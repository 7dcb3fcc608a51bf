"""Privacy-pool protocol shell: the host-side state machine tying the TPU
kernels into the reference's deposit/withdraw semantics (SURVEY.md §7.2.8).

Semantics anchors in the reference node:
  * deposit → Mint with double-spend guards on the deposited L1 tx hash and
    the mint tx hash (src/blockchain/tx/mint_tx.rs:17-34);
  * withdraw → Burn with a replay-protected burn id and balance debit
    (src/blockchain/tx/burn_tx.rs:15-24), released on L1 only once per id
    (`isExecuted[id]`, contracts/src/Owshen.sol:66-78) against a voucher
    hash binding (recipient, token, amount, id, chainid)
    (contracts/src/Owshen.sol:70-73).

The ZK layer replaces trusted bookkeeping with proofs: a deposit inserts a
hiding commitment into the pool's sparse Merkle tree (TPU batch insert); a
withdrawal must carry a Groth16 proof of membership under a known root plus
a deterministic nullifier — the circuit-level burn id — and the recipient
and amount are public inputs, so a voucher cannot be redirected or resized
(circuits/pool.py).  All guards below are exact mirrors of the cited
reference checks, keyed by nullifier instead of operator-assigned burn id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..circuits import pool as circuits
from ..fields.field import FR
from ..groth16 import groth16
from ..ops.keccak import keccak256_int
from ..ops.merkle import SparseMerkleTree

CHAIN_ID = 918273  # reference: src/config.rs:2


class PoolError(Exception):
    pass


@dataclass
class Voucher:
    """The L1-release material (reference: api_services/withdrawals.rs:35-78
    returns {block_number, sig, token, amount} for Owshen.sol::withdraw*)."""
    recipient: int
    amount: int
    nullifier: int
    binding: int  # keccak256(recipient, amount, id, chain_id) — Owshen.sol:70-73


class PrivacyPool:
    """Pool state = sparse Merkle tree of commitments (TPU-resident) +
    nullifier set + deposit double-spend guards (host sets — the role the
    reference's Key::DepositedTransaction / Key::BurnId KV entries play)."""

    def __init__(self, depth: int = 16, setup_seed: bytes = b"owshen-tpu-pool"):
        self.depth = depth
        self.tree = SparseMerkleTree(depth, "poseidon")
        self.next_index = 0
        self.deposited: set[int] = set()   # L1 tx hashes (mint_tx.rs:17-22)
        self.minted: set[int] = set()      # mint tx hashes (mint_tx.rs:24-30)
        self.nullifiers: set[int] = set()  # burn ids (burn_tx.rs:15-18)
        self.roots: list[int] = [self.tree.root_int()]
        # trusted-setup keys for the withdraw circuit at this depth
        builder = circuits.withdraw_circuit(depth)
        self.pk, self.vk = groth16.setup(builder, seed=setup_seed)

    # ------------------------------------------------------------------
    # deposit (L1 → pool): mirror of mint_tx.rs:11-49
    # ------------------------------------------------------------------

    def deposit(self, commitments: list[int], l1_tx_hashes: list[int]) -> list[int]:
        """Credit a batch of commitments.  Guards: each L1 tx hash may mint
        only once (mint_tx.rs:17-22); the derived mint id may not repeat
        (mint_tx.rs:24-30).  Returns the assigned leaf indices."""
        if len(commitments) != len(l1_tx_hashes):
            raise PoolError("commitments/tx_hashes length mismatch")
        mint_ids = []
        for com, txh in zip(commitments, l1_tx_hashes):
            if txh in self.deposited:
                raise PoolError(f"tx {txh:#x} already deposited")  # dup guard 1
            mid = keccak256_int(
                txh.to_bytes(32, "big") + com.to_bytes(32, "big"))
            if mid in self.minted:
                raise PoolError(f"mint {mid:#x} already applied")  # dup guard 2
            mint_ids.append(mid)
        idxs = list(range(self.next_index, self.next_index + len(commitments)))
        if idxs and idxs[-1] >= (1 << self.depth):
            raise PoolError("pool full")
        # TPU batch insert: one scatter + depth re-hash levels
        self.tree.insert_ints(idxs, commitments)
        self.next_index += len(commitments)
        self.deposited.update(l1_tx_hashes)
        self.minted.update(mint_ids)
        self.roots.append(self.tree.root_int())
        return idxs

    # ------------------------------------------------------------------
    # withdraw (pool → L1 voucher): mirror of burn_tx.rs:11-32 +
    # Owshen.sol:66-78
    # ------------------------------------------------------------------

    def withdraw(self, proof: groth16.Proof, root: int, nullifier: int,
                 recipient: int, amount: int) -> Voucher:
        """Verify a membership proof and release a voucher exactly once per
        nullifier."""
        if root not in self.roots:
            raise PoolError("unknown root")
        if nullifier in self.nullifiers:
            # burn_tx.rs:15-18 / Owshen.sol:68 isExecuted[id]
            raise PoolError("nullifier already spent")
        if not groth16.verify(self.vk, [root, nullifier, recipient, amount],
                              proof):
            raise PoolError("invalid proof")
        self.nullifiers.add(nullifier)
        binding = keccak256_int(
            recipient.to_bytes(32, "big") + amount.to_bytes(32, "big")
            + nullifier.to_bytes(32, "big") + CHAIN_ID.to_bytes(32, "big"))
        return Voucher(recipient=recipient, amount=amount,
                       nullifier=nullifier, binding=binding)

    # ------------------------------------------------------------------
    # client-side helpers
    # ------------------------------------------------------------------

    def prove_withdraw(self, secret: int, salt: int, amount: int, index: int,
                       recipient: int, msm_c: int = 8,
                       msm_lanes: int = 256) -> tuple[groth16.Proof, int, int]:
        """Build the witness from the live tree and prove membership.
        Returns (proof, root, nullifier)."""
        sibs_dev, _bits = self.tree.path([index])
        sibs = [FR.decode(sibs_dev[0, l][None])[0] for l in range(self.depth)]
        w = circuits.WithdrawWitness(secret=secret, salt=salt, amount=amount,
                                     index=index, siblings=sibs)
        root = self.tree.root_int()
        b = circuits.withdraw_circuit(self.depth, w, root=root,
                                      recipient=recipient)
        assert b.check(), "witness does not satisfy the circuit"
        proof = groth16.prove(self.pk, b, msm_c=msm_c, msm_lanes=msm_lanes)
        nullifier = circuits.nullifier_of(secret, index)
        return proof, root, nullifier
