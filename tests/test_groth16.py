"""End-to-end Groth16: setup → prove → verify for the quadratic toy circuit
and the privacy-pool deposit/withdraw circuits, with tamper rejection on
every public input (the acceptance gate of BASELINE config 5; replay/voucher
semantics anchor: reference src/blockchain/tx/burn_tx.rs:15-24 and
contracts/src/Owshen.sol:66-78)."""

import random

import numpy as np
import pytest

from owshen_tpu.circuits import pool
from owshen_tpu.groth16 import groth16
from owshen_tpu.groth16.r1cs import Builder
from owshen_tpu.oracle import hash as ohash

rng = random.Random(1234)
P = groth16.P

# small MSM lanes: CPU-mesh test sizes are tiny
LANES = 64


def test_quadratic_setup_prove_structure():
    # cheap structural smoke (full e2e acceptance is covered by the deposit
    # and withdraw tests below — each prove costs ~2 min on the CPU mesh)
    b = Builder()
    y = b.pub(49)
    x = b.priv(7)
    b.enforce_eq(b.mul(x, x), y)
    assert b.check()
    mats = b.compiled(2)
    # bucketed form: every matrix's buckets cover each constrained row once
    for mat in mats:
        rows = np.concatenate([rids for rids, _, _ in mat]) if mat else []
        assert len(set(map(int, rows))) == len(rows)


def _host_tree(depth, index, leaf):
    leaves = [0] * (1 << depth)
    leaves[index] = leaf
    levels = [leaves]
    lvl = leaves
    while len(lvl) > 1:
        lvl = [ohash.poseidon([lvl[j], lvl[j + 1]])
               for j in range(0, len(lvl), 2)]
        levels.append(lvl)
    sibs, i = [], index
    for lv in levels[:-1]:
        sibs.append(lv[i ^ 1])
        i >>= 1
    return levels[-1][0], sibs


def test_deposit_e2e():
    w = pool.DepositWitness(secret=rng.randrange(P), salt=rng.randrange(P),
                            amount=12345)
    com = pool.commitment_of(w.secret, w.salt, w.amount)
    b = pool.deposit_circuit(w)
    assert b.check()
    pk, vk = groth16.setup(b)
    proof = groth16.prove(pk, b, msm_c=4, msm_lanes=LANES)
    assert groth16.verify(vk, [com, w.amount], proof)
    # tampered commitment / amount rejected
    assert not groth16.verify(vk, [(com + 1) % P, w.amount], proof)
    assert not groth16.verify(vk, [com, w.amount + 1], proof)


@pytest.mark.slow
def test_withdraw_e2e_and_malleability():
    # slow (a second full CPU-mesh prove): the default suite still covers a
    # withdraw prove + tamper rejections via tests/test_protocol.py's pool
    # e2e; this adds the exhaustive 4-public-input malleability matrix.
    depth = 2
    secret, salt, amount, index = (rng.randrange(P), rng.randrange(P),
                                   999, 3)
    com = pool.commitment_of(secret, salt, amount)
    nul = pool.nullifier_of(secret, index)
    root, sibs = _host_tree(depth, index, com)
    recipient = 0xBEEF
    w = pool.WithdrawWitness(secret=secret, salt=salt, amount=amount,
                             index=index, siblings=sibs)
    b = pool.withdraw_circuit(depth, w, root=root, recipient=recipient)
    assert b.check()
    pk, vk = groth16.setup(b)
    proof = groth16.prove(pk, b, msm_c=4, msm_lanes=LANES)
    pub = [root, nul, recipient, amount]
    assert groth16.verify(vk, pub, proof)
    # tamper every public input: root, nullifier, recipient (malleability/
    # front-run guard — the ZK analogue of Owshen.sol:70-73's voucher
    # binding), amount
    for k in range(4):
        bad = list(pub)
        bad[k] = (bad[k] + 1) % P
        assert not groth16.verify(vk, bad, proof), f"tampered input {k} accepted"
