"""Protocol shell e2e: deposit → prove membership → verify → voucher →
replay rejected.  Guard semantics anchors: reference
src/blockchain/tx/mint_tx.rs:17-34 (deposit dup guards),
burn_tx.rs:15-24 + contracts/src/Owshen.sol:66-78 (nullifier replay)."""

import random

import pytest

from owshen_tpu.circuits import pool as circuits
from owshen_tpu.protocol.pool import PoolError, PrivacyPool

rng = random.Random(77)
from owshen_tpu.fields.field import P_FR  # noqa: E402

DEPTH = 2  # tiny tree: the cryptographic structure is depth-independent


@pytest.fixture(scope="module")
def pool():
    return PrivacyPool(depth=DEPTH)


def test_pool_e2e(pool):
    """One prove covers the whole guard matrix: deposit dup guards, bad-proof
    rejections (checked BEFORE the nullifier is spent), honest voucher,
    then replay rejection."""
    secret, salt, amount = rng.randrange(P_FR), rng.randrange(P_FR), 5000
    com = circuits.commitment_of(secret, salt, amount)
    tx_hash = rng.randrange(1 << 255)

    # deposit with dup guards (mint_tx.rs:17-34)
    idxs = pool.deposit([com], [tx_hash])
    assert idxs == [0]
    with pytest.raises(PoolError, match="already deposited"):
        pool.deposit([com], [tx_hash])

    recipient = 0xAB
    proof, root, nullifier = pool.prove_withdraw(
        secret, salt, amount, idxs[0], recipient, msm_c=4, msm_lanes=64)

    # front-run attempt: different recipient fails (voucher binding,
    # Owshen.sol:70-73 analogue)
    with pytest.raises(PoolError, match="invalid proof"):
        pool.withdraw(proof, root, nullifier, 0xEE, amount)
    # inflated amount fails
    with pytest.raises(PoolError, match="invalid proof"):
        pool.withdraw(proof, root, nullifier, recipient, amount + 1)
    # unknown root fails fast
    with pytest.raises(PoolError, match="unknown root"):
        pool.withdraw(proof, (root + 1) % P_FR, nullifier, recipient, amount)

    # honest withdrawal
    voucher = pool.withdraw(proof, root, nullifier, recipient, amount)
    assert voucher.recipient == recipient and voucher.amount == amount

    # replay: the same nullifier must be rejected (Owshen.sol:68)
    with pytest.raises(PoolError, match="already spent"):
        pool.withdraw(proof, root, nullifier, recipient, amount)
