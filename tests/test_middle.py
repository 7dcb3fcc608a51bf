"""The previously-untested middle layer: Fq2 units, pairing properties,
gadget-vs-kernel bit-exactness, pool-circuit constraint satisfaction
(VERDICT r1: 'Test the untested middle layer')."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.circuits import gadgets, pool
from owshen_tpu.fields.field import FQ, FR
from owshen_tpu.fields.fq2 import FQ2
from owshen_tpu.groth16 import pairing as pr
from owshen_tpu.groth16.r1cs import LC, Builder
from owshen_tpu.oracle import curve as ocurve
from owshen_tpu.oracle import hash as ohash

rng = random.Random(42)
Q = FQ.p


# ---------------------------------------------------------------------------
# Fq2 device arithmetic vs host ints
# ---------------------------------------------------------------------------

def _rand_fq2(n):
    return [(rng.randrange(Q), rng.randrange(Q)) for _ in range(n)]


def _href(op, a, b=None):
    f = ocurve.FQ2I
    return [getattr(f, op)(x, y) for x, y in zip(a, b)] if b else [
        getattr(f, op)(x) for x in a]


def test_fq2_ops_vs_host():
    a, b = _rand_fq2(8), _rand_fq2(8)
    da, db = FQ2.encode(a), FQ2.encode(b)
    assert FQ2.decode(jax.jit(FQ2.add)(da, db)) == _href("add", a, b)
    assert FQ2.decode(jax.jit(FQ2.sub)(da, db)) == _href("sub", a, b)
    assert FQ2.decode(jax.jit(FQ2.mul)(da, db)) == _href("mul", a, b)
    assert FQ2.decode(jax.jit(FQ2.sqr)(da)) == _href("mul", a, a)
    assert FQ2.decode(jax.jit(FQ2.neg)(da)) == _href("neg", a)
    assert FQ2.decode(jax.jit(FQ2.inv)(da)) == _href("inv", a)


def test_fq2_mul_const():
    a = _rand_fq2(4)
    c = (123456789, 987654321)
    da = FQ2.encode(a)
    got = FQ2.decode(jax.jit(lambda x: FQ2.mul_const(x, c))(da))
    assert got == [ocurve.FQ2I.mul(x, c) for x in a]


# ---------------------------------------------------------------------------
# Pairing: bilinearity + non-degeneracy + identity handling
# ---------------------------------------------------------------------------

def test_pairing_bilinear():
    a, b = 7, 11
    pa = ocurve.G1.mul(ocurve.G1_GEN, a)
    qb = ocurve.G2.mul(ocurve.G2_GEN, b)
    lhs = pr.pairing(pa, qb)
    rhs = pr.pairing(ocurve.G1_GEN, ocurve.G2_GEN).pow(a * b)
    assert lhs == rhs
    assert lhs != pr.Fq12.one()  # non-degenerate


def test_pairing_product_cancellation():
    # e(aG, bH) · e(-abG, H) == 1
    a, b = 5, 9
    pa = ocurve.G1.mul(ocurve.G1_GEN, a)
    qb = ocurve.G2.mul(ocurve.G2_GEN, b)
    neg = ocurve.G1.mul(ocurve.G1_GEN, pr.R - a * b)
    assert pr.pairing_product_is_one([(pa, qb), (neg, ocurve.G2_GEN)])
    assert not pr.pairing_product_is_one([(pa, qb), (pa, qb)])


def test_pairing_identity_points():
    # identity on either side contributes factor 1
    assert pr.pairing(None, ocurve.G2_GEN) == pr.Fq12.one()
    assert pr.pairing(ocurve.G1_GEN, None) == pr.Fq12.one()
    assert pr.pairing_product_is_one([(None, ocurve.G2_GEN),
                                      (ocurve.G1_GEN, None)])


# ---------------------------------------------------------------------------
# Gadgets vs kernels/oracle: identical constants => identical values
# ---------------------------------------------------------------------------

def test_poseidon_gadget_matches_oracle():
    ins = [rng.randrange(FR.p) for _ in range(2)]
    b = Builder()
    lcs = [b.priv(v) for v in ins]
    out = gadgets.poseidon_gadget(b, lcs)
    assert b.check()
    got = out.eval(b.witness())
    assert got == ohash.poseidon(ins)


def test_mimc7_gadget_matches_oracle():
    x, k = rng.randrange(FR.p), rng.randrange(FR.p)
    b = Builder()
    xl, kl = b.priv(x), b.priv(k)
    out = gadgets.mimc7_gadget(b, xl, kl)
    assert b.check()
    assert out.eval(b.witness()) == ohash.mimc7(x, k)


def test_merkle_path_gadget_matches_oracle():
    depth = 3
    leaves = [rng.randrange(FR.p) for _ in range(1 << depth)]
    idx = 5
    lvl = leaves
    sibs, node = [], leaves[idx]
    i = idx
    levels = [leaves]
    while len(lvl) > 1:
        lvl = [ohash.poseidon([lvl[j], lvl[j + 1]]) for j in range(0, len(lvl), 2)]
        levels.append(lvl)
    i = idx
    for lv in levels[:-1]:
        sibs.append(lv[i ^ 1])
        i >>= 1
    root = levels[-1][0]
    b = Builder()
    leaf_lc = b.priv(leaves[idx])
    bit_lcs = [b.priv((idx >> l) & 1) for l in range(depth)]
    sib_lcs = [b.priv(s) for s in sibs]
    out = gadgets.merkle_path_gadget(b, leaf_lc, bit_lcs, sib_lcs)
    assert b.check()
    assert out.eval(b.witness()) == root


# ---------------------------------------------------------------------------
# Pool circuits: constraint satisfaction + structure invariance
# ---------------------------------------------------------------------------

def test_deposit_circuit_satisfied():
    w = pool.DepositWitness(secret=rng.randrange(FR.p),
                            salt=rng.randrange(FR.p), amount=1000)
    b = pool.deposit_circuit(w)
    assert b.check()
    # structure identical with or without values (setup/prove split)
    b2 = pool.deposit_circuit(None)
    assert len(b2.constraints) == len(b.constraints)
    assert b2.num_vars == b.num_vars


def test_withdraw_circuit_satisfied():
    depth = 3
    secret, salt, amount, index = (rng.randrange(FR.p), rng.randrange(FR.p),
                                   777, 5)
    com = pool.commitment_of(secret, salt, amount)
    # build the tree host-side
    leaves = [0] * (1 << depth)
    leaves[index] = com
    levels = [leaves]
    lvl = leaves
    while len(lvl) > 1:
        lvl = [ohash.poseidon([lvl[j], lvl[j + 1]]) for j in range(0, len(lvl), 2)]
        levels.append(lvl)
    root = levels[-1][0]
    sibs, i = [], index
    for lv in levels[:-1]:
        sibs.append(lv[i ^ 1])
        i >>= 1
    w = pool.WithdrawWitness(secret=secret, salt=salt, amount=amount,
                             index=index, siblings=sibs)
    b = pool.withdraw_circuit(depth, w, root=root, recipient=0xdead)
    assert b.check()
    # wrong root must not satisfy
    b_bad = pool.withdraw_circuit(depth, w, root=(root + 1) % FR.p,
                                  recipient=0xdead)
    assert not b_bad.check()
