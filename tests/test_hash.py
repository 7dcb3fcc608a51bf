"""Hash kernel gates: constant-derivation anchors + oracle bit-exactness."""

import random

import jax
import numpy as np

from owshen_tpu.fields.field import FR
from owshen_tpu.ops.constants import mimc7_constants, poseidon_params
from owshen_tpu.ops import hash as jhash
from owshen_tpu.oracle import hash as ohash

rng = random.Random(99)


def test_poseidon_grain_anchors():
    """Pin the Grain generator to the published poseidonperm_x5_254_3
    instantiation (exact 254-bit anchors)."""
    C, M = poseidon_params(3)
    assert C[0] == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    assert M[0][0] == 0x109B7F411BA0E4C9B2B70CAF5C36A7B194BE7C11AD24378BFEDB68592BA8118B
    # all constants are canonical field elements
    assert all(0 <= c < FR.p for c in C)


def test_mimc_constants_keccak_chain():
    cts = mimc7_constants()
    assert cts[0] == 0
    assert len(cts) == 91
    # c[1] = keccak256(keccak256("mimc")) reduced mod p (circomlib chain:
    # cts[0]=0, then one extra keccak application per index)
    from owshen_tpu.ops.keccak import keccak256
    k1 = keccak256(b"mimc")
    assert k1.hex() == "b6e489e6b37224a50bebfddbe7d89fa8fdcaa84304a70bd13f79b5d9f7951e9e"
    assert cts[1] == int.from_bytes(keccak256(k1), "big") % FR.p


def test_mimc7_vs_oracle():
    xs = [rng.randrange(FR.p) for _ in range(8)]
    ks = [rng.randrange(FR.p) for _ in range(8)]
    got = FR.decode(jax.jit(jhash.mimc7)(FR.encode(xs), FR.encode(ks)))
    want = [ohash.mimc7(x, k) for x, k in zip(xs, ks)]
    assert got == want


def test_mimc7_multi_vs_oracle():
    ls = [rng.randrange(FR.p) for _ in range(6)]
    rs = [rng.randrange(FR.p) for _ in range(6)]
    got = FR.decode(jax.jit(jhash.mimc_hash2)(FR.encode(ls), FR.encode(rs)))
    want = [ohash.mimc7_multi([l, r]) for l, r in zip(ls, rs)]
    assert got == want


def test_poseidon_vs_oracle_t3():
    ls = [rng.randrange(FR.p) for _ in range(6)] + [0, 1]
    rs = [rng.randrange(FR.p) for _ in range(6)] + [0, 2]
    got = FR.decode(jax.jit(jhash.poseidon_hash2)(FR.encode(ls), FR.encode(rs)))
    want = [ohash.poseidon([l, r]) for l, r in zip(ls, rs)]
    assert got == want


def test_poseidon_vs_oracle_t5():
    cols = [[rng.randrange(FR.p) for _ in range(4)] for _ in range(4)]
    enc = [FR.encode(c) for c in cols]
    got = FR.decode(jax.jit(lambda *a: jhash.poseidon(list(a)))(*enc))
    want = [ohash.poseidon([cols[j][i] for j in range(4)]) for i in range(4)]
    assert got == want


def test_poseidon_single_input():
    xs = [1, 2, rng.randrange(FR.p)]
    got = FR.decode(jax.jit(lambda a: jhash.poseidon([a]))(FR.encode(xs)))
    want = [ohash.poseidon([x]) for x in xs]
    assert got == want
