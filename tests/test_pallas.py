"""Pallas kernel gates (interpret mode on the CPU mesh; the real Mosaic
path is exercised on hardware by bench.py and the verify drives).

Bit-exactness anchors: the host oracle (oracle/hash.py, pure ints) and the
jnp field path — the same gates the XLA kernels pass."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.fields.field import FR
from owshen_tpu.oracle import hash as ohash
from owshen_tpu.pallas.field_kernels import (
    mimc_hash2_pallas,
    mont_mul_pallas,
    poseidon_hash2_pallas,
)

rng = random.Random(9)


def _pair(n):
    xs = [rng.randrange(FR.p) for _ in range(n)]
    ys = [rng.randrange(FR.p) for _ in range(n)]
    return xs, ys, jnp.asarray(FR.encode(xs)), jnp.asarray(FR.encode(ys))


def test_mont_mul_kernel():
    xs, ys, a, b = _pair(128)
    got = FR.decode(mont_mul_pallas(a, b, block_t=128))
    assert got == [(x * y) % FR.p for x, y in zip(xs, ys)]


def test_mont_mul_kernel_edges():
    xs = [0, 1, FR.p - 1, FR.p - 2] * 32
    ys = [FR.p - 1, 0, FR.p - 1, 1] * 32
    a, b = jnp.asarray(FR.encode(xs)), jnp.asarray(FR.encode(ys))
    got = FR.decode(mont_mul_pallas(a, b, block_t=128))
    assert got == [(x * y) % FR.p for x, y in zip(xs, ys)]


def test_poseidon_kernel():
    xs, ys, a, b = _pair(128)
    got = FR.decode(poseidon_hash2_pallas(a, b, block_t=128))
    assert got == [ohash.poseidon([x, y]) for x, y in zip(xs, ys)]


def test_mimc_kernel():
    xs, ys, a, b = _pair(128)
    got = FR.decode(mimc_hash2_pallas(a, b, block_t=128))
    assert got == [ohash.mimc7_multi([x, y]) for x, y in zip(xs, ys)]


def test_g1_add_double_kernel():
    from owshen_tpu.curves import bn254
    from owshen_tpu.oracle import curve as ocurve
    from owshen_tpu.pallas.field_kernels import g1_add_pallas, g1_double_pallas

    ks = [rng.randrange(1000) + 1 for _ in range(126)]
    pts = [ocurve.G1.mul(ocurve.G1_GEN, k) for k in ks] + [None, None]
    dev = bn254.g1_encode(pts)
    got = bn254.g1_decode(g1_add_pallas(dev, dev, block_t=128))
    want = [ocurve.G1.add(p, p) for p in pts]
    assert got == want
    got2 = bn254.g1_decode(g1_double_pallas(dev, block_t=128))
    assert got2 == want
    # mixed add incl. identity operands
    rev = tuple(x[::-1] for x in dev)
    got3 = bn254.g1_decode(g1_add_pallas(dev, rev, block_t=128))
    want3 = [ocurve.G1.add(a, b) for a, b in zip(pts, pts[::-1])]
    assert got3 == want3


def test_ntt_kernel():
    from owshen_tpu.oracle import ntt as ontt
    from owshen_tpu.pallas.ntt_kernels import ntt_pallas

    log_n = 6
    n = 1 << log_n
    xs = [rng.randrange(FR.p) for _ in range(n)]
    omega = pow(FR.generator, (FR.p - 1) >> log_n, FR.p)
    got = FR.decode(ntt_pallas(jnp.asarray(FR.encode(xs)), log_n))
    assert got == ontt.ntt(xs, omega)
    back = FR.decode(ntt_pallas(jnp.asarray(FR.encode(got)), log_n,
                                inverse=True))
    n_inv = pow(n, -1, FR.p)
    assert [v * n_inv % FR.p for v in back] == xs


def test_ntt_kernel_recursive_split():
    """log_n > MAX_FUSED_LOGN exercises the recursive Bailey split (the
    compile-cost fix: capped fused kernels + per-level twiddle correction)
    against the oracle, forward and inverse."""
    from owshen_tpu.oracle import ntt as ontt
    from owshen_tpu.pallas import ntt_kernels

    old = ntt_kernels.MAX_FUSED_LOGN
    ntt_kernels.MAX_FUSED_LOGN = 3  # force two recursion levels at n=512
    try:
        log_n = 9
        n = 1 << log_n
        xs = [rng.randrange(FR.p) for _ in range(n)]
        omega = pow(FR.generator, (FR.p - 1) >> log_n, FR.p)
        got = FR.decode(ntt_kernels.ntt_pallas(
            jnp.asarray(FR.encode(xs)), log_n))
        assert got == ontt.ntt(xs, omega)
        back = FR.decode(ntt_kernels.ntt_pallas(
            jnp.asarray(FR.encode(got)), log_n, inverse=True))
        n_inv = pow(n, -1, FR.p)
        assert [v * n_inv % FR.p for v in back] == xs
    finally:
        ntt_kernels.MAX_FUSED_LOGN = old


def test_butterfly_kernel():
    """Fused NTT butterfly (lo, hi) = (a + b·w, a − b·w) vs host ints
    (round-5: the XLA Bailey path routes its hot muls through this)."""
    from owshen_tpu.pallas.ntt_kernels import butterfly_pallas

    xs, ys, a, b = _pair(128)
    ws = [rng.randrange(FR.p) for _ in range(128)]
    w = jnp.asarray(FR.encode(ws))
    lo, hi = butterfly_pallas(a, b, w, block_t=128)
    want_lo = [(x + y * t) % FR.p for x, y, t in zip(xs, ys, ws)]
    want_hi = [(x - y * t) % FR.p for x, y, t in zip(xs, ys, ws)]
    assert FR.decode(lo) == want_lo
    assert FR.decode(hi) == want_hi
