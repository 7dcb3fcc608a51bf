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
