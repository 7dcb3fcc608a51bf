"""Fixed-base windowed scalar multiplication (batched multi-exponentiation).

The reference's only scalar-mul is a sequential 254-step double-and-add
(reference: src/blockchain/tx/owshen_airdrop/babyjubjub/mod.rs:68-78); for a
FIXED base (Groth16 setup powers-of-τ, EdDSA base-point muls) the TPU-native
shape is precompute + gather:

  host (once per base):   T[w][d] = d · 2^(c·w) · G   for all windows w and
                          digits d < 2^c — built incrementally with ~W·2^c
                          oracle affine adds;
  device (per batch):     k·G = Σ_w T[w][digit_w(k)] — one gather per point
                          pytree leaf plus a log₂W tree of batched complete
                          adds.  254 sequential EC doubles become 5 batched
                          adds of full VPU width.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields.field import FR
from ..ops.msm import sum_scan, window_digits


class FixedBase:
    """Precomputed window tables for one (curve, generator) pair.

    curve: device Weierstrass ops; oracle: host WCurve; encode: host points ->
    device projective pytree (e.g. bn254.g1_encode); gen: affine generator."""

    def __init__(self, curve, oracle, encode, gen, c: int = 8,
                 n_bits: int = 256):
        self.curve = curve
        self.c = c
        self.n_bits = n_bits
        self.n_windows = (n_bits + c - 1) // c
        rows = []
        base = gen
        for _ in range(self.n_windows):
            acc = None
            row = [None]
            for _ in range(1, 1 << c):
                acc = oracle.add(acc, base)
                row.append(acc)
            rows.extend(row)
            for _ in range(c):
                base = oracle.add(base, base)
        # HOST (numpy) tables: pytree leaves (W, 2^c, ...).  Kept as numpy —
        # a jnp.asarray here would return a TRACER when the first caller is
        # inside a jit trace, and the lru_cached FixedBase would leak it
        # into every later trace (observed UnexpectedTracerError).
        flat = encode(rows)
        self.tables = tuple(
            np.asarray(leaf).reshape((self.n_windows, 1 << c) + leaf.shape[1:])
            for leaf in flat
        )

    def mul(self, scalars):
        """scalars: canonical uint32[n, L] -> projective points [n, ...]."""
        digits = window_digits(scalars, self.c, self.n_bits)  # (W, n)
        wi = jnp.arange(self.n_windows, dtype=jnp.int32)[:, None]
        pts = tuple(jnp.asarray(t)[wi, digits] for t in self.tables)
        return sum_scan(self.curve, pts, axis=0)


@functools.lru_cache(maxsize=None)
def g1_fixed_base(c: int = 8) -> FixedBase:
    from ..oracle import curve as ocurve
    from . import bn254
    return FixedBase(bn254.G1, ocurve.G1, bn254.g1_encode, ocurve.G1_GEN, c)


@functools.lru_cache(maxsize=None)
def g2_fixed_base(c: int = 8) -> FixedBase:
    from ..oracle import curve as ocurve
    from . import bn254
    return FixedBase(bn254.G2, ocurve.G2, bn254.g2_encode, ocurve.G2_GEN, c)


@functools.lru_cache(maxsize=None)
def jub_fixed_base(c: int = 8) -> FixedBase:
    """Windowed tables for the BabyJubJub base point — turns EdDSA-verify's
    s·B from a 254-step double-and-add scan (reference mod.rs:68-78) into
    one gather + 31 batched complete adds."""
    from . import babyjubjub as jub
    return FixedBase(jub.JUB_OPS, jub._JubOracle(), jub.jub_encode,
                     jub.BASE, c)
