"""Fixed-point MSM with precomputed window tables (the Groth16 prover's
commitment engine).

Net-new proving-path component (SURVEY.md §2.3 — the reference snapshot has
no MSM at all; BASELINE config 5).  The Groth16 proving key's point sets
(A_i(τ), B_i(τ), K_i, H_i) are FIXED across proofs, which converts Pippenger
from a scatter/scan problem into the TPU's favourite shape: one big gather
plus wide batched folds (BGMW-style precomputation, re-derived TPU-first):

  table[w, d, i] = d · 2^(c·w) · P_i     (signed digits: d = |digit|)

so    Σ_i s_i·P_i  =  Σ_{w, i}  sgn_{w,i} · table[w, |digit_{w,i}|, i]

— a flat sum of W·n gathered points with NO buckets, NO Horner doublings,
and NO data-dependent control flow.  The window scale 2^(c·w) is baked into
the table, so the whole MSM is: extract signed digits (vector shifts) →
one row-gather of W·n points → conditional y-negation → a chunked fold.

Sequential-step budget (the round-3 driver artifact showed the prover
spending ~80 s in 2^c-step weighted-sum scans at tiny batches — per-step
overhead, not FLOPs, dominates circuit-sized MSMs through the axon tunnel):
the fold here is  (W·n/chunk − 1)  wide scan steps + log₂(chunk) halving
adds ≈ 45 sequential ops at n=8192/c=4, every one of them a full-width
batched complete add.

Memory: W·D·n points; at c=4 signed (W=64, D=9 magnitudes 0..8) and
n=8192 that is 4.7 M G1 points ≈ 0.9 GB HBM — the deliberate sweet spot
(c=2 doubles the add count, c=8 costs 7× the memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


from .msm import _flat_rows, _signed_digits, _unflat_rows


def _pad_points_pow2(curve, points, n_min: int = 1):
    """Pad a projective pytree with identities so n is a power of two."""
    n = points[0].shape[0]
    n2 = 1 << max((n - 1).bit_length(), (n_min - 1).bit_length())
    if n2 == n:
        return points
    ident = curve.identity_like(points[0][0])
    return tuple(
        jnp.concatenate(
            [a, jnp.broadcast_to(jnp.expand_dims(iz, 0), (n2 - n,) + iz.shape)])
        for a, iz in zip(points, ident))


def build_table(curve, points, c: int = 4):
    """(W, D, n) table pytree: table[w, d] = d · 2^(c·w) · points.

    One lax.scan over the W window levels; the body is ~10 full-width curve
    ops, so compile cost is flat in W and n."""
    assert c in (2, 4)
    D = (1 << (c - 1)) + 1  # magnitudes 0 .. 2^(c-1)
    W = 256 // c
    ident = curve.identity_like(points[0])  # (n, ...) identities

    def level(base, _):
        # multiples 2B..(D-1)B as an addition-chain scan — the body is ONE
        # complete add, so the traced graph stays ~2 curve ops per level
        # (an unrolled D-entry chain inlined D× the schoolbook mont-mul
        # subgraph and cost minutes of XLA compile, esp. for Fq2/G2)
        def mul_step(acc, _):
            nxt = curve.add(acc, base)
            return nxt, nxt

        last, mults = jax.lax.scan(mul_step, base, None, length=D - 2)
        stacked = tuple(
            jnp.concatenate([jnp.stack([zi, bi]), mi])
            for zi, bi, mi in zip(ident, base, mults))   # (D, n, ...)
        # next level's base: 2^c·B = 2 · (D-1)·B
        return curve.double(last), stacked

    _, table = jax.lax.scan(level, points, None, length=W)  # (W, D, n, ...)
    return table


def fold_sum(curve, pts, chunk: int = 1 << 14):
    """Σ of a (n, ...) point pytree, n a power of two.

    Every phase is a lax.scan whose body is ONE wide add (the scan body is
    traced once, so the HLO/Mosaic graph stays tiny — an unrolled halving
    tree here cost minutes of XLA compile): first fold n → chunk in n/chunk
    steps at full chunk width (≥97% of the adds in one fixed-shape Pallas
    instance), then fold to a scalar through ~√-width scans (~150 short
    steps of shrinking width)."""

    def scan_fold(p, q, w):
        seq = tuple(a.reshape((q, w) + a.shape[1:]) for a in p)
        init = tuple(a[0] for a in seq)
        rest = tuple(a[1:] for a in seq)

        def body(acc, x):
            return curve.add(acc, x), None

        acc, _ = jax.lax.scan(body, init, rest)
        return acc

    n = pts[0].shape[0]
    if n > chunk:
        pts = scan_fold(pts, n // chunk, chunk)
        n = chunk
    while n > 1:
        w = 1 << ((n.bit_length() - 1) // 2)  # ~sqrt(n)
        pts = scan_fold(pts, n // w, w)
        n = w
    return tuple(a[0] for a in pts)


def msm_fixed(curve, table, scalars, c: int = 4, chunk: int = 1 << 14):
    """MSM against a precomputed `build_table` result.

    scalars: canonical uint32[n, 16] (n = table's point count; shorter
    batches must be zero-padded by the caller).  Jit-safe: everything is
    static-shape gathers, selects, and fixed-length scans."""
    K = curve.K
    W = table[0].shape[0]
    D = table[0].shape[1]
    n = table[0].shape[2]
    assert scalars.shape[0] == n, (scalars.shape, n)
    mag, sgn = _signed_digits(scalars, c)                  # (W, n) each
    # flat row index: entry (w, d, i) lives at (w·D + d)·n + i
    wi = jnp.arange(W, dtype=jnp.int32)[:, None]
    ii = jnp.arange(n, dtype=jnp.int32)[None, :]
    idx = ((wi * D + mag.astype(jnp.int32)) * n + ii).reshape(-1)
    flat = tuple(a.reshape((W * D * n,) + a.shape[3:]) for a in table)
    rows, widths, shapes = _flat_rows(flat)
    g = jnp.take(rows, idx, axis=0)                        # (W·n, F)
    x, y, z = _unflat_rows(g, widths, shapes)
    y = K.select(sgn.reshape(-1), K.neg(y), y)
    return fold_sum(curve, (x, y, z), chunk=chunk)


class FixedMsm:
    """Precomputed fixed-point MSM over one point set.

    Build once (device table), then `.mul(scalars)` per call.  The jitted
    compute fn is cached per (curve, c, W, D, n) shape, so every same-shape
    point set (all four Groth16 proving-key MSMs at one circuit size)
    shares ONE compiled program — the table rides in as an argument."""

    def __init__(self, curve, points, c: int = 4, n_min: int = 1,
                 _table=None):
        self.curve = curve
        self.c = c
        if _table is not None:
            self.table = _table
            self.n = _table[0].shape[2]
            return
        pts = _pad_points_pow2(curve, points, n_min)
        self.n = pts[0].shape[0]
        self.table = _build_jit(curve, c, self.n)(pts)

    @classmethod
    def from_table(cls, curve, table, c: int = 4):
        """Restore from a serialized (W, D, n, ...) table pytree — the
        tables are deterministic derived data, so a warm checkpoint skips
        the device build (round-4 verdict item 6)."""
        return cls(curve, None, c=c, _table=table)

    def mul(self, scalars):
        """scalars: canonical uint32[k, 16] with k <= n (zero-padded)."""
        k = scalars.shape[0]
        if k != self.n:
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((self.n - k, scalars.shape[1]),
                                    scalars.dtype)])
        return _mul_jit(self.curve, self.c, self.n)(self.table, scalars)


@functools.lru_cache(maxsize=None)
def _build_jit(curve, c: int, n: int):
    return jax.jit(lambda pts: build_table(curve, pts, c))


@functools.lru_cache(maxsize=None)
def _mul_jit(curve, c: int, n: int):
    return jax.jit(lambda table, sc: msm_fixed(curve, table, sc, c))


# ---------------------------------------------------------------------------
# Fused multi-set engine: the Groth16 prover's five same-shape G1 MSMs ride
# ONE gather + ONE batched fold (round-4 verdict item 5 — the per-MSM
# dispatch floor and the 5× repetition of the ~180-step fold latency were
# most of the warm prove's wall time)
# ---------------------------------------------------------------------------


def fold_sum_batched(curve, pts, chunk: int = 1 << 14):
    """Per-set Σ over axis 1 of a (S, n, ...) point pytree (n a power of
    two): the S sets fold TOGETHER — every scan step is an (S, w)-wide
    batched add, so the sequential-step count (the latency tail that
    dominates circuit-sized folds) is that of ONE set, not S."""

    def scan_fold(p, q, w):
        seq = tuple(
            jnp.moveaxis(a.reshape((a.shape[0], q, w) + a.shape[2:]), 1, 0)
            for a in p)                                   # (q, S, w, ...)
        init = tuple(a[0] for a in seq)
        rest = tuple(a[1:] for a in seq)

        def body(acc, x):
            return curve.add(acc, x), None

        acc, _ = jax.lax.scan(body, init, rest)
        return acc

    n = pts[0].shape[1]
    if n > chunk:
        pts = scan_fold(pts, n // chunk, chunk)
        n = chunk
    while n > 1:
        w = 1 << ((n.bit_length() - 1) // 2)  # ~sqrt(n)
        pts = scan_fold(pts, n // w, w)
        n = w
    return tuple(a[:, 0] for a in pts)


def msm_fixed_multi(curve, rows, widths, shapes, scalars, n: int,
                    slots, c: int = 4, chunk: int = 1 << 14):
    """S fixed-table MSMs in one pass against a CONCATENATED flat-row table
    matrix (T tables stacked along axis 0, each W·D·n rows).

    rows: (T·W·D·n, F); scalars: canonical uint32[S, n, 16]; slots: static
    tuple mapping set -> table index (sets may share a table — the prover
    evaluates MSM_a at both w and s·w).  Returns a projective pytree of
    (S, ...) per-set sums.  Jit-safe: one gather + fixed-length scans."""
    K = curve.K
    D = (1 << (c - 1)) + 1
    W = 256 // c
    S = scalars.shape[0]
    assert len(slots) == S
    mag, sgn = _signed_digits(scalars.reshape(S * n, 16), c)   # (W, S·n)
    mag = mag.reshape(W, S, n)
    wi = jnp.arange(W, dtype=jnp.int32)[:, None, None]
    ti = jnp.asarray(slots, jnp.int32)[None, :, None]
    ii = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    idx = ti * (W * D * n) + (wi * D + mag.astype(jnp.int32)) * n + ii
    g = jnp.take(rows, idx.reshape(-1), axis=0)                # (W·S·n, F)
    x, y, z = _unflat_rows(g, widths, shapes)
    y = K.select(sgn.reshape(-1), K.neg(y), y)

    def to_sets(a):
        a = a.reshape((W, S, n) + a.shape[1:])
        return jnp.moveaxis(a, 1, 0).reshape((S, W * n) + a.shape[3:])

    return fold_sum_batched(curve, tuple(to_sets(a) for a in (x, y, z)),
                            chunk=chunk)


class FixedMsmGroup:
    """Several same-shape fixed point sets sharing one concatenated
    flat-row table matrix and one fused compute path.

    Build from point sets (device table construction, one compiled shape),
    or restore from serialized rows (`from_rows` — round-4 verdict item 6:
    the tables are deterministic derived data and cold processes should not
    pay the ~90 s device build again)."""

    def __init__(self, curve, point_sets, c: int = 4, n_min: int = 1,
                 _rows=None, _meta=None):
        self.curve = curve
        self.c = c
        if _rows is not None:
            self.rows = _rows
            self.n, self.n_tables, self.widths, self.shapes = _meta
            return
        tabs = []
        n = None
        for pts in point_sets:
            padded = _pad_points_pow2(curve, pts, n_min)
            n = padded[0].shape[0]
            table = _build_jit(curve, c, n)(padded)
            flat = tuple(a.reshape((-1,) + a.shape[3:]) for a in table)
            r, self.widths, self.shapes = _flat_rows(flat)
            tabs.append(r)
        self.n = n
        self.n_tables = len(tabs)
        self.rows = jnp.concatenate(tabs, axis=0) if len(tabs) > 1 else tabs[0]

    @property
    def meta(self):
        return (self.n, self.n_tables, self.widths, self.shapes)

    @classmethod
    def from_rows(cls, curve, rows, meta, c: int = 4):
        return cls(curve, None, c=c, _rows=rows, _meta=meta)

    def mul_multi(self, scalars, slots):
        """scalars: canonical uint32[S, n, 16]; slots: tuple set->table."""
        return _multi_jit(self.curve, self.c, self.n, tuple(slots),
                          tuple(self.widths),
                          tuple(tuple(s) for s in self.shapes))(
            self.rows, scalars)


@functools.lru_cache(maxsize=None)
def _multi_jit(curve, c: int, n: int, slots, widths, shapes):
    return jax.jit(lambda rows, sc: msm_fixed_multi(
        curve, rows, list(widths), [tuple(s) for s in shapes], sc, n, slots,
        c))
