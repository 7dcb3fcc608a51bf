"""Pallas TPU kernels for BN254 limb arithmetic and the Poseidon permutation.

Why Pallas here: the XLA path expresses one field mul as ~50 HLO ops, many
of them layout-changing (skew reshapes, concats, banded dots) — each breaks
fusion and forces an HBM round-trip, leaving FR.mul ~28x off the measured
1.3 T elemops/s VPU rate and making Poseidon spill VMEM at large batches.
Inside one Pallas kernel the whole computation stays in VMEM/vregs.

Layout: a field element batch lives as uint32[L=16, T] inside the kernel —
limbs on SUBLANES (16 rows = two full 8-row tiles), batch on LANES (T a
multiple of 128).  Every op is then a full-width elementwise vector op or a
static sublane slice; there are no gathers, no relayouts.  The host-side
(N, L) arrays are transposed once at the kernel boundary — amortized over
65 fused rounds (Poseidon) or a full Montgomery product.

The arithmetic is the same flat-carry formulation as fields/field.py
(fold rounds + SWAR carry-lookahead (P+2G)^P, complement-add subtraction),
re-expressed limb-major; bit-exactness is gated against the jnp path and
the host oracle in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import FR, MASK, W, Field, int_to_limbs

L = 16


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# In-kernel limb-major primitives (values are (rows, T) uint32 arrays)
# ---------------------------------------------------------------------------

def _shift_down_rows(x, d: int):
    """Row i -> row i+d (zero-fill top): the limb-major _shift_up."""
    pad = jnp.zeros((d,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _resolve_chunk_lm(cols):
    """SWAR carry resolution, limb-major: cols (n<=30, T) each <= 2^W+1.

    Weight/shift vectors are built with in-kernel iota (Pallas kernels may
    not close over host ndarrays)."""
    n = cols.shape[0]
    v = cols & MASK
    g = cols >> W
    p = (v == MASK).astype(jnp.uint32)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    w = jnp.uint32(1) << iota
    # Mosaic lacks unsigned reductions; values < 2^31 so int32 is exact
    G = jnp.sum((g * w).astype(jnp.int32), axis=0,
                keepdims=True).astype(jnp.uint32)    # (1, T)
    P = jnp.sum((p * w).astype(jnp.int32), axis=0,
                keepdims=True).astype(jnp.uint32)
    cin = (P + (G << 1)) ^ P
    cin_rows = (cin >> iota) & 1                     # (n, T)
    return (v + cin_rows) & MASK, (cin >> n) & 1     # limbs, carry (1, T)


def _canon_lm(cols, n_out: int):
    """Carry-canonicalize (k, T) columns (< 2^31) to (n_out, T) limbs +
    (1, T) carry.  Same contract as field._carry_canon, limb-major."""
    k = cols.shape[0]
    n = n_out + 1
    if k < n:
        cols = jnp.concatenate(
            [cols, jnp.zeros((n - k,) + cols.shape[1:], jnp.uint32)], axis=0)
    elif k > n:
        cols = cols[:n]
    for _ in range(2):
        cols = (cols & MASK) + _shift_down_rows(cols >> W, 1)
    parts, carry, start = [], None, 0
    while start < n:
        size = min(24, n - start)
        chunk = cols[start:start + size]
        if carry is not None:
            chunk = jnp.concatenate([chunk[:1] + carry, chunk[1:]], axis=0)
        part, carry = _resolve_chunk_lm(chunk)
        parts.append(part)
        start += size
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return out[:n_out], out[n_out:n_out + 1]


def _acc_rows(cols, x, off: int):
    """cols (n, T) += x placed at row offset `off` (x truncated to fit).

    Pure concatenate+add — `.at[slice].add` would lower to a scatter whose
    index constant Pallas rejects as a captured array."""
    n = cols.shape[0]
    x = x[: max(0, n - off)]
    if x.shape[0] == 0:
        return cols
    pieces = []
    if off:
        pieces.append(jnp.zeros((off,) + x.shape[1:], x.dtype))
    pieces.append(x)
    tail = n - off - x.shape[0]
    if tail:
        pieces.append(jnp.zeros((tail,) + x.shape[1:], x.dtype))
    return cols + (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                   else pieces[0])


def _prod_cols_lm(a, b, n_cols: int):
    """Raw product columns of limb-major operands.

    a: (L, T); b: (L, T) or (L, 1) (fixed multiplier broadcast).  Columns
    accumulate 2L 16-bit halves < 2^21.  Shifted full-block adds only."""
    cols = jnp.zeros((n_cols,) + a.shape[1:], jnp.uint32)
    bb = jnp.broadcast_to(b, (L,) + a.shape[1:]) if b.shape[1:] != a.shape[1:] else b
    for i in range(L):
        p = a[i:i + 1] * bb                          # (L, T), exact in u32
        cols = _acc_rows(cols, p & MASK, i)
        cols = _acc_rows(cols, p >> W, i + 1)
    return cols


def _sub_lm(F: Field, a, b_rows):
    """a - b (limb-major); b_rows (L, 1) fixed.  Returns (limbs, borrow)."""
    cols = a + (MASK - b_rows)
    cols = jnp.concatenate([cols[:1] + 1, cols[1:]], axis=0)
    limbs, carry = _canon_lm(cols, L)
    return limbs, 1 - carry


@functools.lru_cache(maxsize=None)
def _f_consts(field_name: str):
    F = FR if field_name == "fr" else None
    assert F is not None
    return (
        np.asarray(int_to_limbs(F.p, L), np.uint32)[:, None],
        np.asarray(int_to_limbs(F.nprime, L), np.uint32)[:, None],
    )


def _mul_lm(F: Field, p_rows, np_rows, a, b):
    """Montgomery product, limb-major: a (L, T) × b (L, T) or (L, 1)."""
    ab = _prod_cols_lm(a, b, 2 * L)
    t_lo, _ = _canon_lm(ab[:L], L)
    m_cols = _prod_cols_lm(t_lo, np_rows, L)
    m, _ = _canon_lm(m_cols, L)
    mp = _prod_cols_lm(m, p_rows, 2 * L)
    u, _ = _canon_lm(mp + ab, 2 * L)
    limbs = u[L:]
    d, borrow = _sub_lm(F, limbs, p_rows)
    return jnp.where(borrow == 0, d, limbs)


def _add_lm(F: Field, p_rows, a, b):
    s, carry = _canon_lm(a + b, L)
    d, borrow = _sub_lm(F, s, p_rows)
    take_d = (carry != 0) | (borrow == 0)
    return jnp.where(take_d, d, s)


# ---------------------------------------------------------------------------
# Fused Poseidon permutation kernel (t = 3)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _poseidon_tables(t: int):
    from ..ops.hash import _poseidon_consts_mont

    C, M, mask = _poseidon_consts_mont(t)              # (R, t, L), (t, t, L)
    # limb-major: (R, t, L) kept as-is (indexed per round); mask as int32
    return (np.asarray(C, np.uint32), np.asarray(M, np.uint32),
            np.asarray(mask, np.int32))


def _poseidon2_kernel(l_ref, r_ref, c_ref, m_ref, mask_ref, p_ref, np_ref,
                      out_ref):
    F = FR
    p_rows, np_rows = p_ref[...], np_ref[...]
    T = l_ref.shape[1]
    n_rounds = c_ref.shape[0]
    zero = jnp.zeros((L, T), jnp.uint32)
    mul = lambda a, b: _mul_lm(F, p_rows, np_rows, a, b)
    add = lambda a, b: _add_lm(F, p_rows, a, b)

    def pow5(x):
        x2 = mul(x, x)
        x4 = mul(x2, x2)
        return mul(x4, x)

    def round_body(r, s):
        s0, s1, s2 = s
        c = c_ref[r]                                   # (3, L)
        s0 = add(s0, c[0][:, None])
        s1 = add(s1, c[1][:, None])
        s2 = add(s2, c[2][:, None])
        full = mask_ref[r, 1] != 0                     # lanes 1.. sboxed?
        s0 = pow5(s0)
        s1p, s2p = pow5(s1), pow5(s2)
        s1 = jnp.where(full, s1p, s1)
        s2 = jnp.where(full, s2p, s2)
        # MDS: out_i = Σ_j M[i,j]·s_j
        out = []
        for i in range(3):
            acc = mul(s0, m_ref[i, 0][:, None])
            acc = add(acc, mul(s1, m_ref[i, 1][:, None]))
            acc = add(acc, mul(s2, m_ref[i, 2][:, None]))
            out.append(acc)
        return tuple(out)

    s = jax.lax.fori_loop(0, n_rounds,
                          lambda r, s: round_body(r, s),
                          (zero, l_ref[...], r_ref[...]))
    out_ref[...] = s[0]


def poseidon_hash2_pallas(left, right, block_t: int = 512):
    """Fused Poseidon(0, l, r) -> state[0] for 1-D batches.

    left/right: uint32[N, L] Montgomery, N a multiple of block_t (the
    caller pads).  One kernel runs all 65 rounds with the state resident
    in VMEM; the (N, L) <-> (L, N) transposes at the boundary are the only
    layout ops."""
    n = left.shape[0]
    assert n % block_t == 0, (n, block_t)
    C, M, mask = _poseidon_tables(3)
    lt = left.T                                        # (L, N)
    rt = right.T
    grid = (n // block_t,)
    out = pl.pallas_call(
        _poseidon2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(C.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(M.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mask.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=_interpret(),
    )(lt, rt, jnp.asarray(C), jnp.asarray(M), jnp.asarray(mask),
      *(jnp.asarray(v) for v in _f_consts("fr")))
    return out.T


# ---------------------------------------------------------------------------
# Fused MultiMiMC7 2-to-1 kernel (circomlib MiMC7, key 0)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mimc_tables():
    from ..ops.hash import _mimc_consts_mont

    return np.asarray(_mimc_consts_mont(), np.uint32)   # (91, L)


def _mimc_hash2_kernel(l_ref, r_ref, c_ref, p_ref, np_ref, out_ref):
    F = FR
    p_rows, np_rows = p_ref[...], np_ref[...]
    T = l_ref.shape[1]
    n_rounds = c_ref.shape[0]
    mul = lambda a, b: _mul_lm(F, p_rows, np_rows, a, b)
    add = lambda a, b: _add_lm(F, p_rows, a, b)

    def pow7(u):
        u2 = mul(u, u)
        u4 = mul(u2, u2)
        u6 = mul(u4, u2)
        return mul(u6, u)

    def mimc7(x, k):
        r = pow7(add(x, k))

        def body(i, r):
            return pow7(add(add(r, k), c_ref[i][:, None]))

        r = jax.lax.fori_loop(1, n_rounds, body, r)
        return add(r, k)

    acc = jnp.zeros((L, T), jnp.uint32)
    for x in (l_ref[...], r_ref[...]):
        acc = add(add(acc, x), mimc7(x, acc))
    out_ref[...] = acc


def mimc_hash2_pallas(left, right, block_t: int = 512):
    """Fused MultiMiMC7([l, r], key 0) for 1-D batches (reference semantics:
    circomlib MultiMiMC7; replaces the placeholder babyjubjub/mod.rs:202-204)."""
    n = left.shape[0]
    assert n % block_t == 0, (n, block_t)
    C = _mimc_tables()
    out = pl.pallas_call(
        _mimc_hash2_kernel,
        grid=(n // block_t,),
        in_specs=[
            pl.BlockSpec((L, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(C.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=_interpret(),
    )(left.T, right.T, jnp.asarray(C), *(jnp.asarray(v) for v in _f_consts("fr")))
    return out.T


# ---------------------------------------------------------------------------
# Generic Montgomery-mul kernel (Fr)
# ---------------------------------------------------------------------------

def _mul_kernel(a_ref, b_ref, p_ref, np_ref, out_ref):
    out_ref[...] = _mul_lm(FR, p_ref[...], np_ref[...], a_ref[...], b_ref[...])


def mont_mul_pallas(a, b, block_t: int = 1024):
    """Batched Fr Montgomery product via one fused kernel.

    a, b: uint32[N, L], N a multiple of block_t."""
    n = a.shape[0]
    assert n % block_t == 0, (n, block_t)
    out = pl.pallas_call(
        _mul_kernel,
        grid=(n // block_t,),
        in_specs=[
            pl.BlockSpec((L, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=_interpret(),
    )(a.T, b.T, *(jnp.asarray(v) for v in _f_consts("fr")))
    return out.T
