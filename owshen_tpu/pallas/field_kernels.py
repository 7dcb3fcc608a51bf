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
    """Limb-row i -> i+d (zero-fill top) along axis -2 (the limb axis;
    arbitrary leading batch dims)."""
    pad = jnp.zeros(x.shape[:-2] + (d,) + x.shape[-1:], x.dtype)
    return jnp.concatenate([pad, x[..., :-d, :]], axis=-2)


def _resolve_chunk_lm(cols):
    """SWAR carry resolution, limb-major: cols (n<=30, T) each <= 2^W+1.

    Weight/shift vectors are built with in-kernel iota (Pallas kernels may
    not close over host ndarrays)."""
    n = cols.shape[-2]
    v = cols & MASK
    g = cols >> W
    p = (v == MASK).astype(jnp.uint32)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    w = jnp.uint32(1) << iota
    # Mosaic lacks unsigned reductions; values < 2^31 so int32 is exact
    G = jnp.sum((g * w).astype(jnp.int32), axis=-2,
                keepdims=True).astype(jnp.uint32)    # (..., 1, T)
    P = jnp.sum((p * w).astype(jnp.int32), axis=-2,
                keepdims=True).astype(jnp.uint32)
    cin = (P + (G << 1)) ^ P
    cin_rows = (cin >> iota) & 1                     # (..., n, T)
    return (v + cin_rows) & MASK, (cin >> n) & 1


def _canon_lm(cols, n_out: int):
    """Carry-canonicalize (k, T) columns (< 2^31) to (n_out, T) limbs +
    (1, T) carry.  Same contract as field._carry_canon, limb-major."""
    k = cols.shape[-2]
    n = n_out + 1
    if k < n:
        zfill = jnp.zeros(cols.shape[:-2] + (n - k,) + cols.shape[-1:],
                          jnp.uint32)
        cols = jnp.concatenate([cols, zfill], axis=-2)
    elif k > n:
        cols = cols[..., :n, :]
    for _ in range(2):
        cols = (cols & MASK) + _shift_down_rows(cols >> W, 1)
    parts, carry, start = [], None, 0
    while start < n:
        size = min(24, n - start)
        chunk = cols[..., start:start + size, :]
        if carry is not None:
            chunk = jnp.concatenate(
                [chunk[..., :1, :] + carry, chunk[..., 1:, :]], axis=-2)
        part, carry = _resolve_chunk_lm(chunk)
        parts.append(part)
        start += size
    out = jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]
    return out[..., :n_out, :], out[..., n_out:n_out + 1, :]


def _acc_rows(cols, x, off: int):
    """cols (n, T) += x placed at row offset `off` (x truncated to fit).

    Pure concatenate+add — `.at[slice].add` would lower to a scatter whose
    index constant Pallas rejects as a captured array."""
    n = cols.shape[-2]
    x = x[..., : max(0, n - off), :]
    if x.shape[-2] == 0:
        return cols
    pieces = []
    if off:
        pieces.append(jnp.zeros(x.shape[:-2] + (off,) + x.shape[-1:], x.dtype))
    pieces.append(x)
    tail = n - off - x.shape[-2]
    if tail:
        pieces.append(jnp.zeros(x.shape[:-2] + (tail,) + x.shape[-1:], x.dtype))
    return cols + (jnp.concatenate(pieces, axis=-2) if len(pieces) > 1
                   else pieces[0])


def _prod_cols_lm(a, b, n_cols: int):
    """Raw product columns of limb-major operands.

    a: (L, T); b: (L, T) or (L, 1) (fixed multiplier broadcast).  Columns
    accumulate 2L 16-bit halves < 2^21.  Shifted full-block adds only."""
    cols = jnp.zeros(a.shape[:-2] + (n_cols,) + a.shape[-1:], jnp.uint32)
    bb = jnp.broadcast_to(b, a.shape) if b.shape != a.shape else b
    for i in range(L):
        p = a[..., i:i + 1, :] * bb                  # (..., L, T), exact u32
        cols = _acc_rows(cols, p & MASK, i)
        cols = _acc_rows(cols, p >> W, i + 1)
    return cols


def _sub_raw_lm(a, b):
    """a - b limbwise (limb-major, b any shape broadcastable to a):
    complement-add through the canonicalizer.  Returns (limbs, borrow)."""
    cols = a + (MASK - b)
    cols = jnp.concatenate(
        [cols[..., :1, :] + 1, cols[..., 1:, :]], axis=-2)
    limbs, carry = _canon_lm(cols, L)
    return limbs, 1 - carry


def _sub_lm(F: Field, a, b_rows):
    """a - b (limb-major).  Returns (limbs, borrow)."""
    return _sub_raw_lm(a, b_rows)


def _submod_lm(F: Field, p_rows, a, b):
    """Field subtraction a - b mod p (both < p), limb-major."""
    d, borrow = _sub_raw_lm(a, b)
    d_plus, _ = _canon_lm(d + p_rows, L)
    return jnp.where(borrow != 0, d_plus, d)


@functools.lru_cache(maxsize=None)
def _f_consts(field_name: str):
    from ..fields.field import get_field

    F = get_field(field_name)
    return (
        np.asarray(int_to_limbs(F.p, L), np.uint32)[:, None],
        np.asarray(int_to_limbs(F.nprime, L), np.uint32)[:, None],
    )


import os as _os

_MUL_KERNEL = _os.environ.get("OWSHEN_MUL_KERNEL", "pend")
if _MUL_KERNEL not in ("pend", "scratch", "cios", "school"):
    raise ValueError(
        f"OWSHEN_MUL_KERNEL={_MUL_KERNEL!r}: expected pend|scratch|cios|school")


def _mul_lm_school(F: Field, p_rows, np_rows, a, b):
    """Schoolbook Montgomery product (3 full products + 3 canons) — the
    round-2/3 kernel, kept selectable via OWSHEN_MUL_KERNEL=school."""
    ab = _prod_cols_lm(a, b, 2 * L)
    t_lo, _ = _canon_lm(ab[..., :L, :], L)
    m_cols = _prod_cols_lm(t_lo, np_rows, L)
    m, _ = _canon_lm(m_cols, L)
    mp = _prod_cols_lm(m, p_rows, 2 * L)
    u, _ = _canon_lm(mp + ab, 2 * L)
    limbs = u[..., L:, :]
    d, borrow = _sub_lm(F, limbs, p_rows)
    return jnp.where(borrow == 0, d, limbs)


def _mul_lm_cios(F: Field, p_rows, np_rows, a, b):
    """Lazy-carry CIOS Montgomery product, limb-major (round-4 default).

    One interleaved multiply-and-reduce pass over the L input limbs: per
    limb i the running accumulator t (L+1 u32 rows) takes a_i·b and
    m_i·p (m_i = t₀·n′ mod 2^16 — exact because t₀ is an exact lazy u32),
    then shifts down one limb, folding t₀'s high bits into t₁.  Row
    growth is bounded: each iteration adds < 2^18 per row and a row lives
    ≤ L iterations, so values stay < 2^22 — no per-iteration
    canonicalization.  ONE final canon + conditional subtract (result
    < 2p by the standard REDC bound).  vs the schoolbook form this cuts
    the 32-row shifted block adds (~2/3 of its elemops) to (L+1)-row
    adds and 3 canons to 1."""
    t = jnp.zeros(a.shape[:-2] + (L + 1,) + a.shape[-1:], jnp.uint32)
    np0 = np_rows[..., :1, :]

    def z1_like(x):
        return jnp.zeros(x.shape[:-2] + (1,) + x.shape[-1:], jnp.uint32)

    for i in range(L):
        pi = a[..., i:i + 1, :] * b                  # (L, T), exact u32
        z = z1_like(pi)
        t = (t + jnp.concatenate([pi & MASK, z], axis=-2)
             + jnp.concatenate([z, pi >> W], axis=-2))
        m = ((t[..., :1, :] & MASK) * np0) & MASK    # (1, T)
        q = m * p_rows                               # (L, T)
        zq = z1_like(q)
        t = (t + jnp.concatenate([q & MASK, zq], axis=-2)
             + jnp.concatenate([zq, q >> W], axis=-2))
        carry = t[..., :1, :] >> W                   # t0 ≡ 0 mod 2^16
        t = jnp.concatenate(
            [t[..., 1:2, :] + carry, t[..., 2:, :],
             jnp.zeros(t.shape[:-2] + (1,) + t.shape[-1:], jnp.uint32)],
            axis=-2)
    limbs, _ = _canon_lm(t, L)                       # value < 2p < 2^256
    d, borrow = _sub_lm(F, limbs, p_rows)
    return jnp.where(borrow == 0, d, limbs)


def _mul_lm_pend(F: Field, p_rows, np_rows, a, b):
    """Pending-carry CIOS, limb-major (round-5 default).

    Same recurrence as `_mul_lm_cios`, reorganized so EVERY tensor is
    exactly L=16 rows (two full 8-sublane tiles) and every add is aligned:
    the cios form's (L+1)-row accumulator pads to 24 sublanes on the VPU —
    a 1.5× tax on every op — and its hi-half placements need shifted
    concats.  Here the hi halves of a_i·b and m_i·p go into a separate
    L-row `pend` accumulator; because the main accumulator shifts down one
    limb at each iteration end anyway, `pend` (destined for rows i+1..i+L)
    lands ALIGNED at the start of the next iteration.  The row-0 carry
    folds inside the mandatory shift concat, so per iteration there is
    exactly ONE L-row concat and zero misaligned ops.  Bit-exact vs
    cios/school (tests/test_pallas.py gates all variants)."""
    t = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), jnp.uint32)
    pend = t
    np0 = np_rows[..., :1, :]
    for i in range(L):
        pi = a[..., i:i + 1, :] * b                  # (L, T), exact u32
        t = t + pend + (pi & MASK)
        m = ((t[..., :1, :] & MASK) * np0) & MASK    # (1, T)
        q = m * p_rows                               # (L, T), exact u32
        t = t + (q & MASK)
        pend = (pi >> W) + (q >> W)
        # shift down one limb; row 0 is ≡ 0 mod 2^16, fold its carry
        t = jnp.concatenate(
            [t[..., 1:2, :] + (t[..., :1, :] >> W), t[..., 2:, :],
             jnp.zeros_like(t[..., :1, :])], axis=-2)
    t = t + pend                                     # rows < 2^23, lazy
    limbs, _ = _canon_lm(t, L)                       # value < 2p < 2^256
    d, borrow = _sub_lm(F, limbs, p_rows)
    return jnp.where(borrow == 0, d, limbs)


def _mul_lm_scratch(F: Field, p_rows, np_rows, a, b, acc):
    """Lazy-carry CIOS against a VMEM scratch accumulator (round-5 default).

    Same recurrence as `_mul_lm_cios`, but the accumulator is a (2L, T)
    scratch REF at FIXED row offsets: instead of shifting the whole (L+1)-row
    value down one limb per iteration (a concat + full-block add in the SSA
    form — ~2/3 of the cios kernel's elemops, PERF.md "Kernel accounting"),
    iteration i adds its a_i·b / m_i·p halves in place at row offsets i and
    i+1 with sliced `ref[i:i+L] += x` stores.  Row i is finalized exactly
    (≡ 0 mod 2^16 after the m_i·p add) before its high bits are folded into
    row i+1, so rows < L contribute nothing and rows [L, 2L) hold the
    REDC quotient lazily carried (< 2^22 — see bound note in _mul_lm_cios).
    ONE final canon + conditional subtract, as before.  Bit-exact vs the
    cios/school forms (tests/test_pallas.py gates all three)."""
    T = a.shape[-1]
    acc[...] = jnp.zeros((2 * L, T), jnp.uint32)
    np0 = np_rows[:1, :]
    for i in range(L):
        pi = a[i:i + 1, :] * b                       # (L, T), exact u32
        acc[i:i + L, :] += pi & MASK
        acc[i + 1:i + L + 1, :] += pi >> W
        m = ((acc[i:i + 1, :] & MASK) * np0) & MASK  # (1, T)
        q = m * p_rows                               # (L, T), exact u32
        acc[i:i + L, :] += q & MASK
        acc[i + 1:i + L + 1, :] += q >> W
        # row i is now ≡ 0 mod 2^16; fold its high part forward
        acc[i + 1:i + 2, :] += acc[i:i + 1, :] >> W
    limbs, _ = _canon_lm(acc[L:2 * L, :], L)         # value < 2p < 2^256
    d, borrow = _sub_lm(F, limbs, p_rows)
    return jnp.where(borrow == 0, d, limbs)


def _mul_lm(F: Field, p_rows, np_rows, a, b, acc=None):
    """Montgomery product, limb-major: a (L, T) × b (L, T) or (L, 1).

    `acc`: optional (2L, T) VMEM scratch ref enabling the in-place kernel
    (the default; kernels allocate it via scratch_shapes).  Without a
    scratch ref the value-form cios/school kernels are used."""
    if _MUL_KERNEL == "pend":
        return _mul_lm_pend(F, p_rows, np_rows, a, b)
    if _MUL_KERNEL == "scratch" and acc is not None:
        return _mul_lm_scratch(F, p_rows, np_rows, a, b, acc)
    if _MUL_KERNEL == "school":
        return _mul_lm_school(F, p_rows, np_rows, a, b)
    return _mul_lm_cios(F, p_rows, np_rows, a, b)


def _mul_scratch_shape(block_t: int):
    """The scratch buffer every mul-bound kernel allocates: one (2L, T)
    u32 accumulator (128 KB at T=1024) reused across sequential muls."""
    return pltpu.VMEM((2 * L, block_t), jnp.uint32)


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
                      out_ref, acc_ref):
    F = FR
    p_rows, np_rows = p_ref[...], np_ref[...]
    T = l_ref.shape[1]
    n_rounds = c_ref.shape[0]
    zero = jnp.zeros((L, T), jnp.uint32)
    mul = lambda a, b: _mul_lm(F, p_rows, np_rows, a, b, acc_ref)
    add = lambda a, b: _add_lm(F, p_rows, a, b)

    def pow5(x):
        x2 = mul(x, x)
        x4 = mul(x2, x2)
        return mul(x4, x)

    def round_body(r, s, full):
        # `full` is STATIC: the round schedule is fixed (R_F/2 full, R_P
        # partial, R_F/2 full), so the 57 partial rounds compile with ONE
        # S-box instead of three masked ones — 12 muls/round vs 18, ~30%
        # of the permutation's mul work dropped vs the single masked loop.
        s0, s1, s2 = s
        c = c_ref[r]                                   # (3, L)
        s0 = add(s0, c[0][:, None])
        s1 = add(s1, c[1][:, None])
        s2 = add(s2, c[2][:, None])
        s0 = pow5(s0)
        if full:
            s1 = pow5(s1)
            s2 = pow5(s2)
        # MDS: out_i = Σ_j M[i,j]·s_j
        out = []
        for i in range(3):
            acc = mul(s0, m_ref[i, 0][:, None])
            acc = add(acc, mul(s1, m_ref[i, 1][:, None]))
            acc = add(acc, mul(s2, m_ref[i, 2][:, None]))
            out.append(acc)
        return tuple(out)

    from ..ops.hash import POSEIDON_RF, POSEIDON_RP

    half = POSEIDON_RF // 2
    r_p = POSEIDON_RP[1]                               # t=3 instantiation
    assert n_rounds == POSEIDON_RF + r_p
    s = (zero, l_ref[...], r_ref[...])
    s = jax.lax.fori_loop(0, half, lambda r, s: round_body(r, s, True), s)
    s = jax.lax.fori_loop(half, half + r_p,
                          lambda r, s: round_body(r, s, False), s)
    s = jax.lax.fori_loop(half + r_p, n_rounds,
                          lambda r, s: round_body(r, s, True), s)
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
        scratch_shapes=[_mul_scratch_shape(block_t)],
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


def _mimc_hash2_kernel(l_ref, r_ref, c_ref, p_ref, np_ref, out_ref, acc_ref):
    F = FR
    p_rows, np_rows = p_ref[...], np_ref[...]
    T = l_ref.shape[1]
    n_rounds = c_ref.shape[0]
    mul = lambda a, b: _mul_lm(F, p_rows, np_rows, a, b, acc_ref)
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
        scratch_shapes=[_mul_scratch_shape(block_t)],
        interpret=_interpret(),
    )(left.T, right.T, jnp.asarray(C), *(jnp.asarray(v) for v in _f_consts("fr")))
    return out.T


# ---------------------------------------------------------------------------
# Generic Montgomery-mul kernel (Fr)
# ---------------------------------------------------------------------------

def _mul_kernel(a_ref, b_ref, p_ref, np_ref, out_ref, acc_ref):
    out_ref[...] = _mul_lm(FR, p_ref[...], np_ref[...], a_ref[...], b_ref[...],
                           acc_ref)


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
        scratch_shapes=[_mul_scratch_shape(block_t)],
        interpret=_interpret(),
    )(a.T, b.T, *(jnp.asarray(v) for v in _f_consts("fr")))
    return out.T


# ---------------------------------------------------------------------------
# Fused complete G1 add / double kernels (short Weierstrass a=0 over Fq)
# ---------------------------------------------------------------------------

def _wadd_lm(mul, add, sub, mulc_b3, P1, P2):
    """RCB15 algorithm 7 (a=0), limb-major — mirrors
    curves/weierstrass.Weierstrass.add."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    t5 = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    three_t0 = add(add(t0, t0), t0)
    t2b = mulc_b3(t2)
    z3 = add(t1, t2b)
    t1b = sub(t1, t2b)
    y3 = mulc_b3(t5)
    X3 = sub(mul(t3, t1b), mul(t4, y3))
    Y3 = add(mul(y3, three_t0), mul(t1b, z3))
    Z3 = add(mul(z3, t4), mul(three_t0, t3))
    return X3, Y3, Z3


def _wdbl_lm(mul, add, sub, mulc_b3, P1):
    """RCB15 algorithm 9 (a=0), limb-major — mirrors Weierstrass.double."""
    X, Y, Z = P1
    t0 = mul(Y, Y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t1 = mul(Y, Z)
    t2 = mulc_b3(mul(Z, Z))
    X3 = mul(t2, z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = add(X3, mul(t0, Y3))
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return X3, Y3, Z3


def _field_ops(p_ref, np_ref, b3_ref, acc_ref=None):
    FQ_ = None  # field object only used for signatures
    p_rows, np_rows = p_ref[...], np_ref[...]
    b3 = b3_ref[...]
    mul = lambda a, b: _mul_lm(FQ_, p_rows, np_rows, a, b, acc_ref)
    add = lambda a, b: _add_lm(FQ_, p_rows, a, b)
    sub = lambda a, b: _submod_lm(FQ_, p_rows, a, b)
    mulc = lambda a: _mul_lm(FQ_, p_rows, np_rows, a, b3, acc_ref)
    return mul, add, sub, mulc


def _g1_add_kernel(x1, y1, z1, x2, y2, z2, p_ref, np_ref, b3_ref,
                   ox, oy, oz, acc_ref):
    mul, add, sub, mulc = _field_ops(p_ref, np_ref, b3_ref, acc_ref)
    X3, Y3, Z3 = _wadd_lm(mul, add, sub, mulc,
                          (x1[...], y1[...], z1[...]),
                          (x2[...], y2[...], z2[...]))
    ox[...], oy[...], oz[...] = X3, Y3, Z3


def _g1_dbl_kernel(x1, y1, z1, p_ref, np_ref, b3_ref, ox, oy, oz, acc_ref):
    mul, add, sub, mulc = _field_ops(p_ref, np_ref, b3_ref, acc_ref)
    X3, Y3, Z3 = _wdbl_lm(mul, add, sub, mulc, (x1[...], y1[...], z1[...]))
    ox[...], oy[...], oz[...] = X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def _g1_b3_rows():
    from ..fields.field import FQ

    return np.asarray(int_to_limbs(FQ.to_mont_int(9), L), np.uint32)[:, None]


def _flatten_pt(p):
    """(..., L) leaves -> list of ((N, L) 2-D views, original shape)."""
    shape = p[0].shape
    n = int(np.prod(shape[:-1]))
    return [leaf.reshape(n, L) for leaf in p], shape


def _pallas_ec(kernel, n_pts, n_in, block_t, *flat):
    """Shared pallas_call wrapper: transposed (L, N) blocks, 3 outputs."""
    spec = pl.BlockSpec((L, block_t), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pts // block_t,),
        in_specs=[spec] * n_in + [cspec] * 3,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, n_pts), jnp.uint32) for _ in range(3)),
        scratch_shapes=[_mul_scratch_shape(block_t)],
        interpret=_interpret(),
    )(*flat)
    return outs


def _ec_args():
    p_rows, np_rows = (jnp.asarray(v) for v in _f_consts("fq"))
    return p_rows, np_rows, jnp.asarray(_g1_b3_rows())


def g1_add_pallas(p, q, block_t: int = 512):
    """Complete G1 addition via one fused kernel (14 muls + 17 add/subs all
    resident in VMEM).  p, q: projective pytrees with uint32[..., L] leaves;
    batch shapes must match and flatten to a multiple of block_t (callers
    pad — ops/msm.py shapes are powers of two)."""
    (f1, shape) = _flatten_pt(p)
    (f2, _) = _flatten_pt(q)
    n = f1[0].shape[0]
    assert n % block_t == 0, (shape, block_t)
    flat = [leaf.T for leaf in (*f1, *f2)]
    outs = _pallas_ec(_g1_add_kernel, n, 6, block_t, *flat, *_ec_args())
    return tuple(o.T.reshape(shape) for o in outs)


def g1_double_pallas(p, block_t: int = 512):
    """Complete G1 doubling via one fused kernel."""
    (f1, shape) = _flatten_pt(p)
    n = f1[0].shape[0]
    assert n % block_t == 0, (shape, block_t)
    flat = [leaf.T for leaf in f1]
    outs = _pallas_ec(_g1_dbl_kernel, n, 3, block_t, *flat, *_ec_args())
    return tuple(o.T.reshape(shape) for o in outs)
