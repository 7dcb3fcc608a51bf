"""Batched prime-field arithmetic over multi-limb integers for TPU.

Design (TPU-first, not a port):
  * A field element is a little-endian array of L=16 limbs, W=16 bits each,
    stored as ``uint32[..., L]``.  16-bit limbs make every partial product
    ``a_i * b_j < 2**32`` exactly representable in uint32 — no add-with-carry
    instruction is needed, which is the key constraint of the TPU's 32-bit
    vector ISA (see SURVEY.md §7.4).
  * Multiplication is schoolbook convolution (outer product + anti-diagonal
    sums, each column < 2**21 so lazy carries fit) followed by a 16-iteration
    Montgomery reduction (R = 2**256).  Everything is branchless and batched
    over arbitrary leading axes, so XLA vectorizes the batch across VPU lanes.
  * Exponentiation (inverse, sqrt) runs as a ``lax.scan`` over a static bit
    array so the HLO stays compact.

Semantics match the reference's `ff`-derived field exactly: little-endian
byte/limb order, plain modular arithmetic (reference:
src/blockchain/tx/owshen_airdrop/babyjubjub/mod.rs:7-11).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

W = 16  # bits per limb
MASK = (1 << W) - 1

# BN254 scalar field (Fr) modulus — the reference's `Fp`
# (babyjubjub/mod.rs:8).  Also the base field of BabyJubJub.
P_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# BN254 base field (Fq) modulus — coordinate field of G1; needed for
# Groth16 commitments (net-new vs the reference snapshot, see SURVEY.md §0).
P_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def int_to_limbs(x: int, L: int = 16) -> np.ndarray:
    """Little-endian W-bit limb decomposition of a Python int."""
    out = np.zeros(L, dtype=np.uint32)
    for i in range(L):
        out[i] = (x >> (W * i)) & MASK
    return out


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.uint64)
    return sum(int(v) << (W * i) for i, v in enumerate(limbs.reshape(-1)))


def ints_to_array(xs: Sequence[int], L: int = 16) -> np.ndarray:
    """[ints] -> uint32[len(xs), L]."""
    return np.stack([int_to_limbs(int(x), L) for x in xs]).astype(np.uint32)


def array_to_ints(a) -> list[int]:
    a = np.asarray(jax.device_get(a))
    flat = a.reshape(-1, a.shape[-1])
    return [limbs_to_int(row) for row in flat]


def _shift_up(x, d: int):
    """Move x[..., i] to position i+d along the last axis (zero-fill low,
    drop high).  Static d, so XLA sees a pad+slice — no gather."""
    pad = jnp.zeros(x.shape[:-1] + (d,), x.dtype)
    return jnp.concatenate([pad, x[..., :-d]], axis=-1)


def _resolve_chunk(cols):
    """Exact carry resolution of a chunk of <= 30 columns, each <= 2**W + 1.

    The 0/1 residual ripple after the fold rounds is a carry-lookahead
    recurrence c_{i+1} = g_i | (p_i & c_i) with disjoint generate/propagate
    bits (a column of 2**W has residue 0, so it can't also propagate).
    Packing g/p into per-element uint32 bitfields turns the whole chain
    into THREE scalar ops: cin = (P + 2G) ^ P — the SWAR carry trick,
    brute-force-verified over all disjoint g/p patterns.  Returns
    (limbs < 2**W, carry_out in {0,1})."""
    n = cols.shape[-1]
    assert n <= 30
    v = cols & MASK
    g = cols >> W                                   # 0/1
    p = (v == MASK).astype(jnp.uint32)
    w = jnp.asarray(np.uint32(1) << np.arange(n, dtype=np.uint32))
    G = jnp.sum(g * w, axis=-1)
    P = jnp.sum(p * w, axis=-1)
    cin = (P + (G << 1)) ^ P                        # bit i = carry into limb i
    shifts = jnp.asarray(np.arange(n, dtype=np.uint32))
    cin_limbs = (cin[..., None] >> shifts) & 1
    return (v + cin_limbs) & MASK, (cin >> n) & 1


def _carry_canon(cols, n_out):
    """Propagate carries over accumulated columns (< 2**31 each).

    TPU-first: instead of a word-serial ripple (a 16/32-step lax.scan was
    round 1's compile/runtime pathology), this is a *flat* unrolled
    sequence of ~20 elementwise vector ops:

      1. two fold rounds ``v & MASK  +  (v >> W) shifted up`` — after the
         second round every column is <= 2**W, with only a 0/1 residual
         ripple left;
      2. SWAR carry-lookahead per <=24-limb chunk (see _resolve_chunk),
         chunks chained through their carry bit.

    No scan, no log-depth loop, fully fusable.  Precondition: the true
    value must fit in n_out+1 limbs (carry_out <= 1) — true for every call
    site (sums of two 256-bit values; products that fit 2L).  Returns
    (limbs uint32[..., n_out] each < 2**W, carry_out uint32[...])."""
    k = cols.shape[-1]
    n = n_out + 1  # one extra limb catches the carry out
    if k < n:
        pad = jnp.zeros(cols.shape[:-1] + (n - k,), jnp.uint32)
        cols = jnp.concatenate([cols, pad], axis=-1)
    elif k > n:
        cols = cols[..., :n]
    # fold rounds: cols < 2**31 -> (<= 2**16 + 2**15) -> (<= 2**16)
    for _ in range(2):
        cols = (cols & MASK) + _shift_up(cols >> W, 1)
    parts = []
    carry = None
    start = 0
    while start < n:
        size = min(24, n - start)
        chunk = cols[..., start:start + size]
        if carry is not None:
            chunk = chunk.at[..., 0].add(carry)
        part, carry = _resolve_chunk(chunk)
        parts.append(part)
        start += size
    out = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    return out[..., :n_out], out[..., n_out]


def _antidiag_sums(m):
    """Anti-diagonal column sums of m: uint32[..., L, L] ->
    uint32[..., 2L-1] with out[k] = Σ_{i+j=k} m[i, j].

    Skew-by-reshape: pad each row to width 2L, flatten, truncate L
    elements, re-view with width 2L-1 — row i is now shifted right by i,
    so one sum over the row axis yields all anti-diagonals.  Pure
    pad/reshape/reduce: no matmul, no gather, optimal adds."""
    L = m.shape[-1]
    pad = jnp.zeros(m.shape[:-1] + (L,), m.dtype)
    flat = jnp.concatenate([m, pad], axis=-1).reshape(m.shape[:-2] + (2 * L * L,))
    skew = flat[..., : L * (2 * L - 1)].reshape(m.shape[:-2] + (L, 2 * L - 1))
    return skew.sum(axis=-2)


def _prod_cols(a, b, n_cols: int):
    """Column sums of the schoolbook product of W-bit limb arrays.

    a, b: uint32[..., L] with limbs < 2**W.  Each partial product fits
    uint32 exactly; each column sums ≤ 2L halves < 2**(W+6).  Returns
    uint32[..., n_cols]."""
    a, b = jnp.broadcast_arrays(a, b)
    L = a.shape[-1]
    outer = a[..., :, None] * b[..., None, :]            # (..., L, L)
    lo = _antidiag_sums(outer & MASK)                    # cols i+j
    hi = _antidiag_sums(outer >> W)                      # cols i+j+1
    ext = n_cols - (2 * L - 1)
    if ext > 0:
        zpad = jnp.zeros(lo.shape[:-1] + (ext,), jnp.uint32)
        lo = jnp.concatenate([lo, zpad], axis=-1)
    else:
        lo = lo[..., :n_cols]
    return lo.at[..., 1:].add(hi[..., : n_cols - 1])


@functools.lru_cache(maxsize=None)
def _band8(val: int, n_in8: int, n_cols8: int) -> np.ndarray:
    """Banded convolution matrix of a FIXED multiplier in 8-bit radix:
    BAND[j, k] = byte (k-j) of val, so x8 @ BAND = product columns of
    x · val in 8-bit radix.  Partial products are 8×8-bit and column sums
    have <= n_in8 terms, so everything fits uint32 with room to spare —
    and the whole convolution is ONE dot op in the HLO (MXU/VPU-friendly),
    vs an outer product + diagonal reduction for variable×variable."""
    out = np.zeros((n_in8, n_cols8), np.uint32)
    for j in range(n_in8):
        for k in range(n_cols8):
            if 0 <= k - j < 64:
                out[j, k] = (val >> (8 * (k - j))) & 0xFF
    return out


def _to_bytes_limbs(x):
    """uint32[..., L] of 16-bit limbs -> uint32[..., 2L] of 8-bit limbs."""
    lohi = jnp.stack([x & 0xFF, x >> 8], axis=-1)        # (..., L, 2)
    return lohi.reshape(x.shape[:-1] + (2 * x.shape[-1],))


def _fixed_mul_cols(x, val: int, n_cols16: int):
    """16-bit-radix product columns of (canonical-limb x) · (fixed val).

    x: uint32[..., L]; returns uint32[..., n_cols16] with column sums
    < 2**30 (valid _carry_canon input)."""
    L = x.shape[-1]
    x8 = _to_bytes_limbs(x)
    band = jnp.asarray(_band8(val, 2 * L, 2 * n_cols16))
    cols8 = x8 @ band                                    # (..., 2·n_cols16)
    even = cols8[..., 0::2]
    odd = cols8[..., 1::2]
    return even + (odd << 8)


class Field:
    """A prime field instance with batched jnp ops (Montgomery domain).

    All binary ops take/return uint32[..., L] arrays.  Unless noted, values
    are in Montgomery form (x*R mod p); `to_mont`/`from_mont` convert.
    """

    def __init__(self, name: str, p: int, L: int = 16):
        assert p < (1 << (W * L))
        self.name = name
        self.p = p
        self.L = L
        self.R = (1 << (W * L)) % p
        self.R2 = (self.R * self.R) % p
        self.n0 = (-pow(p, -1, 1 << W)) % (1 << W)
        # full-width N' = -p^{-1} mod R for one-shot Montgomery reduction
        self.nprime = (-pow(p, -1, 1 << (W * L))) % (1 << (W * L))
        self.nprime_limbs = int_to_limbs(self.nprime, L)
        self.p_limbs = int_to_limbs(p, L)
        self.zero = np.zeros(L, np.uint32)
        self.one_mont = int_to_limbs(self.R, L)
        self.two_adicity = (p - 1 & -(p - 1)).bit_length() - 1
        # generator 7 matches the reference (babyjubjub/mod.rs:9); fall back
        # to a search if 7 is not a generator of this field.
        self.generator = self._find_generator()
        self._inv_bits = _exp_bits(p - 2)

    def _find_generator(self) -> int:
        # factorization-free check: enough for our two moduli where
        # (p-1)/2^s is prime times small factors; verify via p-1 order tests
        for g in (7, 5, 3, 2, 6, 10, 11, 13):
            if pow(g, (self.p - 1) // 2, self.p) == self.p - 1:
                return g
        raise ValueError("no generator found")

    # ---------- host-side conversions ----------

    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * pow(self.R, -1, self.p)) % self.p

    def encode(self, xs, mont: bool = True) -> np.ndarray:
        """Python ints -> device limb array (Montgomery form by default)."""
        if isinstance(xs, int):
            xs = [xs]
        xs = [self.to_mont_int(x % self.p) if mont else x % self.p for x in xs]
        return ints_to_array(xs, self.L)

    def decode(self, a, mont: bool = True) -> list[int]:
        vals = array_to_ints(a)
        if mont:
            vals = [self.from_mont_int(v) for v in vals]
        return vals

    def const(self, x: int, mont: bool = True) -> np.ndarray:
        """Single constant as uint32[L] (host numpy; safe to close over)."""
        v = self.to_mont_int(x % self.p) if mont else x % self.p
        return int_to_limbs(v, self.L)

    def encode_const(self, c: int) -> np.ndarray:
        """Fixed constant -> host limb array (Montgomery); the Fq2-parallel
        spelling so curve code stays field-polymorphic."""
        return self.const(c)

    # ---------- batched device ops ----------

    def add(self, a, b):
        s, carry = self._add_limbs(a, b)
        return self._cond_sub_p(s, carry)

    def sub(self, a, b):
        d, borrow = self._sub_limbs(a, b)
        d_plus, _ = self._add_limbs(d, jnp.asarray(self.p_limbs))
        return jnp.where((borrow != 0)[..., None], d_plus, d)

    def neg(self, a):
        # p - a, with 0 -> 0 (sub handles the wraparound branchlessly)
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def _add_limbs(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        cols = a.astype(jnp.uint32) + b.astype(jnp.uint32)
        return _carry_canon(cols, self.L)

    def _sub_limbs(self, a, b):
        """a - b limbwise; returns (limbs mod 2^(W·L), borrow_out).

        Complement-add: a + (2^(W·L) - 1 - b) + 1 = a - b + 2^(W·L), so the
        canonicalizer's carry_out is 1 exactly when a >= b — one flat
        carry-resolve instead of a borrow ripple."""
        a, b = jnp.broadcast_arrays(a, b)
        cols = a + (MASK - b)
        cols = cols.at[..., 0].add(1)
        limbs, carry = _carry_canon(cols, self.L)
        return limbs, (1 - carry).astype(jnp.uint32)

    def _cond_sub_p(self, s, carry):
        d, borrow = self._sub_limbs(s, jnp.asarray(self.p_limbs))
        take_d = (carry != 0) | (borrow == 0)
        return jnp.where(take_d[..., None], d, s)

    def _wide_mul(self, a, b):
        """Full 2L-limb product columns, carry-propagated to canonical 16-bit
        limbs: returns uint32[..., 2L]."""
        cols = _prod_cols(a, b, 2 * self.L)
        limbs, _ = _carry_canon(cols, 2 * self.L)
        return limbs

    def _redc_from_cols(self, ab_cols):
        """Montgomery-reduce raw 2L product columns (each < 2**30 - 2**22).

        m = (t mod R)·N′ mod R;  u = t + m·p  (≡ 0 mod R);  result = u/R,
        then one conditional subtract (u/R < 2p).  Unlike word-serial CIOS
        there is no 16-deep dependency chain, and both fixed-multiplier
        products (·N′, ·p) are single banded dots — what the TPU wants and
        what keeps XLA trace/compile size sane."""
        L = self.L
        t_lo, _ = _carry_canon(ab_cols[..., :L], L)
        m_cols = _fixed_mul_cols(t_lo, self.nprime, L)   # mod R: carry dropped
        m, _ = _carry_canon(m_cols, L)
        mp_cols = _fixed_mul_cols(m, self.p, 2 * L)
        u, _ = _carry_canon(mp_cols + ab_cols, 2 * L)
        limbs = u[..., L:]
        d, borrow = self._sub_limbs(limbs, jnp.asarray(self.p_limbs))
        return jnp.where((borrow == 0)[..., None], d, limbs)

    def mont_reduce(self, t):
        """One-shot Montgomery reduction of a 2L-limb value t < R·p
        (canonical 16-bit limbs): returns (t·R⁻¹ mod p) as L limbs."""
        return self._redc_from_cols(t.astype(jnp.uint32))

    def mul(self, a, b):
        """Montgomery product (the hottest op in the framework — everything
        above is compositions of this)."""
        ab_cols = _prod_cols(a, b, 2 * self.L)
        return self._redc_from_cols(ab_cols)

    def mul_const(self, a, c: int):
        """Montgomery product with a FIXED plain-integer constant c: the
        variable×variable outer product is replaced by one banded dot on
        the Montgomery form of c (curve constants a/d/3b ride this)."""
        c_mont = self.to_mont_int(c % self.p)
        ab_cols = _fixed_mul_cols(a, c_mont, 2 * self.L)
        return self._redc_from_cols(ab_cols)

    def sqr(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, jnp.asarray(int_to_limbs(self.R2, self.L)))

    def from_mont(self, a):
        pad = jnp.zeros(a.shape[:-1] + (self.L,), jnp.uint32)
        return self.mont_reduce(jnp.concatenate([a, pad], axis=-1))

    # ---------- predicates / selection ----------

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, cond, a, b):
        """cond ? a : b  (cond boolean [...], broadcast over limb axis)."""
        return jnp.where(cond[..., None], a, b)

    def zeros_like(self, a):
        """Field zero with a's shape (zero is zero in Montgomery form too)."""
        return jnp.zeros_like(a)

    def one_like(self, a):
        """Montgomery one (R mod p) broadcast to a's shape."""
        return jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)

    # ---------- exponentiation ----------

    def pow_const(self, x, exp: int):
        """x ** exp for a static Python-int exponent, via lax.scan (compact HLO)."""
        bits = _exp_bits(exp)
        if bits.size == 0:
            return jnp.broadcast_to(jnp.asarray(self.one_mont), x.shape)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), x.shape)

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(bit != 0, self.mul(acc, x), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, one, jnp.asarray(bits, jnp.uint32))
        return acc

    def inv(self, x):
        """Batched inverse via Fermat (x^(p-2)); inv(0) = 0."""
        return self.pow_const(x, self.p - 2)

    def batch_inv(self, x):
        """Montgomery batch inversion along the leading axis: one pow + 3(n-1)
        muls. Zeros map to zeros. x: uint32[N, ..., L]."""
        n = x.shape[0]
        one = jnp.asarray(self.one_mont)
        zmask = self.is_zero(x)
        x_safe = self.select(zmask, jnp.broadcast_to(one, x.shape), x)

        def fwd(carry, xi):
            nxt = self.mul(carry, xi)
            return nxt, carry  # prefix products (exclusive)

        total, prefix = jax.lax.scan(fwd, jnp.broadcast_to(one, x.shape[1:]), x_safe)
        inv_total = self.inv(total)

        def bwd(carry, inp):
            xi, pref = inp
            invi = self.mul(carry, pref)
            carry = self.mul(carry, xi)
            return carry, invi

        _, invs = jax.lax.scan(bwd, inv_total, (x_safe, prefix), reverse=True)
        return self.select(zmask, jnp.zeros_like(x), invs)

    def sqrt(self, x):
        """Batched Tonelli–Shanks square root (branchless, fixed s iterations).

        Returns (root, ok) where ok[...] indicates x was a QR. Root choice is
        unspecified (caller canonicalizes by parity, as the reference does in
        decompress, babyjubjub/mod.rs:88-98)."""
        p, s = self.p, self.two_adicity
        q = (p - 1) >> s
        z = pow(self.generator, q, p)  # 2^s-th primitive root
        c0 = jnp.asarray(self.const(z))
        t = self.pow_const(x, q)
        r = self.pow_const(x, (q + 1) // 2)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), x.shape)
        c = jnp.broadcast_to(c0, x.shape)

        def body(carry, i):
            r, t, c = carry
            # t^(2^(i-1)); dynamic trip count keeps the scanned HLO compact
            t_pow = jax.lax.fori_loop(0, i - 1, lambda _, v: self.sqr(v), t)
            flip = ~self.eq(t_pow, one)
            c2 = self.sqr(c)
            r = self.select(flip, self.mul(r, c), r)
            t = self.select(flip, self.mul(t, c2), t)
            return (r, t, c2), None

        (r, t, c), _ = jax.lax.scan(body, (r, t, c), jnp.arange(s - 1, 0, -1))
        ok = self.eq(self.mul(r, r), x) | self.is_zero(x)
        return r, ok

    # ---------- misc ----------

    def to_bits_le(self, a, n_bits: int | None = None):
        """Canonical (non-Montgomery) limbs -> uint32[..., n_bits] of 0/1."""
        n_bits = n_bits or (W * self.L)
        bits = []
        for i in range(n_bits):
            limb = a[..., i // W]
            bits.append((limb >> (i % W)) & 1)
        return jnp.stack(bits, axis=-1)

    def is_odd(self, a):
        """Parity of the canonical integer value. `a` must be non-Montgomery."""
        return (a[..., 0] & 1) == 1


def _exp_bits(exp: int) -> np.ndarray:
    """MSB-first bit array of a positive int."""
    if exp == 0:
        return np.zeros(0, np.uint32)
    nb = exp.bit_length()
    return np.array([(exp >> (nb - 1 - i)) & 1 for i in range(nb)], np.uint32)


@functools.lru_cache(maxsize=None)
def get_field(name: str) -> Field:
    if name == "fr":
        return Field("fr", P_FR)
    if name == "fq":
        return Field("fq", P_FQ)
    raise KeyError(name)


FR = get_field("fr")
FQ = get_field("fq")
