"""Batched BabyJubJub twisted-Edwards curve + EdDSA over BN254 Fr.

TPU-native re-design of the reference's curve core (reference:
src/blockchain/tx/owshen_airdrop/babyjubjub/mod.rs):

* Points live in projective coordinates (X : Y : Z) as Montgomery-domain
  limb arrays; the reference's projective add/double formulas (mod.rs:118-172,
  the standard "bbjlp" formulas) are *complete* for BabyJubJub (a is a QR,
  d is a non-QR in Fr), so we drop the reference's zero/equality branches and
  run one branchless path — batched across VPU lanes.
* Scalar multiplication is a 254-step lax.scan double-and-add (the
  reference's sequential hot loop, mod.rs:68-78, vectorized over the batch).
* EdDSA follows the reference exactly (mod.rs:202-236): challenge
  h = H(R.x, R.y, A.x, A.y, M), accept iff s·B == R + h·A, with H either the
  reference's placeholder product hash (for bit-exact parity) or Poseidon
  (the real protocol hash, BASELINE config 1/2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import FR
from ..ops.hash import poseidon

F = FR

A = 168700
D = 168696
BASE = (
    5299619240641551281634865583518297030282874472190772894086521144482721001553,
    16950150798460657717958625567821834550301663161624707787222815936182638968203,
)
ORDER = 21888242871839275222246405745257275088614511777268538073601725287587578984328
SUBORDER = ORDER // 8

_A_mont = F.const(A)
_D_mont = F.const(D)


def identity_like(x):
    zero = jnp.zeros_like(x)
    one = jnp.broadcast_to(jnp.asarray(F.one_mont), x.shape)
    return (zero, one, one)


def encode_points(pts):
    """[(x, y) ints] -> projective device arrays (Montgomery)."""
    xs = F.encode([p[0] for p in pts])
    ys = F.encode([p[1] for p in pts])
    zs = F.encode([1] * len(pts))
    return (xs, ys, zs)


def decode_points(p):
    """Projective -> [(x, y) ints]; identity decodes to (0, 1)."""
    x, y = to_affine(p)
    return list(zip(F.decode(x), F.decode(y)))


def add(p, q):
    """Complete projective twisted-Edwards addition (reference mod.rs:118-142,
    branchless)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    a = F.mul(Z1, Z2)
    b = F.sqr(a)
    c = F.mul(X1, X2)
    d = F.mul(Y1, Y2)
    e = F.mul_const(F.mul(c, d), D)
    f = F.sub(b, e)
    g = F.add(b, e)
    x_part = F.sub(F.mul(F.add(X1, Y1), F.add(X2, Y2)), F.add(c, d))
    X3 = F.mul(F.mul(a, f), x_part)
    Y3 = F.mul(F.mul(a, g), F.sub(d, F.mul_const(c, A)))
    Z3 = F.mul(f, g)
    return (X3, Y3, Z3)


def double(p):
    """Projective doubling (reference mod.rs:152-163), valid for all inputs
    including identity."""
    X1, Y1, Z1 = p
    b = F.sqr(F.add(X1, Y1))
    c = F.sqr(X1)
    d = F.sqr(Y1)
    e = F.mul_const(c, A)
    f = F.add(e, d)
    h = F.sqr(Z1)
    j = F.sub(f, F.add(h, h))
    X3 = F.mul(F.sub(F.sub(b, c), d), j)
    Y3 = F.mul(f, F.sub(e, d))
    Z3 = F.mul(f, j)
    return (X3, Y3, Z3)


def select(cond, p, q):
    return tuple(F.select(cond, a, b) for a, b in zip(p, q))


class _JubOps:
    """Ops-object adapter (same protocol as curves.weierstrass ops) so the
    generic batched machinery (FixedBase, ops.msm.sum_scan) drives the
    Edwards curve too."""

    @staticmethod
    def add(p, q):
        return add(p, q)

    @staticmethod
    def double(p):
        return double(p)

    @staticmethod
    def select(cond, p, q):
        return select(cond, p, q)

    @staticmethod
    def identity_like(x):
        return identity_like(x)


JUB_OPS = _JubOps()


class _JubOracle:
    """Host affine oracle adapter with identity=None (FixedBase's table
    builder contract)."""

    @staticmethod
    def add(p, q):
        from ..oracle.curve import jub_add

        if p is None:
            return q
        if q is None:
            return p
        return jub_add(p, q)


def jub_encode(pts):
    """[(x, y) ints | None] -> projective device arrays (None = identity)."""
    xs = F.encode([0 if p is None else p[0] for p in pts])
    ys = F.encode([1 if p is None else p[1] for p in pts])
    zs = F.encode([1] * len(pts))
    return (xs, ys, zs)


def scalar_mul(p, bits):
    """bits: uint32[n_bits, ...] MSB-first (the reference iterates
    to_le_bits().rev(), mod.rs:71)."""
    acc = identity_like(p[0])

    def body(acc, bit):
        acc = double(acc)
        acc = select(bit != 0, add(acc, p), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc, bits)
    return acc


def scalar_mul_int(p, scalars_canonical):
    """scalars: canonical (non-Montgomery) limb array uint32[..., L]."""
    bits = F.to_bits_le(scalars_canonical, 254)  # (..., 254)
    bits = jnp.moveaxis(bits, -1, 0)[::-1]  # MSB-first, leading axis
    return scalar_mul(p, bits)


def to_affine(p):
    X, Y, Z = p
    zinv = F.inv(Z)
    return (F.mul(X, zinv), F.mul(Y, zinv))


def eq(p, q):
    """Projective equality via cross-multiplication."""
    x_eq = F.eq(F.mul(p[0], q[2]), F.mul(q[0], p[2]))
    y_eq = F.eq(F.mul(p[1], q[2]), F.mul(q[1], p[2]))
    return x_eq & y_eq


def on_curve_affine(x, y):
    """a·x² + y² == 1 + d·x²·y² (reference mod.rs:47-49)."""
    x2, y2 = F.sqr(x), F.sqr(y)
    lhs = F.add(F.mul_const(x2, A), y2)
    one = jnp.broadcast_to(jnp.asarray(F.one_mont), x.shape)
    rhs = F.add(one, F.mul_const(F.mul(x2, y2), D))
    return F.eq(lhs, rhs)


def compress(x_aff, y_aff):
    """(x, sign) with sign = y.is_odd() (reference mod.rs:82-84).  Returns
    (x canonical limbs, odd bool)."""
    y_plain = F.from_mont(y_aff)
    return F.from_mont(x_aff), F.is_odd(y_plain)


def decompress(x_plain, odd):
    """Recover y from x and parity (reference mod.rs:88-98).  Returns
    (x_mont, y_mont, ok)."""
    x = F.to_mont(x_plain)
    x2 = F.sqr(x)
    one = jnp.broadcast_to(jnp.asarray(F.one_mont), x.shape)
    num = F.sub(one, F.mul_const(x2, A))
    den = F.sub(one, F.mul_const(x2, D))
    y2 = F.mul(num, F.inv(den))
    y, ok = F.sqrt(y2)
    y_parity = F.is_odd(F.from_mont(y))
    y = F.select(y_parity == odd, y, F.neg(y))
    return x, y, ok


# ---------------------------------------------------------------------------
# EdDSA (reference mod.rs:194-236)
# ---------------------------------------------------------------------------

def placeholder_hash(elems):
    """The reference's stand-in challenge hash: product of inputs
    (mod.rs:202-204).  Kept for bit-exact parity tests only."""
    acc = elems[0]
    for e in elems[1:]:
        acc = F.mul(acc, e)
    return acc


def poseidon_hash5(elems):
    """Real challenge hash for the protocol: Poseidon over 5 inputs."""
    return poseidon(list(elems))


import functools


@functools.lru_cache(maxsize=None)
def _sign_device_jit(hash_mode: str):
    """Device half of batched EdDSA sign: r = H(rand, M); R = r·B (windowed
    fixed-base); h = H(R.x, R.y, A.x, A.y, M) with A = a·B.  Everything is
    batched fixed-base multi-exp + fused Poseidon; only the ORDER-modular
    fold s = r + h·a stays on host (the reference reduces s through BigUint
    for the same reason, mod.rs:228-233 — ORDER ≠ p, and the TPU field
    stack is mod-p)."""
    from .fixed_base import jub_fixed_base

    h_fn = poseidon_hash5 if hash_mode == "poseidon" else placeholder_hash

    def f(rand_m, msg_m, a_can):
        r = h_fn([rand_m, msg_m])
        r_can = F.from_mont(r)
        fb = jub_fixed_base()
        Rx, Ry = to_affine(fb.mul(r_can))
        Ax, Ay = to_affine(fb.mul(a_can))
        h = h_fn([Rx, Ry, Ax, Ay, msg_m])
        return (F.from_mont(Rx), F.from_mont(Ry), r_can, F.from_mont(h))

    return jax.jit(f)


def eddsa_sign_batch(priv, randomness, messages, hash_mode="poseidon"):
    """Batched EdDSA sign with the reference's exact semantics
    (mod.rs:210-236): returns [(R=(x, y), s)] per input.

    priv/randomness/messages: equal-length lists of host ints (priv < 2^254,
    as all reduced scalars are).  The sequencer voucher path signs batches
    through this instead of one-at-a-time host signing (the r·B and a·B
    fixed-base muls and both Poseidon challenge hashes are TPU-shaped work
    the framework already has kernels for)."""
    from ..fields.field import array_to_ints, ints_to_array

    assert len(priv) == len(randomness) == len(messages)
    p = F.p
    rand_m = jnp.asarray(F.encode([x % p for x in randomness]))
    msg_m = jnp.asarray(F.encode([m % p for m in messages]))
    a_can = jnp.asarray(ints_to_array(list(priv)))
    Rx, Ry, r_can, h_can = _sign_device_jit(hash_mode)(rand_m, msg_m, a_can)
    rx = F.decode(Rx, mont=False)
    ry = F.decode(Ry, mont=False)
    rs = array_to_ints(np.asarray(r_can))
    hs = array_to_ints(np.asarray(h_can))
    return [((x, y), (r + h * a) % ORDER)
            for x, y, r, h, a in zip(rx, ry, rs, hs, priv)]


def eddsa_verify(pk_affine, msg, sig_r_affine, sig_s_canonical, hash_mode="poseidon"):
    """Batched verify: s·B == R + H(R, A, M)·A (reference mod.rs:99-115).

    pk_affine/sig_r_affine: (x, y) Montgomery arrays; msg: Montgomery array;
    sig_s_canonical: canonical limb scalars.  Returns bool[...]."""
    ax, ay = pk_affine
    rx, ry = sig_r_affine
    h_fn = poseidon_hash5 if hash_mode == "poseidon" else placeholder_hash
    h = h_fn([rx, ry, ax, ay, msg])  # Montgomery Fr element
    h_canonical = F.from_mont(h)

    on_curve = on_curve_affine(ax, ay) & on_curve_affine(rx, ry)

    pk_proj = (ax, ay, jnp.broadcast_to(jnp.asarray(F.one_mont), ax.shape))
    r_proj = (rx, ry, jnp.broadcast_to(jnp.asarray(F.one_mont), rx.shape))

    # s·B: fixed-base windowed tables (31 batched adds, not a 254-step scan)
    from .fixed_base import jub_fixed_base

    sb = jub_fixed_base().mul(jnp.atleast_2d(sig_s_canonical))
    sb = tuple(a.reshape(ax.shape) for a in sb)
    # h·A: variable base — stays double-and-add, batched over lanes
    ha = scalar_mul_int(pk_proj, h_canonical)
    rhs = add(r_proj, ha)
    return eq(sb, rhs) & on_curve
