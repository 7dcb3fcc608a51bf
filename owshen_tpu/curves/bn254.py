"""BN254 (alt_bn128) G1/G2 instances: generators, device curve ops, host
conversions.

G1: y² = x³ + 3 over Fq;  G2: y² = x³ + 3/(9+u) over Fq2 (sextic twist).
Scalar field is Fr (the reference's `Fp`, babyjubjub/mod.rs:8).  These are
the commitment groups for Groth16 (SURVEY.md §7.2 layers 3/6/7)."""

from __future__ import annotations

import numpy as np

from ..fields.field import FQ, FR, int_to_limbs
from ..fields.fq2 import FQ2
from .weierstrass import Weierstrass

Q = FQ.p
R = FR.p

# BN parameter x: q = 36x⁴+36x³+24x²+6x+1, r = 36x⁴+36x³+18x²+6x+1
BN_X = 4965661367192848881
assert 36 * BN_X**4 + 36 * BN_X**3 + 24 * BN_X**2 + 6 * BN_X + 1 == Q
assert 36 * BN_X**4 + 36 * BN_X**3 + 18 * BN_X**2 + 6 * BN_X + 1 == R

B_G1 = 3
# ξ = 9 + u is the Fq2 sextic-twist non-residue; b' = 3/ξ
XI = (9, 1)


def _fq2_inv(a):
    c0, c1 = a
    norm_inv = pow((c0 * c0 + c1 * c1) % Q, -1, Q)
    return (c0 * norm_inv % Q, (-c1) * norm_inv % Q)


def _fq2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)


B_G2 = _fq2_mul((B_G1, 0), _fq2_inv(XI))  # 3/(9+u)

# Standard generators.
G1_GEN = (1, 2)
G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def _check_generators():
    # G1 on curve
    x, y = G1_GEN
    assert (y * y - (x * x * x + B_G1)) % Q == 0
    # G2 on curve: y² = x³ + b'
    x2, y2 = G2_GEN
    lhs = _fq2_mul(y2, y2)
    x3 = _fq2_mul(_fq2_mul(x2, x2), x2)
    rhs = ((x3[0] + B_G2[0]) % Q, (x3[1] + B_G2[1]) % Q)
    assert lhs == rhs, "G2 generator not on twist curve"


_check_generators()

# device curve instances (b3 passed as plain ints: multiplications by it
# ride the banded fixed-multiplier path)
G1 = Weierstrass(FQ, 3 * B_G1)
G2 = Weierstrass(FQ2, ((3 * B_G2[0]) % Q, (3 * B_G2[1]) % Q))


# ---------- host <-> device point conversion ----------

def g1_encode(points):
    """[(x, y) ints or None for identity] -> projective (X, Y, Z) arrays."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return (FQ.encode(xs), FQ.encode(ys), FQ.encode(zs))


def g1_decode(p):
    """Projective device point(s) -> [(x, y) ints or None]."""
    xs, ys = G1.to_affine_jit(p)
    zs_zero = np.asarray(G1.is_identity(p)).reshape(-1)
    xi, yi = FQ.decode(xs), FQ.decode(ys)
    return [None if z else (x, y) for x, y, z in zip(xi, yi, zs_zero)]


def g1_decode_host(p):
    """Single projective device point -> (x, y) ints or None, with the
    Z-inversion done on host (`pow(z, -1, q)` is microseconds in Python vs
    a 254-step exponentiation chain of tiny device ops through the tunnel —
    the prover's three proof-element decodes use this)."""
    leaves = tuple(a[None] if a.ndim == 1 else a for a in p)
    x = FQ.decode(leaves[0])[0]
    y = FQ.decode(leaves[1])[0]
    z = FQ.decode(leaves[2])[0]
    if z == 0:
        return None
    zi = pow(z, -1, Q)
    return (x * zi % Q, y * zi % Q)


def g2_decode_host(p):
    """Single projective G2 device point -> ((x0,x1), (y0,y1)) or None."""
    leaves = tuple(a[None] if a.ndim == 2 else a for a in p)
    x = FQ2.decode(leaves[0])[0]
    y = FQ2.decode(leaves[1])[0]
    z = FQ2.decode(leaves[2])[0]
    if z == (0, 0):
        return None
    zi = _fq2_inv(z)
    return (_fq2_mul(x, zi), _fq2_mul(y, zi))


def g2_encode(points):
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append((0, 0)), ys.append((1, 0)), zs.append((0, 0))
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append((1, 0))
    return (FQ2.encode(xs), FQ2.encode(ys), FQ2.encode(zs))


def g2_decode(p):
    xs, ys = G2.to_affine_jit(p)
    zs_zero = np.asarray(G2.is_identity(p)).reshape(-1)
    xi, yi = FQ2.decode(xs), FQ2.decode(ys)
    return [None if z else (x, y) for x, y, z in zip(xi, yi, zs_zero)]
