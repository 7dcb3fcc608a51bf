"""Host-side EdDSA sign/verify oracle with the reference's exact semantics
(reference: babyjubjub/mod.rs:194-236).  Signing is inherently sequential and
stays on host; batched verification is the TPU kernel it gates."""

from __future__ import annotations

from .curve import JUB_BASE, JUB_ORDER, P, jub_add, jub_mul, jub_on_curve
from .hash import poseidon


def placeholder_hash(elems):
    """reference mod.rs:202-204: fold-multiply starting from ONE."""
    acc = 1
    for e in elems:
        acc = acc * e % P
    return acc


def _h(elems, mode):
    return poseidon(list(elems)) if mode == "poseidon" else placeholder_hash(elems)


def to_pub(a: int):
    return jub_mul(JUB_BASE, a)


def sign(a: int, randomness: int, message: int, hash_mode="poseidon"):
    """Returns (R=(x,y), s).  s = (r + h·a) mod ORDER (mod.rs:210-236)."""
    pk = to_pub(a)
    r = _h([randomness, message], hash_mode)
    R = jub_mul(JUB_BASE, r)
    h = _h([R[0], R[1], pk[0], pk[1], message], hash_mode)
    # NOTE: ORDER > p, so s may not be a canonical Fr element; it is used
    # only as an integer scalar (the reference stores it via raw LE bytes,
    # mod.rs:228-233).
    s = (r + h * a) % JUB_ORDER
    return R, s


def verify(pk, message: int, R, s: int, hash_mode="poseidon") -> bool:
    """s·B == R + h·A (mod.rs:99-115)."""
    if not (jub_on_curve(pk) and jub_on_curve(R)):
        return False
    h = _h([R[0], R[1], pk[0], pk[1], message], hash_mode)
    sb = jub_mul(JUB_BASE, s)
    rhs = jub_add(R, jub_mul(pk, h))
    return sb == rhs
