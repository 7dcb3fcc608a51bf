"""Generic batched short-Weierstrass curve ops (y² = x³ + b, a = 0) in
complete homogeneous projective coordinates.

Uses the Renes–Costello–Batina 2015 complete formulas (algorithms 7 and 9
for a = 0): branchless — identity (0:1:0), doubling, and mixed cases all
flow through the same code path, which is what a TPU SIMD lane wants.
Field-polymorphic: instantiate with the Fq ops for BN254 G1 or the Fq2 ops
for G2 (net-new proving-path component per SURVEY.md §2.3 — the reference
snapshot has no G1/G2 code)."""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

# Minimum flattened batch size routed to the fused Pallas kernels.  Every
# DISTINCT (shape, kernel) Pallas instance costs ~25 s of Mosaic compile
# through the axon tunnel and the TPU backend has no persistent compile
# cache, so graph-heavy callers (ops.msm.msm_sorted builds log2(n) tree
# levels of halving widths) raise this to keep the instance count small —
# the small-width adds run fine on the composed-XLA path.
_PALLAS_MIN_ROWS = 128


@contextlib.contextmanager
def pallas_min_rows(n: int):
    """Trace-time override of the Pallas routing threshold (static)."""
    global _PALLAS_MIN_ROWS
    old = _PALLAS_MIN_ROWS
    _PALLAS_MIN_ROWS = n
    try:
        yield
    finally:
        _PALLAS_MIN_ROWS = old


class Weierstrass:
    """K: field-op object (Field or Fq2); b3: 3·b as a plain K constant
    (int for Field, (c0, c1) ints for Fq2) — multiplications by it ride the
    banded fixed-multiplier path (K.mul_const), not a full product.

    Points are (X, Y, Z) tuples of K-element arrays, batched over leading
    axes.  Identity is (0 : 1 : 0)."""

    def __init__(self, K, b3):
        self.K = K
        self.b3_int = b3
        self.b3 = K.encode_const(b3)

    def _pallas_block(self, p):
        """Pick a Pallas block size for a fused G1 add/double, or None to
        take the composed-XLA path (non-Fq fields, CPU mesh, odd batches)."""
        from ..config import settings
        from ..fields.field import FQ

        if self.K is not FQ or settings().no_pallas:
            return None
        if jax.default_backend() != "tpu":
            return None
        import numpy as np

        n = int(np.prod(p[0].shape[:-1])) if p[0].ndim >= 2 else 0
        if n < _PALLAS_MIN_ROWS:
            return None
        for block in (512, 128):
            if n >= block and n % block == 0:
                return block
        return None

    def _pallas_small(self, p):
        """Route a SMALL Fq batch (including a single unbatched point)
        through the fused kernels by padding to one 128-lane block.

        A width-1 composed-XLA complete add is ~700 serialized HLO
        micro-ops ≈ 1 ms of pure latency; msm_sorted's Horner carry runs
        ~18 of them per window (~0.3 s of the 2^22 headline).  One padded
        128-lane Pallas call is ~10 µs, and every such op shares the SAME
        kernel instance (block_t=128, grid=1) so Mosaic compiles it once."""
        from ..config import settings
        from ..fields.field import FQ

        if self.K is not FQ or settings().no_pallas:
            return None
        if jax.default_backend() != "tpu":
            return None
        if p[0].shape[-1] != FQ.L:
            return None
        import numpy as np

        n = int(np.prod(p[0].shape[:-1])) if p[0].ndim >= 2 else 1
        if n >= _PALLAS_MIN_ROWS or n >= 128:
            return None
        return n

    @staticmethod
    def _pad128(leaf, n):
        flat = leaf.reshape((n, leaf.shape[-1]))
        return jnp.concatenate(
            [flat, jnp.zeros((128 - n,) + flat.shape[1:], flat.dtype)])

    def identity_like(self, x):
        K = self.K
        return (K.zeros_like(x), K.one_like(x), K.zeros_like(x))

    def is_identity(self, p):
        return self.K.is_zero(p[2])

    def add(self, p, q):
        """Complete addition (RCB15 algorithm 7, a=0): 12M + 2·b3-mul.

        On TPU, Fq batches route to the fused Pallas kernel (all 14 muls +
        17 add/subs resident in VMEM)."""
        block = self._pallas_block(p) if p[0].shape == q[0].shape else None
        if block is not None:
            from ..pallas.field_kernels import g1_add_pallas

            return g1_add_pallas(p, q, block_t=block)
        if p[0].shape == q[0].shape:
            n = self._pallas_small(p)
            if n is not None:
                from ..pallas.field_kernels import g1_add_pallas

                shp = p[0].shape
                out = g1_add_pallas(tuple(self._pad128(a, n) for a in p),
                                    tuple(self._pad128(a, n) for a in q),
                                    block_t=128)
                return tuple(a[:n].reshape(shp) for a in out)
        K = self.K
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0 = K.mul(X1, X2)
        t1 = K.mul(Y1, Y2)
        t2 = K.mul(Z1, Z2)
        t3 = K.mul(K.add(X1, Y1), K.add(X2, Y2))
        t3 = K.sub(t3, K.add(t0, t1))            # X1Y2 + X2Y1
        t4 = K.mul(K.add(Y1, Z1), K.add(Y2, Z2))
        t4 = K.sub(t4, K.add(t1, t2))            # Y1Z2 + Y2Z1
        t5 = K.mul(K.add(X1, Z1), K.add(X2, Z2))
        t5 = K.sub(t5, K.add(t0, t2))            # X1Z2 + X2Z1
        three_t0 = K.add(K.add(t0, t0), t0)
        t2b = K.mul_const(t2, self.b3_int)
        z3 = K.add(t1, t2b)
        t1b = K.sub(t1, t2b)
        y3 = K.mul_const(t5, self.b3_int)
        X3 = K.sub(K.mul(t3, t1b), K.mul(t4, y3))
        Y3 = K.add(K.mul(y3, three_t0), K.mul(t1b, z3))
        Z3 = K.add(K.mul(z3, t4), K.mul(three_t0, t3))
        return (X3, Y3, Z3)

    def double(self, p):
        """Complete doubling (RCB15 algorithm 9, a=0): 6M + 2S + 1·b3-mul."""
        block = self._pallas_block(p)
        if block is not None:
            from ..pallas.field_kernels import g1_double_pallas

            return g1_double_pallas(p, block_t=block)
        n = self._pallas_small(p)
        if n is not None:
            from ..pallas.field_kernels import g1_double_pallas

            shp = p[0].shape
            out = g1_double_pallas(tuple(self._pad128(a, n) for a in p),
                                   block_t=128)
            return tuple(a[:n].reshape(shp) for a in out)
        K = self.K
        X, Y, Z = p
        t0 = K.sqr(Y)
        z3 = K.add(t0, t0)
        z3 = K.add(z3, z3)
        z3 = K.add(z3, z3)                        # 8Y²
        t1 = K.mul(Y, Z)
        t2 = K.mul_const(K.sqr(Z), self.b3_int)
        X3 = K.mul(t2, z3)
        Y3 = K.add(t0, t2)
        Z3 = K.mul(t1, z3)
        t1 = K.add(t2, t2)
        t2 = K.add(t1, t2)                        # 3·b3·Z²
        t0 = K.sub(t0, t2)
        Y3 = K.add(X3, K.mul(t0, Y3))
        t1 = K.mul(X, Y)
        X3 = K.mul(t0, t1)
        X3 = K.add(X3, X3)
        return (X3, Y3, Z3)

    def neg(self, p):
        X, Y, Z = p
        return (X, self.K.neg(Y), Z)

    def select(self, cond, p, q):
        K = self.K
        return tuple(K.select(cond, a, b) for a, b in zip(p, q))

    def scalar_mul(self, p, bits):
        """Batched double-and-add over MSB-first bit array bits[n_bits, ...].

        Branchless conditional adds via select; runs as lax.scan."""
        acc = self.identity_like(p[0])

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            acc = self.select(bit != 0, added, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits)
        return acc

    def to_affine(self, p):
        """(X/Z, Y/Z) with identity mapped to (0, 0)."""
        K = self.K
        X, Y, Z = p
        zinv = K.inv(Z)
        return (K.mul(X, zinv), K.mul(Y, zinv))

    def to_affine_jit(self, p):
        """jit-cached to_affine (host decode helper; the 254-step inverse
        exponentiation otherwise re-traces eagerly on every decode)."""
        if not hasattr(self, "_to_affine_jit"):
            self._to_affine_jit = jax.jit(self.to_affine)
        return self._to_affine_jit(p)

    def eq(self, p, q):
        """Projective equality: X1Z2 == X2Z1 and Y1Z2 == Y2Z1 (and both
        identity)."""
        K = self.K
        both_id = self.is_identity(p) & self.is_identity(q)
        x_eq = K.eq(K.mul(p[0], q[2]), K.mul(q[0], p[2]))
        y_eq = K.eq(K.mul(p[1], q[2]), K.mul(q[1], p[2]))
        neither = ~self.is_identity(p) & ~self.is_identity(q)
        return both_id | (neither & x_eq & y_eq)

    def on_curve_affine(self, x, y):
        """y² == x³ + b (b recovered from b3 host-side by the caller)."""
        K = self.K
        y2 = K.sqr(y)
        x3 = K.mul(K.sqr(x), x)
        # b = b3 / 3: precompute? Instead check 3y² == 3x³ + b3
        three = lambda v: K.add(K.add(v, v), v)
        return K.eq(three(y2), K.add(three(x3), jnp.broadcast_to(jnp.asarray(self.b3), x.shape)))

    def sum_reduce(self, p, axis=0):
        """Tree-reduce EC sum along `axis` (log₂ rounds of vectorized adds)."""
        X, Y, Z = p
        if axis != 0:
            X, Y, Z = (jnp.moveaxis(a, axis, 0) for a in (X, Y, Z))
        n = X.shape[0]
        while n > 1:
            half = n // 2
            lo = (X[:half], Y[:half], Z[:half])
            hi = (X[half : 2 * half], Y[half : 2 * half], Z[half : 2 * half])
            s = self.add(lo, hi)
            if n % 2:
                tail = (X[n - 1 :], Y[n - 1 :], Z[n - 1 :])
                s = (jnp.concatenate([s[0], tail[0]]),
                     jnp.concatenate([s[1], tail[1]]),
                     jnp.concatenate([s[2], tail[2]]))
                n = half + 1
            else:
                n = half
            X, Y, Z = s
        return (X[0], Y[0], Z[0])
