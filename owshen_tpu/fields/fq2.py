"""Batched Fq2 = Fq[u]/(u²+1) arithmetic (jnp, Montgomery components).

Needed for BN254 G2 (coordinates in Fq2) so Groth16's [B]₂ commitment MSM can
run on-device.  An Fq2 element is uint32[..., 2, L]: index 0 = c0, 1 = c1.
Exposes the same op surface as ``fields.field.Field`` so curve code is
field-polymorphic (net-new vs the reference snapshot; SURVEY.md §2.3)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .field import FQ, Field, int_to_limbs


class Fq2:
    def __init__(self, base: Field = FQ):
        self.K = base
        self.p = base.p
        self.one_mont = np.stack([base.one_mont, base.zero])  # (2, L)

    # -- host-side helpers: elements as (c0, c1) int pairs --
    def encode(self, xs):
        """[(c0, c1) ints] -> uint32[n, 2, L] Montgomery."""
        if isinstance(xs, tuple):
            xs = [xs]
        flat = []
        for c0, c1 in xs:
            flat += [c0, c1]
        return self.K.encode(flat).reshape(len(xs), 2, self.K.L)

    def decode(self, a):
        vals = self.K.decode(a.reshape(-1, self.K.L))
        return [(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]

    def const(self, c0: int, c1: int) -> np.ndarray:
        return np.stack([self.K.const(c0), self.K.const(c1)])

    # -- batched ops; operands uint32[..., 2, L] --
    def add(self, a, b):
        return jnp.stack(
            [self.K.add(a[..., 0, :], b[..., 0, :]), self.K.add(a[..., 1, :], b[..., 1, :])],
            axis=-2,
        )

    def sub(self, a, b):
        return jnp.stack(
            [self.K.sub(a[..., 0, :], b[..., 0, :]), self.K.sub(a[..., 1, :], b[..., 1, :])],
            axis=-2,
        )

    def neg(self, a):
        return jnp.stack([self.K.neg(a[..., 0, :]), self.K.neg(a[..., 1, :])], axis=-2)

    def mul(self, a, b):
        # Karatsuba: (a0b0 - a1b1, (a0+a1)(b0+b1) - a0b0 - a1b1)
        K = self.K
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        v0 = K.mul(a0, b0)
        v1 = K.mul(a1, b1)
        c0 = K.sub(v0, v1)
        t = K.mul(K.add(a0, a1), K.add(b0, b1))
        c1 = K.sub(K.sub(t, v0), v1)
        return jnp.stack([c0, c1], axis=-2)

    def sqr(self, a):
        # (a0+a1)(a0-a1), 2*a0*a1
        K = self.K
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0 = K.mul(K.add(a0, a1), K.sub(a0, a1))
        m = K.mul(a0, a1)
        return jnp.stack([c0, K.add(m, m)], axis=-2)

    def mul_const(self, a, c):
        """Montgomery product with a FIXED Fq2 constant c = (c0, c1) ints:
        Karatsuba over three banded fixed-multiplier dots (see
        field.Field.mul_const)."""
        K = self.K
        c0, c1 = c
        a0, a1 = a[..., 0, :], a[..., 1, :]
        v0 = K.mul_const(a0, c0)
        v1 = K.mul_const(a1, c1)
        t = K.mul_const(K.add(a0, a1), (c0 + c1) % K.p)
        r0 = K.sub(v0, v1)
        r1 = K.sub(K.sub(t, v0), v1)
        return jnp.stack([r0, r1], axis=-2)

    def encode_const(self, c) -> np.ndarray:
        """Fixed constant -> host limb array (Montgomery)."""
        return self.const(c[0], c[1])

    def mul_base(self, a, c):
        """Multiply by a base-field constant/array c (uint32[..., L])."""
        K = self.K
        return jnp.stack(
            [K.mul(a[..., 0, :], c), K.mul(a[..., 1, :], c)], axis=-2
        )

    def inv(self, a):
        # 1/(c0 + c1 u) = (c0 - c1 u) / (c0² + c1²)
        K = self.K
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = K.add(K.sqr(a0), K.sqr(a1))
        ninv = K.inv(norm)
        return jnp.stack([K.mul(a0, ninv), K.neg(K.mul(a1, ninv))], axis=-2)

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)


FQ2 = Fq2()
