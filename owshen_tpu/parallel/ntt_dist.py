"""Multi-chip NTT: 4-step (Bailey) decomposition with all_to_all stage
exchange (SURVEY.md §2.4 "NTT stage parallelism"; BASELINE config 3).

A length-n NTT over Fr factors as n = n1·n2 (view the coefficients as an
[n1, n2] matrix, index i = i1·n2 + i2):

  A[k1, i2] = NTT_n1 over i1   (columns — local when i2 is sharded)
  B[k1, i2] = A · ω_n^{k1·i2}  (twiddle correction, elementwise)
  C[k1, k2] = NTT_n2 over i2   (rows — local after one all_to_all that
                                re-shards from i2-blocks to k1-blocks;
                                this is THE collective of the algorithm,
                                riding ICI inside a slice)
  X[k1 + n1·k2] = C[k1, k2]

So the butterfly network is decomposed into two bulks of fully local
vectorized stages joined by a single global transpose — the idiomatic XLA
shape for distributed FFT/NTT (vs the reference, which has no parallelism
at all: SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.field import FR, Field
from ..ops.ntt import NttDomain, powers_device
from .mesh import CHIP


class DistNtt:
    """Distributed radix-2 NTT/iNTT at size n = 2^log_n over a 1-D mesh.

    Requires d = mesh size to divide both n1 and n2 (n1 = 2^(log_n//2))."""

    def __init__(self, mesh: Mesh, log_n: int, field: Field = FR):
        self.mesh = mesh
        self.F = field
        self.log_n = log_n
        self.n = 1 << log_n
        self.log_n1 = log_n // 2
        self.n1 = 1 << self.log_n1
        self.n2 = self.n // self.n1
        d = mesh.devices.size
        assert self.n1 % d == 0 and self.n2 % d == 0, (
            f"mesh size {d} must divide n1={self.n1} and n2={self.n2}")
        self.d = d
        self.dom1 = NttDomain(self.log_n1, field)
        self.dom2 = NttDomain(log_n - self.log_n1, field)
        p = field.p
        self.omega = pow(field.generator, (p - 1) >> log_n, p)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(self.n, -1, p)
        self._fwd = self._build(inverse=False)
        self._inv = self._build(inverse=True)

    # full ω_n power tables (replicated; gathered for twiddle correction)
    def _pow_table(self, base: int):
        return powers_device(self.F, base, self.n)

    def _build(self, inverse: bool):
        F, n1, n2, d = self.F, self.n1, self.n2, self.d
        dom1 = self.dom1
        dom2 = self.dom2
        n2d = n2 // d

        def local(x, w_tab):
            # x: [n1, n2/d, L] — this chip's i2-block
            c = jax.lax.axis_index(CHIP)
            a = dom1._transform(x, dom1.pows_inv if inverse else dom1.pows)
            # twiddle: ω^{k1 · i2_global}; k1 < n1, i2 < n2 => exponent < n
            k1 = jnp.arange(n1, dtype=jnp.int32)[:, None]
            i2 = (c * n2d + jnp.arange(n2d, dtype=jnp.int32))[None, :]
            tw = jnp.take(w_tab, k1 * i2, axis=0)  # [n1, n2/d, L]
            b = F.mul(a, tw)
            # global transpose: i2-sharded [n1, n2/d] -> k1-sharded [n1/d, n2]
            b = jax.lax.all_to_all(b, CHIP, split_axis=0, concat_axis=1,
                                   tiled=True)
            # row NTTs along axis 1
            c_rows = jnp.moveaxis(b, 1, 0)  # [n2, n1/d, L]
            c_rows = dom2._transform(
                c_rows, dom2.pows_inv if inverse else dom2.pows)
            return jnp.moveaxis(c_rows, 0, 1)  # [n1/d, n2, L]

        smapped = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, CHIP), P()),
            out_specs=P(CHIP),
            check_vma=False,
        )

        out_shard = NamedSharding(self.mesh, P(CHIP))

        def full(x, w_tab):
            # natural order [n, L] -> [n1, n2, L] (i1-major)
            xm = x.reshape(n1, n2, F.L)
            cm = smapped(xm, w_tab)  # [n1, n2, L], k1-sharded
            # X[k1 + n1·k2] = C[k1, k2]: output natural order = C^T flattened
            out = jnp.swapaxes(cm, 0, 1).reshape(self.n, F.L)
            if inverse:
                n_inv = jnp.asarray(F.const(self.n_inv))
                out = F.mul(out, n_inv[None])
            return jax.lax.with_sharding_constraint(out, out_shard)

        return jax.jit(full)

    def ntt(self, x):
        """x: uint32[n, L] Montgomery, natural order -> NTT, natural order."""
        return self._fwd(x, self._pow_table(self.omega))

    def intt(self, x):
        return self._inv(x, self._pow_table(self.omega_inv))
