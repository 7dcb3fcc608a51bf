"""Radix-2 NTT over BN254 Fr (batched limb arithmetic, jnp).

Net-new proving-path component (SURVEY.md §2.3: absent from the reference
snapshot; BASELINE config 3): QAP witness→coefficient conversion for Groth16.

TPU-first shape: the transform is an iterative DIT over log₂n fully
vectorized butterfly stages — each stage is one batched Montgomery multiply +
add/sub over the whole coefficient array (VPU-friendly, no scalar loops).
Twiddle tables are built on device by block-doubling (log₂n small host pows).
The multi-chip 4-step (Bailey) decomposition with all-to-all exchange lives
in parallel/ntt_dist.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import FR, Field


def _bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for i in range(log_n):
        rev = (rev << 1) | ((idx >> i) & 1)
    return rev.astype(np.int32)


def powers_device(F: Field, base: int, n: int):
    """[1, base, base², …, base^(n-1)] as a Montgomery device array: host
    computes the log₂n square powers base^(2^b); the device combines them
    by binary index decomposition — log₂n FULL-WIDTH select-and-multiply
    steps at ONE fixed shape.  (The previous block-doubling concat grew
    the array 1→n across log₂n DISTINCT shapes, and each distinct-shape
    eager mul is a fresh remote compile through the axon tunnel — the 2^20
    twiddle table alone cost ~12 minutes of the round-4 bench's NTT
    section before this rewrite.)

    Runs under ensure_compile_time_eval so the result is CONCRETE even when
    first touched inside a jit trace — these tables are cached on NttDomain
    instances shared across traces, and a cached tracer from one trace
    poisons every later one (observed UnexpectedTracerError in the
    distributed prover when the single-chip h-pipeline had populated
    coset_pows first)."""
    logn = max((n - 1).bit_length(), 1)
    sq = [pow(base, 1 << b, F.p) for b in range(logn)]
    with jax.ensure_compile_time_eval():
        idx = jnp.arange(n, dtype=jnp.uint32)
        arr = jnp.broadcast_to(jnp.asarray(F.const(1)), (n, F.L))
        for b in range(logn):
            mult = F.mul(arr, jnp.asarray(F.const(sq[b]))[None])
            arr = F.select(((idx >> b) & 1) == 1, mult, arr)
        return arr


def _pallas_rows_ok(F: Field, n_rows: int) -> bool:
    """Route a bulk Fr op to the fused Pallas kernels: TPU backend, Fr,
    row count VPU-tiled (the XLA composed form costs ~50 HLO ops and
    several HBM passes per mul — PERF.md measured it ~28× off the kernel
    rate, which was most of the round-4 NTT's 0.71 s at 2^20)."""
    from ..config import settings

    return (F is FR and n_rows >= (1 << 14) and n_rows % 1024 == 0
            and jax.default_backend() == "tpu" and not settings().no_pallas)


def _butterfly(F: Field, a, b, w):
    """(a + b·w, a − b·w) with the fused Pallas kernel when routable;
    `w` broadcastable to b's shape.  Shapes (..., L)."""
    n_rows = int(np.prod(a.shape[:-1]))
    if _pallas_rows_ok(F, n_rows):
        from ..pallas.ntt_kernels import butterfly_pallas

        w = jnp.broadcast_to(w, b.shape)
        lo, hi = butterfly_pallas(a.reshape(n_rows, F.L),
                                  b.reshape(n_rows, F.L),
                                  w.reshape(n_rows, F.L))
        return lo.reshape(a.shape), hi.reshape(a.shape)
    t = F.mul(b, w)
    return F.add(a, t), F.sub(a, t)


def _bulk_mul(F: Field, a, b):
    """a·b (Montgomery) with the fused Pallas mul when routable."""
    n_rows = int(np.prod(a.shape[:-1]))
    if _pallas_rows_ok(F, n_rows):
        from ..pallas.field_kernels import mont_mul_pallas

        b = jnp.broadcast_to(b, a.shape)
        out = mont_mul_pallas(a.reshape(n_rows, F.L), b.reshape(n_rows, F.L))
        return out.reshape(a.shape)
    return F.mul(a, b)


class NttDomain:
    """Power-of-two evaluation domain over Fr with cached twiddle tables."""

    def __init__(self, log_n: int, field: Field = FR):
        assert log_n <= field.two_adicity
        self.F = field
        self.log_n = log_n
        self.n = 1 << log_n
        p = field.p
        self.omega = pow(field.generator, (p - 1) >> log_n, p)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(self.n, -1, p)
        self._bitrev = jnp.asarray(_bitrev_indices(log_n))

    @functools.cached_property
    def pows(self):
        return powers_device(self.F, self.omega, max(self.n // 2, 1))

    @functools.cached_property
    def pows_inv(self):
        return powers_device(self.F, self.omega_inv, max(self.n // 2, 1))

    @functools.cached_property
    def _stage_tables(self):
        """Per-stage butterfly index tables (log_n, n/2) int32: positions
        of the a/b operands and the twiddle index j·(n/m) into `pows` —
        the inputs that make every DIT stage shape-uniform so the stage
        loop can run as ONE lax.scan (see _transform_scan)."""
        n, log_n = self.n, self.log_n
        ia = np.zeros((log_n, n // 2), np.int32)
        ib = np.zeros((log_n, n // 2), np.int32)
        itw = np.zeros((log_n, n // 2), np.int32)
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m // 2
            g = (np.arange(n // m, dtype=np.int32) * m)[:, None]
            j = np.arange(half, dtype=np.int32)[None, :]
            ia[s - 1] = (g + j).reshape(-1)
            ib[s - 1] = (g + j + half).reshape(-1)
            itw[s - 1] = np.broadcast_to(j * (n // m), (n // m, half)
                                         ).reshape(-1)
        # cache HOST arrays: a jnp.asarray here would capture the enclosing
        # trace when first touched inside shard_map/jit and the cached
        # tracer poisons every later trace (the round-3 powers_device
        # UnexpectedTracerError, same mechanism)
        return ia, ib, itw

    def _transform_scan(self, x, pows):
        """Stage loop as one lax.scan whose body is a single batched
        butterfly (gather a/b + 1 mul + add/sub + scatter back).  The
        traced graph holds ONE montgomery-mul subgraph instead of log₂n of
        them — the unrolled form made every jit that embeds NTTs (the
        Groth16 h-pipeline embeds six) cost minutes of XLA compile.  Used
        for circuit-sized domains where the per-stage gather/scatter of
        n/2 rows is noise; the big bench transform keeps the unrolled
        reshape form (fewer HBM passes at 2^20)."""
        F = self.F
        x = jnp.take(x, self._bitrev, axis=0)
        ia_all, ib_all, itw_all = self._stage_tables
        batch_nd = x.ndim - 2

        def body(x, inp):
            a_idx, b_idx, t_idx = inp
            a = jnp.take(x, a_idx, axis=0)
            b = jnp.take(x, b_idx, axis=0)
            w = jnp.take(pows, t_idx, axis=0)
            if batch_nd:
                w = w.reshape((w.shape[0],) + (1,) * batch_nd + (F.L,))
            lo, hi = _butterfly(F, a, b, w)
            x = x.at[a_idx].set(lo)
            x = x.at[b_idx].set(hi)
            return x, None

        x, _ = jax.lax.scan(body, x, (ia_all, ib_all, itw_all))
        return x

    def _transform_bailey(self, x, pows):
        """4-step (Bailey) split n = n1·n2 with scan-form sub-transforms —
        the XLA-path answer to the unrolled stage ladder's compile cost
        (measured round 4: the unrolled 2^20 transform cost ~16 min of
        remote compile; the traced graph here is two small scans plus one
        twiddle multiply).  Sub-domain tables slice out of the given
        `pows` (ω_{n1}^j = ω_n^{j·n2}), so forward/inverse both work; the
        ω^{k1·i2} correction reads pows[e] for e < n/2 and −pows[e−n/2]
        above (ω^{n/2} = −1).  2-D input only (the bench/h-pipeline
        shapes)."""
        F, n = self.F, self.n
        la = self.log_n // 2
        lb = self.log_n - la
        n1, n2 = 1 << la, 1 << lb
        sub1 = NttDomain(la, F)
        sub2 = NttDomain(lb, F)
        mat = x.reshape(n1, n2, F.L)                  # i = i1·n2 + i2
        a = sub1._transform_scan(mat, pows[::n2][: n1 // 2])
        k1 = jnp.arange(n1, dtype=jnp.int32)[:, None]
        i2 = jnp.arange(n2, dtype=jnp.int32)[None, :]
        e = (k1 * i2).reshape(-1)                     # < n, int32-exact
        lo = e < (n // 2)
        tw = jnp.take(pows, jnp.where(lo, e, e - n // 2), axis=0)
        tw = F.select(lo, tw, F.neg(tw)).reshape(n1, n2, F.L)
        b = _bulk_mul(F, a, tw)
        c = sub2._transform_scan(jnp.moveaxis(b, 1, 0),
                                 pows[::n1][: n2 // 2])
        # c is (k2, k1, L); row-major flatten = natural X[k1 + n1·k2]
        return c.reshape(n, F.L)

    def _transform(self, x, pows):
        """x: uint32[n, ..., L] Montgomery -> NTT along axis 0 (natural
        in/out); trailing axes are batch (vectorized across VPU lanes)."""
        F, n, log_n = self.F, self.n, self.log_n
        if 2 <= log_n <= 14:
            return self._transform_scan(x, pows)
        if x.ndim == 2 and log_n <= 28:
            return self._transform_bailey(x, pows)
        rest = x.shape[1:]
        x = jnp.take(x, self._bitrev, axis=0)
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m // 2
            w = pows[:: n // m][:half]  # ω_m^j for j < half
            # align w (half, L) against b (n//m, half, *batch, L)
            w = w.reshape((1, half) + (1,) * (len(rest) - 1) + (F.L,))
            y = x.reshape((n // m, m) + rest)
            a, b = y[:, :half], y[:, half:]
            lo_, hi_ = _butterfly(F, a, b, w)
            x = jnp.concatenate([lo_, hi_], axis=1)
            x = x.reshape((n,) + rest)
        return x

    def _pallas_ok(self, x) -> bool:
        from ..config import settings

        # default threshold log_n >= 14 so the Bailey split's column
        # dimension n2 is >= 128 — smaller n2 feeds Mosaic lane-dim blocks
        # under the vreg width, a shape range never validated on hardware
        # (advisor r2 finding); mid sizes stay on the composed-XLA path
        cfg = settings()
        return (self.F is FR and x.ndim == 2
                and self.log_n >= cfg.ntt_pallas_min_logn
                and jax.default_backend() == "tpu" and not cfg.no_pallas)

    def ntt(self, x):
        if self._pallas_ok(x):
            from ..pallas.ntt_kernels import ntt_pallas

            return ntt_pallas(x, self.log_n)
        return self._transform(x, self.pows)

    def intt(self, x):
        if self._pallas_ok(x):
            from ..pallas.ntt_kernels import ntt_pallas

            y = ntt_pallas(x, self.log_n, inverse=True)
        else:
            y = self._transform(x, self.pows_inv)
        n_inv = jnp.asarray(self.F.const(self.n_inv))
        return _bulk_mul(self.F, y, n_inv[None])

    # ---- coset transforms (for h(x) = (AB - C)/Z on a coset, Groth16) ----

    @functools.cached_property
    def coset_gen(self) -> int:
        return self.F.generator  # multiplicative generator is outside H

    @functools.cached_property
    def coset_pows(self):
        return powers_device(self.F, self.coset_gen, self.n)

    @functools.cached_property
    def coset_pows_inv(self):
        return powers_device(self.F, pow(self.coset_gen, -1, self.F.p), self.n)

    def coset_ntt(self, coeffs):
        """Evaluate polynomial (coeff form) on the coset g·H."""
        return self.ntt(_bulk_mul(self.F, coeffs, self.coset_pows))

    def coset_intt(self, evals):
        """Inverse: coset evaluations -> coefficient form."""
        return _bulk_mul(self.F, self.intt(evals), self.coset_pows_inv)

    def z_on_coset_inv(self) -> int:
        """1 / Z_H(g) where Z_H(x) = x^n - 1 (constant on the coset)."""
        p = self.F.p
        return pow((pow(self.coset_gen, self.n, p) - 1) % p, -1, p)
