"""Groth16 prover orchestration: host witness/setup scalars, TPU hot path.

Net-new vs the reference snapshot (SURVEY.md §0: the Groth16 prover of the
original Owshen wallet is absent); BASELINE config 5.  The prove-time compute
is >99% NTT + MSM (SURVEY.md §7.4.5), so:

  * witness generation: host (branchy, tiny — the builder assigns values
    during synthesis);
  * constraint-system evaluation (A·w, B·w, C·w): batched device sparse
    matvec over padded index/coefficient arrays (r1cs.Builder.compiled);
  * QAP h(x): device NTTs over the evaluation domain (coset trick:
    h = intt_coset((A·B − C)·Z⁻¹)), h scalars stay on device end-to-end;
  * commitments [A]₁ [B]₂ [C]₁: device Pippenger MSMs (ops/msm.py);
  * setup exponents: host ints; setup POINTS: device fixed-base windowed
    multi-exponentiation (curves/fixed_base.py) — no 254-step double-and-add;
  * verification: host pairing product (groth16/pairing.py).

Setup here is a *simulated* trusted setup from a seed — fine for a proving
library (the ceremony is out of scope, as it is for the reference)."""

from __future__ import annotations

import contextlib
import functools
import hashlib
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import bn254
from ..curves.fixed_base import g1_fixed_base, g2_fixed_base
from ..fields.field import FR, ints_to_array
from ..ops.msm import msm
from ..ops.ntt import NttDomain
from ..oracle import curve as ocurve
from .pairing import pairing_product_is_one
from .r1cs import Builder

P = FR.p


@functools.lru_cache(maxsize=None)
def _domain(log_n: int) -> NttDomain:
    """Shared domain instances so jitted pipelines cache across calls."""
    return NttDomain(log_n)


def _rand_stream(seed: bytes):
    i = 0
    while True:
        v = int.from_bytes(hashlib.sha256(seed + i.to_bytes(4, "little")).digest(), "big") % P
        i += 1
        if v != 0:
            yield v


@dataclass
class ProvingKey:
    n_domain: int
    n_pub: int
    # device point arrays (projective pytrees)
    a_g1: tuple
    b_g1: tuple
    b_g2: tuple
    k_g1: tuple  # private-var coefficients /δ
    h_g1: tuple  # τ^i·Z(τ)/δ
    alpha_g1: tuple
    beta_g1: tuple
    delta_g1: tuple
    beta_g2: tuple
    delta_g2: tuple


@dataclass
class VerifyingKey:
    alpha_g1: tuple  # host affine ints
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    ic: list  # host affine per public var (incl. the constant 1 wire)


@dataclass
class Proof:
    a: tuple  # G1 affine ints
    b: tuple  # G2 affine
    c: tuple  # G1 affine


def _lagrange_at_tau(n: int, tau: int, omega: int):
    """L_j(τ) for j<n over the radix-2 domain: Zh(τ)·ω^j / (n·(τ−ω^j)).

    One batched inversion for all n denominators (Montgomery's trick on
    host ints) — n single inversions would dominate setup at 2^14+."""
    zh = (pow(tau, n, P) - 1) % P
    n_inv = pow(n, -1, P)
    wjs, dens = [], []
    wj = 1
    for _ in range(n):
        wjs.append(wj)
        dens.append((tau - wj) % P)
        wj = wj * omega % P
    # batch invert dens
    prefix = [1] * (n + 1)
    for i, d in enumerate(dens):
        prefix[i + 1] = prefix[i] * d % P
    inv_all = pow(prefix[n], -1, P)
    invs = [0] * n
    for i in range(n - 1, -1, -1):
        invs[i] = inv_all * prefix[i] % P
        inv_all = inv_all * dens[i] % P
    return [zh * wjs[j] % P * invs[j] % P * n_inv % P for j in range(n)]


# The prover/setup pipelines run PALLAS-FREE by default: at circuit-sized
# batches (hundreds..8K points) the composed-XLA curve ops cost well under
# a second of runtime, while every distinct-shape Mosaic kernel costs
# minutes of compile through the axon tunnel (which has NO persistent
# compile cache) — the round-2 bench lost its whole budget there.  Set
# OWSHEN_PROVER_PALLAS=1 to re-enable fused kernels for very large
# circuits where runtime dominates compile.
def _prover_pallas_ctx():
    from ..curves.weierstrass import pallas_min_rows

    from ..config import settings

    if settings().prover_pallas:
        return contextlib.nullcontext()
    return pallas_min_rows(1 << 30)


@functools.lru_cache(maxsize=None)
def _fixed_base_jit(group: str, c: int):
    fb = g1_fixed_base(c) if group == "g1" else g2_fixed_base(c)

    def mul(sc):
        with _prover_pallas_ctx():
            return fb.mul(sc)

    return jax.jit(mul)


def _batch_device(group: str, exponents, c: int = 8):
    """[ints] -> device projective points (windowed fixed-base mul).

    The exponent batch is padded to a power of two (zero exponents map to
    the identity via the window tables' d=0 entries) so every setup call
    shares a handful of compiled shapes — each distinct shape costs a fresh
    ~25 s TPU compile (no persistent cache), and the round-2 setup spent
    ~3 minutes compiling one kernel per exponent-array length."""
    n = len(exponents)
    n2 = 1 << max(9, (n - 1).bit_length())
    sc = ints_to_array([e % P for e in exponents] + [0] * (n2 - n))
    out = _fixed_base_jit(group, c)(sc)
    return tuple(a[:n] for a in out)


def _g1_batch_device(exponents, c: int = 8):
    return _batch_device("g1", exponents, c)


def _g2_batch_device(exponents, c: int = 8):
    return _batch_device("g2", exponents, c)


def setup(builder: Builder, seed: bytes = b"owshen-tpu-setup"):
    """Simulated trusted setup -> (ProvingKey, VerifyingKey)."""
    rs = _rand_stream(seed)
    tau, alpha, beta, gamma, delta = (next(rs) for _ in range(5))
    m = builder.num_vars
    n_pub = builder.n_pub + 1  # include the constant wire
    n = 1 << max(1, (len(builder.constraints) - 1).bit_length())
    dom = _domain(n.bit_length() - 1)
    lag = _lagrange_at_tau(n, tau, dom.omega)

    a_t = [0] * m
    b_t = [0] * m
    c_t = [0] * m
    for j, (a, b, c) in enumerate(builder.constraints):
        lj = lag[j]
        for i, v in a.items():
            a_t[i] = (a_t[i] + v * lj) % P
        for i, v in b.items():
            b_t[i] = (b_t[i] + v * lj) % P
        for i, v in c.items():
            c_t[i] = (c_t[i] + v * lj) % P

    gamma_inv = pow(gamma, -1, P)
    delta_inv = pow(delta, -1, P)
    k_exp = [
        (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % P * delta_inv % P
        for i in range(n_pub, m)
    ]
    ic_exp = [
        (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % P * gamma_inv % P
        for i in range(n_pub)
    ]
    zh_tau = (pow(tau, n, P) - 1) % P
    h_exp = [pow(tau, i, P) * zh_tau % P * delta_inv % P for i in range(n - 1)]

    pk = ProvingKey(
        n_domain=n,
        n_pub=n_pub,
        a_g1=_g1_batch_device(a_t),
        b_g1=_g1_batch_device(b_t),
        b_g2=_g2_batch_device(b_t),
        k_g1=_g1_batch_device(k_exp) if k_exp else None,
        h_g1=_g1_batch_device(h_exp),
        alpha_g1=_g1_batch_device([alpha]),
        beta_g1=_g1_batch_device([beta]),
        delta_g1=_g1_batch_device([delta]),
        beta_g2=_g2_batch_device([beta]),
        delta_g2=_g2_batch_device([delta]),
    )
    vk = VerifyingKey(
        alpha_g1=ocurve.G1.mul(ocurve.G1_GEN, alpha),
        beta_g2=ocurve.G2.mul(ocurve.G2_GEN, beta),
        gamma_g2=ocurve.G2.mul(ocurve.G2_GEN, gamma),
        delta_g2=ocurve.G2.mul(ocurve.G2_GEN, delta),
        ic=[ocurve.G1.mul(ocurve.G1_GEN, e) for e in ic_exp],
    )
    return pk, vk


def _matvec(w_mont, mat, n_rows: int):
    """Batched sparse LC·w over nnz-bucketed rows (r1cs.Builder.compiled):
    w uint32[m, L] Montgomery; mat = [(row_ids[r], idx[r, k],
    coeff[r, k, L]), ...].  Returns uint32[n_rows, L] — scatter targets are
    unique per bucket AND across buckets (each row lives in exactly one)."""
    acc = jnp.zeros((n_rows, FR.L), jnp.uint32)
    for rids, idx, coeff in mat:
        gathered = jnp.take(w_mont, idx, axis=0)  # (r, k, L)
        prods = FR.mul(gathered, coeff)
        rowsum = prods[:, 0]
        for t in range(1, prods.shape[1]):
            rowsum = FR.add(rowsum, prods[:, t])
        acc = acc.at[rids].set(rowsum)
    return acc


def _h_scalars_device(dom: NttDomain, w_mont, mats):
    """Full device pipeline: witness -> A/B/C evals -> h coefficients ->
    canonical limb scalars for the MSM (no host round-trip)."""
    F = FR
    n = dom.n
    ma, mb, mc = mats
    a_e = _matvec(w_mont, ma, n)
    b_e = _matvec(w_mont, mb, n)
    c_e = _matvec(w_mont, mc, n)
    a_s = dom.coset_ntt(dom.intt(a_e))
    b_s = dom.coset_ntt(dom.intt(b_e))
    c_s = dom.coset_ntt(dom.intt(c_e))
    zinv = jnp.asarray(F.const(dom.z_on_coset_inv()))
    h_s = F.mul(F.sub(F.mul(a_s, b_s), c_s), zinv[None])
    h_c = dom.coset_intt(h_s)
    return F.from_mont(h_c)  # canonical scalars, stays on device


def _pad_for_mesh(pts, sc, d: int, curve):
    """Pad (points, scalars) so n is a multiple of the mesh size (identity
    points with zero scalars contribute nothing)."""
    n = sc.shape[0]
    pad = (-n) % d
    if pad == 0:
        return pts, sc
    ident = curve.identity_like(pts[0][0])
    pts = tuple(
        jnp.concatenate(
            [a, jnp.broadcast_to(jnp.expand_dims(iz, 0), (pad,) + iz.shape)])
        for a, iz in zip(pts, ident))
    sc = jnp.concatenate([sc, jnp.zeros((pad,) + sc.shape[1:], sc.dtype)])
    return pts, sc


def _h_scalars_dist(mesh, dom: NttDomain, w_mont, mats):
    """Distributed h-pipeline: the three NTT round-trips ride the Bailey
    all_to_all decomposition over the mesh (parallel/ntt_dist.DistNtt); the
    tiny sparse matvec stays replicated.  Matches _h_scalars_device
    bit-exactly (gated by tests/test_dist.py::test_prove_dist)."""
    from ..parallel.ntt_dist import DistNtt

    F = FR
    dn = DistNtt(mesh, dom.log_n)
    evals = [_matvec(w_mont, mat, dom.n) for mat in mats]
    coset = dom.coset_pows
    coset_inv = dom.coset_pows_inv
    specs = []
    for ev in evals:
        coeffs = dn.intt(ev)
        specs.append(dn.ntt(F.mul(coeffs, coset)))
    a_s, b_s, c_s = specs
    zinv = jnp.asarray(F.const(dom.z_on_coset_inv()))
    h_s = F.mul(F.sub(F.mul(a_s, b_s), c_s), zinv[None])
    h_c = F.mul(dn.intt(h_s), coset_inv)
    return FR.from_mont(h_c)


class _FixedTables:
    """Per-ProvingKey precomputed fixed-point MSM tables (ops/msm_fixed).

    Built lazily at first prove and cached on the pk object (NOT serialized
    by checkpoints — they are derived data, ~1 GB at the 8K-point circuit
    sizes).  All four big point sets share one padded size, so the compute
    fn compiles ONCE per circuit size."""

    def __init__(self, pk: "ProvingKey", _restored=None):
        from ..ops.msm_fixed import FixedMsm, FixedMsmGroup

        n_min = max(pk.a_g1[0].shape[0], pk.h_g1[0].shape[0],
                    pk.k_g1[0].shape[0] if pk.k_g1 is not None else 1)
        self.n = 1 << (n_min - 1).bit_length()
        self.has_k = pk.k_g1 is not None
        if _restored is not None:
            self.g1, self.b2 = _restored
            _stage_log("tables restored from checkpoint")
        else:
            # ONE concatenated G1 row matrix for [a, b1, (k,) h] — the five
            # prover G1 MSMs then share one gather + one batched fold
            # (round-4 verdict item 5)
            sets = [pk.a_g1, pk.b_g1] + \
                ([pk.k_g1] if self.has_k else []) + [pk.h_g1]
            self.g1 = FixedMsmGroup(bn254.G1, sets, n_min=self.n)
            _stage_log(f"g1 tables built (n={self.n})")
            self.b2 = FixedMsm(bn254.G2, pk.b_g2, n_min=self.n)
            _stage_log("b2 table built (G2)")
        # tail points (α, β, δ)₁ / (β, δ)₂ as HOST affine ints: the
        # per-proof randomizer terms are 5 single scalar-muls — ~0.1 s of
        # host oracle arithmetic, vs ~3 minutes of extra remote compile
        # for dedicated tiny-table MSM jits (measured in the round-4
        # rehearsal: "tables ready"+"tails dispatched" cost 174 s)
        th = _tail_host(pk)
        self.alpha1 = th["alpha1"]
        self.beta1 = th["beta1"]
        self.delta1 = th["delta1"]
        self.beta2 = th["beta2"]
        self.delta2 = th["delta2"]


def _fixed_tables(pk: ProvingKey) -> _FixedTables:
    fx = getattr(pk, "_fixed", None)
    if fx is None:
        fx = _FixedTables(pk)
        object.__setattr__(pk, "_fixed", fx)
    return fx


def _fixed_table_bytes(pk: ProvingKey) -> int:
    """Projected HBM footprint of the fixed prover tables: tables scale
    linearly with the padded circuit size (W·D·n points per set), so a
    2^16-domain circuit overflows a v5e — callers must route around."""
    n_min = max(pk.a_g1[0].shape[0], pk.h_g1[0].shape[0],
                pk.k_g1[0].shape[0] if pk.k_g1 is not None else 1)
    n = 1 << (n_min - 1).bit_length()
    W, D = 64, 9                        # c=4 signed
    g1_sets = 3 + (1 if pk.k_g1 is not None else 0)
    per_g1 = 3 * 16 * 4                 # x/y/z × 16 u32 limbs
    per_g2 = 2 * per_g1                 # Fq2 coordinates
    return W * D * n * (g1_sets * per_g1 + per_g2)


def _fixed_tables_fit(pk: ProvingKey) -> bool:
    """True when the fixed tables fit the configured HBM budget
    (OWSHEN_FIXED_TABLE_MAX_GB, default 6); past it the prover falls back
    to the sorted streaming engine instead of OOMing (round-4 weak #6)."""
    if getattr(pk, "_fixed", None) is not None:
        return True                     # already built/restored
    limit = float(os.environ.get("OWSHEN_FIXED_TABLE_MAX_GB", "6"))
    return _fixed_table_bytes(pk) <= limit * (1 << 30)


def _tail_host(pk: ProvingKey) -> dict:
    """The five fixed tail points (α, β, δ)₁ / (β, δ)₂ as host affine ints,
    decoded once per pk: randomizer tail terms are 5 single scalar-muls of
    host oracle arithmetic per proof (~0.1 s) — dedicated device jits for
    them cost minutes of remote compile (round-4 rehearsal measurement)."""
    th = getattr(pk, "_tail_host_cache", None)
    if th is None:
        th = {
            "alpha1": bn254.g1_decode_host(tuple(a[0] for a in pk.alpha_g1)),
            "beta1": bn254.g1_decode_host(tuple(a[0] for a in pk.beta_g1)),
            "delta1": bn254.g1_decode_host(tuple(a[0] for a in pk.delta_g1)),
            "beta2": bn254.g2_decode_host(tuple(a[0] for a in pk.beta_g2)),
            "delta2": bn254.g2_decode_host(tuple(a[0] for a in pk.delta_g2)),
        }
        object.__setattr__(pk, "_tail_host_cache", th)
    return th


def _prove_core(pk: ProvingKey, w, r: int, s: int, h_sc, mg1, mg2) -> Proof:
    """Shared tail-free prover algebra over pluggable MSM backends.

    Uses  s·A = s·α + MSM_a(s·w) + s·r·δ  and  r·B₁ = r·β + MSM_b1(r·w)
    + r·s·δ  so C needs no variable-point scalar multiplication at all:
      C = MSM_h(h) + MSM_k(w_priv) + MSM_a(s·w) + MSM_b1(r·w)
          + (s·α + r·β + r·s·δ).
    mg1(which, scalars) / mg2(scalars): the MSM backend — fixed tables on
    one chip, msm_dist over the mesh."""
    th = _tail_host(pk)
    w_sc = jnp.asarray(ints_to_array(w))
    sw = jnp.asarray(ints_to_array([(s * wi) % P for wi in w]))
    rw = jnp.asarray(ints_to_array([(r * wi) % P for wi in w]))
    a_w = mg1("a", w_sc)
    a_sw = mg1("a", sw)
    b1_rw = mg1("b1", rw)
    _stage_log("g1 msms dispatched")
    b2_w = mg2(w_sc)
    _stage_log("g2 msm dispatched")
    if pk.k_g1 is not None:
        k_w = mg1("k", w_sc[pk.n_pub:])
    else:
        k_w = bn254.G1.identity_like(a_w[0])
    h_h = mg1("h", h_sc)
    # randomizer tails on HOST (oracle affine arithmetic — 5 scalar-muls):
    #   tail_a  = α + r·δ          tail_c = s·α + r·β + r·s·δ
    #   tail_b2 = β₂ + s·δ₂
    oG1, oG2 = ocurve.G1, ocurve.G2
    tail_a_pt = oG1.add(th["alpha1"], oG1.mul(th["delta1"], r % P))
    tail_c_pt = oG1.add(oG1.add(oG1.mul(th["alpha1"], s % P),
                                oG1.mul(th["beta1"], r % P)),
                        oG1.mul(th["delta1"], (r * s) % P))
    tail_b2_pt = oG2.add(th["beta2"], oG2.mul(th["delta2"], s % P))
    tail_a = tuple(a[0] for a in bn254.g1_encode([tail_a_pt]))
    tail_c = tuple(a[0] for a in bn254.g1_encode([tail_c_pt]))
    tail_b2 = tuple(a[0] for a in bn254.g2_encode([tail_b2_pt]))
    _stage_log("tails computed (host)")
    A, B2, C = _combine_jit()(a_w, tail_a, b2_w, tail_b2, a_sw, b1_rw,
                              k_w, h_h, tail_c)
    a_aff = bn254.g1_decode_host(A)
    b_aff = bn254.g2_decode_host(B2)
    c_aff = bn254.g1_decode_host(C)
    _stage_log("decoded")
    return Proof(a=a_aff, b=b_aff, c=c_aff)


@functools.lru_cache(maxsize=None)
def _combine_jit():
    """One dispatch for the nine single-point adds assembling A/B₂/C."""

    def combine(a_w, tail_a, b2_w, tail_b2, a_sw, b1_rw, k_w, h_h, tail_c):
        A = bn254.G1.add(a_w, tail_a)
        B2 = bn254.G2.add(b2_w, tail_b2)
        C = bn254.G1.add(a_sw, b1_rw)
        C = bn254.G1.add(C, k_w)
        C = bn254.G1.add(C, h_h)
        C = bn254.G1.add(C, tail_c)
        return A, B2, C

    return jax.jit(combine)


def _stage_log(msg: str) -> None:
    """Per-stage progress (stderr) gated by OWSHEN_PROVE_LOG=1 — compile
    through the axon tunnel costs minutes per jit, and a budget kill
    mid-compile must leave a diagnostic tail."""
    if os.environ.get("OWSHEN_PROVE_LOG") == "1":
        import sys
        import time

        print(f"    [prove t={time.time():.0f}] {msg}", file=sys.stderr,
              flush=True)


@functools.lru_cache(maxsize=None)
def _fused_prove_jit(n: int, n_pub: int, has_k: bool, c: int,
                     slots, widths, shapes):
    """ONE device dispatch for the whole commitment phase: the five G1
    MSMs share one gather + one (S, w)-wide batched fold
    (ops/msm_fixed.msm_fixed_multi), the G2 MSM and the nine assembly adds
    run in the same program, and the s·w / r·w scalar products move from
    host Python ints onto the device (round-4 verdict item 5: the per-MSM
    dispatch floor and 5× fold latency dominated the warm prove)."""
    from ..ops.msm_fixed import msm_fixed, msm_fixed_multi

    S = 5 if has_k else 4

    def run(g1_rows, b2_table, w_mont, h_sc, s_mont, r_mont,
            tail_a, tail_b2, tail_c):
        w_sc = FR.from_mont(w_mont)                        # canonical (n,16)
        sw = FR.from_mont(FR.mul(w_mont, jnp.broadcast_to(s_mont,
                                                          w_mont.shape)))
        rw = FR.from_mont(FR.mul(w_mont, jnp.broadcast_to(r_mont,
                                                          w_mont.shape)))
        h_pad = jnp.concatenate(
            [h_sc, jnp.zeros((n - h_sc.shape[0], 16), h_sc.dtype)]) \
            if h_sc.shape[0] != n else h_sc
        sets = [w_sc, sw, rw]
        if has_k:
            sets.append(jnp.concatenate(
                [w_sc[n_pub:], jnp.zeros((n_pub, 16), w_sc.dtype)]))
        sets.append(h_pad)
        g1s = msm_fixed_multi(
            bn254.G1, g1_rows, list(widths), [tuple(sh) for sh in shapes],
            jnp.stack(sets), n, slots, c)
        b2_w = msm_fixed(bn254.G2, b2_table, w_sc, c)
        a_w = tuple(a[0] for a in g1s)
        a_sw = tuple(a[1] for a in g1s)
        b1_rw = tuple(a[2] for a in g1s)
        k_w = (tuple(a[3] for a in g1s) if has_k
               else bn254.G1.identity_like(a_w[0]))
        h_h = tuple(a[S - 1] for a in g1s)
        A = bn254.G1.add(a_w, tail_a)
        B2 = bn254.G2.add(b2_w, tail_b2)
        C = bn254.G1.add(a_sw, b1_rw)
        C = bn254.G1.add(C, k_w)
        C = bn254.G1.add(C, h_h)
        C = bn254.G1.add(C, tail_c)
        return A, B2, C

    return jax.jit(run)


def _prove_fixed(pk: ProvingKey, builder: Builder, w, r: int, s: int,
                 h_sc) -> Proof:
    """Single-chip prover over precomputed tables: ONE fused device
    dispatch for scalars + all MSMs + assembly, host tails, host decode."""
    fx = _fixed_tables(pk)
    _stage_log("tables ready")
    th = _tail_host(pk)
    n, n_pub = fx.n, pk.n_pub
    # sets [a:w, a:sw, b1:rw, (k,) h] against tables [a, b1, (k,) h]
    slots = (0, 0, 1, 2, 3) if fx.has_k else (0, 0, 1, 2)
    # pad the Montgomery witness to the shared table size
    w_mont = FR.encode(w)
    if w_mont.shape[0] != n:
        w_mont = np.concatenate(
            [w_mont, np.zeros((n - w_mont.shape[0], FR.L), np.uint32)])
    # randomizer tails on HOST (5 oracle scalar-muls, ~0.1 s — dedicated
    # device jits for them cost minutes of remote compile, round-4 note)
    oG1, oG2 = ocurve.G1, ocurve.G2
    tail_a_pt = oG1.add(th["alpha1"], oG1.mul(th["delta1"], r % P))
    tail_c_pt = oG1.add(oG1.add(oG1.mul(th["alpha1"], s % P),
                                oG1.mul(th["beta1"], r % P)),
                        oG1.mul(th["delta1"], (r * s) % P))
    tail_b2_pt = oG2.add(th["beta2"], oG2.mul(th["delta2"], s % P))
    tail_a = tuple(a[0] for a in bn254.g1_encode([tail_a_pt]))
    tail_c = tuple(a[0] for a in bn254.g1_encode([tail_c_pt]))
    tail_b2 = tuple(a[0] for a in bn254.g2_encode([tail_b2_pt]))
    _stage_log("tails computed (host)")
    fn = _fused_prove_jit(n, n_pub, fx.has_k, fx.g1.c, slots,
                          tuple(fx.g1.widths),
                          tuple(tuple(s_) for s_ in fx.g1.shapes))
    A, B2, C = fn(fx.g1.rows, fx.b2.table, jnp.asarray(w_mont),
                  jnp.asarray(h_sc), jnp.asarray(FR.encode([s % P])),
                  jnp.asarray(FR.encode([r % P])), tail_a, tail_b2, tail_c)
    _stage_log("fused prove dispatched")
    a_aff = bn254.g1_decode_host(A)
    b_aff = bn254.g2_decode_host(B2)
    c_aff = bn254.g1_decode_host(C)
    _stage_log("decoded")
    return Proof(a=a_aff, b=b_aff, c=c_aff)


def _prove_mesh(pk: ProvingKey, w, r: int, s: int, h_sc, mesh,
                msm_c: int, msm_lanes: int) -> Proof:
    """Multi-chip prover: the same tail-free algebra over msm_dist
    backends (points sharded per chip, ICI all_gather reduce).  Replaces
    the round-3 mesh tail code (six 254-step scalar-mul ladders + eager
    glue) that dominated the multichip dryrun's wall time."""
    from ..parallel.msm_dist import msm_dist

    d = mesh.devices.size
    pts_g1 = {"a": pk.a_g1, "b1": pk.b_g1, "k": pk.k_g1, "h": pk.h_g1}

    def mg1(which, sc):
        pts, sc = _pad_for_mesh(pts_g1[which], jnp.asarray(sc), d, bn254.G1)
        return msm_dist(mesh, bn254.G1, pts, sc, c=msm_c, lanes=msm_lanes)

    def mg2(sc):
        pts, sc = _pad_for_mesh(pk.b_g2, jnp.asarray(sc), d, bn254.G2)
        return msm_dist(mesh, bn254.G2, pts, sc, c=msm_c, lanes=msm_lanes)

    return _prove_core(pk, w, r, s, h_sc, mg1, mg2)


def prove(pk: ProvingKey, builder: Builder, seed: bytes | None = None,
          msm_c: int = 8, msm_lanes: int = 1024, mesh=None,
          engine: str | None = None) -> Proof:
    """Generate a proof from a fully-assigned builder.

    The Groth16 randomizers (r, s) default to fresh `os.urandom` entropy —
    zero-knowledge collapses if (r, s) are predictable, since a simulator
    (or any observer) who knows them can relate proofs of the same witness.
    Pass an explicit `seed` ONLY for reproducible tests.

    engine: single-chip MSM engine — "fixed" (default; precomputed-table
    gather+fold, ops/msm_fixed.py), "lane" (scan-based Pippenger), or
    "sorted" (chunk-scan sorted engine); resolved from
    OWSHEN_PROVER_ENGINE when None.  The mesh path always uses msm_dist.

    mesh: optional jax.sharding.Mesh — the multi-chip prover (BASELINE
    config 5, "v5p multi-host"): the three G1 MSMs + the G2 MSM shard
    points per chip with an ICI all_gather reduce (parallel/msm_dist) and
    the h-pipeline NTTs ride the Bailey all_to_all (parallel/ntt_dist)."""
    w = builder.witness()
    rs = _rand_stream((seed if seed is not None else os.urandom(32)) + b"|rs")
    r, s = next(rs), next(rs)
    n = pk.n_domain
    dom = _domain(n.bit_length() - 1)

    mats = builder.compiled(n)
    mats_dev = tuple(
        tuple((jnp.asarray(r), jnp.asarray(i), jnp.asarray(c))
              for r, i, c in mat)
        for mat in mats)
    w_mont = jnp.asarray(FR.encode(w))
    if mesh is None:
        h_sc = _h_pipeline(dom)(w_mont, mats_dev)[: n - 1]
    else:
        h_sc = _h_scalars_dist(mesh, dom, w_mont, mats_dev)[: n - 1]

    if mesh is None:
        if engine is None:
            from ..config import settings

            engine = settings().prover_engine
        if engine not in ("fixed", "lane", "sorted"):
            # an unrecognized OWSHEN_PROVER_ENGINE (e.g. a typo) must not
            # silently fall through to the slow legacy engine (round-4
            # advisor finding)
            raise ValueError(
                f"unknown prover engine {engine!r}: expected fixed|lane|sorted")
        if engine == "fixed" and _fixed_tables_fit(pk):
            return _prove_fixed(pk, builder, w, r, s, h_sc)
        if engine == "fixed":
            engine = "sorted"  # oversized tables: route past the HBM ceiling
    else:
        return _prove_mesh(pk, w, r, s, h_sc, mesh, msm_c, msm_lanes)

    # legacy single-chip engines ("lane"/"sorted"), kept for comparison:
    # pad every MSM to a power-of-two batch so the deposit circuit's
    # three G1 MSMs (m, m-n_pub, n-1 points) share ONE compiled shape
    # (each distinct shape is a fresh ~25 s TPU compile, no cache)
    w_sc = ints_to_array(w)

    def _padded(group, curve):
        inner = _msm_jit(group, msm_c, msm_lanes, engine)

        def call(pts, sc):
            n_in = sc.shape[0]
            n2 = 1 << max(9, (n_in - 1).bit_length())
            if n2 != n_in:
                ident = curve.identity_like(pts[0][0])
                pts = tuple(
                    jnp.concatenate(
                        [a, jnp.broadcast_to(jnp.expand_dims(iz, 0),
                                             (n2 - n_in,) + iz.shape)])
                    for a, iz in zip(pts, ident))
                sc = jnp.concatenate(
                    [sc, jnp.zeros((n2 - n_in,) + sc.shape[1:], sc.dtype)])
            return inner(pts, sc)

        return call

    msm_g1 = _padded("g1", bn254.G1)
    msm_g2 = _padded("g2", bn254.G2)

    # [A]₁ = α + Σ w_i·A_i(τ) + r·δ
    a_acc = msm_g1(pk.a_g1, w_sc)
    a_acc = bn254.G1.add(a_acc, tuple(x[0] for x in pk.alpha_g1))
    a_acc = bn254.G1.add(a_acc, _scale_first(bn254.G1, pk.delta_g1, r))

    # [B]₂ (and its G1 shadow for C)
    b2_acc = msm_g2(pk.b_g2, w_sc)
    b2_acc = bn254.G2.add(b2_acc, tuple(x[0] for x in pk.beta_g2))
    b2_acc = bn254.G2.add(b2_acc, _scale_first(bn254.G2, pk.delta_g2, s))

    b1_acc = msm_g1(pk.b_g1, w_sc)
    b1_acc = bn254.G1.add(b1_acc, tuple(x[0] for x in pk.beta_g1))
    b1_acc = bn254.G1.add(b1_acc, _scale_first(bn254.G1, pk.delta_g1, s))

    # [C]₁ = Σ_priv w_i·K_i + Σ h_i·H_i + s·A + r·B₁ − r·s·δ
    c_acc = msm_g1(pk.h_g1, h_sc)
    if pk.k_g1 is not None:
        c_acc = bn254.G1.add(c_acc, msm_g1(pk.k_g1, w_sc[pk.n_pub:]))
    c_acc = bn254.G1.add(c_acc, _scale_point(bn254.G1, a_acc, s))
    c_acc = bn254.G1.add(c_acc, _scale_point(bn254.G1, b1_acc, r))
    c_acc = bn254.G1.add(
        c_acc, _scale_first(bn254.G1, pk.delta_g1, (-r * s) % P)
    )

    a_aff = bn254.g1_decode(tuple(x[None] for x in a_acc))[0]
    b_aff = bn254.g2_decode(tuple(x[None] for x in b2_acc))[0]
    c_aff = bn254.g1_decode(tuple(x[None] for x in c_acc))[0]
    return Proof(a=a_aff, b=b_aff, c=c_aff)


@functools.lru_cache(maxsize=None)
def _msm_jit(group: str, c: int, lanes: int, engine: str = "lane"):
    """Non-default prover MSM engines, kept for comparison/fallback:
    "lane" = scan-based Pippenger, "sorted" = the chunk-scan sorted engine
    at c=8 (both superseded as prover defaults by the fixed-table engine —
    the round-3 driver artifact measured the lane path's 2^c-step
    weighted-sum scans at 79.6 s on the 265-constraint deposit prove)."""
    curve = bn254.G1 if group == "g1" else bn254.G2
    use_sorted = (engine == "sorted"
                  or os.environ.get("OWSHEN_PROVER_SORTED_MSM") == "1")

    def call(p, sc):
        with _prover_pallas_ctx():
            if use_sorted:
                from ..ops.msm import msm_sorted

                return msm_sorted(curve, p, sc, c=8)
            return msm(curve, p, sc, c=c, lanes=lanes)

    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def _h_pipeline(dom: NttDomain):
    return jax.jit(lambda wm, ms: _h_scalars_device(dom, wm, ms))


@functools.lru_cache(maxsize=None)
def _scalar_mul_jit(group: str):
    curve = bn254.G1 if group == "g1" else bn254.G2
    return jax.jit(curve.scalar_mul)


def _scale_first(curve, pts, k: int):
    """k · pts[0] (single point from a batch-of-1 device array)."""
    p0 = tuple(x[0] for x in pts)
    return _scale_point(curve, p0, k)


def _scale_point(curve, p, k: int):
    bits = FR.to_bits_le(ints_to_array([k % P]), 254)[0]
    bits = bits[::-1]  # MSB-first
    group = "g1" if curve is bn254.G1 else "g2"
    return _scalar_mul_jit(group)(p, bits)


def verify(vk: VerifyingKey, public_inputs: list[int], proof: Proof) -> bool:
    """e(A,B) == e(α,β)·e(IC(pub),γ)·e(C,δ)  (host pairing product)."""
    assert len(public_inputs) == len(vk.ic) - 1
    ic = vk.ic[0]
    for x, pt in zip(public_inputs, vk.ic[1:]):
        ic = ocurve.G1.add(ic, ocurve.G1.mul(pt, x % P))
    neg_a = None if proof.a is None else (proof.a[0], (-proof.a[1]) % bn254.Q)
    return pairing_product_is_one([
        (neg_a, proof.b),
        (vk.alpha_g1, vk.beta_g2),
        (ic, vk.gamma_g2),
        (proof.c, vk.delta_g2),
    ])
