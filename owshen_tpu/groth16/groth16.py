"""Groth16 prover orchestration: host witness/setup, TPU NTT + MSM hot path.

Net-new vs the reference snapshot (SURVEY.md §0: the Groth16 prover of the
original Owshen wallet is absent); BASELINE config 5.  The prove-time compute
is >99% NTT + MSM (SURVEY.md §7.4.5), so:

  * witness generation + sparse matvecs: host (branchy, tiny);
  * QAP h(x) computation: device NTTs over the evaluation domain (coset
    trick: h = intt_coset((A·B - C)·Z⁻¹));
  * commitments [A]₁ [B]₂ [C]₁: device Pippenger MSMs;
  * verification: host pairing product (groth16/pairing.py).

Setup here is a *simulated* trusted setup from a seed — fine for a proving
library (the ceremony is out of scope, as it is for the reference)."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import bn254
from ..fields.field import FR, ints_to_array
from ..ops.msm import msm, pad_to_pow2
from ..ops.ntt import NttDomain
from ..oracle import curve as ocurve
from .pairing import pairing_product_is_one
from .r1cs import Builder

P = FR.p


def _rand_stream(seed: bytes):
    i = 0
    while True:
        v = int.from_bytes(hashlib.sha256(seed + i.to_bytes(4, "le")).digest(), "be") % P
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
    """L_j(τ) for j<n over the radix-2 domain: Zh(τ)·ω^j / (n·(τ−ω^j))."""
    zh = (pow(tau, n, P) - 1) % P
    out = []
    wj = 1
    n_inv = pow(n, -1, P)
    for _ in range(n):
        out.append(zh * wj % P * pow((tau - wj) % P, -1, P) % P * n_inv % P)
        wj = wj * omega % P
    return out


def _g1_batch_device(exponents):
    """[ints] -> device projective G1 points (batched fixed-base mul)."""
    n = len(exponents)
    base = bn254.g1_encode([ocurve.G1_GEN] * n)
    bits = FR.to_bits_le(ints_to_array([e % P for e in exponents]), 254)
    bits = jnp.moveaxis(bits, -1, 0)[::-1]
    return jax.jit(bn254.G1.scalar_mul)(base, bits)


def _g2_batch_device(exponents):
    n = len(exponents)
    base = bn254.g2_encode([ocurve.G2_GEN] * n)
    bits = FR.to_bits_le(ints_to_array([e % P for e in exponents]), 254)
    bits = jnp.moveaxis(bits, -1, 0)[::-1]
    return jax.jit(bn254.G2.scalar_mul)(base, bits)


def setup(builder: Builder, seed: bytes = b"owshen-tpu-setup"):
    """Simulated trusted setup -> (ProvingKey, VerifyingKey)."""
    rs = _rand_stream(seed)
    tau, alpha, beta, gamma, delta = (next(rs) for _ in range(5))
    m = builder.num_vars
    n_pub = builder.n_pub + 1  # include the constant wire
    n = 1 << max(1, (len(builder.constraints) - 1).bit_length())
    dom = NttDomain(n.bit_length() - 1)
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


def _matvec_evals(constraints, which: int, w, n: int):
    """Per-constraint sparse LC·w evaluations, padded to n (host)."""
    out = [0] * n
    for j, rows in enumerate(constraints):
        out[j] = rows[which].eval(w)
    return out


def _h_coeffs_device(dom: NttDomain, a_e, b_e, c_e):
    """h = ((A·B - C)·Z⁻¹ on coset) -> coefficients (device)."""
    F = FR
    a_c = dom.intt(a_e)
    b_c = dom.intt(b_e)
    c_c = dom.intt(c_e)
    a_s = dom.coset_ntt(a_c)
    b_s = dom.coset_ntt(b_c)
    c_s = dom.coset_ntt(c_c)
    zinv = jnp.asarray(F.const(dom.z_on_coset_inv()))
    h_s = F.mul(F.sub(F.mul(a_s, b_s), c_s), zinv[None])
    return dom.coset_intt(h_s)


def prove(pk: ProvingKey, builder: Builder, seed: bytes = b"owshen-tpu-prove",
          msm_c: int = 8, msm_chunk: int = 256) -> Proof:
    """Generate a proof from a fully-assigned builder."""
    w = builder.witness()
    rs = _rand_stream(seed + b"|rs")
    r, s = next(rs), next(rs)
    n = pk.n_domain
    dom = NttDomain(n.bit_length() - 1)

    a_e = FR.encode(_matvec_evals(builder.constraints, 0, w, n))
    b_e = FR.encode(_matvec_evals(builder.constraints, 1, w, n))
    c_e = FR.encode(_matvec_evals(builder.constraints, 2, w, n))
    h_c = jax.jit(lambda a, b, c: _h_coeffs_device(dom, a, b, c))(a_e, b_e, c_e)
    # decode h coefficients to canonical scalars for the MSM
    h_scalars_int = FR.decode(h_c)[: n - 1]

    w_sc = ints_to_array(w)
    run_msm = jax.jit(lambda p, sc: msm(bn254.G1, p, sc, c=msm_c, chunk=msm_chunk))

    def msm_g1(points, scalars_int):
        pts, sc = pad_to_pow2(points, ints_to_array(scalars_int), bn254.G1)
        return run_msm(pts, sc)

    # [A]₁ = α + Σ w_i·A_i(τ) + r·δ
    pts_a, sc_a = pad_to_pow2(pk.a_g1, w_sc, bn254.G1)
    a_acc = run_msm(pts_a, sc_a)
    a_acc = bn254.G1.add(a_acc, tuple(x[0] for x in pk.alpha_g1))
    a_acc = bn254.G1.add(a_acc, _scale_first(bn254.G1, pk.delta_g1, r))

    # [B]₂ (and its G1 shadow for C)
    pts_b2, sc_b = pad_to_pow2(pk.b_g2, w_sc, bn254.G2)
    b2_acc = jax.jit(lambda p, sc: msm(bn254.G2, p, sc, c=msm_c, chunk=msm_chunk))(pts_b2, sc_b)
    b2_acc = bn254.G2.add(b2_acc, tuple(x[0] for x in pk.beta_g2))
    b2_acc = bn254.G2.add(b2_acc, _scale_first(bn254.G2, pk.delta_g2, s))

    pts_b1, _ = pad_to_pow2(pk.b_g1, w_sc, bn254.G1)
    b1_acc = run_msm(pts_b1, sc_b)
    b1_acc = bn254.G1.add(b1_acc, tuple(x[0] for x in pk.beta_g1))
    b1_acc = bn254.G1.add(b1_acc, _scale_first(bn254.G1, pk.delta_g1, s))

    # [C]₁ = Σ_priv w_i·K_i + Σ h_i·H_i + s·A + r·B₁ − r·s·δ
    c_acc = msm_g1(pk.h_g1, h_scalars_int)
    if pk.k_g1 is not None:
        c_acc = bn254.G1.add(c_acc, msm_g1(pk.k_g1, w[pk.n_pub:]))
    c_acc = bn254.G1.add(c_acc, _scale_point(bn254.G1, a_acc, s))
    c_acc = bn254.G1.add(c_acc, _scale_point(bn254.G1, b1_acc, r))
    c_acc = bn254.G1.add(
        c_acc, _scale_first(bn254.G1, pk.delta_g1, (-r * s) % P)
    )

    a_aff = bn254.g1_decode(tuple(x[None] for x in a_acc))[0]
    b_aff = bn254.g2_decode(tuple(x[None] for x in b2_acc))[0]
    c_aff = bn254.g1_decode(tuple(x[None] for x in c_acc))[0]
    return Proof(a=a_aff, b=b_aff, c=c_aff)


def _scale_first(curve, pts, k: int):
    """k · pts[0] (single point from a batch-of-1 device array)."""
    p0 = tuple(x[0] for x in pts)
    return _scale_point(curve, p0, k)


def _scale_point(curve, p, k: int):
    bits = FR.to_bits_le(ints_to_array([k % P]), 254)[0]
    bits = bits[::-1]  # MSB-first
    return curve.scalar_mul(p, bits)


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
