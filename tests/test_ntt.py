"""NTT gates: oracle bit-exactness, involution, convolution theorem."""

import random

import jax
import numpy as np

from owshen_tpu.fields.field import FR
from owshen_tpu.ops.ntt import NttDomain, powers_device
from owshen_tpu.oracle import ntt as ontt

rng = random.Random(5)


def test_powers_device():
    base = rng.randrange(FR.p)
    got = FR.decode(powers_device(FR, base, 16))
    assert got == [pow(base, i, FR.p) for i in range(16)]


def test_ntt_vs_oracle():
    for log_n in (3, 6):
        n = 1 << log_n
        dom = NttDomain(log_n)
        xs = [rng.randrange(FR.p) for _ in range(n)]
        got = FR.decode(jax.jit(dom.ntt)(FR.encode(xs)))
        assert got == ontt.ntt(xs)


def test_intt_roundtrip():
    dom = NttDomain(8)
    xs = [rng.randrange(FR.p) for _ in range(256)]
    enc = FR.encode(xs)
    back = FR.decode(jax.jit(lambda v: dom.intt(dom.ntt(v)))(enc))
    assert back == xs


def test_convolution_theorem():
    """NTT(a)·NTT(b) == NTT(a*b) for polynomials with deg sum < n."""
    log_n, half = 4, 8
    dom = NttDomain(log_n)
    a = [rng.randrange(FR.p) for _ in range(half)] + [0] * half
    b = [rng.randrange(FR.p) for _ in range(half)] + [0] * half
    prod_evals = FR.mul(dom.ntt(FR.encode(a)), dom.ntt(FR.encode(b)))
    got = FR.decode(dom.intt(prod_evals))
    want = ontt.poly_mul(a[:half], b[:half])
    want = want + [0] * (16 - len(want))
    assert got == want


def test_coset_roundtrip_and_vanishing():
    dom = NttDomain(5)
    xs = [rng.randrange(FR.p) for _ in range(32)]
    enc = FR.encode(xs)
    back = FR.decode(jax.jit(lambda v: dom.coset_intt(dom.coset_ntt(v)))(enc))
    assert back == xs
    # Z_H(g·ω^i) is the same nonzero constant at every coset point
    z = (pow(dom.coset_gen, dom.n, FR.p) - 1) % FR.p
    assert z != 0
    assert dom.z_on_coset_inv() == pow(z, -1, FR.p)


def test_ntt_bailey_xla_path():
    """log_n > 14 routes the XLA path through the 4-step Bailey split with
    scan-form sub-transforms (the 2^20 bench shape, shrunk): gate fwd+inv
    against the oracle at n = 2^16 with a structured input."""
    log_n = 16
    n = 1 << log_n
    dom = NttDomain(log_n)
    base = [rng.randrange(FR.p) for _ in range(64)]
    xs = [base[i % 64] + i % 97 for i in range(n)]
    enc = FR.encode(xs)
    got = FR.decode(jax.jit(dom.ntt)(enc))
    assert got == ontt.ntt(xs)
    back = FR.decode(jax.jit(dom.intt)(jax.numpy.asarray(
        FR.encode(got))))
    assert back == [x % FR.p for x in xs]
