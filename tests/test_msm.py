"""MSM gates: segmented-scan machinery + Pippenger vs naive oracle sum."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.curves import bn254
from owshen_tpu.fields.field import FR, ints_to_array
from owshen_tpu.ops.msm import msm, segmented_scan, plain_scan
from owshen_tpu.oracle import curve as ocurve

rng = random.Random(11)


def _g1_points(ks):
    return [ocurve.G1.mul(ocurve.G1_GEN, k) for k in ks]


def test_segmented_scan_small():
    ks = [rng.randrange(100) + 1 for _ in range(16)]
    pts = _g1_points(ks)
    dev = bn254.g1_encode(pts)
    flags = np.zeros(16, bool)
    flags[[0, 3, 9]] = True
    outs, outf = jax.jit(
        lambda p, f: segmented_scan(bn254.G1, p, f, chunk=4)
    )(dev, jnp.asarray(flags))
    got = bn254.g1_decode(outs)
    # oracle: per-segment running sums
    want = []
    seg = None
    for i in range(16):
        seg = 0 if flags[i] else seg
        seg += ks[i]
        want.append(ocurve.G1.mul(ocurve.G1_GEN, seg))
    assert got == want
    assert np.asarray(outf).all()


def test_plain_scan():
    ks = [rng.randrange(50) for _ in range(8)]
    dev = bn254.g1_encode(_g1_points(ks))
    outs = plain_scan(bn254.G1, dev, chunk=4)
    got = bn254.g1_decode(outs)
    run = np.cumsum(ks)
    want = [ocurve.G1.mul(ocurve.G1_GEN, int(s)) for s in run]
    assert got == want


def test_msm_vs_oracle():
    n = 32
    ks = [rng.randrange(1000) for _ in range(n)]
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    scalars[0] = 0  # exercise zero scalar
    scalars[1] = FR.p - 1
    pts = _g1_points(ks)
    dev_pts = bn254.g1_encode(pts)
    dev_sc = ints_to_array(scalars)
    got = bn254.g1_decode(
        tuple(x[None] for x in jax.jit(
            lambda p, s: msm(bn254.G1, p, s, c=8, lanes=8)
        )(dev_pts, dev_sc))
    )[0]
    want = ocurve.G1.msm(pts, scalars)
    assert got == want


def test_msm_c4():
    # per_limb = 4 digit-extraction path (c=16 is a TPU-scale option:
    # its 2^16-bucket arrays are exercised by bench.py, not the CPU mesh)
    n = 16
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    pts = _g1_points([rng.randrange(500) + 1 for _ in range(n)])
    got = bn254.g1_decode(
        tuple(x[None] for x in jax.jit(
            lambda p, s: msm(bn254.G1, p, s, c=4, lanes=8)
        )(bn254.g1_encode(pts), ints_to_array(scalars)))
    )[0]
    assert got == ocurve.G1.msm(pts, scalars)


def test_msm_g2():
    n = 8
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    pts = [ocurve.G2.mul(ocurve.G2_GEN, rng.randrange(100) + 1) for _ in range(n)]
    got = bn254.g2_decode(
        tuple(x[None] for x in jax.jit(
            lambda p, s: msm(bn254.G2, p, s, c=8, lanes=4)
        )(bn254.g2_encode(pts), ints_to_array(scalars)))
    )[0]
    want = None
    for pt, s in zip(pts, scalars):
        want = ocurve.G2.add(want, ocurve.G2.mul(pt, s))
    assert got == want


def test_msm_sorted_vs_oracle():
    """Window-serial sorted engine (the 2^22 TPU path) at CPU-testable c:
    c=8 (the TPU config's structure with a smaller boundary batch) and c=4,
    G1 and G2, including zero / p-1 / high-bit scalars."""
    from owshen_tpu.ops.msm import msm_sorted

    n = 70
    ks = [rng.randrange(1000) + 1 for _ in range(n)]
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = FR.p - 1
    scalars[2] = 1
    scalars[3] = 1 << 253
    pts = _g1_points(ks)
    want = ocurve.G1.msm(pts, scalars)
    dev_p, dev_s = bn254.g1_encode(pts), ints_to_array(scalars)
    got = bn254.g1_decode(tuple(x[None] for x in jax.jit(
        lambda p, s: msm_sorted(bn254.G1, p, s, c=8)
    )(dev_p, dev_s)))[0]
    assert got == want, "msm_sorted c=8"


@pytest.mark.slow
def test_msm_sorted_c4():
    # each msm_sorted variant costs a multi-minute cold CPU-XLA compile;
    # the default suite gates c=8 (same structure, m=128)
    from owshen_tpu.ops.msm import msm_sorted

    n = 40
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    pts = _g1_points([rng.randrange(500) + 1 for _ in range(n)])
    got = bn254.g1_decode(tuple(x[None] for x in jax.jit(
        lambda p, s: msm_sorted(bn254.G1, p, s, c=4)
    )(bn254.g1_encode(pts), ints_to_array(scalars))))[0]
    assert got == ocurve.G1.msm(pts, scalars)


@pytest.mark.slow
def test_msm_sorted_g2():
    from owshen_tpu.ops.msm import msm_sorted

    n = 20
    pts = [ocurve.G2.mul(ocurve.G2_GEN, rng.randrange(100) + 1)
           for _ in range(n)]
    sc = [rng.randrange(FR.p) for _ in range(n)]
    got = bn254.g2_decode(tuple(x[None] for x in jax.jit(
        lambda p, s: msm_sorted(bn254.G2, p, s, c=8)
    )(bn254.g2_encode(pts), ints_to_array(sc))))[0]
    want = None
    for pt, s in zip(pts, sc):
        want = ocurve.G2.add(want, ocurve.G2.mul(pt, s))
    assert got == want


@pytest.mark.slow
def test_msm_large_window_split_path():
    """The legacy lane-scan engine's two_c > 512 hi/lo split (c=16) was
    never executed before (advisor r2 finding): gate it against the oracle
    at a tiny n so the split algebra ships tested.  slow-marked (479 s of
    CPU compile for a comparison-only engine)."""
    n = 8
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    pts = _g1_points([rng.randrange(300) + 1 for _ in range(n)])
    got = bn254.g1_decode(tuple(x[None] for x in jax.jit(
        lambda p, s: msm(bn254.G1, p, s, c=16, lanes=4)
    )(bn254.g1_encode(pts), ints_to_array(scalars))))[0]
    assert got == ocurve.G1.msm(pts, scalars)


# ---------------------------------------------------------------------------
# Fixed-point MSM (precomputed window tables — the prover's engine)
# ---------------------------------------------------------------------------

def test_msm_fixed_g1_vs_oracle():
    from owshen_tpu.ops.msm_fixed import FixedMsm

    n = 37  # non-power-of-two: exercises identity padding
    ks = [rng.randrange(1, 10000) for _ in range(n)]
    pts = _g1_points(ks)
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    fx = FixedMsm(bn254.G1, bn254.g1_encode(pts))
    got = bn254.g1_decode_host(fx.mul(jnp.asarray(ints_to_array(scalars))))
    assert got == ocurve.G1.msm(pts, scalars)
    # short scalar batches zero-pad (the k_g1 private-var slice path)
    got2 = bn254.g1_decode_host(
        fx.mul(jnp.asarray(ints_to_array(scalars[:5]))))
    assert got2 == ocurve.G1.msm(pts[:5], scalars[:5])
    # all-zero scalars -> identity
    assert bn254.g1_decode_host(
        fx.mul(jnp.zeros((n, 16), jnp.uint32))) is None


def test_msm_fixed_g2_vs_oracle():
    from owshen_tpu.ops.msm_fixed import FixedMsm

    n = 9
    pts = [ocurve.G2.mul(ocurve.G2_GEN, rng.randrange(1, 500))
           for _ in range(n)]
    sc = [rng.randrange(FR.p) for _ in range(n)]
    fx = FixedMsm(bn254.G2, bn254.g2_encode(pts))
    got = bn254.g2_decode_host(fx.mul(jnp.asarray(ints_to_array(sc))))
    want = None
    for pt, s in zip(pts, sc):
        want = ocurve.G2.add(want, ocurve.G2.mul(pt, s))
    assert got == want


def test_msm_fixed_shared_compile_cache():
    """Same-shape point sets share ONE compiled mul fn (tables ride in as
    arguments) — the property that bounds the prover's TPU compile cost."""
    from owshen_tpu.ops.msm_fixed import FixedMsm, _mul_jit

    pts_a = _g1_points([3, 5, 7, 11])
    pts_b = _g1_points([13, 17, 19, 23])
    fa = FixedMsm(bn254.G1, bn254.g1_encode(pts_a))
    fb = FixedMsm(bn254.G1, bn254.g1_encode(pts_b))
    assert _mul_jit(bn254.G1, 4, fa.n) is _mul_jit(bn254.G1, 4, fb.n)
    sc = [rng.randrange(FR.p) for _ in range(4)]
    ga = bn254.g1_decode_host(fa.mul(jnp.asarray(ints_to_array(sc))))
    gb = bn254.g1_decode_host(fb.mul(jnp.asarray(ints_to_array(sc))))
    assert ga == ocurve.G1.msm(pts_a, sc)
    assert gb == ocurve.G1.msm(pts_b, sc)
