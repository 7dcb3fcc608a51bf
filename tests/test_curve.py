"""Curve-layer gates: device G1/G2/BabyJubJub ops vs the Python oracle,
mirroring the reference's algebra-identity tests (babyjubjub/tests.rs:4-51)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.curves import bn254, babyjubjub as jub
from owshen_tpu.fields.field import FR, FQ, ints_to_array
from owshen_tpu.oracle import curve as ocurve
from owshen_tpu.oracle import eddsa as oeddsa

rng = random.Random(7)


class TestG1:
    def _pts(self, ks):
        return [ocurve.G1.mul(ocurve.G1_GEN, k) for k in ks]

    def test_add_double_vs_oracle(self):
        ks = [1, 2, 5, rng.randrange(FR.p)]
        pts = self._pts(ks)
        dev = bn254.g1_encode(pts)
        got = bn254.g1_decode(jax.jit(bn254.G1.add)(dev, dev))
        want = [ocurve.G1.add(p, p) for p in pts]
        assert got == want
        got = bn254.g1_decode(jax.jit(bn254.G1.double)(dev))
        assert got == want

    def test_add_identity_and_inverse(self):
        pts = self._pts([3, 9])
        dev = bn254.g1_encode(pts)
        ident = bn254.g1_encode([None, None])
        got = bn254.g1_decode(bn254.G1.add(dev, ident))
        assert got == pts
        neg = bn254.G1.neg(dev)
        got = bn254.g1_decode(bn254.G1.add(dev, neg))
        assert got == [None, None]

    def test_mixed_addition(self):
        ka, kb = rng.randrange(FR.p), rng.randrange(FR.p)
        pa, pb = self._pts([ka, kb])
        got = bn254.g1_decode(
            bn254.G1.add(bn254.g1_encode([pa]), bn254.g1_encode([pb]))
        )[0]
        assert got == ocurve.G1.add(pa, pb)

    def test_scalar_mul(self):
        ks = [0, 1, 2, rng.randrange(FR.p)]
        base = bn254.g1_encode([ocurve.G1_GEN] * len(ks))
        bits = FR.to_bits_le(ints_to_array(ks), 254)
        bits = jnp.moveaxis(bits, -1, 0)[::-1]
        got = bn254.g1_decode(jax.jit(bn254.G1.scalar_mul)(base, bits))
        want = [ocurve.G1.mul(ocurve.G1_GEN, k) for k in ks]
        assert got == want

    def test_sum_reduce(self):
        ks = [rng.randrange(1000) for _ in range(7)]
        pts = self._pts(ks)
        dev = bn254.g1_encode(pts)
        s = bn254.G1.sum_reduce(tuple(c[:, None] for c in dev))
        got = bn254.g1_decode(tuple(c for c in s))[0]
        assert got == ocurve.G1.mul(ocurve.G1_GEN, sum(ks))


class TestG2:
    def test_add_double_scalar(self):
        k = rng.randrange(FR.p)
        p2 = ocurve.G2.mul(ocurve.G2_GEN, 7)
        dev = bn254.g2_encode([ocurve.G2_GEN, p2])
        got = bn254.g2_decode(jax.jit(bn254.G2.double)(dev))
        want = [ocurve.G2.add(ocurve.G2_GEN, ocurve.G2_GEN), ocurve.G2.add(p2, p2)]
        assert got == want
        # scalar mul on one point
        base = bn254.g2_encode([ocurve.G2_GEN])
        bits = FR.to_bits_le(ints_to_array([k]), 254)
        bits = jnp.moveaxis(bits, -1, 0)[::-1]
        got = bn254.g2_decode(jax.jit(bn254.G2.scalar_mul)(base, bits))[0]
        assert got == ocurve.G2.mul(ocurve.G2_GEN, k)


class TestBabyJubJub:
    def test_algebra_identities(self):
        """(2G+G)+G == 2(2G) == 4G — the reference's test
        (babyjubjub/tests.rs:4-30)."""
        g = jub.encode_points([jub.BASE])
        g2 = jub.double(g)
        g3 = jub.add(g2, g)
        g4a = jub.decode_points(jub.add(g3, g))
        g4b = jub.decode_points(jub.double(g2))
        want = ocurve.jub_mul(ocurve.JUB_BASE, 4)
        assert g4a[0] == want and g4b[0] == want

    def test_scalar_mul_vs_oracle(self):
        ks = [0, 1, 8, rng.randrange(jub.ORDER)]
        base = jub.encode_points([jub.BASE] * len(ks))
        got = jub.decode_points(
            jax.jit(jub.scalar_mul_int)(base, ints_to_array(ks))
        )
        want = [ocurve.jub_mul(ocurve.JUB_BASE, k) for k in ks]
        assert got == want

    def test_compress_decompress_roundtrip(self):
        """reference babyjubjub/tests.rs:33-38."""
        ks = [1, 2, 3, 123456789]
        pts = [ocurve.jub_mul(ocurve.JUB_BASE, k) for k in ks]
        x, y, z = jub.encode_points(pts)
        cx, odd = jub.compress(x, y)
        rx, ry, ok = jax.jit(jub.decompress)(cx, odd)
        assert np.asarray(ok).all()
        got = list(zip(FR.decode(rx), FR.decode(ry)))
        assert got == pts

    @pytest.mark.parametrize("mode", ["placeholder", "poseidon"])
    def test_eddsa_accept_reject(self, mode):
        """reference babyjubjub/tests.rs:41-51 (accept + tamper-reject)."""
        sk = [rng.randrange(jub.SUBORDER) for _ in range(2)]
        msgs = [123, rng.randrange(FR.p)]
        sigs = [oeddsa.sign(a, rng.randrange(FR.p), m, mode) for a, m in zip(sk, msgs)]
        pks = [oeddsa.to_pub(a) for a in sk]
        assert all(oeddsa.verify(pk, m, R, s, mode) for pk, m, (R, s) in zip(pks, msgs, sigs))

        pk_dev = jub.encode_points(pks)
        r_dev = jub.encode_points([R for R, _ in sigs])
        s_dev = ints_to_array([s for _, s in sigs])
        msg_dev = FR.encode(msgs)
        ok = jax.jit(lambda *a: jub.eddsa_verify(*a, hash_mode=mode))(
            (pk_dev[0], pk_dev[1]), msg_dev, (r_dev[0], r_dev[1]), s_dev
        )
        assert np.asarray(ok).all()
        # tampered message must reject
        bad_msg = FR.encode([m + 1 for m in msgs])
        ok = jub.eddsa_verify(
            (pk_dev[0], pk_dev[1]), bad_msg, (r_dev[0], r_dev[1]), s_dev,
            hash_mode=mode,
        )
        assert not np.asarray(ok).any()


def test_eddsa_sign_batch_vs_oracle():
    """Batched device sign == host oracle sign, bit for bit (R and s), and
    the signatures verify through the batched device verifier.  Reference
    semantics anchor: mod.rs:210-236."""
    import jax.numpy as jnp

    from owshen_tpu.curves import babyjubjub as jub
    from owshen_tpu.fields.field import FR, ints_to_array
    from owshen_tpu.oracle import eddsa as oeddsa

    rng = random.Random(77)
    n = 4
    privs = [rng.randrange(1, FR.p) for _ in range(n)]
    rands = [rng.randrange(FR.p) for _ in range(n)]
    msgs = [rng.randrange(FR.p) for _ in range(n)]
    got = jub.eddsa_sign_batch(privs, rands, msgs)
    for (R, s), a, rnd, m in zip(got, privs, rands, msgs):
        R_o, s_o = oeddsa.sign(a, rnd, m)
        assert R == R_o and s == s_o
        assert oeddsa.verify(oeddsa.to_pub(a), m, R, s)
    # device batch verify accepts all of them
    pubs = [oeddsa.to_pub(a) for a in privs]
    ok = jub.eddsa_verify(
        (jnp.asarray(FR.encode([p[0] for p in pubs])),
         jnp.asarray(FR.encode([p[1] for p in pubs]))),
        jnp.asarray(FR.encode(msgs)),
        (jnp.asarray(FR.encode([R[0] for R, _ in got])),
         jnp.asarray(FR.encode([R[1] for R, _ in got]))),
        jnp.asarray(ints_to_array([s for _, s in got])))
    import numpy as np

    assert np.asarray(ok).all()
