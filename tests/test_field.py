"""Field-core bit-exactness gates vs the Python-int oracle.

Mirrors the reference's fixture-backed exact-value test style (SURVEY.md §4)
with the oracle standing in for the Rust `ff` field."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.fields.field import FR, FQ, ints_to_array, array_to_ints
from owshen_tpu.oracle import field as ofield

rng = random.Random(1234)


def rand_elems(p, n):
    return [rng.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("F,O", [(FR, ofield.FR), (FQ, ofield.FQ)], ids=["fr", "fq"])
class TestFieldOps:
    N = 32

    def _pairs(self, F):
        xs = rand_elems(F.p, self.N) + [0, 1, F.p - 1, F.p - 2]
        ys = rand_elems(F.p, self.N) + [F.p - 1, 0, F.p - 1, 1]
        return xs, ys

    def test_encode_decode_roundtrip(self, F, O):
        xs, _ = self._pairs(F)
        assert F.decode(F.encode(xs)) == [x % F.p for x in xs]
        a = ints_to_array(xs, F.L)
        assert array_to_ints(a) == [x % F.p for x in xs]

    def test_add_sub_neg(self, F, O):
        xs, ys = self._pairs(F)
        a, b = F.encode(xs), F.encode(ys)
        # add/sub/neg act identically in Montgomery and plain domain
        got = F.decode(jax.jit(F.add)(a, b))
        assert got == [O.add(x, y) for x, y in zip(xs, ys)]
        got = F.decode(jax.jit(F.sub)(a, b))
        assert got == [O.sub(x, y) for x, y in zip(xs, ys)]
        got = F.decode(jax.jit(F.neg)(a))
        assert got == [O.neg(x) for x in xs]

    def test_mul(self, F, O):
        xs, ys = self._pairs(F)
        a, b = F.encode(xs), F.encode(ys)
        got = F.decode(jax.jit(F.mul)(a, b))
        assert got == [O.mul(x, y) for x, y in zip(xs, ys)]

    def test_mont_roundtrip(self, F, O):
        xs, _ = self._pairs(F)
        plain = F.encode(xs, mont=False)
        m = jax.jit(F.to_mont)(plain)
        assert F.decode(m) == [x % F.p for x in xs]
        back = jax.jit(F.from_mont)(m)
        assert F.decode(back, mont=False) == [x % F.p for x in xs]

    def test_inv(self, F, O):
        xs = [x for x in rand_elems(F.p, 8)] + [1, F.p - 1]
        a = F.encode(xs)
        got = F.decode(jax.jit(F.inv)(a))
        assert got == [O.inv(x) for x in xs]

    def test_inv_zero_is_zero(self, F, O):
        assert F.decode(F.inv(F.encode([0])))[0] == 0

    def test_batch_inv(self, F, O):
        xs = rand_elems(F.p, 16) + [0, 5]
        a = F.encode(xs)
        got = F.decode(jax.jit(F.batch_inv)(a))
        want = [O.inv(x) if x else 0 for x in xs]
        assert got == want

    def test_pow(self, F, O):
        xs = rand_elems(F.p, 4)
        e = rng.randrange(1 << 200)
        a = F.encode(xs)
        got = F.decode(jax.jit(lambda v: F.pow_const(v, e))(a))
        assert got == [O.pow(x, e) for x in xs]

    def test_sqrt(self, F, O):
        qrs = [O.mul(x, x) for x in rand_elems(F.p, 6)] + [0, 1, 4]
        non_qr = O.mul(F.generator, 1)  # generator is a non-residue
        xs = qrs + [non_qr]
        a = F.encode(xs)
        r, ok = jax.jit(F.sqrt)(a)
        roots = F.decode(r)
        oks = np.asarray(ok)
        for x, root, k in zip(xs, roots, oks):
            if x in qrs[:len(qrs)] and O.sqrt(x) is not None:
                assert k
                assert O.mul(root, root) == x
        assert not oks[-1]  # non-residue rejected

    def test_predicates(self, F, O):
        a = F.encode([0, 5, 5, 7])
        b = F.encode([0, 5, 7, 5])
        assert list(np.asarray(F.eq(a, b))) == [True, True, False, False]
        assert list(np.asarray(F.is_zero(a))) == [True, False, False, False]

    def test_is_odd_bits(self, F, O):
        xs = [0, 1, 2, 12345678901234567890]
        a = F.encode(xs, mont=False)
        assert list(np.asarray(F.is_odd(a))) == [x % 2 == 1 for x in xs]
        bits = np.asarray(F.to_bits_le(a, 70))
        for i, x in enumerate(xs):
            assert all(int(bits[i, j]) == ((x >> j) & 1) for j in range(70))


def test_field_constants():
    # 2-adicity of Fr is 28 (needed for 2^20 NTT), Fq is p ≡ 3 mod 4
    assert FR.two_adicity == 28
    assert FQ.p % 4 == 3
    # generator matches the reference's PrimeFieldGenerator = 7
    assert FR.generator == 7
