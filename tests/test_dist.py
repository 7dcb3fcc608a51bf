"""Multi-chip collective paths on the virtual 8-device CPU mesh (the
"RamKvStore of meshes", SURVEY.md §4): DistNtt (all_to_all stage exchange),
msm_dist (sharded Pippenger + gather-reduce), merkle_root_dist (subtree
partitioning).  VERDICT r1 #5: these must run in the default suite."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.curves import bn254
from owshen_tpu.fields.field import FR, ints_to_array
from owshen_tpu.oracle import curve as ocurve
from owshen_tpu.oracle import ntt as ontt
from owshen_tpu.ops import merkle
from owshen_tpu.parallel.mesh import make_mesh
from owshen_tpu.parallel.merkle_dist import DistSparseMerkleTree, merkle_root_dist
from owshen_tpu.parallel.msm_dist import msm_dist
from owshen_tpu.parallel.ntt_dist import DistNtt

rng = random.Random(5)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


@pytest.mark.parametrize("d", [2, 4, 8])
def test_dist_ntt_fwd_inv(d):
    mesh = make_mesh(d)
    log_n = 6
    xs = [rng.randrange(FR.p) for _ in range(1 << log_n)]
    dn = DistNtt(mesh, log_n)
    got = FR.decode(dn.ntt(jnp.asarray(FR.encode(xs))))
    assert got == ontt.ntt(xs, dn.omega)
    back = FR.decode(dn.intt(jnp.asarray(FR.encode(got))))
    assert back == xs


@pytest.mark.parametrize("d", [2, 8])
def test_dist_msm(d):
    mesh = make_mesh(d)
    n = 2 * d
    ks = [rng.randrange(500) + 1 for _ in range(n)]
    scalars = [rng.randrange(FR.p) for _ in range(n)]
    pts = [ocurve.G1.mul(ocurve.G1_GEN, k) for k in ks]
    acc = msm_dist(mesh, bn254.G1, bn254.g1_encode(pts),
                   ints_to_array(scalars), c=4, lanes=2)
    got = bn254.g1_decode(tuple(x[None] for x in acc))[0]
    assert got == ocurve.G1.msm(pts, scalars)


@pytest.mark.parametrize("d", [8])
def test_dist_sparse_insert(d):
    """VERDICT r1 #9: dist insert matches oracle_sparse_root on an 8-device
    mesh at depth 16 (two batches, cross-chip indices, overwrite case)."""
    mesh = make_mesh(d)
    depth = 16
    t = DistSparseMerkleTree(mesh, depth)
    entries = {}
    batches = (
        [(0, 111), (3, 222), (40000, 333), (65535, 444)],
        [(1, 555), (40000, 666), (30000, 777)],  # overwrite + new chip
    )
    for batch in batches:
        idxs = [i for i, _ in batch]
        vals = [v for _, v in batch]
        t.insert_ints(idxs, vals)
        entries.update(dict(batch))
        assert t.root_int() == merkle.oracle_sparse_root(entries, depth)


@pytest.mark.parametrize("d", [4, 8])
def test_dist_merkle_root(d):
    mesh = make_mesh(d)
    n = 8 * d
    leaves = [rng.randrange(FR.p) for _ in range(n)]
    root = merkle_root_dist(mesh, jnp.asarray(FR.encode(leaves)), "poseidon")
    want = merkle.oracle_sparse_root(
        dict(enumerate(leaves)), (n - 1).bit_length(), "poseidon")
    assert FR.decode(root[None])[0] == want


def test_prove_dist():
    """Distributed Groth16 prove (BASELINE config 5 'v5p multi-host'): the
    mesh path (msm_dist + DistNtt h-pipeline) is BIT-EXACT vs the
    single-chip prover under the same seed, and the proof verifies."""
    from owshen_tpu.groth16 import groth16
    from owshen_tpu.groth16.r1cs import Builder

    mesh = make_mesh(8)
    b = Builder()
    y = b.pub(49)
    x = b.priv(7)
    b.enforce_eq(b.mul(x, x), y)
    for k in range(32):  # n_domain = 128 so DistNtt shards at d=8
        v = b.priv(k + 2)
        b.enforce_eq(b.mul(v, v), b.priv((k + 2) ** 2))
    assert b.check()
    pk, vk = groth16.setup(b, seed=b"dist-test")
    p_dist = groth16.prove(pk, b, seed=b"d1", msm_c=4, msm_lanes=2, mesh=mesh)
    assert groth16.verify(vk, [49], p_dist)
    p_one = groth16.prove(pk, b, seed=b"d1", msm_c=4, msm_lanes=2)
    assert p_dist == p_one


def test_dist_sparse_duplicate_index_rejected():
    """Duplicate leaf indices within one batch are rejected host-side (the
    colliding scatter's winner is XLA-unspecified — advisor r2 finding)."""
    mesh = make_mesh(8)
    t = DistSparseMerkleTree(mesh, 16)
    with pytest.raises(ValueError, match="unique leaf indices"):
        t.insert_ints([7, 7], [1, 2])
