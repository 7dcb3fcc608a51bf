"""Merkle state-machine gates vs the Python oracle (BASELINE configs 1-2)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from owshen_tpu.fields.field import FR
from owshen_tpu.ops import merkle
from owshen_tpu.oracle import hash as ohash

rng = random.Random(99)


def test_dense_root_mimc():
    # config 1 shape: MiMC7 2-to-1 nodes; tiny tree, exact vs oracle
    leaves_int = [rng.randrange(FR.p) for _ in range(8)]
    root = merkle.merkle_root(jnp.asarray(FR.encode(leaves_int)), "mimc")
    lvl = leaves_int
    while len(lvl) > 1:
        lvl = [ohash.mimc7_multi([lvl[i], lvl[i + 1]]) for i in range(0, len(lvl), 2)]
    assert FR.decode(root[None])[0] == lvl[0]


def test_dense_root_poseidon_and_paths():
    leaves_int = [rng.randrange(FR.p) for _ in range(16)]
    leaves = jnp.asarray(FR.encode(leaves_int))
    levels = merkle.build_levels(leaves, "poseidon")
    root = levels[-1][0]
    idx = jnp.asarray([0, 5, 15], jnp.int32)
    sibs, bits = merkle.merkle_path(levels, idx)
    leaf = jnp.take(leaves, idx, axis=0)
    ok = merkle.verify_path(leaf, sibs, bits, root[None], "poseidon")
    assert np.asarray(ok).all()
    # corrupt one leaf -> reject
    bad = FR.add(leaf, jnp.asarray(FR.encode([1, 1, 1])))
    ok = merkle.verify_path(bad, sibs, bits, root[None], "poseidon")
    assert not np.asarray(ok).any()


def test_zero_hashes_match_empty_tree():
    zh = merkle.zero_hashes(4, "poseidon")
    t = merkle.SparseMerkleTree(4, "poseidon")
    assert t.root_int() == zh[4]
    assert zh[1] == ohash.poseidon([0, 0])


def test_sparse_insert_matches_oracle():
    depth = 6
    t = merkle.SparseMerkleTree(depth, "poseidon")
    entries = {}
    # two batches, including sibling-pair and duplicate-parent cases
    for batch in ([(3, 111), (2, 222), (40, 333)], [(41, 444), (0, 555)]):
        idxs = [i for i, _ in batch]
        vals = [v for _, v in batch]
        t.insert_ints(idxs, vals)
        entries.update(dict(batch))
        assert t.root_int() == merkle.oracle_sparse_root(entries, depth)


def test_sparse_paths_verify():
    depth = 8
    t = merkle.SparseMerkleTree(depth, "poseidon")
    idxs = [7, 8, 200, 255]
    vals = [rng.randrange(FR.p) for _ in idxs]
    t.insert_ints(idxs, vals)
    sibs, bits = t.path(idxs)
    ok = merkle.verify_path(t.leaf(idxs), sibs, bits, t.root[None], "poseidon")
    assert np.asarray(ok).all()


def test_sparse_overwrite():
    t = merkle.SparseMerkleTree(5, "poseidon")
    t.insert_ints([3], [10])
    t.insert_ints([3], [20])
    assert t.root_int() == merkle.oracle_sparse_root({3: 20}, 5)


def test_smt_duplicate_index_rejected():
    """Duplicate leaf indices within one batch would race the scatter with
    an XLA-unspecified winner — the host API rejects them."""
    import pytest

    from owshen_tpu.ops.merkle import SparseMerkleTree

    t = SparseMerkleTree(4, "poseidon")
    with pytest.raises(ValueError, match="unique leaf indices"):
        t.insert_ints([3, 3], [1, 2])
    # split across batches = deterministic last-wins
    t.insert_ints([3], [1])
    t.insert_ints([3], [2])
    from owshen_tpu.ops.merkle import oracle_sparse_root

    assert t.root_int() == oracle_sparse_root({3: 2}, 4)
