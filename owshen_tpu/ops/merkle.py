"""Merkle state machine over BN254 Fr: dense roots + sparse batch insertion.

This is the TPU-resident replacement for the role LevelDB plays in the
reference node (reference: src/db/disk.rs:26-63 — the persistent state the
privacy pool commits into), re-designed per SURVEY.md §7.2.4: instead of a
key-value store walked pointer-by-pointer, the tree lives as dense per-level
device arrays and every update is a batched hash + scatter, so the VPU sees
one wide hash kernel per level rather than a scalar chase.

  * ``merkle_root`` / ``build_levels``: dense bottom-up tree (BASELINE
    config 1 — MiMC7, 20 levels).
  * ``SparseMerkleTree``: fixed-depth sparse tree with zero-subtree
    defaults stored densely on device; ``batch_insert`` scatters k leaves
    and re-hashes only the k dirty paths per level (duplicate parents are
    recomputed redundantly but identically — idempotent scatter, no dedup
    branch needed).  BASELINE config 2 (Poseidon, 2^16 leaves).
  * ``merkle_path`` / ``verify_path``: authentication paths, batched.

Multi-chip subtree partitioning (index-prefix sharding + collective top
levels) lives in parallel/merkle_dist.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import FR, ints_to_array
from ..oracle import hash as ohash
from .hash import mimc_hash2, poseidon_hash2

HASH2 = {"poseidon": poseidon_hash2, "mimc": mimc_hash2}
HASH2_ORACLE = {
    "poseidon": lambda l, r: ohash.poseidon([l, r]),
    "mimc": lambda l, r: ohash.mimc7_multi([l, r]),
}


@functools.lru_cache(maxsize=None)
def zero_hashes(depth: int, hash_name: str = "poseidon") -> tuple[int, ...]:
    """zero_hashes[l] = root of an all-zero subtree of height l (host ints)."""
    h2 = HASH2_ORACLE[hash_name]
    out = [0]
    for _ in range(depth):
        out.append(h2(out[-1], out[-1]))
    return tuple(out)


def build_levels(leaves, hash_name: str = "poseidon"):
    """Dense tree: leaves uint32[n, L] (Montgomery, n a power of two) ->
    list of levels [leaves, ..., root_level[1, L]]."""
    h2 = HASH2[hash_name]
    levels = [leaves]
    x = leaves
    while x.shape[0] > 1:
        x = h2(x[0::2], x[1::2])
        levels.append(x)
    return levels


def merkle_root(leaves, hash_name: str = "poseidon"):
    """Root of the dense tree over uint32[n, L] Montgomery leaves."""
    return build_levels(leaves, hash_name)[-1][0]


def merkle_path(levels, indices):
    """Authentication paths for a batch of leaf indices.

    levels: output of build_levels; indices: int32[k].
    Returns (siblings uint32[k, depth, L], bits uint32[k, depth]) where
    bits[i, l] = 1 iff the node is the RIGHT child at level l (matches
    circuits/gadgets.py merkle_path_gadget convention)."""
    sibs, bits = [], []
    idx = indices
    for lvl in levels[:-1]:
        sibs.append(jnp.take(lvl, idx ^ 1, axis=0))
        bits.append(idx & 1)
        idx = idx >> 1
    return jnp.stack(sibs, axis=1), jnp.stack(bits, axis=1).astype(jnp.uint32)


def verify_path(leaf, siblings, bits, root, hash_name: str = "poseidon"):
    """Recompute root from (leaf, path) and compare. All args batched [k,...]."""
    h2 = HASH2[hash_name]
    node = leaf

    def body(node, inp):
        sib, bit = inp
        right = (bit != 0)
        l = FR.select(right, sib, node)
        r = FR.select(right, node, sib)
        return h2(l, r), None

    sib_t = jnp.moveaxis(siblings, 1, 0)  # (depth, k, L)
    bit_t = jnp.moveaxis(bits, 1, 0)
    node, _ = jax.lax.scan(body, node, (sib_t, bit_t))
    return FR.eq(node, root)


class SparseMerkleTree:
    """Fixed-depth sparse Merkle tree, stored densely on device in implicit
    binary-heap layout: one uint32[2^(depth+1), L] array, root at node 1,
    leaf i at node 2^depth + i, children of j at (2j, 2j+1).

    Conceptually sparse (all leaves default to 0 / zero-subtree hashes, the
    standard SMT trick), physically one dense array so (a) the whole tree is
    a single pytree leaf living permanently on device, and (b) the batch
    insert walks levels as a ``lax.scan`` whose body is ONE batched hash +
    gather/scatter — the per-level shapes are identical (k dirty nodes), so
    XLA compiles a single hash instance regardless of depth.  depth=16 ->
    2^16 leaves (BASELINE config 2); 8 MB at 16 limbs, well within HBM.

    Duplicate parents in a batch (sibling leaves both updated) are simply
    recomputed redundantly-but-identically — idempotent scatter, no dedup
    branch, which is what a SIMD lane wants.
    """

    def __init__(self, depth: int, hash_name: str = "poseidon"):
        self.depth = depth
        self.hash_name = hash_name
        zh = zero_hashes(depth, hash_name)
        self.zero_hashes = zh
        # node j at level l (leaves = level 0) sits at heap index
        # 2^(depth-l) + j; fill each level with its zero-subtree hash
        init = np.zeros((1 << (depth + 1), FR.L), np.uint32)
        for l in range(depth + 1):
            row = ints_to_array([FR.to_mont_int(zh[l])])[0]
            lo = 1 << (depth - l)
            init[lo : 2 * lo] = row
        self.nodes = jnp.asarray(init)
        self._insert_fn = jax.jit(self._batch_insert_impl)
        self._path_fn = jax.jit(self._path_impl)

    # ---------- device kernels ----------

    def _batch_insert_impl(self, nodes, indices, values):
        h2 = HASH2[self.hash_name]
        j = indices + (1 << self.depth)
        nodes = nodes.at[j].set(values)

        def body(carry, _):
            nodes, j = carry
            p = j >> 1
            h = h2(jnp.take(nodes, p << 1, axis=0),
                   jnp.take(nodes, (p << 1) | 1, axis=0))
            return (nodes.at[p].set(h), p), None

        (nodes, _), _ = jax.lax.scan(body, (nodes, j), None, length=self.depth)
        return nodes

    def _path_impl(self, nodes, indices):
        j = indices + (1 << self.depth)

        def body(j, _):
            sib = jnp.take(nodes, j ^ 1, axis=0)
            return j >> 1, (sib, (j & 1).astype(jnp.uint32))

        _, (sibs, bits) = jax.lax.scan(body, j, None, length=self.depth)
        return jnp.moveaxis(sibs, 0, 1), jnp.moveaxis(bits, 0, 1)

    # ---------- host API ----------

    def batch_insert(self, indices, values):
        """indices: int32[k] (device or host, UNIQUE within the batch);
        values: uint32[k, L] Montgomery.

        Duplicate indices in one batch would race through the leaf scatter
        with an XLA-unspecified winner; they are rejected host-side.  Split
        duplicates across calls for deterministic last-wins."""
        host_idx = np.asarray(indices)
        if len(np.unique(host_idx)) != host_idx.size:
            raise ValueError(
                "batch_insert requires unique leaf indices within a batch")
        indices = jnp.asarray(indices, jnp.int32)
        self.nodes = self._insert_fn(self.nodes, indices, values)

    def insert_ints(self, indices, values_int):
        self.batch_insert(indices, jnp.asarray(FR.encode(list(values_int))))

    @property
    def root(self):
        return self.nodes[1]

    def root_int(self) -> int:
        return FR.decode(self.root[None])[0]

    def path(self, indices):
        """(siblings uint32[k, depth, L], bits uint32[k, depth])."""
        return self._path_fn(self.nodes, jnp.asarray(indices, jnp.int32))

    def leaf(self, indices):
        idx = jnp.asarray(indices, jnp.int32) + (1 << self.depth)
        return jnp.take(self.nodes, idx, axis=0)

    # ---------- inverse-delta support (reorg/rollback) ----------
    #
    # The reference persists an inverse delta on every push_block and
    # replays it on pop_block (src/blockchain/mod.rs:284-315; delta
    # computation src/db/mirror.rs:19-38).  The SMT analogue: a batch
    # insert touches exactly the k dirty leaves plus their ancestors, so
    # capturing those heap rows BEFORE the insert is a complete undo
    # record (one device gather; restore is one scatter).

    def touched_rows(self, indices) -> np.ndarray:
        """Heap rows (deduped, host int32) a batch insert at `indices`
        modifies: the leaves and every ancestor up to the root."""
        j = np.unique(np.asarray(indices, np.int64)) + (1 << self.depth)
        out = []
        for _ in range(self.depth + 1):
            out.append(j)
            j = np.unique(j >> 1)
        return np.unique(np.concatenate(out)).astype(np.int32)

    def snapshot_rows(self, rows):
        """Prior values of the given heap rows (device gather)."""
        return jnp.take(self.nodes, jnp.asarray(rows, jnp.int32), axis=0)

    def restore_rows(self, rows, values):
        """Scatter prior values back — the pop_block replay."""
        self.nodes = self.nodes.at[jnp.asarray(rows, jnp.int32)].set(
            jnp.asarray(values))


# ---------------------------------------------------------------------------
# Host oracle (bit-exactness gate)
# ---------------------------------------------------------------------------

def oracle_sparse_root(entries: dict[int, int], depth: int,
                       hash_name: str = "poseidon") -> int:
    """Pure-Python sparse root over {leaf_index: value} (host ints)."""
    h2 = HASH2_ORACLE[hash_name]
    zh = zero_hashes(depth, hash_name)
    level = dict(entries)
    for l in range(depth):
        nxt = {}
        for idx in {i >> 1 for i in level}:
            left = level.get(idx * 2, zh[l])
            right = level.get(idx * 2 + 1, zh[l])
            nxt[idx] = h2(left, right)
        level = nxt
    return level.get(0, zh[depth])
