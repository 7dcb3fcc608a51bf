"""Multi-chip Merkle tree: leaves partitioned by index prefix, per-chip
subtree roots combined up the top levels via collectives (SURVEY.md §2.4
"Merkle subtree parallelism"; BASELINE configs 1-2 at scale).

Leaf i lives on chip i >> (depth - log2(d)) — i.e. the top log2(d) address
bits select the chip, so each chip owns one contiguous dense subtree and
computes its root with zero communication; the d subtree roots are
all_gather'ed (d field elements over ICI) and the remaining log2(d) levels
are hashed identically on every chip, leaving the root replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.field import FR
from ..ops.merkle import HASH2, HASH2_ORACLE, build_levels
from .mesh import CHIP


def merkle_root_dist(mesh: Mesh, leaves, hash_name: str = "poseidon"):
    """Distributed dense root.  leaves: uint32[n, L] Montgomery (n a power
    of two, n >= mesh size).  Returns the replicated root uint32[L]."""
    h2 = HASH2[hash_name]

    def local(shard):
        sub_root = build_levels(shard, hash_name)[-1]  # [1, L]
        tops = jax.lax.all_gather(sub_root, CHIP, tiled=True)  # [d, L]
        while tops.shape[0] > 1:
            tops = h2(tops[0::2], tops[1::2])
        return tops[0]

    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P(CHIP),
                               out_specs=P(), check_vma=False))
    return fn(leaves)


class DistSparseMerkleTree:
    """Sparse Merkle tree sharded by leaf-index prefix (SURVEY.md §2.4 row 5
    'Merkle subtree parallelism').

    Chip c owns the dense subtree of the 2^local_depth leaves whose top
    log2(d) address bits equal c, in the same implicit-heap layout as
    ops.merkle.SparseMerkleTree; a batch insert is one shard_map in which
    every chip scatters its share of the batch (non-owned rows land in the
    unused heap slot 0 — idempotent, no gather/branch) and re-hashes its
    dirty paths locally, then the d subtree roots cross ICI once
    (all_gather, d field elements) and the top log2(d) levels are hashed
    identically everywhere, leaving the root replicated."""

    def __init__(self, mesh: Mesh, depth: int, hash_name: str = "poseidon"):
        import numpy as np
        from jax.sharding import NamedSharding

        from ..ops.merkle import SparseMerkleTree, zero_hashes

        d = mesh.devices.size
        self.d = d
        self.log_d = (d - 1).bit_length()
        assert 1 << self.log_d == d, "mesh size must be a power of two"
        assert depth > self.log_d
        self.depth = depth
        self.local_depth = depth - self.log_d
        self.hash_name = hash_name
        self.mesh = mesh
        self._zh = zero_hashes(depth, hash_name)
        # identical all-zero local heaps on every chip
        local = SparseMerkleTree(self.local_depth, hash_name)
        init = np.broadcast_to(
            np.asarray(local.nodes)[None], (d,) + local.nodes.shape)
        self.nodes = jax.device_put(
            np.ascontiguousarray(init), NamedSharding(mesh, P(CHIP)))
        self._insert_fn = self._build_insert()

    def _build_insert(self):
        h2 = HASH2[self.hash_name]
        ld, log_d = self.local_depth, self.log_d

        def local(nodes, idx, vals):
            nodes = nodes[0]                       # (2^(ld+1), L)
            c = jax.lax.axis_index(CHIP)
            owner = (idx >> ld) == c
            j = jnp.where(owner, (idx & ((1 << ld) - 1)) + (1 << ld), 0)
            cur = jnp.take(nodes, j, axis=0)
            nodes = nodes.at[j].set(FR.select(owner, vals, cur))

            def body(carry, _):
                nodes, j = carry
                p = j >> 1
                h = h2(jnp.take(nodes, p << 1, axis=0),
                       jnp.take(nodes, (p << 1) | 1, axis=0))
                keep = jnp.take(nodes, p, axis=0)
                h = FR.select(p > 0, h, keep)      # dump slot stays inert
                return (nodes.at[p].set(h), p), None

            (nodes, _), _ = jax.lax.scan(body, (nodes, j), None, length=ld)
            tops = jax.lax.all_gather(nodes[1], CHIP)  # (d, L)
            for _ in range(log_d):
                tops = h2(tops[0::2], tops[1::2])
            return nodes[None], tops[0]

        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(P(CHIP), P(), P()),
            out_specs=(P(CHIP), P()), check_vma=False))

    def batch_insert(self, indices, values):
        """indices int32[k] (global leaf indices, UNIQUE within the batch);
        values uint32[k, L] Montgomery.  Returns the replicated root
        (uint32[L]).

        Duplicate indices in one batch would race through `.at[j].set` with
        an XLA-unspecified winner, so they are rejected host-side (indices
        are concrete at call time; PrivacyPool always assigns unique ones —
        this guards the public API, advisor r2 finding).  Split duplicates
        across two batch_insert calls for deterministic last-wins."""
        import numpy as np

        host_idx = np.asarray(indices)
        if len(np.unique(host_idx)) != host_idx.size:
            raise ValueError(
                "batch_insert requires unique leaf indices within a batch "
                "(split duplicates across calls for last-wins semantics)")
        indices = jnp.asarray(indices, jnp.int32)
        self.nodes, root = self._insert_fn(self.nodes, indices, values)
        return root

    def insert_ints(self, indices, values_int):
        return self.batch_insert(
            indices, jnp.asarray(FR.encode(list(values_int))))

    def root_int(self) -> int:
        # root is recomputable from any chip's top; cheapest: re-gather
        tops = jax.device_get(self.nodes)[:, 1]    # (d, L)
        h2o = HASH2_ORACLE[self.hash_name]
        vals = [FR.decode(t[None])[0] for t in tops]
        while len(vals) > 1:
            vals = [h2o(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]
        return vals[0]
