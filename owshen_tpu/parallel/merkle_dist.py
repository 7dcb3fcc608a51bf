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
from ..ops.merkle import HASH2, build_levels
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
