"""Multi-chip Pippenger MSM: points/scalars sharded per chip, partial sums
combined over ICI (SURVEY.md §2.4 "MSM bucket parallelism"; BASELINE
config 4).

Decomposition: Σᵢ kᵢ·Pᵢ = Σ_chips Σ_{i∈chip} kᵢ·Pᵢ — each chip runs the full
windowed bucket pipeline on its 1/d slice of the points (ops/msm.py), then
the d projective partials are all_gather'ed (3 field elements each — a few
KB over ICI) and tree-added identically on every chip, leaving the result
replicated.  EC addition is not a ring psum, so the reduce is an explicit
all_gather + local complete-formula adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.msm import msm
from .mesh import CHIP


def msm_dist(mesh: Mesh, curve, points, scalars, c: int = 8,
             n_bits: int = 256, lanes: int = 1024):
    """Distributed MSM.  points: projective pytree [n, ...]; scalars:
    canonical uint32[n, L]; n divisible by the mesh size.
    Returns a replicated projective point."""

    def local(pts, sc):
        partial = msm(curve, pts, sc, c=c, n_bits=n_bits, lanes=lanes)
        gathered = jax.lax.all_gather(partial, CHIP)  # each leaf [d, ...]
        return curve.sum_reduce(gathered)

    n_pt_leaves = len(points)
    fn = jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=((P(CHIP),) * n_pt_leaves, P(CHIP)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))
    return fn(points, scalars)


def msm_dist_jit(mesh: Mesh, curve, c: int = 8, n_bits: int = 256,
                 lanes: int = 1024):
    """jit-wrapped distributed MSM closure (compile once per shape)."""
    return jax.jit(functools.partial(msm_dist, mesh, curve, c=c,
                                     n_bits=n_bits, lanes=lanes))
