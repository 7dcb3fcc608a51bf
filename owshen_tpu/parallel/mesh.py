"""Device-mesh helpers: the communication layer of the framework.

The reference node has no distributed backend at all (SURVEY.md §2.4 — a
single sequencer behind one mutex); scale-out here is net-new and purely
XLA-native: a named `jax.sharding.Mesh` plus `shard_map`, with psum /
all_gather / all_to_all riding ICI inside a slice and DCN across hosts.
No hand-rolled transport exists anywhere in this package by design.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHIP = "chip"


def make_mesh(n_devices: int | None = None, axis: str = CHIP) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


@functools.lru_cache(maxsize=None)
def default_mesh() -> Mesh:
    return make_mesh()


def shard_leading(mesh: Mesh, x, axis: str = CHIP):
    """Place an array (or pytree) sharded along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)


def replicated(mesh: Mesh, x):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)
