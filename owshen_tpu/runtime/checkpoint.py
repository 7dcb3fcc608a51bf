"""Checkpoint / resume for pool state and proving keys (SURVEY.md §5).

The reference gets persistence for free by keeping all chain state in
LevelDB (src/db/disk.rs:26-35): restarting `owshen start --db <path>`
resumes at the persisted Key::Height.  The TPU build's live state is device
arrays (SMT node heap, ProvingKey point tables) plus host guard sets; this
module round-trips all of it through the native KV store so a restarted
process resumes deterministically — same root, same guards, proofs from the
reloaded key still verify (tests/test_checkpoint.py).

Layout: each logical object is one KV entry (pickled numpy/host payload);
a commit after the writes makes the checkpoint atomic (a crash mid-save
leaves the previous checkpoint intact — the native engine discards
uncommitted batches on open).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.merkle import SparseMerkleTree
from .store import open_store


def _to_host(tree_like):
    """Device pytree -> picklable numpy pytree (None passes through)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree_like)


def _to_device(tree_like):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a), tree_like)


def save_tree(store, tree: SparseMerkleTree, key: bytes = b"smt"):
    meta = {"depth": tree.depth, "hash_name": tree.hash_name}
    store.put(key + b"/meta", pickle.dumps(meta))
    store.put(key + b"/nodes", pickle.dumps(np.asarray(tree.nodes)))


def load_tree(store, key: bytes = b"smt") -> SparseMerkleTree:
    meta = pickle.loads(store.get(key + b"/meta"))
    tree = SparseMerkleTree(meta["depth"], meta["hash_name"])
    tree.nodes = jnp.asarray(pickle.loads(store.get(key + b"/nodes")))
    return tree


def save_proving_key(store, pk, key: bytes = b"pk"):
    """ProvingKey: device point pytrees -> host arrays, one pickled blob.
    Scalar metadata (n_domain, n_pub) stays as plain ints."""
    payload = {
        f: (v if isinstance(v, (int, type(None))) else _to_host(v))
        for f in pk.__dataclass_fields__
        for v in [getattr(pk, f)]
    }
    store.put(key, pickle.dumps(payload))


def load_proving_key(store, key: bytes = b"pk"):
    from ..groth16.groth16 import ProvingKey

    payload = pickle.loads(store.get(key))
    dev = {k: (_to_device(v) if isinstance(v, (tuple, list)) else v)
           for k, v in payload.items()}
    return ProvingKey(**dev)


def save_pool(pool, path: str):
    """Checkpoint the full PrivacyPool: tree, counters, guard sets, keys."""
    with open_store(path) as store:
        save_tree(store, pool.tree)
        host = {
            "depth": pool.depth,
            "next_index": pool.next_index,
            "deposited": sorted(pool.deposited),
            "minted": sorted(pool.minted),
            "nullifiers": sorted(pool.nullifiers),
            "executed": sorted(getattr(pool, "executed", ())),
            "roots": list(pool.roots),
            "vk": pool.vk,
            "seq_pub": getattr(pool, "seq_pub", None),
            "seq_priv": getattr(pool, "_seq_priv", None),
            # per-batch inverse deltas so reorg/rollback survives restart
            # (the reference persists Key::Delta per block,
            # src/blockchain/mod.rs:284-287)
            "undo": [
                {**rec, "prior": np.asarray(rec["prior"])}
                for rec in getattr(pool, "_undo", [])
            ],
        }
        store.put(b"pool/host", pickle.dumps(host))
        save_proving_key(store, pool.pk)
        store.commit()


def load_pool(path: str):
    """Deterministic resume: rebuilds a PrivacyPool without re-running
    trusted setup (the dominant cost) or replaying inserts."""
    from ..protocol.pool import PrivacyPool

    with open_store(path) as store:
        host = pickle.loads(store.get(b"pool/host"))
        pool = PrivacyPool.__new__(PrivacyPool)
        pool.depth = host["depth"]
        pool.tree = load_tree(store)
        pool.next_index = host["next_index"]
        pool.deposited = set(host["deposited"])
        pool.minted = set(host["minted"])
        pool.nullifiers = set(host["nullifiers"])
        pool.executed = set(host.get("executed", ()))
        pool.roots = list(host["roots"])
        pool.vk = host["vk"]
        pool.pk = load_proving_key(store)
        if host.get("seq_pub") is not None:
            pool.seq_pub = host["seq_pub"]
            pool._seq_priv = host["seq_priv"]
        pool._undo = [
            {**rec, "prior": jnp.asarray(rec["prior"])}
            for rec in host.get("undo", [])
        ]
    return pool
