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


_BLOB_CHUNK = 256 << 20


def _put_blob(store, key: bytes, data: bytes):
    """Store an arbitrarily large blob as ≤256 MB chunks: the log engines
    reject records ≥ 1 GB (their replay guard would silently discard the
    batch otherwise — found round 5 with a 1.27 GB prover-table pickle)."""
    n = (len(data) + _BLOB_CHUNK - 1) // _BLOB_CHUNK or 1
    store.put(key + b"/n", str(n).encode())
    for i in range(n):
        store.put(key + b"/%d" % i,
                  data[i * _BLOB_CHUNK:(i + 1) * _BLOB_CHUNK])


def _get_blob(store, key: bytes) -> bytes | None:
    raw = store.get(key + b"/n")
    if raw is None:
        return None
    return b"".join(store.get(key + b"/%d" % i) for i in range(int(raw)))


def save_prover_tables(store, pk, key: bytes = b"fxtab", build: bool = False):
    """Persist the fixed prover MSM tables (round-4 verdict item 6: they
    are deterministic derived data, and rebuilding them cost ~90 s of the
    10-minute cold-start; a restored process reaches its first proof with
    only the compile left to pay).

    By default only ALREADY-BUILT tables are saved (building at save time
    would stall a checkpoint of a never-proved pool); pass build=True to
    force the build so the store is prove-warm.  Returns True if saved."""
    from ..groth16.groth16 import _fixed_tables

    fx = getattr(pk, "_fixed", None)
    if fx is None and build:
        fx = _fixed_tables(pk)
    if fx is None:
        return False
    payload = {
        "n": fx.n, "has_k": fx.has_k,
        "g1_rows": np.asarray(fx.g1.rows), "g1_meta": fx.g1.meta,
        "g1_c": fx.g1.c,
        "b2_table": _to_host(fx.b2.table), "b2_c": fx.b2.c,
    }
    _put_blob(store, key, pickle.dumps(payload))
    return True


def load_prover_tables(store, pk, key: bytes = b"fxtab") -> bool:
    """Attach checkpointed fixed tables to a ProvingKey (no device build).
    Returns False when the store holds no tables for this key."""
    from ..curves import bn254
    from ..groth16.groth16 import _FixedTables
    from ..ops.msm_fixed import FixedMsm, FixedMsmGroup

    raw = _get_blob(store, key)
    if raw is None:
        return False
    p = pickle.loads(raw)
    g1 = FixedMsmGroup.from_rows(bn254.G1, jnp.asarray(p["g1_rows"]),
                                 p["g1_meta"], c=p["g1_c"])
    b2 = FixedMsm.from_table(bn254.G2, _to_device(p["b2_table"]),
                             c=p["b2_c"])
    fx = _FixedTables(pk, _restored=(g1, b2))
    object.__setattr__(pk, "_fixed", fx)
    return True


def save_pool(pool, path: str):
    """Checkpoint the full PrivacyPool: tree, counters, guard sets, keys,
    and (when already built) the fixed prover tables."""
    with open_store(path) as store:
        save_tree(store, pool.tree)
        host = {
            "depth": pool.depth,
            "next_index": pool.next_index,
            "deposited": sorted(pool.deposited),
            "minted": sorted(pool.minted),
            "nullifiers": sorted(pool.nullifiers),
            "executed": sorted(getattr(pool, "executed", ())),
            "balances": dict(getattr(pool, "balances", {})),
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
        save_prover_tables(store, pool.pk)
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
        pool.balances = dict(host.get("balances", {}))
        pool.roots = list(host["roots"])
        pool.vk = host["vk"]
        pool.pk = load_proving_key(store)
        load_prover_tables(store, pool.pk)
        if host.get("seq_pub") is not None:
            pool.seq_pub = host["seq_pub"]
            pool._seq_priv = host["seq_priv"]
        pool._undo = [
            {**rec, "prior": jnp.asarray(rec["prior"])}
            for rec in host.get("undo", [])
        ]
    return pool
