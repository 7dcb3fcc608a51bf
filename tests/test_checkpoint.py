"""Checkpoint/resume gates (SURVEY.md §5): native KV store semantics,
SMT round-trip, pool resume with a still-verifying proving key.

Reference anchors: LevelDB-backed persistence src/db/disk.rs:26-63;
atomic Writebatch commit src/blockchain/mod.rs:90-99."""

import os
import random

import numpy as np
import pytest

from owshen_tpu.fields.field import FR
from owshen_tpu.ops.merkle import SparseMerkleTree, oracle_sparse_root
from owshen_tpu.runtime import checkpoint
from owshen_tpu.runtime.store import NativeKvStore, PyKvStore, _load_lib, open_store

rng = random.Random(5)


def _stores(tmp_path):
    out = [("py", PyKvStore(str(tmp_path / "py.db")))]
    if _load_lib() is not None:
        out.append(("native", NativeKvStore(str(tmp_path / "native.db"))))
    return out


def test_store_put_get_delete(tmp_path):
    for name, st in _stores(tmp_path):
        st.put(b"a", b"1")
        st.put(b"b", b"\x00" * 100)
        st.commit()
        assert st.get(b"a") == b"1", name
        assert st.get(b"b") == b"\x00" * 100
        assert st.get(b"absent") is None
        st.delete(b"a")
        st.commit()
        assert st.get(b"a") is None
        assert st.keys() == [b"b"]
        st.close()


def test_native_store_atomic_batch(tmp_path):
    """Uncommitted puts are discarded on close; torn tails are discarded on
    reopen (Writebatch semantics)."""
    if _load_lib() is None:
        pytest.skip("no native toolchain")
    path = str(tmp_path / "atomic.db")
    st = NativeKvStore(path)
    st.put(b"committed", b"yes")
    st.commit()
    st.put(b"torn", b"no")
    st.close()  # discard-on-close drops the uncommitted record
    st2 = NativeKvStore(path)
    assert st2.get(b"committed") == b"yes"
    assert st2.get(b"torn") is None
    # torn tail: a second committed batch whose marker is sheared off
    # mid-write (crash) must vanish without touching the first batch
    st2.put(b"second", b"batch")
    st2.commit()
    st2.close()
    with open(path, "r+b") as fh:
        fh.seek(0, os.SEEK_END)
        fh.truncate(fh.tell() - 5)
    st3 = NativeKvStore(path)
    assert st3.get(b"committed") == b"yes"
    assert st3.get(b"second") is None
    st3.close()


def test_native_store_reopen_and_compact(tmp_path):
    if _load_lib() is None:
        pytest.skip("no native toolchain")
    path = str(tmp_path / "re.db")
    with NativeKvStore(path) as st:
        for i in range(50):
            st.put(f"k{i:03d}".encode(), os.urandom(64))
        st.put(b"k000", b"overwritten")
        st.delete(b"k001")
        st.commit()
        want = {k: st.get(k) for k in st.keys()}
    with NativeKvStore(path) as st:
        assert {k: st.get(k) for k in st.keys()} == want
        size_before = os.path.getsize(path)
        st.compact()
        assert {k: st.get(k) for k in st.keys()} == want
        assert os.path.getsize(path) <= size_before
    with NativeKvStore(path) as st:
        assert {k: st.get(k) for k in st.keys()} == want


def test_smt_checkpoint_roundtrip(tmp_path):
    depth = 10
    tree = SparseMerkleTree(depth, "poseidon")
    idxs = rng.sample(range(1 << depth), 20)
    vals = [rng.randrange(FR.p) for _ in idxs]
    tree.insert_ints(idxs, vals)
    root = tree.root_int()
    assert root == oracle_sparse_root(dict(zip(idxs, vals)), depth)

    with open_store(str(tmp_path / "smt.db")) as st:
        checkpoint.save_tree(st, tree)
        st.commit()
    with open_store(str(tmp_path / "smt.db")) as st:
        tree2 = checkpoint.load_tree(st)
    assert tree2.depth == depth and tree2.hash_name == "poseidon"
    assert tree2.root_int() == root
    # resumed tree keeps working: another insert matches the oracle
    more_i = [7, 513]
    more_v = [123456, 654321]
    tree2.insert_ints(more_i, more_v)
    tree.insert_ints(more_i, more_v)
    assert tree2.root_int() == tree.root_int()


def test_pool_checkpoint_resume(tmp_path, small_pool):
    """insert -> save -> reload -> same root; a proof made with the RELOADED
    pk verifies against the RELOADED vk (deterministic resume)."""
    pool = small_pool
    path = str(tmp_path / "pool.db")
    checkpoint.save_pool(pool, path)
    pool2 = checkpoint.load_pool(path)
    assert pool2.tree.root_int() == pool.tree.root_int()
    assert pool2.next_index == pool.next_index
    assert pool2.deposited == pool.deposited
    assert pool2.nullifiers == pool.nullifiers
    # prove with the reloaded key
    from owshen_tpu.circuits import pool as circuits

    secret, salt, amount = 111, 222, 1000
    com = circuits.commitment_of(secret, salt, amount)
    idx = pool2.deposit([com], [0xABCDEF], [amount])[0]
    proof, root, nullifier = pool2.prove_withdraw(
        secret, salt, amount, idx, recipient=0xCAFE, msm_lanes=64)
    v = pool2.withdraw(proof, root, nullifier, recipient=0xCAFE, amount=amount)
    assert v.nullifier == nullifier


def test_metrics_registry():
    """Metrics/observability (SURVEY §5): counters, gauges, timers, and the
    structured JSON event log all round-trip."""
    import json as _json
    import time as _time

    from owshen_tpu.runtime.metrics import MetricsRegistry

    m = MetricsRegistry()
    m.inc("a")
    m.inc("a", 2)
    m.gauge("g", 7.5)
    with m.timer("t"):
        _time.sleep(0.01)
    try:
        with m.timer("t"):
            raise RuntimeError("x")  # failure latencies still record
    except RuntimeError:
        pass
    snap = m.dump()
    assert snap["counters"]["a"] == 3
    assert snap["gauges"]["g"] == 7.5
    assert snap["timers"]["t"]["count"] == 2
    assert snap["timers"]["t"]["min_s"] > 0
    assert snap["timers"]["t"]["mean_s"] >= snap["timers"]["t"]["min_s"]


def test_pool_metrics_flow(tmp_path, small_pool):
    """The pool hot paths feed the registry (deposit counter moves)."""
    from owshen_tpu.circuits import pool as circuits
    from owshen_tpu.runtime.metrics import metrics

    before = metrics.dump()["counters"].get("pool.deposits", 0)
    com = circuits.commitment_of(9, 9, 9)
    small_pool.deposit([com], [0x9999_0001])
    after = metrics.dump()["counters"].get("pool.deposits", 0)
    assert after == before + 1
    metrics.emit(str(tmp_path / "events.jsonl"))
    import json

    line = json.loads(open(tmp_path / "events.jsonl").read().splitlines()[-1])
    assert "counters" in line and "t" in line
