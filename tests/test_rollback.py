"""Reorg/rollback gates (SURVEY.md §5 — the reference's one real recovery
mechanism: push_block persists an inverse delta, pop_block replays it,
src/blockchain/mod.rs:284-315, delta computation src/db/mirror.rs:19-38;
exercised by the reference's blockchain/tests.rs:45-52) plus the store-level
invariants the round-3 advisor flagged (empty-key/COMMIT-marker aliasing,
close/compact semantics parity between engines)."""

import pytest

from owshen_tpu.ops.merkle import SparseMerkleTree, oracle_sparse_root
from owshen_tpu.protocol.pool import PoolError
from owshen_tpu.runtime.store import (NativeKvStore, PyKvStore, _load_lib,
                                      open_store)


def _stores(tmp_path):
    out = [("py", PyKvStore(str(tmp_path / "py.db")))]
    if _load_lib() is not None:
        out.append(("native", NativeKvStore(str(tmp_path / "native.db"))))
    return out


# ---------------------------------------------------------------------------
# SMT inverse deltas
# ---------------------------------------------------------------------------

def test_smt_restore_rows_bit_exact():
    tree = SparseMerkleTree(6, "poseidon")
    tree.insert_ints([3, 9], [111, 222])
    root0 = tree.root_int()
    idxs = [1, 9, 40]  # overwrites an existing leaf too
    rows = tree.touched_rows(idxs)
    prior = tree.snapshot_rows(rows)
    tree.insert_ints(idxs, [7, 8, 9])
    assert tree.root_int() == oracle_sparse_root(
        {3: 111, 1: 7, 9: 8, 40: 9}, 6)
    tree.restore_rows(rows, prior)
    assert tree.root_int() == root0
    assert tree.root_int() == oracle_sparse_root({3: 111, 9: 222}, 6)


# ---------------------------------------------------------------------------
# Pool pop_batch (reference pop_block, blockchain/tests.rs:16-54 analogue)
# ---------------------------------------------------------------------------

def test_pool_pop_batch_roundtrip(small_pool):
    from owshen_tpu.circuits import pool as circuits

    pool = small_pool
    root0 = pool.tree.root_int()
    n_roots = len(pool.roots)
    idx0 = pool.next_index
    com = circuits.commitment_of(5, 6, 7)
    txh = 0xDEAD0001
    pool.deposit([com], [txh])
    assert pool.tree.root_int() != root0
    assert txh in pool.deposited
    n = pool.pop_batch()
    assert n == 1
    # bit-exact state restore: root, history, counters, guards
    assert pool.tree.root_int() == root0
    assert len(pool.roots) == n_roots and pool.roots[-1] == root0
    assert pool.next_index == idx0
    assert txh not in pool.deposited
    # the same L1 tx may deposit again after the reorg unwound it
    # (reference: mint guards are state, and pop_block rewinds state)
    pool.deposit([com], [txh])
    pool.pop_batch()
    assert pool.tree.root_int() == root0


def test_pool_pop_batch_empty_raises(small_pool):
    # drain any leftovers deterministically, then popping must fail loudly
    while small_pool._undo:
        small_pool.pop_batch()
    with pytest.raises(PoolError, match="no batch to pop"):
        small_pool.pop_batch()


def test_pool_undo_survives_checkpoint(tmp_path, small_pool):
    """The inverse deltas persist (reference stores Key::Delta in the DB,
    mod.rs:284-287): a reloaded pool can still pop the last batch."""
    from owshen_tpu.circuits import pool as circuits
    from owshen_tpu.runtime import checkpoint

    pool = small_pool
    root0 = pool.tree.root_int()
    com = circuits.commitment_of(50, 60, 70)
    pool.deposit([com], [0xDEAD0002])
    path = str(tmp_path / "undo.db")
    checkpoint.save_pool(pool, path)
    pool.pop_batch()  # unwind the live pool back for other tests
    assert pool.tree.root_int() == root0
    pool2 = checkpoint.load_pool(path)
    assert pool2.tree.root_int() != root0
    pool2.pop_batch()
    assert pool2.tree.root_int() == root0


# ---------------------------------------------------------------------------
# Store-level advisor findings
# ---------------------------------------------------------------------------

def test_store_rejects_empty_keys(tmp_path):
    """klen==0 frames identically to the COMMIT marker; replay would then
    truncate away later committed batches (round-3 advisor, medium)."""
    for name, st in _stores(tmp_path):
        with pytest.raises(ValueError):
            st.put(b"", b"value")
        with pytest.raises(ValueError):
            st.delete(b"")
        # the store still works and commits fine afterwards
        st.put(b"k", b"v")
        st.commit()
        assert st.get(b"k") == b"v", name
        st.close()


def test_store_close_discards_pending(tmp_path):
    """Both engines drop uncommitted puts on close (Writebatch contract)."""
    for name in ("py", "native"):
        if name == "native" and _load_lib() is None:
            continue
        path = str(tmp_path / f"cd_{name}.db")
        cls = PyKvStore if name == "py" else NativeKvStore
        st = cls(path)
        st.put(b"durable", b"1")
        st.commit()
        st.put(b"pending", b"2")
        st.close()
        st2 = cls(path)
        assert st2.get(b"durable") == b"1", name
        assert st2.get(b"pending") is None, name
        st2.close()


def test_store_compact_refuses_dirty(tmp_path):
    """compact() must not silently commit a pending batch."""
    for name, st in _stores(tmp_path):
        st.put(b"a", b"1")
        st.commit()
        st.put(b"pending", b"2")
        with pytest.raises(IOError):
            st.compact()
        st.commit()
        st.compact()  # clean: allowed
        assert st.get(b"pending") == b"2", name
        st.close()


def test_store_rejects_oversized_records(tmp_path):
    """Records >= 1 GB would pass put/commit but be silently DISCARDED by
    the log replay guard on reopen (found round 5: a 1.27 GB prover-table
    pickle made a whole pool checkpoint vanish) — both engines must reject
    them loudly; runtime/checkpoint chunks large blobs instead."""
    from owshen_tpu.runtime.store import MAX_RECORD

    for name, st in _stores(tmp_path):
        class _FakeLen(bytes):
            def __len__(self):
                return MAX_RECORD
        with pytest.raises(ValueError, match="chunk large blobs"):
            st.put(b"k", _FakeLen(b"v"))
        st.close()


def test_checkpoint_blob_chunking(tmp_path):
    """_put_blob/_get_blob round-trip across the chunk boundary."""
    from owshen_tpu.runtime import checkpoint as cp
    from owshen_tpu.runtime.store import open_store

    orig = cp._BLOB_CHUNK
    cp._BLOB_CHUNK = 1 << 10
    try:
        data = bytes(range(256)) * 37  # 9472 B -> 10 chunks
        with open_store(str(tmp_path / "blob.db")) as st:
            cp._put_blob(st, b"blob", data)
            st.commit()
        with open_store(str(tmp_path / "blob.db")) as st:
            assert cp._get_blob(st, b"blob") == data
            assert cp._get_blob(st, b"missing") is None
    finally:
        cp._BLOB_CHUNK = orig
