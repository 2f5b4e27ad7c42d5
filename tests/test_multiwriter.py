"""Optimistic concurrent append protocol (r13, VERDICT ask #4): two
concurrent appenders land with both batches visible; claim/commit/abort
state machine; crash matrix (stale lease, mid-move orphan, blocked
fold); flush refusal + fold; single-writer interplay."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
from flouds_vectordb_spark.operators import multiwriter as mw
from flouds_vectordb_spark.operators.upsert import CollectionWriter


def _mk(spark, tmp_path_factory, tenant="mwt", model="m", dim=4):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    cat.set_vector_store(tenant)
    cat.generate_schema(CollectionSpec(tenant, model, dimension=dim))
    return cat


def _batch(spark, ids, dim=4, off=0.0):
    return spark.createDataFrame(
        [(i, [float(k) + off for k in range(dim)], f"c{i}", "{}")
         for i in ids],
        "id string, vector array<double>, chunk string, meta string")


def test_two_concurrent_appenders_both_visible(spark, tmp_path_factory):
    """The headline contract: two appenders running CONCURRENTLY (barrier
    between claim and commit so the phases genuinely interleave) both
    land; the watermark folds to the max ts; reads see every row."""
    cat = _mk(spark, tmp_path_factory)
    errs, results = [], {}
    gate = threading.Barrier(2, timeout=120)
    orig_commit = mw.commit_append

    def barrier_commit(*a, **k):
        gate.wait()  # both writers finish their moves before either commits
        return orig_commit(*a, **k)

    mw.commit_append = barrier_commit
    try:
        def run(tag, ids):
            try:
                results[tag] = mw.concurrent_insert(
                    cat, "mwt", "m", _batch(spark, ids))
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        t1 = threading.Thread(target=run, args=("a", [f"a{i}" for i in range(6)]))
        t2 = threading.Thread(target=run, args=("b", [f"b{i}" for i in range(5)]))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
    finally:
        mw.commit_append = orig_commit
    assert not errs, errs
    assert results["a"]["inserted"] == 6 and results["b"]["inserted"] == 5
    assert results["a"]["batch_ts"] != results["b"]["batch_ts"]
    rows = cat.read_collection("mwt", "m").collect()
    assert {r["id"] for r in rows} == {f"a{i}" for i in range(6)} | {
        f"b{i}" for i in range(5)}
    meta = cat.describe_collection("mwt", "m")
    assert not meta.get("mw_pending") and not meta.get("mw_committed")
    assert int(meta["last_complete_ts"]) == max(
        results["a"]["batch_ts"], results["b"]["batch_ts"])


def test_commit_blocked_by_earlier_pending_still_readable(spark,
                                                          tmp_path_factory):
    """A commit above a still-pending earlier claim must NOT advance the
    watermark (it would expose the in-flight batch) but its rows are
    visible via the committed-ts filter; folding completes when the
    earlier claim resolves."""
    cat = _mk(spark, tmp_path_factory)
    ts1, _ = mw.claim_append(cat, "mwt", "m")  # in-flight, never writes
    r2 = mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["x1", "x2"]))
    assert not r2["visible_at_watermark"]  # blocked by ts1
    meta = cat.describe_collection("mwt", "m")
    assert int(meta.get("last_complete_ts") or 0) < r2["batch_ts"]
    assert r2["batch_ts"] in [int(t) for t in meta["mw_committed"]]
    # blocked-but-committed rows ARE readable (read-your-writes)
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"x1", "x2"}
    # earlier claim aborts -> burned blocks fold until flush; commit path
    # folds on the NEXT commit
    mw.abort_append(cat, "mwt", "m", ts1)
    r3 = mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["y1"]))
    meta = cat.describe_collection("mwt", "m")
    # ts1 is burned (not vacuumed yet) so the fold still holds below it
    assert ts1 in [int(t) for t in meta.get("mw_burned", [])]
    assert int(meta.get("last_complete_ts") or 0) < ts1
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"x1", "x2", "y1"}
    # flush sweeps the burned claim and folds everything
    w = CollectionWriter(cat, "mwt", "m")
    w.flush()
    meta = cat.describe_collection("mwt", "m")
    assert not meta.get("mw_committed") and not meta.get("mw_burned")
    assert int(meta["last_complete_ts"]) >= r3["batch_ts"]
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"x1", "x2", "y1"}


def test_crash_mid_move_orphan_invisible_and_swept(spark, tmp_path_factory):
    """A writer that dies after moving SOME part files (claimed, never
    committed): rows invisible to every reader; after lease expiry the
    claim burns and flush deletes the orphan files by name prefix."""
    cat = _mk(spark, tmp_path_factory)
    mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["base"]))
    ts, _ = mw.claim_append(cat, "mwt", "m", claim_stale_s=0.0)
    meta = cat.describe_collection("mwt", "m")
    from flouds_vectordb_spark.catalog import resolve_data_dir
    stage = os.path.join(meta["path"], f"{mw.STAGE_PREFIX}{ts}")
    _batch(spark, ["ghost1", "ghost2"]).withColumn(
        "batch_ts", F.lit(ts)).write.mode("overwrite").parquet(stage)
    moved = 0
    data_dir = resolve_data_dir(meta["path"])
    for fn in os.listdir(stage):
        if fn.endswith(".parquet") and moved < 1:  # simulate partial move
            os.replace(os.path.join(stage, fn),
                       os.path.join(data_dir, f"{mw.FILE_PREFIX}{ts}-{fn}"))
            moved += 1
    # invisible: never committed
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"base"}
    # the zero-second lease means the next claim evicts it to burned
    ts2, _ = mw.claim_append(cat, "mwt", "m")
    meta = cat.describe_collection("mwt", "m")
    assert ts in [int(t) for t in meta.get("mw_burned", [])]
    # a commit of a LATER batch must not fold past the burned ts
    # (the orphan files are still on disk)
    with pytest.raises(ValueError):
        mw.commit_append(cat, "mwt", "m", ts)  # burned lease: no commit
    mw.abort_append(cat, "mwt", "m", ts2)
    w = CollectionWriter(cat, "mwt", "m")
    w.flush()
    meta = cat.describe_collection("mwt", "m")
    assert not meta.get("mw_burned")
    assert not [fn for fn in os.listdir(resolve_data_dir(meta["path"]))
                if fn.startswith(mw.FILE_PREFIX)]
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"base"}


def test_flush_refuses_while_pending(spark, tmp_path_factory):
    cat = _mk(spark, tmp_path_factory)
    mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["a"]))
    ts, _ = mw.claim_append(cat, "mwt", "m")
    w = CollectionWriter(cat, "mwt", "m")
    with pytest.raises(mw.PendingAppendsError):
        w.flush()
    mw.abort_append(cat, "mwt", "m", ts)
    w.flush()  # burned claim does not block
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"a"}


def test_single_writer_interplay_and_validation(spark, tmp_path_factory):
    """Claims advance last_batch_ts, so a subsequent exclusive
    insert_data must pick a larger ts; validation failures abort the
    claim; validation rejects before claiming (nothing burned)."""
    cat = _mk(spark, tmp_path_factory)
    r1 = mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["k1"]))
    w = CollectionWriter(cat, "mwt", "m")
    with pytest.raises(ValueError, match="strictly increasing"):
        w.insert_data(_batch(spark, ["k2"]), batch_ts=r1["batch_ts"])
    w.insert_data(_batch(spark, ["k2"]), batch_ts=r1["batch_ts"] + 1)
    got = {r["id"] for r in cat.read_collection("mwt", "m").collect()}
    assert got == {"k1", "k2"}
    # wrong-dim batch: loud error BEFORE any claim — nothing burned,
    # nothing pending, nothing visible (r13: validation precedes claim)
    bad = spark.createDataFrame([("z", [1.0], "c", "{}")],
                                "id string, vector array<double>, "
                                "chunk string, meta string")
    with pytest.raises(ValueError, match="dimension"):
        mw.concurrent_insert(cat, "mwt", "m", bad)
    meta = cat.describe_collection("mwt", "m")
    assert not meta.get("mw_pending") and not meta.get("mw_burned")
    assert {r["id"] for r in cat.read_collection("mwt", "m").collect()} == \
        {"k1", "k2"}
    # duplicate keys in one batch: same loud contract as insert_data
    dup = _batch(spark, ["d", "d"])
    with pytest.raises(ValueError, match="duplicate"):
        mw.concurrent_insert(cat, "mwt", "m", dup)
    # auto-id collections: client-supplied ids rejected like insert_data
    cat.generate_schema(CollectionSpec("mwt", "mauto", dimension=4,
                                       primary_key_data_type="INT64"))
    with pytest.raises(ValueError, match="auto-assigned"):
        mw.concurrent_insert(cat, "mwt", "mauto", _batch(spark, ["q"]))


def test_latest_wins_across_concurrent_batches(spark, tmp_path_factory):
    """Two concurrent batches upserting the SAME key: the higher claimed
    ts wins in the latest-wins view, deterministically."""
    cat = _mk(spark, tmp_path_factory)
    r1 = mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["k"], off=1.0))
    r2 = mw.concurrent_insert(cat, "mwt", "m", _batch(spark, ["k"], off=2.0))
    assert r2["batch_ts"] > r1["batch_ts"]
    w = CollectionWriter(cat, "mwt", "m")
    rows = w.read_latest().collect()
    assert len(rows) == 1 and rows[0]["vector"][0] == 2.0


def _auto_batch(spark, n, dim=4, off=0.0):
    return spark.createDataFrame(
        [([float(k) + off + i for k in range(dim)], f"c{i}", "{}")
         for i in range(n)],
        "vector array<double>, chunk string, meta string")


def test_concurrent_auto_id_ranges_disjoint(spark, tmp_path_factory):
    """r13: auto-id concurrent appenders reserve disjoint INT64 ranges
    at claim time — all ids unique, each batch dense within its range,
    validation failures burn neither a ts nor a range."""
    cat = _mk(spark, tmp_path_factory)
    from flouds_vectordb_spark.catalog import CollectionSpec
    cat.generate_schema(CollectionSpec("mwt", "ma", dimension=4,
                                       primary_key_data_type="INT64"))
    errs, res = [], {}
    gate = threading.Barrier(2, timeout=120)
    orig = mw.commit_append

    def barrier_commit(*a, **k):
        gate.wait()
        return orig(*a, **k)

    mw.commit_append = barrier_commit
    try:
        def run(tag, n, off):
            try:
                res[tag] = mw.concurrent_insert(
                    cat, "mwt", "ma", _auto_batch(spark, n, off=off))
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        t1 = threading.Thread(target=run, args=("a", 7, 0.0))
        t2 = threading.Thread(target=run, args=("b", 5, 100.0))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
    finally:
        mw.commit_append = orig
    assert not errs, errs
    rows = cat.read_collection("mwt", "ma").collect()
    ids = sorted(int(r["id"]) for r in rows)
    assert len(ids) == 12 and len(set(ids)) == 12
    meta = cat.describe_collection("mwt", "ma")
    assert int(meta["auto_id_next"]) == 12
    ra = set(range(res["a"]["id_start"], res["a"]["id_start"] + 7))
    rb = set(range(res["b"]["id_start"], res["b"]["id_start"] + 5))
    assert not (ra & rb) and ra | rb == set(ids)
    # wrong-dim auto batch: rejected BEFORE any claim (no burned ts,
    # no leaked range)
    bad = spark.createDataFrame([([1.0], "c", "{}")],
                                "vector array<double>, chunk string, "
                                "meta string")
    with pytest.raises(ValueError, match="dimension"):
        mw.concurrent_insert(cat, "mwt", "ma", bad)
    meta = cat.describe_collection("mwt", "ma")
    assert int(meta["auto_id_next"]) == 12
    assert not meta.get("mw_burned") and not meta.get("mw_pending")
