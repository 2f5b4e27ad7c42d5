"""Stateful streaming sessionization (applyInPandasWithState) vs its batch
twin, plus batch-twin unit checks on a hand-built fixture."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flouds_vectordb_spark.sources.tables import events
from flouds_vectordb_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)
from tests.conftest import SF_SMALL

T0 = datetime(2025, 6, 1, 12, 0, 0)


def _mk_events(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, T0, 1.0), (1, T0 + timedelta(minutes=10), 2.5),
        (1, T0 + timedelta(minutes=55), 4.0),
        (1, T0 + timedelta(minutes=60), 0.5),
        # user 2: one session, events exactly at the 30-min gap (inclusive)
        (2, T0, 10.0), (2, T0 + timedelta(minutes=30), 20.0),
        # user 3: single event
        (3, T0 + timedelta(hours=3), 7.25),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_batch_sessionize_gap_semantics(spark):
    out = {(r["user_id"], r["session_idx"]): r
           for r in sessionize_batch(_mk_events(spark), gap_minutes=30).collect()}
    assert len(out) == 4
    s11, s12 = out[(1, 1)], out[(1, 2)]
    assert s11["n_events"] == 2 and s11["sum_value_r"] == 3.5
    assert s12["n_events"] == 2 and s12["sum_value_r"] == 4.5
    assert s12["session_start"] == T0 + timedelta(minutes=55)
    # gap is inclusive: exactly 30 min apart stays one session
    assert out[(2, 1)]["n_events"] == 2
    assert out[(3, 1)]["n_events"] == 1 and out[(3, 1)]["sum_value_r"] == 7.25


def test_batch_sessionize_single_event_shuffle(spark):
    """Scale guard: the session aggregation must shuffle the EVENTS exactly
    once (one hashpartitioning exchange on user_id feeding the session
    window sort); the ordinal window shuffles only the session rows."""
    plan = (sessionize_batch(_mk_events(spark), gap_minutes=30)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SessionWindow" in plan or "session_window" in plan


def test_batch_sessionize_matches_python_reference_on_random_events(spark):
    """Randomized equivalence: the session_window plan must agree with a
    direct pure-Python sessionizer on arbitrary event layouts (including
    duplicate timestamps and exact-gap boundaries)."""
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(600):
        user = rng.randint(1, 15)
        # offsets in whole minutes with occasional exact-30 gaps and ties
        minute = rng.choice([0, 1, 5, 29, 30, 31, 60, 90, 90, 180])
        base = rng.randint(0, 40) * 37
        rows.append((user, T0 + timedelta(minutes=base + minute),
                     round(rng.uniform(-5, 5), 3)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    got = {(r["user_id"], r["session_idx"]):
           (r["session_start"], r["session_end"], r["n_events"], r["sum_value_r"])
           for r in sessionize_batch(df, gap_minutes=30).collect()}

    per_user: dict[int, list] = {}
    for u, ts, v in rows:
        per_user.setdefault(u, []).append((ts, v))
    want = {}
    for u, evs in per_user.items():
        evs.sort(key=lambda e: e[0])
        idx = 0
        cur = None
        for ts, v in evs:
            if cur is None or (ts - cur["end"]).total_seconds() > 30 * 60:
                if cur is not None:
                    want[(u, idx)] = (cur["start"], cur["end"], cur["n"],
                                      round(cur["sum_micro"] / 1e6, 4))
                idx += 1
                cur = {"start": ts, "end": ts, "n": 1,
                       "sum_micro": round(v * 1e6)}
            else:
                cur["end"] = max(cur["end"], ts)
                cur["n"] += 1
                cur["sum_micro"] += round(v * 1e6)
        want[(u, idx)] = (cur["start"], cur["end"], cur["n"],
                          round(cur["sum_micro"] / 1e6, 4))
    assert got == want


def test_stream_sessionize_matches_batch(spark, tmp_path_factory):
    """Multi-micro-batch run with OUT-OF-ORDER arrival: events land in 4
    files split round-robin (so each micro-batch interleaves the full time
    range) processed one file per trigger. Every emitted session must match
    the batch twin — boundaries, ordinals, sums — and every session old
    enough to finalize must actually be emitted."""
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))
    src_dir = str(tmp_path_factory.mktemp("src") / "events")

    ev = events(spark, SF_SMALL)
    # 4 time-sliced files; events in the 30 min before each slice boundary
    # are shifted into the NEXT file — cross-batch out-of-order arrival that
    # stays inside the 1 h watermark tolerance (later-than-watermark rows
    # would be legitimately dropped by any streaming engine)
    # testdata parquet stores naive timestamps (TIMESTAMP_NTZ after Spark's
    # NTZ inference); unix_micros requires TIMESTAMP, so cast first — the
    # micros feed only the relative file-slicing arithmetic below
    _micros = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = ev.agg(F.min(_micros), F.max(_micros)).first()
    span = (hi - lo) // 4 + 1
    x = _micros - F.lit(lo)
    k = F.floor(x / span)
    late = (F.lit(span) * (k + 1) - x) <= F.lit(30 * 60 * 1_000_000)
    tagged = ev.withColumn("_f", F.when(late, k + 1).otherwise(k))
    # sequential appends -> increasing mtimes -> the file source (ordered by
    # modification time) replays the slices in time order
    import time as _time
    for slice_no in range(5):
        tagged.filter(F.col("_f") == slice_no).drop("_f") \
            .coalesce(1).write.mode("append").parquet(src_dir)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .start(out_dir)
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    got = {(r["user_id"], r["session_idx"]):
           (r["session_start"], r["session_end"], r["n_events"], r["sum_value_r"])
           for r in spark.read.parquet(out_dir).collect()}
    batch = {(r["user_id"], r["session_idx"]):
             (r["session_start"], r["session_end"], r["n_events"], r["sum_value_r"])
             for r in sessionize_batch(ev, gap_minutes=30).collect()}

    # append mode: every emitted session must match the batch twin exactly
    assert got, "stream emitted no sessions"
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])
    # completeness: any session whose end + gap is older than the final
    # watermark (max_ts - 1h) must have been emitted
    from datetime import timedelta
    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - timedelta(hours=1) - timedelta(minutes=30)
    must_emit = {k for k, v in batch.items() if v[1] < horizon}
    assert must_emit <= set(got), f"missing {len(must_emit - set(got))} finalizable sessions"
