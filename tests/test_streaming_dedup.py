"""Streaming exact dedup vs the batch operator: first-arrival filtering
across micro-batches, bounded-state watermark variant."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.dedup import dedup_exact
from flouds_vectordb_spark.streaming.dedup import stream_dedup_exact

T0 = datetime(2025, 6, 1, 12, 0, 0)


def _rows():
    # ids ascending == arrival order; dup content appears across batches
    return [
        (1, "the quick brown fox", T0),
        (2, "The  QUICK brown fox", T0 + timedelta(minutes=1)),  # dup of 1
        (3, "something else entirely", T0 + timedelta(minutes=2)),
        (4, "the quick brown fox", T0 + timedelta(minutes=90)),  # dup of 1, late
        (5, "a third distinct document", T0 + timedelta(minutes=91)),
    ]


def _run_stream(spark, tmp_path_factory, n_files, make_stream):
    src = str(tmp_path_factory.mktemp("src") / "docs")
    out = str(tmp_path_factory.mktemp("out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    rows = _rows()
    schema = "id long, text string, ts timestamp"
    for i in range(n_files):
        chunk = [r for j, r in enumerate(rows) if j % n_files == i]
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.1)  # mtime order == arrival order
    stream = (spark.readStream.schema(
        spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src))
    q = (make_stream(stream)
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("parquet").start(out))
    assert q.awaitTermination(300)
    return spark.read.parquet(out)


def test_stream_dedup_matches_batch_survivors(spark, tmp_path_factory):
    got = _run_stream(spark, tmp_path_factory, 3,
                      lambda s: stream_dedup_exact(s))
    surviving = sorted(r["id"] for r in got.collect())
    # batch keeper = min(id) per hash; arrival order == id order here, so
    # first-arrival survivors equal the batch keepers
    batch = dedup_exact(spark.createDataFrame(_rows(),
                        "id long, text string, ts timestamp"))
    keepers = sorted(r["keeper_id"] for r in
                     batch.select("keeper_id").distinct().collect())
    assert surviving == keepers == [1, 3, 5]


def test_stream_dedup_within_watermark_readmits_after_horizon(spark, tmp_path_factory):
    """Two availableNow runs over one checkpoint (deterministic batch
    boundary): run 1 advances the watermark past the first fox's 10-min
    horizon and evicts its hash; run 2's re-arrival is admitted again."""
    src = str(tmp_path_factory.mktemp("src2") / "docs")
    out = str(tmp_path_factory.mktemp("out2"))
    ckpt = str(tmp_path_factory.mktemp("ckpt2"))
    schema = "id long, text string, ts timestamp"

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .parquet(src))
        q = (stream_dedup_exact(stream, ts_col="ts", within="10 minutes")
             .writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .format("parquet").start(out))
        assert q.awaitTermination(300)

    rows = _rows()
    run(rows[:3] + [rows[4]])   # 1, 2(dup of 1), 3, 5@+91min
    run([rows[3]])              # 4: same content as 1, 90 min later
    surviving = sorted(r["id"] for r in spark.read.parquet(out).collect())
    # 2 collapsed into 1 (1 min apart, inside the horizon); 4 re-admitted
    # (run 1's final watermark 13:21 evicted the fox hash whose horizon
    # ended 12:10)
    assert surviving == [1, 3, 4, 5]
