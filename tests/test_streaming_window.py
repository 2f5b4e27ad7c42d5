"""Structured Streaming windowed aggregation over the events fixture:
watermark + tumbling window, availableNow trigger, checked against the
equivalent batch aggregation.

The events parquet has stored TIMESTAMP(NANOS) (read as long nanos under
spark.sql.legacy.parquet.nanosAsLong) or plain microsecond timestamps
(read as TIMESTAMP_NTZ); the stream normalizes either to TIMESTAMP the
same way sources.tables.events / streaming.sessionize do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flouds_vectordb_spark.sources.tables import events
from tests.conftest import SF_SMALL


def _windowed(df):
    return (
        df.groupBy(F.window("ts", "1 day"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            # fixed-point micro-units: float sums are accumulation-order
            # dependent between the streaming state store and the batch
            # hash aggregate; integer sums are exact either way
            (F.sum(F.round(F.col("value") * 1e6, 0).cast("long")).cast("double") / 1e6)
            .alias("_sv"),
        )
        .select(F.col("window.start").alias("ws"), "event_type", "n",
                F.round("_sv", 4).alias("sum_value"))
    )


def test_stream_tumbling_window_matches_batch(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))

    raw_schema = spark.read.parquet(f"{SF_SMALL}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(SF_SMALL)
    )
    # normalize ts to TIMESTAMP whatever the testdata generation stored:
    # long nanos (nanosAsLong sessions) -> exact integer truncation;
    # TIMESTAMP_NTZ (plain us parquet) -> session-tz cast (UTC session, so
    # wall-clock preserving). Watermarks accept only TIMESTAMP.
    if dict(stream.dtypes)["ts"] in ("bigint", "long"):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    stream = stream.withWatermark("ts", "1 hour")
    q = (
        _windowed(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .start(out_dir)
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    got = spark.read.parquet(out_dir)
    batch = _windowed(events(spark, SF_SMALL))
    g = {(r["ws"], r["event_type"]): (r["n"], r["sum_value"]) for r in got.collect()}
    b = {(r["ws"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    # append mode emits only windows closed by the watermark; every emitted
    # window must match the batch result
    assert g, "stream produced no closed windows"
    for k, v in g.items():
        assert b[k] == v
    # completeness by the watermark contract (not fixture-timing luck): any
    # day window ENDING before the final watermark (max ts - 1 h) must be out
    from datetime import timedelta
    max_ts = events(spark, SF_SMALL).agg(F.max("ts")).first()[0]
    horizon = max_ts - timedelta(hours=1)
    must_emit = {k for k in b if k[0] + timedelta(days=1) < horizon}
    assert must_emit <= set(g), f"missing {len(must_emit - set(g))} closed windows"
