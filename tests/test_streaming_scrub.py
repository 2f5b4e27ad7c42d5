"""Streaming PII scrubbing: scrub_pii (r11 Arrow rewrite) is a pure map
(one pandas_udf pass per micro-batch split, no shuffle, no state), so it
applies to a readStream unchanged — the streaming result must equal the
batch result row for row, redacted text and per-class counts included.
Also pins spread_small_input's target-capped spread on the streaming
path (it must not touch .rdd on a streaming frame).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.text_analysis import scrub_pii
from tests.conftest import SF_SMALL


def _inject(df):
    """The text_scrub_pii gate's deterministic PII injection, so the
    stream exercises real redactions, not just pass-through."""
    return df.withColumn(
        "text",
        F.when(F.col("id") % 5 == 0,
               F.concat(F.col("text"),
                        F.lit(" contact user"), F.col("id").cast("string"),
                        F.lit("@example.com from 10.0."),
                        (F.col("id") % 200).cast("string"), F.lit(".7")))
        .otherwise(F.col("text")))


def test_stream_scrub_pii_matches_batch(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))

    schema = spark.read.parquet(f"{SF_SMALL}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMALL)
        .select(F.col("doc_id").alias("id"), "text")
        .transform(_inject)
    )
    q = (
        scrub_pii(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .start(out_dir)
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    got = {r["id"]: (r["text_scrubbed"], r["n_email"], r["n_ipv4"],
                     r["n_ssn"], r["n_ccard"], r["n_phone"])
           for r in spark.read.parquet(out_dir).collect()}
    batch = _inject(spark.read.parquet(f"{SF_SMALL}/documents.parquet")
                    .select(F.col("doc_id").alias("id"), "text"))
    want = {r["id"]: (r["text_scrubbed"], r["n_email"], r["n_ipv4"],
                      r["n_ssn"], r["n_ccard"], r["n_phone"])
            for r in scrub_pii(batch).collect()}
    assert got == want and got
    # injection actually redacted something
    assert any(v[1] > 0 for v in got.values())
