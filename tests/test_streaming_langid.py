"""Streaming language ID: lang_id is a pure map (one Arrow UDF per
micro-batch split, no shuffle, no state), so it applies to a readStream
unchanged — the streaming result must equal the batch result row for
row. Also pins spread_small_input's streaming guard (it must not touch
.rdd on a streaming frame).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.langid import lang_id
from tests.conftest import SF_SMALL


def test_stream_lang_id_matches_batch(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))

    schema = spark.read.parquet(f"{SF_SMALL}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMALL)
        .select(F.col("doc_id").alias("id"), "text")
    )
    q = (
        lang_id(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .start(out_dir)
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    got = {r["id"]: (r["lang"], r["distance"])
           for r in spark.read.parquet(out_dir).collect()}
    batch = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text")
    want = {r["id"]: (r["lang"], r["distance"])
            for r in lang_id(batch).collect()}
    assert got == want and got
