"""Structured Streaming ingest -> the batch upsert sink (foreachBatch)."""

from __future__ import annotations

import pytest

from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
from flouds_vectordb_spark.operators.upsert import CollectionWriter
from flouds_vectordb_spark.streaming.ingest import stream_ingest


def test_stream_ingest_lands_in_collection(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh_stream")
    cat = Catalog(spark, str(wh))
    cat.set_vector_store("s1")
    cat.generate_schema(CollectionSpec("s1", "m", dimension=2))
    writer = CollectionWriter(cat, "s1", "m")

    src_dir = tmp_path_factory.mktemp("stream_src")
    batch = spark.createDataFrame(
        [("a", "hello", [1.0, 0.0]), ("b", "world", [0.0, 1.0])],
        "id string, chunk string, vector array<float>",
    )
    batch.write.mode("overwrite").parquet(str(src_dir / "data"))

    stream = (
        spark.readStream.schema("id string, chunk string, vector array<float>")
        .parquet(str(src_dir / "data"))
    )
    q = stream_ingest(stream, writer, str(src_dir / "ckpt"), auto_flush_min_batch=1)
    assert q.awaitTermination(300), "stream did not finish in time"

    latest = {r["id"]: r["chunk"] for r in writer.read_latest().collect()}
    assert latest == {"a": "hello", "b": "world"}
