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


def test_stream_ingest_maintains_dense_index(spark, tmp_path_factory):
    """A micro-batch arriving AFTER build_index goes through the same
    O(batch) index-append path as a REST insert (here: the HNSW graph
    insert) — streamed rows are immediately visible to
    search(use_index=True), the growing-segment contract."""
    import numpy as np

    from flouds_vectordb_spark.operators.dense_search import DenseSearchRequest

    rng = np.random.RandomState(11)
    wh = tmp_path_factory.mktemp("wh_stream_idx")
    cat = Catalog(spark, str(wh))
    cat.set_vector_store("s2")
    cat.generate_schema(CollectionSpec("s2", "m", dimension=8,
                                       metric_type="COSINE", index_type="HNSW"))
    writer = CollectionWriter(cat, "s2", "m")
    base = spark.createDataFrame(
        [(f"k{i}", f"doc {i}", [float(x) for x in rng.uniform(-1, 1, 8)])
         for i in range(80)],
        "id string, chunk string, vector array<float>")
    writer.insert_data(base, batch_ts=1, force_flush=True)
    writer.build_index()

    target = [float(x) for x in rng.uniform(-1, 1, 8)]
    src_dir = tmp_path_factory.mktemp("stream_idx_src")
    spark.createDataFrame(
        [("streamed", "late arrival", target)],
        "id string, chunk string, vector array<float>",
    ).write.mode("overwrite").parquet(str(src_dir / "data"))
    stream = (
        spark.readStream.schema("id string, chunk string, vector array<float>")
        .parquet(str(src_dir / "data"))
    )
    q = stream_ingest(stream, writer, str(src_dir / "ckpt"),
                      auto_flush_min_batch=-1)  # never flush: index append only
    assert q.awaitTermination(300), "stream did not finish in time"

    req = DenseSearchRequest(query_vector=target, metric="COSINE", limit=1,
                             score_threshold=None)
    got = writer.search(req, use_index=True, id_col="id", vector_col="vector",
                        chunk_col="chunk").collect()
    assert got[0]["id"] == "streamed" and got[0]["chunk"] == "late arrival"
