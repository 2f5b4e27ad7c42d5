"""Streaming MinHash near-dup candidates vs the batch operator: the
flagged-arrival set must equal the batch candidates' later sides when
arrivals are fed in id order; band hashes must be bit-identical."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.dedup import dedup_minhash
from flouds_vectordb_spark.streaming.neardup import band_hashes_expr, stream_near_dup_flags

T0 = datetime(2025, 6, 1, 12, 0, 0)

_BASE = ("spark shuffles keyed data across executors while the optimizer "
         "prunes columns and pushes filters into the parquet scan")
_DOCS = [
    (1, _BASE),
    (2, _BASE + " with one extra tail"),               # near-dup of 1
    (3, "an entirely different document about cooking pasta at home with "
        "fresh tomatoes basil and olive oil on a sunday afternoon"),
    (4, _BASE + " with a second different tail"),      # near-dup of 1
    (5, "yet another unrelated text mentioning mountains rivers forests "
        "and the long hiking trails that cross them in every season"),
]


def test_band_hashes_match_batch_operator(spark):
    from flouds_vectordb_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_SIGS,
        minhash_signatures,
    )
    from flouds_vectordb_spark.functions.hashing import hash64

    df = spark.createDataFrame(_DOCS, "id long, text string")
    stream_bands = {r["id"]: r["b"] for r in df.select(
        "id", band_hashes_expr(F.col("text")).alias("b")).collect()}
    sigs = minhash_signatures(df)
    rows_per_band = MINHASH_SIGS // MINHASH_BANDS
    batch_cols = []
    for b in range(MINHASH_BANDS):
        parts = [F.col(f"sig{b * rows_per_band + r}").cast("string")
                 for r in range(rows_per_band)]
        batch_cols.append(hash64(F.concat_ws("|", *parts), seed=1000 + b).alias(f"b{b}"))
    batch_bands = {r["id"]: [r[f"b{b}"] for b in range(MINHASH_BANDS)]
                   for r in sigs.select("id", *batch_cols).collect()}
    assert stream_bands == batch_bands


def test_stream_flags_match_batch_candidates(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("src") / "docs")
    out = str(tmp_path_factory.mktemp("out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    rows = [(i, t, T0 + timedelta(minutes=i)) for i, t in _DOCS]
    schema = "id long, text string, ts timestamp"
    for j in range(2):  # two micro-batches, id order == arrival order
        chunk = [r for k, r in enumerate(rows) if k % 2 == j]
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.1)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (stream_near_dup_flags(stream, within="2 hours")
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("parquet").start(out))
    assert q.awaitTermination(300)
    flags = spark.read.parquet(out).collect()
    flagged = {r["id"] for r in flags}
    owners = {(r["id"], r["owner_id"]) for r in flags}

    # batch LSH candidates (pre-verify) on the same corpus
    df = spark.createDataFrame(_DOCS, "id long, text string")
    pairs = dedup_minhash(df, jaccard_threshold=0.0)
    batch_later = {r["id_b"] for r in pairs.collect()}
    assert flagged == batch_later
    # every flag points at an EARLIER arrival
    assert all(o < i for i, o in owners)
    # near-dups of doc 1 are flagged against it; distinct docs are not
    assert {2, 4} <= flagged and 3 not in flagged and 5 not in flagged


def test_stream_empty_docs_never_band(spark):
    """Streaming twin of test_minhash_empty_docs_never_pair: zero-shingle
    docs (empty/whitespace text) must emit NO band entries — without the
    guard every NULL-signature doc collapses into the constant hash64('')
    bucket per band and each empty arrival is flagged against the first,
    breaking the 'bit-identical to the batch operator' contract (the
    batch path filters size(shingles) > 0 before banding)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t\n"),
         (4, "real words in a document here with enough tokens to shingle")],
        "id long, text string")
    bands = {r["id"]: r["b"] for r in df.select(
        "id", band_hashes_expr(F.col("text")).alias("b")).collect()}
    assert bands[1] == [] and bands[2] == [] and bands[3] == []
    assert len(bands[4]) > 0
    # posexplode of an empty array emits no rows -> empty docs can never
    # reach the stateful bucket tracker at all
    n = df.select(F.posexplode(band_hashes_expr(F.col("text")))).count()
    assert n == len(bands[4])
