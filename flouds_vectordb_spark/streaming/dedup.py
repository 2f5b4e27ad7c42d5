"""Streaming exact dedup — content-hash first-arrival filter.

The streaming face of operators/dedup.dedup_exact for a continuous
training-data ingest: each micro-batch keeps only documents whose
normalized-content hash has not been seen before. State is the set of
seen hashes (scalars), managed by Spark's streaming dedup operator:

- `stream_dedup_exact(stream)`: unbounded state — exact forever, state
  grows with distinct content (one 8-byte hash + overhead per distinct
  doc; fine for bounded corpora, the honest caveat for infinite ones).
- `stream_dedup_exact(stream, ts_col=..., within=...)`:
  `dropDuplicatesWithinWatermark` — state bounded by the watermark
  horizon, the 100 TB/day design: duplicates arriving within `within` of
  each other collapse; a re-arrival after the horizon is admitted again
  (the same contract Spark's own operator documents).

Semantics vs the batch operator: batch dedup_exact keeps min(id) per
hash; the stream keeps the FIRST ARRIVAL per hash (processing order) —
the only causal choice online. The equivalence test feeds arrivals in id
order so both pick the same survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.hashing import hash64
from flouds_vectordb_spark.operators.dedup import _norm


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the batch operator's content_hash (same normalization + md5
    derivation, so stream and batch agree on what a duplicate is)."""
    return df.withColumn("content_hash", hash64(_norm(F.col(text_col))))


def stream_dedup_exact(stream: DataFrame, text_col: str = "text",
                       ts_col: str | None = None,
                       within: str | None = None) -> DataFrame:
    """First-arrival-per-content-hash filter over a streaming DataFrame."""
    hashed = with_content_hash(stream, text_col)
    if within is not None:
        if ts_col is None:
            raise ValueError("within requires ts_col (the event-time column)")
        return (hashed
                .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
                .withWatermark(ts_col, within)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    return hashed.dropDuplicates(["content_hash"])
