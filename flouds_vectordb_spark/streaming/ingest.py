"""Continuous ingest: Structured Streaming -> the batch upsert sink.

The reference's insert path is append/upsert batches with deferred flush
(app/milvus/vector_store.py:369-387) — the closest thing it has to a
stream (SURVEY.md §1.1). Re-expressed Spark-first: a `readStream` source
feeds `foreachBatch`, and every micro-batch goes through EXACTLY the same
code path as a REST insert — dimension validation (I2), append, flush
policy (I3). One implementation, two arrival modes.

Scale notes: foreachBatch gives exactly-once per micro-batch against the
append-only segment layout (each batch writes new files; replays overwrite
by batch_ts, and latest-wins reads make duplicates harmless). Checkpointing
is the stream's source-offset checkpoint; at 100 TB the sink would be a
transactional table format, but the append+compact contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from flouds_vectordb_spark.operators.upsert import AUTO_FLUSH_MIN_BATCH, CollectionWriter


def stream_ingest(
    stream_df: DataFrame,
    writer: CollectionWriter,
    checkpoint_dir: str,
    auto_flush_min_batch: int = AUTO_FLUSH_MIN_BATCH,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Attach a streaming source to a collection. `stream_df` must match the
    collection schema (id, chunk, vector[, sparse_vector, meta]).

    batch_ts is stamped `base + epoch_id`, where base is read ONCE at
    attach time as (current max batch_ts in the collection) + 1. A raw
    epoch_id would restart at 0 on a fresh checkpoint and lose latest-wins
    to rows written earlier with higher ts; anchoring to the stored maximum
    keeps stream rows newer than everything already stored, while replays
    of the SAME epoch (failure recovery within one run) still reuse one ts
    — duplicates stay harmless."""
    from pyspark.sql import functions as F

    try:
        row = writer.catalog.read_collection(writer.tenant, writer.model) \
            .agg(F.max("batch_ts")).first()
        base = (int(row[0]) if row[0] is not None else -1) + 1
    except Exception:
        base = 0

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        writer.insert_data(batch, batch_ts=base + epoch_id,
                           auto_flush_min_batch=auto_flush_min_batch)

    out = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        out = out.trigger(availableNow=True)
    return out.start()
