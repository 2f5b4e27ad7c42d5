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
    collection schema (id, chunk, vector[, sparse_vector, meta]); batch_ts is
    stamped per micro-batch from the epoch id."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        writer.insert_data(batch, batch_ts=epoch_id,
                           auto_flush_min_batch=auto_flush_min_batch)

    out = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        out = out.trigger(availableNow=True)
    return out.start()
