"""CSV bulk-load source — the same EmbeddedVector record shape as the
reference's JSON insert payload (`app/models/embedded_vector.py:26-33`),
as a flat-file bulk format the reference does not have but every offline
pipeline feeding a vector store does.

Wire format (header row required, standard CSV quoting):

    key,chunk,model,metadata,vector
    doc-1,"some text",m64,"{""lang"": ""en""}","0.1;−0.2;..."

- `vector` is a single ';'-joined float string (CSV has no nested types;
  a fixed scalar encoding keeps the read schema-first — no inference
  scan, exactly like the JSON source).
- `metadata` is a JSON object string, parsed with the same map schema the
  JSON source uses; empty/missing -> {}.

Everything downstream is SHARED with the JSON path: to_collection_batch,
validate_insert_request (all reference insert validators in one
aggregation), and CollectionWriter.insert_data — one arrival mode more,
zero new sink code. Scale shape: schema-first read, one projection to
parse vector/metadata, then the shared single-aggregation validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flouds_vectordb_spark.sources.json_ingest import (
    ingest_batch,
    to_collection_batch,
)

CSV_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("chunk", T.StringType()),
    T.StructField("model", T.StringType()),
    T.StructField("metadata", T.StringType()),
    T.StructField("vector", T.StringType()),
])

VECTOR_SEP = ";"


def read_embedded_vectors_csv(spark: SparkSession, path: str) -> DataFrame:
    """EmbeddedVector records from CSV with the explicit schema (no
    inference pass); malformed rows fail loudly like the JSON source —
    structurally broken rows via FAILFAST, unparseable metadata JSON via
    an explicit raise_error guard (from_json alone would silently NULL,
    and to_collection_batch would coerce that to {}). A non-numeric
    vector element try_casts to NULL and is rejected by the shared
    validator's NULL-ELEMENT rule (validate_insert_request n_null_elem —
    the dimension check cannot see it: the split still has dim entries).

    multiLine=true honors RFC 4180 quoted embedded newlines. The scale
    cost is explicit: multiLine CSV files are not SPLITTABLE (one task
    per file) — parallelism comes from the file count, so bulk producers
    should write many moderate files (every distributed writer already
    does) or keep fields newline-free."""
    # escape='"' = RFC 4180 doubled-quote escaping — the format every
    # external CSV producer writes; Spark's default escape is backslash
    raw = (spark.read.schema(CSV_SCHEMA)
           .option("header", "true").option("escape", '"')
           .option("multiLine", "true")
           .option("mode", "FAILFAST").csv(path))
    # try_cast, not cast: under ANSI mode a non-numeric element would
    # throw NumberFormatException mid-stage; NULL instead flows into the
    # shared validator, which names the violated rule
    vec = F.transform(
        F.split(F.col("vector"), VECTOR_SEP),
        lambda x: x.try_cast("float"))
    parsed = F.from_json(
        F.col("metadata"), T.MapType(T.StringType(), T.StringType()))
    meta = F.when(
        F.col("metadata").isNotNull() & (F.trim("metadata") != "")
        & parsed.isNull(),
        F.raise_error(F.concat(
            F.lit("malformed metadata JSON in CSV record: "),
            F.substring(F.col("metadata"), 1, 200))),
    ).otherwise(parsed)
    return raw.select(
        "key", "chunk", "model",
        meta.alias("metadata"),
        F.when(F.col("vector").isNotNull(), vec).alias("vector"))


def ingest_csv(spark: SparkSession, path: str, writer, batch_ts: int,
               enforce_request_caps: bool = True, **insert_kwargs) -> dict:
    """End-to-end source->sink: CSV -> validated collection batch ->
    CollectionWriter.insert_data — literally the same pipeline tail as
    the JSON source (json_ingest.ingest_batch)."""
    return ingest_batch(
        to_collection_batch(read_embedded_vectors_csv(spark, path)),
        writer, batch_ts, enforce_request_caps=enforce_request_caps,
        **insert_kwargs)
