"""JSON ingest source — the reference's insert payload as a Spark source.

The reference ingests exclusively via REST JSON: `InsertEmbeddedRequest`
(`/root/reference/app/models/insert_request.py:19-36`) carries a list of
`EmbeddedVector` records `{key, chunk, model, metadata, vector}`
(`app/models/embedded_vector.py:26-33`). This module reads the same records
as JSON-lines into the collection batch shape, re-expressing the request
validators as Spark aggregations:

- non-empty data, max 1000 vectors/request  (insert_request.py:66-70)
- unique, non-empty primary keys            (insert_request.py:96-105)
- chunk length <= 60000 chars               (insert_request.py:80-83)
- vector dimension == collection dim        (I2, vector_store.py:332-352)
- vector element bound |x| <= 1e6           (input_validator.py:241-249)
- serialized metadata length <= collection
  metadata_length                           (base_milvus.py VARCHAR
  max_length on the meta field; the reference stores
  `dumps(metadata)` per vector_store.py:286)

Scale notes: the read uses an EXPLICIT schema — no inference pass over the
data (inference samples the whole input; at 100 TB that is a full extra
scan). All validations fold into ONE aggregation job over the batch. The
per-request 1000-row cap is an API-contract artifact; `enforce_request_caps`
keeps it for parity and turns it off for bulk loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_VECTORS_PER_REQUEST = 1000  # insert_request.py:70
MAX_CHUNK_CHARS = 60000  # insert_request.py:81
MAX_VECTOR_ELEMENT = 1e6  # input_validator.py:247-248: abs(val) > 1e6 rejected
DEFAULT_METADATA_LENGTH = 4096  # base_milvus.py:1001 generate-schema default

EMBEDDED_VECTOR_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("chunk", T.StringType()),
    T.StructField("model", T.StringType()),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    T.StructField("vector", T.ArrayType(T.FloatType())),
])


EMBEDDED_VECTOR_FIELDS = tuple(f.name for f in EMBEDDED_VECTOR_SCHEMA.fields)


def read_embedded_vectors_json(spark: SparkSession, path: str,
                               dynamic_fields: bool = False) -> DataFrame:
    """Read EmbeddedVector JSON-lines with the explicit schema (no
    inference scan); malformed lines fail loudly (FAILFAST) like the
    reference's pydantic parse.

    dynamic_fields=True (enable_dynamic_field collections,
    base_milvus.py:992-997): unknown top-level keys are captured into an
    `_extras` map<string,string> — one text scan, two JSON parses per
    line, still no inference pass. Values are stored as their JSON-literal
    strings (from_json's map coercion), Milvus's
    store-whatever-the-client-sent contract. A malformed line makes the
    MAP parse NULL (the struct parse yields an all-NULL row, which is
    indistinguishable from an empty object) — a raise_error guard on it
    keeps the dynamic path's parse-failure contract equivalent to
    FAILFAST (errors at action time, no extra scan, no driver job).
    Field-level type mismatches on an otherwise-valid line surface
    through the request validators (validate_insert_request), same as
    the schema-first path's nulled fields."""
    if not dynamic_fields:
        return (spark.read.schema(EMBEDDED_VECTOR_SCHEMA)
                .option("mode", "FAILFAST").json(path))
    raw = spark.read.text(path).filter(F.trim("value") != "")
    known = F.array(*[F.lit(k) for k in EMBEDDED_VECTOR_FIELDS])
    mapped = F.from_json("value", T.MapType(T.StringType(), T.StringType()))
    checked_map = F.when(
        mapped.isNull(),
        F.raise_error(F.concat(
            F.lit("malformed EmbeddedVector JSON line: "),
            F.substring(F.col("value"), 1, 200))),
    ).otherwise(mapped)
    extras = F.map_filter(checked_map, lambda k, _: ~F.array_contains(known, k))
    empty = F.from_json(F.lit("{}"), T.MapType(T.StringType(), T.StringType()))
    return raw.select(
        F.from_json("value", EMBEDDED_VECTOR_SCHEMA).alias("_r"),
        F.coalesce(extras, empty).alias("_extras"),
    ).select("_r.*", "_extras")


def to_collection_batch(df: DataFrame) -> DataFrame:
    """EmbeddedVector records -> the collection batch shape
    (id, chunk, vector, meta [, _extras])."""
    cols = [
        F.col("key").alias("id"),
        F.col("chunk"),
        F.col("vector"),
        F.coalesce(
            F.col("metadata"),
            F.from_json(F.lit("{}"), T.MapType(T.StringType(), T.StringType())),
        ).alias("meta"),
    ]
    if "_extras" in df.columns:
        cols.append(F.col("_extras"))
    return df.select(*cols)


def validate_insert_request(batch: DataFrame, dim: int,
                            enforce_request_caps: bool = True,
                            metadata_length: int = DEFAULT_METADATA_LENGTH) -> int:
    """All reference insert validators in ONE aggregation pass; raises
    ValueError with every violated rule listed. Returns the row count.

    The metadata bound measures what the reference actually stores: the
    `json.dumps(metadata)` string (vector_store.py:286) checked against the
    meta field's VARCHAR max_length. Spark's to_json is the compact form,
    so the dumps length = to_json length + 2*entries - 1 (": " and ", "
    separators) for non-empty maps. Exact for ASCII meta; non-ASCII chars
    count 1 here vs 6 (\\uXXXX) under dumps(ensure_ascii=True) — a
    documented approximation, not a semantics change."""
    nonempty_id = F.when(F.col("id").isNotNull() & (F.trim("id") != ""), F.col("id"))
    dumps_len = F.when(
        F.col("meta").isNotNull() & (F.size("meta") > 0),
        F.length(F.to_json(F.col("meta"))) + F.size("meta") * 2 - 1,
    ).otherwise(F.lit(2))  # falsy metadata stores the literal "{}"
    stats = batch.agg(
        F.count("*").alias("n"),
        # distinct over NON-EMPTY keys only: empty keys are their own rule
        # and must not mask or fake duplicates among the real keys
        F.count_distinct(nonempty_id).alias("n_keys"),
        F.coalesce(
            F.sum(F.when(F.col("id").isNull() | (F.trim("id") == ""), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_empty_keys"),
        F.coalesce(F.max(F.length("chunk")), F.lit(0)).alias("max_chunk"),
        # chunk is a REQUIRED EmbeddedVector field (pydantic Field(...)) —
        # a missing chunk must be rejected here, not silently inserted as a
        # row every search later drops via the empty-chunk post-filter
        F.coalesce(
            F.sum(F.when(F.col("chunk").isNull() | (F.col("chunk") == ""), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_missing_chunk"),
        F.coalesce(
            F.sum(F.when(F.col("vector").isNull() | (F.size("vector") != dim), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_bad_dim"),
        # NULL elements (JSON "vector": [1.0, null] parses; a non-numeric
        # CSV element try_casts to NULL) would poison every distance
        # downstream — reject here, where the rule can be named
        F.coalesce(
            F.sum(F.when(
                F.exists(F.col("vector"), lambda x: x.isNull()),
                1).otherwise(0)),
            F.lit(0),
        ).alias("n_null_elem"),
        # |x| <= 1e6 (input_validator.py:247-248). NaN must be ACCEPTED to
        # match the reference (Python abs(nan) > 1e6 is False); Spark orders
        # NaN above every number, so abs(NaN) > bound would be TRUE without
        # the explicit isnan guard
        F.coalesce(
            F.sum(F.when(
                F.exists(F.col("vector"),
                         lambda x: ~F.isnan(x) & (F.abs(x) > F.lit(MAX_VECTOR_ELEMENT))),
                1).otherwise(0)),
            F.lit(0),
        ).alias("n_big_elem"),
        F.coalesce(F.max(dumps_len), F.lit(0)).alias("max_meta_len"),
    ).first()
    problems = []
    if stats["n"] == 0:
        problems.append("Data list cannot be empty")
    if enforce_request_caps and stats["n"] > MAX_VECTORS_PER_REQUEST:
        problems.append(f"Maximum {MAX_VECTORS_PER_REQUEST} vectors per request")
    if stats["n_empty_keys"]:
        problems.append(f"{stats['n_empty_keys']} empty primary keys")
    if stats["n_keys"] != stats["n"] - stats["n_empty_keys"]:
        problems.append("Duplicate primary keys found")
    if stats["max_chunk"] > MAX_CHUNK_CHARS:
        problems.append(
            f"Chunk exceeds maximum length of {MAX_CHUNK_CHARS} characters")
    if stats["n_missing_chunk"]:
        problems.append(f"{stats['n_missing_chunk']} records with missing chunk")
    if stats["n_bad_dim"]:
        problems.append(f"{stats['n_bad_dim']} vectors with dimension != {dim}")
    if stats["n_big_elem"]:
        problems.append(
            f"{stats['n_big_elem']} vectors with an element larger than "
            f"{MAX_VECTOR_ELEMENT:g}")
    if stats["n_null_elem"]:
        problems.append(
            f"{stats['n_null_elem']} vectors with a null (unparseable) element")
    if stats["max_meta_len"] > metadata_length:
        problems.append(
            f"Metadata exceeds maximum length of {metadata_length} characters")
    if problems:
        raise ValueError("; ".join(problems))
    return int(stats["n"])


def ingest_batch(batch: DataFrame, writer, batch_ts: int,
                 enforce_request_caps: bool = True, **insert_kwargs) -> dict:
    """Validated collection batch -> `CollectionWriter.insert_data` — the
    shared pipeline tail of every file-arrival mode (JSON, CSV).
    Dimensions are already checked by validate_insert_request's single
    aggregation, so the sink's per-batch dim scan is skipped (one less job
    over the unpersisted source)."""
    validate_insert_request(
        batch, int(writer.meta["dimension"]),
        enforce_request_caps=enforce_request_caps,
        metadata_length=int(writer.meta.get("metadata_length",
                                            DEFAULT_METADATA_LENGTH)))
    return writer.insert_data(batch, batch_ts=batch_ts,
                              skip_dim_validation=True, **insert_kwargs)


def ingest_json(spark: SparkSession, path: str, writer, batch_ts: int,
                enforce_request_caps: bool = True, **insert_kwargs) -> dict:
    """End-to-end source->sink: JSON-lines -> validated collection batch ->
    `CollectionWriter.insert_data` (same path as every other arrival
    mode)."""
    return ingest_batch(
        to_collection_batch(read_embedded_vectors_json(spark, path)),
        writer, batch_ts, enforce_request_caps=enforce_request_caps,
        **insert_kwargs)
