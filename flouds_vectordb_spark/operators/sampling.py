"""Deterministic sampling for LLM training-data pipelines.

Beyond the reference's surface (pipeline extension, same family as the
dedup/text operators): reproducible corpus subsetting. Spark's native
`df.sample()` is seed-dependent on partitioning (a repartition changes
which rows survive), which makes pipeline runs unreproducible; both
operators here decide membership from a CONTENT-derived hash
(functions/hashing.py md5-hash64, bit-identical in DuckDB), so the sample
is a pure function of the data — stable across partitioning, cluster
size, and engine.

- `sample_fraction`: keep rows whose hash64(key) mod DENOM falls below
  fraction*DENOM. One scan, no shuffle, filter fully pushed into the
  projection; exact-ratio in expectation per Bernoulli sampling.
- `sample_stratified`: per-stratum deterministic top-n by (hash, key)
  rank — a fixed-size quota per stratum (e.g. n docs per language), the
  balanced-subset op every multilingual pipeline needs. One keyed shuffle
  (window per stratum); the rank key is the hash, so the quota is an
  unbiased pseudo-random subset, reproducible forever.

At 100 TB: sample_fraction is embarrassingly parallel. sample_stratified
shuffles only (stratum, hash, key) scalars — payload joins back for
survivors would be the late-materialization variant; with n per stratum
small, the window state per partition is bounded by the quota.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.hashing import hash64, hash64_sql

_DENOM = 1_000_000


def sample_fraction(df: DataFrame, fraction: float, key_col: str = "id",
                    seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli sample: membership is a pure function of
    (seed, key) — reproducible across partitioning/engines."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * _DENOM)
    h = hash64(F.col(key_col).cast("string"), seed=seed)
    return df.filter(F.pmod(h, F.lit(_DENOM)) < F.lit(cut))


def sample_fraction_sql(table_sql: str, fraction: float, key_expr: str = "id",
                        seed: int = 0) -> str:
    cut = int(fraction * _DENOM)
    h = hash64_sql(f"({key_expr})::VARCHAR", seed=seed)
    return (f"SELECT * FROM {table_sql} "
            f"WHERE ({h}) % {_DENOM} < {cut}")


def sample_stratified(df: DataFrame, stratum_col: str, n_per_stratum: int,
                      key_col: str = "id", seed: int = 0) -> DataFrame:
    """Per-stratum deterministic quota: the n rows with the smallest
    (hash64(seed|key), key) per stratum. Ties impossible (key is unique),
    so the subset is exact and engine-independent."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    h = hash64(F.col(key_col).cast("string"), seed=seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def sample_stratified_sql(table_sql: str, stratum_expr: str, n_per_stratum: int,
                          key_expr: str = "id", seed: int = 0) -> str:
    h = hash64_sql(f"({key_expr})::VARCHAR", seed=seed)
    return f"""
SELECT * EXCLUDE (_rk) FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {stratum_expr} ORDER BY {h} ASC, {key_expr} ASC) AS _rk
  FROM {table_sql}
) WHERE _rk <= {n_per_stratum}
"""
