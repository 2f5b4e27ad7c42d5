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

from flouds_vectordb_spark.functions.hashing import (
    RANGE_BUCKET_W,
    RANGE_BUCKETS,
    hash64,
    hash64_sql,
)
from flouds_vectordb_spark.functions.text import tokenize_sql

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


# --- corpus mixing: per-source token budgets (r8) -------------------------------

# range-bucket geometry shared across the two-phase operators
# (functions/hashing.py owns it so retuning can't drift per operator)
_NB = RANGE_BUCKETS
_BUCKET_W = RANGE_BUCKET_W


def sample_token_budget(df: DataFrame, budgets: dict, source_col: str = "source",
                        text_col: str = "text", key_col: str = "id",
                        seed: int = 0) -> DataFrame:
    """Deterministic corpus mixing — the pretraining "data mixture" stage:
    for each source with a token budget, keep the hash-ranked prefix of
    its documents whose running (inclusive) whitespace-token total stays
    within the budget; sources without a budget drop entirely. Membership
    is a pure function of (seed, data): the rank key is the content hash,
    so the kept prefix is an unbiased pseudo-random subset, reproducible
    across partitioning, cluster size, and engine. Greedy-prefix rule:
    once the running total exceeds the budget, every later-ranked doc of
    that source drops even if it would individually fit (the standard
    reproducible-mixture contract — no knapsack refitting).

    100 TB shape (two-phase, no per-source serial window over the corpus):
    a naive per-source running-sum window puts one whole source in one
    window partition — the worst skew possible. Instead: (1) one scalar
    projection (key, source, hash, n_tokens) range-buckets the hash space
    into _NB (1024) contiguous ranges and aggregates token sums per (source,
    bucket) — map-side combinable, |sources| x _NB rows to the driver;
    (2) the driver prefix-sums each source's buckets in hash order and
    classifies each bucket full-keep (cum_through <= B), full-drop
    (cum_before > B), or THE one boundary bucket; (3) full-keep buckets
    become a pure filter (no shuffle touches text), and only the boundary
    bucket's rows (~1/_NB of one source) take the row-level running-sum
    window with the remaining budget. Bit-identical to the single-window
    definition the DuckDB twin uses."""
    from flouds_vectordb_spark.functions.text import tokenize

    if not budgets:
        raise ValueError("budgets must name at least one source")
    for s, b in budgets.items():
        if int(b) < 0:
            raise ValueError(f"negative budget for source {s!r}")
    h = hash64(F.col(key_col).cast("string"), seed=seed)
    # NULL text tokenizes to NULL: count it as 0 tokens (keepable for
    # free) in BOTH engines rather than crash/NULL-poison the sums
    nt = F.coalesce(F.size(tokenize(F.col(text_col))), F.lit(0))
    work = (df.filter(F.col(source_col).isin(list(budgets)))
            .withColumn("_h", h).withColumn("_nt", nt)
            .withColumn("_bk", F.floor(F.col("_h") / F.lit(_BUCKET_W))))
    sums = (work.groupBy(source_col, "_bk").agg(F.sum("_nt").alias("_ts"))
            .collect())
    per_src: dict = {}
    for r in sums:
        per_src.setdefault(r[source_col], []).append((int(r["_bk"]), int(r["_ts"] or 0)))
    keep_full: list = []   # (source, bucket) fully kept
    boundary: dict = {}    # source -> (bucket, remaining_budget)
    for src, buckets in per_src.items():
        budget = int(budgets[src])
        cum = 0
        for bk, ts in sorted(buckets):
            if cum + ts <= budget:
                keep_full.append((src, bk))
                cum += ts
            elif cum <= budget:
                boundary[src] = (bk, budget - cum)
                break  # later buckets: cum_before > budget -> full drop
            else:  # pragma: no cover - loop breaks before reaching here
                break
    # membership via broadcast LITERAL-TABLE joins, not OR chains: a
    # `(source == s AND _bk == b) OR ...` filter collapses into the scan
    # projection and re-inlines _bk's md5 expression PER COMPARISON —
    # hundreds of kept buckets blew the codegen method limit (the same
    # gotcha class as the r8 PSL rewrite; janino fell back to interpreted
    # mode on the example funnel's stage-8 filter). Row membership is
    # identical, so results are bit-unchanged.
    from flouds_vectordb_spark.functions.local import local_df

    spark = df.sparkSession
    # the literal tables use INTERNAL column names and explicit join
    # conditions: splicing source_col into a DDL schema string would
    # break on non-identifier column names ("source name", reserved
    # words) that the old OR-chain handled
    stype = dict(df.dtypes)[source_col]
    if keep_full:
        kf = local_df(spark, sorted(keep_full), f"_src {stype}, _kbk bigint")
        kept = work.join(
            F.broadcast(kf),
            (work[source_col] == kf["_src"]) & (work["_bk"] == kf["_kbk"]),
            "leftsemi")
    else:
        kept = work.filter(F.lit(False))
    if boundary:
        bt = local_df(
            spark,
            [(src, bk, int(r)) for src, (bk, r) in sorted(boundary.items())],
            f"_src {stype}, _bbk bigint, _rem long")
        w = Window.partitionBy(source_col).orderBy(
            F.col("_h").asc(), F.col(key_col).asc())
        brows = (work.join(
                     F.broadcast(bt),
                     (work[source_col] == bt["_src"])
                     & (work["_bk"] == bt["_bbk"]))
                 .drop("_src", "_bbk")
                 .withColumn("_cum", F.sum("_nt").over(
                     w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
                 .filter(F.col("_cum") <= F.col("_rem")).drop("_cum", "_rem"))
        kept = kept.unionByName(brows)
    return kept.drop("_h", "_nt", "_bk")


def sample_temperature_mix(df: DataFrame, total_budget: int,
                           alpha: float = 0.5, source_col: str = "source",
                           text_col: str = "text", key_col: str = "id",
                           seed: int = 0) -> DataFrame:
    """Temperature-scaled corpus mixing (the multilingual-pretraining
    sampling rule, Conneau & Lample 2019 / mT5): per-source budgets are
    b_s = floor(T * n_s^alpha / sum_s n_s^alpha) tokens, where n_s is the
    source's total token count — alpha < 1 up-weights small sources
    (alpha=1 is proportional, alpha->0 is uniform) — then the greedy
    hash-prefix keep of sample_token_budget applies within each source.

    Determinism across engines: n_s is an exact integer aggregate; the
    weight denominator is folded in SORTED SOURCE ORDER (floating addition
    is order-sensitive — the same sorted-fold contract every scored
    operator uses), and the budget formula is written identically here and
    in the SQL twin, so both engines evaluate the same IEEE expression
    tree. Scale shape: one map-side-combinable (source, sum) agg —
    |sources| scalars to the driver — then sample_token_budget's two-phase
    plan; the text column never shuffles."""
    import math

    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    if not (alpha > 0.0):
        raise ValueError("alpha must be > 0")
    from flouds_vectordb_spark.functions.text import tokenize

    # native source values (str() keys would KeyError in the budget lookup
    # for non-string source columns, and would fold in text order where
    # the twin folds in native order); all-NULL-text sources sum to NULL
    # -> 0 tokens (the twin coalesces identically)
    totals = sorted(
        (r[source_col], int(r["_ns"] or 0))
        for r in df.groupBy(source_col)
        .agg(F.sum(F.size(tokenize(F.col(text_col)))).alias("_ns"))
        .collect())
    denom = 0.0
    for _, ns in totals:  # sorted-source fold order, mirrored in the twin
        denom += math.pow(float(ns), alpha)
    if denom <= 0.0:
        raise ValueError("corpus has no tokens to budget")
    budgets = {src: int(math.floor(total_budget * math.pow(float(ns), alpha)
                                   / denom))
               for src, ns in totals}
    return sample_token_budget(df, budgets, source_col=source_col,
                               text_col=text_col, key_col=key_col, seed=seed)


def sample_temperature_mix_sql(table_sql: str, total_budget: int,
                               alpha: float = 0.5,
                               source_expr: str = "source",
                               text_expr: str = "text", key_expr: str = "id",
                               seed: int = 0) -> str:
    """DuckDB twin: budgets computed in-query with the identical formula
    (sorted-source weight fold, same expression order), then the
    single-window greedy-prefix rule of sample_token_budget_sql."""
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    if not (alpha > 0.0):
        raise ValueError("alpha must be > 0")
    h = hash64_sql(f"({key_expr})::VARCHAR", seed=seed)
    tok = f"coalesce(len({tokenize_sql(text_expr)}), 0)"
    return f"""
WITH _rows AS (
  SELECT *, {h} AS _h, {tok} AS _nt FROM {table_sql}
),
_ns AS (
  SELECT {source_expr} AS _src, coalesce(sum(_nt), 0)::BIGINT AS _tok_total
  FROM _rows GROUP BY 1
),
_den AS (
  SELECT list_reduce(list(pow(_tok_total::DOUBLE, {alpha!r}) ORDER BY _src),
                     (x, y) -> x + y) AS _d
  FROM _ns
),
_b AS (
  SELECT _src,
         floor({total_budget} * pow(_tok_total::DOUBLE, {alpha!r}) / _d)::BIGINT
           AS _budget
  FROM _ns, _den
)
SELECT * EXCLUDE (_h, _nt, _cum, _src, _budget) FROM (
  SELECT *, sum(_nt) OVER (
      PARTITION BY {source_expr} ORDER BY _h ASC, {key_expr} ASC
      ROWS UNBOUNDED PRECEDING) AS _cum
  FROM _rows JOIN _b ON {source_expr} = _src
) WHERE _cum <= _budget
"""


def sample_token_budget_sql(table_sql: str, budgets: dict,
                            source_expr: str = "source",
                            text_expr: str = "text", key_expr: str = "id",
                            seed: int = 0) -> str:
    """DuckDB twin: the single-window formulation of the same rule (keep
    iff the running inclusive token sum in (hash, key) order <= the
    source's budget) — the two-phase Spark plan is an execution strategy,
    not a semantics change, so the results must hash-match exactly."""
    h = hash64_sql(f"({key_expr})::VARCHAR", seed=seed)
    tok = f"coalesce(len({tokenize_sql(text_expr)}), 0)"
    srcs = ", ".join("'" + str(s).replace("'", "''") + "'" for s in budgets)
    cases = " ".join(
        "WHEN '" + str(s).replace("'", "''") + f"' THEN {int(b)}"
        for s, b in sorted(budgets.items()))
    return f"""
SELECT * EXCLUDE (_h, _nt, _cum) FROM (
  SELECT *, sum(_nt) OVER (
      PARTITION BY {source_expr} ORDER BY _h ASC, {key_expr} ASC
      ROWS UNBOUNDED PRECEDING) AS _cum
  FROM (
    SELECT *, {h} AS _h, {tok} AS _nt FROM {table_sql}
    WHERE {source_expr} IN ({srcs})
  )
) WHERE _cum <= (CASE {source_expr} {cases} END)
"""
