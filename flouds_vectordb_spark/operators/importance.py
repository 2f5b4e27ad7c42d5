"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The pretraining data-selection stage: given a RAW corpus and a small
TARGET corpus (the distribution you want more of — e.g. curated wiki-grade
quality text), estimate per-document importance weights under hashed
n-gram bag-of-words models and resample raw documents with Gumbel-top-k,
so the kept subset is distributed like the target.

Public-knowledge recipe (the paper's released implementation shape):
- features: word unigrams + bigrams hashed into B buckets;
- bucket log-ratio: log p_target(b) - log p_raw(b), add-k smoothed;
- doc log-weight: sum of its feature counts x bucket log-ratios;
- selection: top n of log_weight + Gumbel noise (the "sampled" variant —
  pure argmax-of-weights over-selects duplicates of one target mode).

Determinism across engines (the repo-wide contract):
- feature hashing is md5-derived hash64 mod B — bit-identical in DuckDB;
- every floating sum folds in sorted bucket order (float addition is
  order-sensitive); log/exp are libm-identical on one box;
- Gumbel noise is HASH-derived, not random: u = (hash64(seed|id)+1) /
  (2^60+1) in (0,1), g = -ln(-ln(u)) — a pure function of (seed, id), so
  the resample is reproducible forever and the oracle can replay it.

Scale shape (100 TB): the two bucket-count aggregations are map-side
combinable to B scalars (B defaults to 8192; the driver never sees text);
the log-ratio table broadcasts; per-doc weights shuffle (id, bucket,
count) scalars only; final selection is a global top-n — TakeOrdered
(a per-partition heap + driver merge of n rows), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.hashing import hash64, hash64_sql
from flouds_vectordb_spark.functions.local import local_df
from flouds_vectordb_spark.functions.text import tokenize, tokenize_sql
from flouds_vectordb_spark.lifecycle import tracked_persist as _persist

_DENOM_U = float((1 << 60) + 1)  # maps hash64's [0, 2^60) onto (0, 1)


def _features(text_col: str):
    """Word unigrams + bigrams of the pipeline tokenization, as one array."""
    toks = tokenize(F.col(text_col))
    bi_n = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.when(
        bi_n > 0,
        F.transform(F.sequence(F.lit(1), bi_n),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                          F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _features_sql(text_expr: str) -> str:
    tok = tokenize_sql(text_expr)
    return (
        f"list_concat({tok}, "
        f"list_transform(generate_series(1, greatest(len({tok}) - 1, 0)), "
        f"i -> {tok}[i] || ' ' || {tok}[i + 1]))"
    )


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int,
                   seed: int) -> DataFrame:
    feats = _features(text_col)
    return (
        df.select(F.explode(feats).alias("_f"))
        .select(F.pmod(hash64(F.col("_f"), seed=seed),
                       F.lit(n_buckets)).alias("_b"))
        .groupBy("_b").count().withColumnRenamed("count", "_cnt")
    )


def _ratios_from_counts(rc: DataFrame, tc: DataFrame, n_buckets: int,
                        smoothing: int) -> DataFrame:
    """(_b, _lr) from PERSISTED (_b, _cnt) count tables — the totals
    collect and the ratio join both read the cache, so each corpus's
    feature extraction runs exactly once. The B-row result materializes
    eagerly into a LocalRelation (it is broadcast by every consumer
    anyway, and doubles survive the repr round-trip bit-exactly), so the
    caller may unpersist rc/tc as soon as this returns."""
    a = int(smoothing)
    spark = rc.sparkSession
    r_tot = int((rc.agg(F.sum("_cnt")).collect()[0][0]) or 0)
    t_tot = int((tc.agg(F.sum("_cnt")).collect()[0][0]) or 0)
    if r_tot == 0 or t_tot == 0:
        raise ValueError("raw and target corpora must both contain tokens")
    r_den = float(r_tot + a * n_buckets)
    t_den = float(t_tot + a * n_buckets)
    # log((tc+a)/t_den) - log((rc+a)/r_den), written as the identical
    # expression tree the SQL twin uses
    buckets = spark.range(n_buckets).select(F.col("id").alias("_b"))
    lazy = (
        buckets.join(rc, "_b", "left").join(tc, "_b", "left")
        .select(
            "_b",
            (F.log((F.coalesce(tc["_cnt"], F.lit(0)).cast("double") + a)
                   / F.lit(t_den))
             - F.log((F.coalesce(rc["_cnt"], F.lit(0)).cast("double") + a)
                     / F.lit(r_den))).alias("_lr"))
    )
    rows = [(r["_b"], r["_lr"]) for r in lazy.collect()]
    return local_df(spark, rows, "_b bigint, _lr double")


def dsir_log_ratios(raw: DataFrame, target: DataFrame, n_buckets: int = 8192,
                    text_col: str = "text", smoothing: int = 1,
                    seed: int = 0) -> DataFrame:
    """(_b, _lr): per-bucket log p_target(b) - log p_raw(b), add-k smoothed
    over hashed unigram+bigram features. B rows — broadcastable anywhere."""
    if int(smoothing) < 1:
        raise ValueError("smoothing must be >= 1")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    rc = _persist(_bucket_counts(raw, text_col, n_buckets, seed))
    tc = _persist(_bucket_counts(target, text_col, n_buckets, seed))
    try:
        return _ratios_from_counts(rc, tc, n_buckets, smoothing)
    finally:
        # _ratios_from_counts returned a LocalRelation: the count tables
        # have no remaining consumers and this operator owns their lifetime
        rc.unpersist()
        tc.unpersist()


def dsir_resample(raw: DataFrame, target: DataFrame, n_keep: int,
                  n_buckets: int = 8192, id_col: str = "id",
                  text_col: str = "text", smoothing: int = 1,
                  seed: int = 0) -> DataFrame:
    """(id, log_weight_r, gumbel_key_r): the n_keep raw documents selected
    by Gumbel-top-k over DSIR importance weights. log_weight_r is the
    doc's summed feature log-ratio (rounded 6dp for cross-engine hashing);
    gumbel_key_r = log_weight + hash-Gumbel(seed|id) decides selection —
    ties broken by id. Zero-token documents carry weight 0 and compete on
    noise alone (the paper drops them upstream; gates here keep the rule
    total so every input row is accounted for)."""
    if n_keep < 1:
        raise ValueError("n_keep must be >= 1")
    if int(smoothing) < 1:
        raise ValueError("smoothing must be >= 1")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    d = raw.select(F.col(id_col).alias("id"), _features(text_col).alias("_fs"))
    # per-doc bucket counts persist ONCE and the raw bucket counts derive
    # from them — the raw corpus's feature extraction (the expensive
    # tokenize+bigram+hash projection) runs a single time
    per_doc = (
        d.select("id", F.explode("_fs").alias("_f"))
        .select("id", F.pmod(hash64(F.col("_f"), seed=seed),
                             F.lit(n_buckets)).alias("_b"))
        .groupBy("id", "_b").count()
    )
    per_doc = _persist(per_doc)
    rc = _persist(per_doc.groupBy("_b").agg(F.sum("count").alias("_cnt")))
    tc = _persist(_bucket_counts(target, text_col, n_buckets, seed))
    lr = F.broadcast(_ratios_from_counts(rc, tc, n_buckets, smoothing))
    # the ratio table is now a LocalRelation: rc/tc are fully consumed and
    # this operator owns their lifetime. per_doc must stay cached — the
    # returned frame still reads it lazily (persist_scope releases it).
    rc.unpersist()
    tc.unpersist()
    per_bucket = (
        per_doc.join(lr, "_b")
        .select("id", "_b",
                (F.col("count").cast("double") * F.col("_lr")).alias("_c"))
    )
    folded = per_bucket.groupBy("id").agg(
        F.aggregate(F.array_sort(F.collect_list(F.struct("_b", "_c"))),
                    F.lit(0.0), lambda acc, e: acc + e["_c"]).alias("_lw"))
    u = (hash64(F.col("id").cast("string"), seed=seed + 1) + 1) / F.lit(_DENOM_U)
    scored = (
        d.select("id").join(folded, "id", "left")
        .select("id", F.coalesce(F.col("_lw"), F.lit(0.0)).alias("_lw"))
        .withColumn("_g", F.col("_lw") - F.log(-F.log(u)))
    )
    return (
        scored.orderBy(F.col("_g").desc(), F.col("id").asc()).limit(n_keep)
        .select("id", F.round("_lw", 6).alias("log_weight_r"),
                F.round("_g", 6).alias("gumbel_key_r"))
    )


def dsir_resample_sql(raw_sql: str, target_sql: str, n_keep: int,
                      n_buckets: int = 8192, id_expr: str = "id",
                      text_expr: str = "text", smoothing: int = 1,
                      seed: int = 0) -> str:
    """DuckDB oracle twin: identical hashing, smoothing, sorted-bucket
    fold, hash-Gumbel key, and (key DESC, id ASC) top-n."""
    a = int(smoothing)
    if a < 1:
        raise ValueError("smoothing must be >= 1")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if n_keep < 1:
        raise ValueError("n_keep must be >= 1")
    fh = hash64_sql("_f", seed=seed)
    # _docs aliases {id_expr} to `id`, so the Gumbel hash keys on d.id —
    # the same value the Spark side hashes
    gh = hash64_sql("(d.id)::VARCHAR", seed=seed + 1)
    raw_feats = _features_sql(text_expr)
    return f"""
WITH _raw_b AS (
  SELECT {fh} % {n_buckets} AS _b, count(*) AS _cnt FROM (
    SELECT unnest({raw_feats}) AS _f FROM {raw_sql}
  ) GROUP BY 1
),
_tgt_b AS (
  SELECT {fh} % {n_buckets} AS _b, count(*) AS _cnt FROM (
    SELECT unnest({_features_sql(text_expr)}) AS _f FROM {target_sql}
  ) GROUP BY 1
),
_tots AS (
  SELECT (SELECT coalesce(sum(_cnt), 0) FROM _raw_b)::DOUBLE
           + {a}.0 * {n_buckets} AS _rden,
         (SELECT coalesce(sum(_cnt), 0) FROM _tgt_b)::DOUBLE
           + {a}.0 * {n_buckets} AS _tden
),
_lr AS (
  SELECT b.range AS _b,
         ln((coalesce(t._cnt, 0)::DOUBLE + {a}) / _tden)
           - ln((coalesce(r._cnt, 0)::DOUBLE + {a}) / _rden) AS _lr
  FROM range({n_buckets}) b
  LEFT JOIN _raw_b r ON b.range = r._b
  LEFT JOIN _tgt_b t ON b.range = t._b, _tots
),
_docs AS (
  SELECT {id_expr} AS id, {raw_feats} AS _fs FROM {raw_sql}
),
_per_bucket AS (
  SELECT id, _b, count(*)::DOUBLE * any_value(_lr) AS _c FROM (
    SELECT id, {fh} % {n_buckets} AS _b FROM (
      SELECT id, unnest(_fs) AS _f FROM _docs
    )
  ) JOIN _lr USING (_b)
  GROUP BY id, _b
),
_folded AS (
  SELECT id, list_reduce(list(_c ORDER BY _b), (x, y) -> x + y) AS _lw
  FROM _per_bucket GROUP BY id
),
_scored AS (
  SELECT d.id, coalesce(_lw, 0.0) AS _lw,
         coalesce(_lw, 0.0)
           - ln(-ln(({gh} + 1) / {_DENOM_U!r})) AS _g
  FROM _docs d LEFT JOIN _folded USING (id)
)
SELECT id, round(_lw, 6) AS log_weight_r, round(_g, 6) AS gumbel_key_r
FROM _scored
ORDER BY _g DESC, id ASC
LIMIT {n_keep}
"""
