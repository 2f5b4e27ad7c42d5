"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference's surface (SURVEY.md §7 Phase 4): per-document quality
signals a 100 TB corpus pipeline computes before training — token counts,
length stats, stop-word ratio, a composite quality score, a language-ID
heuristic, and a rolling-hash document fingerprint. All pure Column
expressions over one scan (no shuffle at all for the per-doc stats; one
aggregation for the corpus rollup) — embarrassingly parallel at any scale.

Each builder has a DuckDB *_sql twin for the correctness oracle. Ratios are
rounded to 6 decimals for cross-engine hashability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.hashing import hash64, hash64_sql
from flouds_vectordb_spark.functions.text import tokenize
from flouds_vectordb_spark.sources.tables import spread_small_input
from flouds_vectordb_spark.stopwords import NLTK_ENGLISH

# tiny per-language function-word lists for the n-gram/function-word
# language-ID heuristic (public common-word lists; the fixture corpus is
# synthetic so the heuristic is exercised, not accurate)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
}

# Quality ratios use the compact 179-word NLTK core, NOT the full Q6
# union (stopwords.DEFAULT_STOPWORDS, ~1.8k words): per-token membership
# against an inline array is O(tokens x words) inside codegen, and the
# custom list's junk entries ("a1", "10", phrases) add cost without
# signal. Q6 text-filter parity is unaffected — it has its own path.
_STOPWORDS_SORTED = tuple(sorted(NLTK_ENGLISH))


def _ratio(n: Column, d: Column) -> Column:
    return F.when(d > 0, n.cast("double") / d.cast("double")).otherwise(F.lit(0.0))


def text_stats(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars_norm, avg_token_len_r, stopword_ratio_r,
    distinct_ratio_r, quality_r, lang_guess, fingerprint)."""
    toks = tokenize(F.col(text_col))
    d = spread_small_input(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t"),
        toks.alias("_toks"))
    n_tokens = F.size("_toks")
    n_chars = F.length("_t")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS_SORTED])
    n_stop = F.size(F.filter("_toks", lambda t: F.array_contains(sw, t)))
    n_distinct = F.size(F.array_distinct("_toks"))
    avg_len = _ratio(
        F.aggregate(F.transform("_toks", lambda t: F.length(t)), F.lit(0), lambda a, x: a + x),
        n_tokens,
    )
    stop_ratio = _ratio(n_stop, n_tokens)
    distinct_ratio = _ratio(n_distinct, n_tokens)
    # composite quality: penalize too-short docs, reward vocabulary variety,
    # penalize stop-word stuffing — fixed-order float math for parity
    quality = (
        F.least(n_tokens.cast("double") / F.lit(20.0), F.lit(1.0)) * F.lit(0.5)
        + distinct_ratio * F.lit(0.3)
        + (F.lit(1.0) - stop_ratio) * F.lit(0.2)
    )

    # language-ID: count function-word hits per language; argmax with a
    # deterministic tie-break = language-code order (de, en, fr)
    hit_cols = {}
    for lang, markers in sorted(LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        hit_cols[lang] = F.size(F.filter("_toks", lambda t: F.array_contains(marr, t)))
    best = F.greatest(*hit_cols.values())
    lang_guess = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        lang_guess = lang_guess.when(hit_cols[lang] == best, F.lit(lang))
    lang_guess = lang_guess.otherwise(F.lit("und"))

    # rolling document fingerprint: md5-derived hash of the normalized token
    # stream — a content fingerprint stable under whitespace changes
    fingerprint = hash64(F.array_join("_toks", " "))

    return d.select(
        "id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_norm"),
        F.round(avg_len, 6).alias("avg_token_len_r"),
        F.round(stop_ratio, 6).alias("stopword_ratio_r"),
        F.round(distinct_ratio, 6).alias("distinct_ratio_r"),
        F.round(quality, 6).alias("quality_r"),
        lang_guess.alias("lang_guess"),
        fingerprint.alias("fingerprint"),
    )


def text_stats_sql(table_sql: str, id_expr: str = "id", text_expr: str = "text") -> str:
    """DuckDB oracle twin of text_stats."""
    toks = f"list_filter(string_split_regex(lower({text_expr}), '\\s+'), x -> x <> '')"
    sw_list = ", ".join("'" + w.replace("'", "''") + "'" for w in _STOPWORDS_SORTED)
    langs = sorted(LANG_MARKERS)
    hit_sel = ""
    for lang in langs:
        marr = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        hit_sel += f", len(list_filter(_toks, t -> list_contains([{marr}], t))) AS _h_{lang}"
    best = "greatest(" + ", ".join(f"_h_{lang}" for lang in langs) + ")"
    guess_cases = " ".join(f"WHEN _h_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"""
WITH _base AS (
  SELECT {id_expr} AS id, {text_expr} AS _t, {toks} AS _toks FROM {table_sql}
),
_stats AS (
  SELECT id,
         len(_toks) AS n_tokens,
         length(_t) AS n_chars_norm,
         list_sum(list_transform(_toks, t -> length(t))) AS _sum_len,
         len(list_filter(_toks, t -> list_contains([{sw_list}], t))) AS _n_stop,
         len(list_distinct(_toks)) AS _n_distinct
         {hit_sel},
         {hash64_sql("array_to_string(_toks, ' ')")} AS fingerprint
  FROM _base
)
SELECT id, n_tokens, n_chars_norm,
       round(CASE WHEN n_tokens > 0 THEN _sum_len::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END, 6)
         AS avg_token_len_r,
       round(CASE WHEN n_tokens > 0 THEN _n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END, 6)
         AS stopword_ratio_r,
       round(CASE WHEN n_tokens > 0 THEN _n_distinct::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END, 6)
         AS distinct_ratio_r,
       round(least(n_tokens::DOUBLE / 20.0, 1.0) * 0.5
             + (CASE WHEN n_tokens > 0 THEN _n_distinct::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END) * 0.3
             + (1.0 - (CASE WHEN n_tokens > 0 THEN _n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)) * 0.2, 6)
         AS quality_r,
       CASE WHEN {best} = 0 THEN 'und' {guess_cases} ELSE 'und' END AS lang_guess,
       fingerprint
FROM _stats
"""


def corpus_rollup(stats: DataFrame, df: DataFrame, id_col: str = "id",
                  group_col: str = "source") -> DataFrame:
    """Corpus-level quality rollup grouped by a dimension column: doc count,
    token sum, mean quality. Integer sums are exact; the mean divides two
    exact sums -> deterministic."""
    joined = stats.join(df.select(F.col(id_col).alias("id"), F.col(group_col)), "id")
    return joined.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            # fixed-point micro-units: integer sum is exact and order-free,
            # so the mean is deterministic across engines/parallelism
            F.sum(F.round(F.col("quality_r") * 1e6, 0).cast("long")).cast("double") / 1e6
            / F.count("*").cast("double"),
            6,
        ).alias("mean_quality_r"),
    )


def corpus_rollup_sql(stats_sql: str, table_sql: str, id_expr: str = "id",
                      group_col: str = "source") -> str:
    return f"""
SELECT {group_col}, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
       round((sum(round(quality_r * 1e6, 0)::BIGINT)::DOUBLE / 1e6) / count(*)::DOUBLE, 6)
         AS mean_quality_r
FROM ({stats_sql}) s JOIN (SELECT {id_expr} AS id, {group_col} FROM {table_sql}) t USING (id)
GROUP BY {group_col}
"""
