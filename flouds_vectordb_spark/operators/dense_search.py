"""Dense vector top-k search with the reference's full post-filter pipeline.

Reference behavior reproduced (citations into /root/reference):
- metric ∈ {COSINE, L2, IP}; larger score = better for all
  (app/milvus/vector_store.py:445-517, search_request.py:202-220)
- limit clamped to <=100 (vector_store.py:457), offset 0-100
  (search_request.py:56-61)
- over-fetch by `increase_limit_for_text_search` when a text filter is
  present, trim back after filtering (vector_store.py:483-490, :579-582)
- post-filters run AFTER the k-cut, in order: score_threshold -> text
  filter -> meta_required -> meta_filter (vector_store.py:519-582);
  a query may return fewer than `limit` rows
- range search: radius / range_filter bounds on the score
  (vector_store.py:501-503)
- round_decimal applied to the reported score (search_request.py:70-75)

Scale notes: the k-cut compiles to TakeOrderedAndProject (per-partition
top-k, merge of <=fetch rows on the driver) — no global sort, no shuffle of
the corpus. Post-filters and the rank window run over <=236 rows. With the
IVF plan (plans/ivf.py) the scan itself is partition-pruned first.

Every builder has a *_sql twin emitting the equivalent DuckDB query so the
correctness oracle shares one semantics definition with the engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions import vector as V
from flouds_vectordb_spark.functions.text import text_filter_predicate, text_filter_sql

MAX_LIMIT = 100  # reference vector_store.py:457
RANK_DECIMALS = 6  # deterministic cross-engine ranking key


@dataclass
class DenseSearchRequest:
    """Mirror of the reference's SearchEmbeddedRequest dense surface
    (app/models/search_request.py:44-240)."""

    query_vector: list[float]
    metric: str = "COSINE"
    limit: int = 10
    offset: int = 0
    round_decimal: int = -1
    score_threshold: float | None = None
    radius: float | None = None
    range_filter: float | None = None
    text_filter: str | None = None
    minimum_words_match: int = 2
    include_stop_words: bool = False
    increase_limit_for_text_search: int = 10
    meta_filter: dict[str, str] = field(default_factory=dict)
    meta_required: bool = False

    @property
    def effective_limit(self) -> int:
        return min(self.limit, MAX_LIMIT)

    @property
    def fetch(self) -> int:
        extra = self.increase_limit_for_text_search if self.text_filter else 0
        return self.effective_limit + extra


def meta_filter_predicate(meta: Column, meta_filter: dict[str, str]) -> Column:
    """Reference `_matches_meta_filter` (vector_store.py:871-886): each key
    must exist and the expected value must be a case-insensitive substring."""
    pred = F.lit(True)
    for k, v in meta_filter.items():
        val = F.element_at(meta, F.lit(k))
        pred = pred & val.isNotNull() & (F.instr(F.lower(val), v.lower()) > 0)
    return pred


def dense_search(
    df: DataFrame,
    req: DenseSearchRequest,
    id_col: str = "id",
    vector_col: str = "vector",
    chunk_col: str | None = None,
    meta_col: str | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Returns (id, rank, score [, chunk, extra...]) — rank 1-based after
    post-filtering, score rounded to round_decimal (or 6 for determinism)."""
    score = V.metric_score(req.metric, F.col(vector_col), F.array(*[F.lit(float(x)) for x in req.query_vector]))
    scored = df.withColumn("_score", score).withColumn("_score_r", F.round(F.col("_score"), RANK_DECIMALS))

    # range search bounds apply inside the ANN scan (vector_store.py:501-503)
    if req.radius is not None:
        scored = scored.filter(F.col("_score_r") >= F.lit(float(req.radius)))
    if req.range_filter is not None:
        scored = scored.filter(F.col("_score_r") < F.lit(float(req.range_filter)))

    # k-cut: TakeOrderedAndProject, offset folded into the fetch
    fetch = req.fetch + req.offset
    topk = scored.orderBy(F.col("_score_r").desc(), F.col(id_col).asc()).limit(fetch)
    if req.offset:
        w = Window.orderBy(F.col("_score_r").desc(), F.col(id_col).asc())
        topk = (
            topk.withColumn("_pre_rank", F.row_number().over(w))
            .filter(F.col("_pre_rank") > req.offset)
            .drop("_pre_rank")
        )

    # post-filter pipeline (vector_store.py:519-582) — AFTER the k-cut
    out = topk
    if req.score_threshold is not None:
        out = out.filter(F.col("_score_r") >= F.lit(float(req.score_threshold)))
    if req.text_filter is not None and chunk_col is not None:
        out = out.filter(
            text_filter_predicate(
                F.col(chunk_col), req.text_filter, req.minimum_words_match, req.include_stop_words
            )
        )
    if req.meta_required and meta_col is not None:
        out = out.filter(F.size(F.col(meta_col)) > 0)
    if req.meta_filter and meta_col is not None:
        out = out.filter(meta_filter_predicate(F.col(meta_col), req.meta_filter))

    # trim back to the original limit, assign final rank
    w = Window.orderBy(F.col("_score_r").desc(), F.col(id_col).asc())
    out = out.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= req.effective_limit)

    dec = req.round_decimal if req.round_decimal >= 0 else RANK_DECIMALS
    cols = [F.col(id_col), F.col("rank"), F.round(F.col("_score"), dec).alias("score")]
    if chunk_col:
        cols.append(F.col(chunk_col))
    cols += [F.col(c) for c in extra_cols]
    return out.select(*cols)


def dense_search_sql(
    req: DenseSearchRequest,
    table_sql: str,
    id_expr: str,
    vector_expr: str,
    chunk_expr: str | None = None,
    meta_exprs: dict[str, str] | None = None,
    meta_size_expr: str | None = None,
    extra_exprs: dict[str, str] | None = None,
) -> str:
    """DuckDB oracle twin of dense_search. `table_sql` is a FROM-able
    subquery/view; `meta_exprs` maps meta_filter keys to SQL expressions
    (NULL-able); `meta_size_expr` is the meta-entry-count expression."""
    qvec = "[" + ",".join(repr(float(x)) for x in req.query_vector) + "]::DOUBLE[]"
    score = V.metric_sql(req.metric, vector_expr, qvec)
    where = ["TRUE"]
    if req.radius is not None:
        where.append(f"_score_r >= {float(req.radius)!r}")
    if req.range_filter is not None:
        where.append(f"_score_r < {float(req.range_filter)!r}")
    fetch = req.fetch + req.offset

    post = ["TRUE"]
    if req.score_threshold is not None:
        post.append(f"_score_r >= {float(req.score_threshold)!r}")
    if req.text_filter is not None and chunk_expr is not None:
        post.append(
            text_filter_sql("chunk", req.text_filter, req.minimum_words_match, req.include_stop_words)
        )
    if req.meta_required and meta_size_expr is not None:
        post.append(f"({meta_size_expr}) > 0")
    meta_sel = ""
    for i, (k, v) in enumerate((req.meta_filter or {}).items()):
        e = (meta_exprs or {})[k]
        meta_sel += f", {e} AS _meta_{i}"
        vv = v.lower().replace("'", "''")
        post.append(f"(_meta_{i} IS NOT NULL AND instr(lower(_meta_{i}), '{vv}') > 0)")

    dec = req.round_decimal if req.round_decimal >= 0 else RANK_DECIMALS
    chunk_sel = f", {chunk_expr} AS chunk" if chunk_expr else ""
    extra_sel = "".join(f", {e} AS {name}" for name, e in (extra_exprs or {}).items())
    chunk_out = ", chunk" if chunk_expr else ""
    extra_out = "".join(f", {name}" for name in (extra_exprs or {}))
    return f"""
WITH scored AS (
  SELECT {id_expr} AS id, {score} AS _score, round({score}, {RANK_DECIMALS}) AS _score_r
         {chunk_sel}{extra_sel}{meta_sel},
         {meta_size_expr if meta_size_expr is not None else '0'} AS _meta_n
  FROM {table_sql}
),
topk AS (
  SELECT * FROM scored WHERE {' AND '.join(where)}
  ORDER BY _score_r DESC, id ASC LIMIT {fetch - req.offset} OFFSET {req.offset}
),
filtered AS (
  SELECT * FROM topk WHERE {' AND '.join(post)}
)
SELECT id, rank, score{chunk_out}{extra_out} FROM (
  SELECT id, row_number() OVER (ORDER BY _score_r DESC, id ASC) AS rank,
         round(_score, {dec}) AS score{chunk_out}{extra_out}
  FROM filtered
) WHERE rank <= {req.effective_limit}
"""
