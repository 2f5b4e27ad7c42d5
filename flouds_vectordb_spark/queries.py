"""Registry of oracle-checked queries — the driver contract surface.

Each entry pairs a Spark DataFrame program (the engine) with the equivalent
DuckDB SQL (the oracle). Both are generated from ONE request object by the
paired builders in operators/*, so semantics cannot drift.

Keys map to SURVEY.md §2 operator ids (Q1..Q14, I1, dedup/similarity/text
extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flouds_vectordb_spark.operators.dense_search import (
    DenseSearchRequest,
    dense_search,
    dense_search_sql,
)
from flouds_vectordb_spark.sources.tables import COLLECTION_SQL, collection


def fixture_query_vector(dim: int = 64, seed: int = 1) -> list[float]:
    """Deterministic pseudo-query vector; exact decimal literals so the Spark
    and DuckDB sides parse to identical doubles."""
    return [((seed * 1_000_003 + j * 7_919) % 2_000) / 1_000.0 - 1.0 for j in range(dim)]


_META_EXPRS = {"lang": "lang", "source": "source"}
# collection meta has exactly 2 entries per row (lang, source); none null
_META_SIZE = "2"


def _dense_pair(req: DenseSearchRequest, with_chunk: bool = False):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return dense_search(
            collection(spark, sf_dir),
            req,
            id_col="id",
            vector_col="vector",
            chunk_col="chunk" if with_chunk else None,
            meta_col="meta",
        )

    sql = dense_search_sql(
        req,
        COLLECTION_SQL,
        id_expr="id",
        vector_expr="vector",
        chunk_expr="chunk" if with_chunk else None,
        meta_exprs=_META_EXPRS,
        meta_size_expr=_META_SIZE,
    )
    return q, sql


_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _register(name: str, q, sql) -> None:
    _REGISTRY[name] = (q, sql)


# --- Q1: dense top-k, all three metrics --------------------------------------
_register("q1_dense_cosine_topk", *_dense_pair(
    DenseSearchRequest(query_vector=fixture_query_vector(seed=1), metric="COSINE", limit=10)))
_register("q1_dense_l2_topk", *_dense_pair(
    DenseSearchRequest(query_vector=fixture_query_vector(seed=2), metric="L2", limit=10)))
_register("q1_dense_ip_topk", *_dense_pair(
    DenseSearchRequest(query_vector=fixture_query_vector(seed=3), metric="IP", limit=10)))

# --- Q2: range search (score bounds inside the scan) --------------------------
_register("q2_range_search", *_dense_pair(
    DenseSearchRequest(
        query_vector=fixture_query_vector(seed=4), metric="COSINE",
        limit=100, radius=0.05, range_filter=0.5)))

# --- Q5+Q11: score threshold post-filter + round_decimal ----------------------
_register("q5_score_threshold", *_dense_pair(
    DenseSearchRequest(
        query_vector=fixture_query_vector(seed=5), metric="COSINE",
        limit=50, score_threshold=0.1, round_decimal=4)))

# --- Q6+Q7: text keyword post-filter with over-fetch ---------------------------
_register("q6_text_filter", *_dense_pair(
    DenseSearchRequest(
        query_vector=fixture_query_vector(seed=6), metric="COSINE",
        limit=10, text_filter="spark vector merge", minimum_words_match=2,
        increase_limit_for_text_search=10),
    with_chunk=True))

# all-stopword filter must reject every row (vector_store.py:919-921)
_register("q6_text_filter_all_stopwords", *_dense_pair(
    DenseSearchRequest(
        query_vector=fixture_query_vector(seed=6), metric="COSINE",
        limit=10, text_filter="the a of and", minimum_words_match=1),
    with_chunk=True))

# --- Q8+Q9: metadata post-filter + meta_required -------------------------------
_register("q8_meta_filter", *_dense_pair(
    DenseSearchRequest(
        query_vector=fixture_query_vector(seed=7), metric="COSINE",
        limit=50, meta_filter={"lang": "e", "source": "src1"}, meta_required=True)))

# --- Q10: pagination (offset) ---------------------------------------------------
_register("q10_pagination", *_dense_pair(
    DenseSearchRequest(
        query_vector=fixture_query_vector(seed=8), metric="COSINE",
        limit=20, offset=15)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q for name, (q, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
