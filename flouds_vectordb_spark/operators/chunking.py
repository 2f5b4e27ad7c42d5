"""Document chunking — fixed token windows with overlap.

The ingest-side stage between raw documents and the vector store's
`chunk` unit (the reference embeds CHUNKS, not documents — every insert
payload in its examples is a chunk): split each document into
max_tokens-token windows advancing by (max_tokens - overlap), so
consecutive chunks share `overlap` tokens of context — the standard RAG/
retrieval chunking contract.

Semantics (deterministic, engine-portable):
- tokens are the pipeline-wide whitespace tokenization (functions/text),
  chunks re-join with single spaces (the token stream, as span removal
  already normalizes);
- a document with n <= max_tokens tokens yields exactly one chunk (the
  whole document); empty/whitespace documents yield NO chunks;
- the last window starts at the last stride boundary that still covers
  new tokens, so every token belongs to >= 1 chunk and the tail chunk may
  be shorter than max_tokens (never empty).

Scale shape: one stateless projection + one explode — no shuffle at all;
chunk rows inherit the scan's partitioning. The explode multiplies rows
by ~n/stride, the honest and unavoidable output volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.text import tokenize


def _validate(max_tokens: int, overlap: int) -> int:
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not (0 <= overlap < max_tokens):
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    return max_tokens - overlap


def chunk_documents(df: DataFrame, max_tokens: int = 128, overlap: int = 32,
                    id_col: str = "id", text_col: str = "text") -> DataFrame:
    """(id, chunk_idx, chunk, n_tokens): overlapping token-window chunks,
    chunk_idx 0-based in document order."""
    stride = _validate(max_tokens, overlap)
    toks = tokenize(F.col(text_col))
    d = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    n = F.size("_toks")
    # windows = 1 + ceil((n - max_tokens) / stride) for n > max_tokens
    extra = F.greatest(n - F.lit(max_tokens), F.lit(0))
    k = F.lit(1) + F.ceil(extra.cast("double") / F.lit(stride)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), k - 1)) \
        .otherwise(F.array().cast("array<int>"))
    exploded = d.select("id", "_toks", F.explode(idx).alias("chunk_idx"))
    window = F.slice(F.col("_toks"),
                     F.col("chunk_idx") * F.lit(stride) + 1, max_tokens)
    return exploded.select(
        "id", "chunk_idx",
        F.array_join(window, " ").alias("chunk"),
        F.size(window).alias("n_tokens"),
    )


def chunk_documents_sql(table_sql: str, max_tokens: int = 128,
                        overlap: int = 32, id_expr: str = "id",
                        text_expr: str = "text") -> str:
    """DuckDB oracle twin: same tokenization, same window arithmetic
    (DuckDB list_slice(l, a, b) is INCLUSIVE-bounds 1-based where Spark
    slice(l, start, length) takes a length — bounds converted here)."""
    stride = _validate(max_tokens, overlap)
    tok = (f"list_filter(string_split_regex(lower({text_expr}), '\\s+'), "
           f"x -> x <> '')")
    return f"""
WITH _docs AS (
  SELECT {id_expr} AS id, {tok} AS _toks FROM {table_sql}
),
_exp AS (
  SELECT id, _toks,
         unnest(generate_series(0,
             CASE WHEN len(_toks) > {max_tokens}
                  THEN ceil((len(_toks) - {max_tokens})::DOUBLE / {stride})::INT
                  ELSE 0 END)) AS chunk_idx
  FROM _docs WHERE len(_toks) > 0
)
SELECT id, chunk_idx,
       array_to_string(list_slice(_toks, chunk_idx * {stride} + 1,
                                  chunk_idx * {stride} + {max_tokens}), ' ') AS chunk,
       len(list_slice(_toks, chunk_idx * {stride} + 1,
                      chunk_idx * {stride} + {max_tokens})) AS n_tokens
FROM _exp
"""
