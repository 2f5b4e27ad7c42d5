"""Text tokenization and the reference's keyword post-filter, as Columns.

Reference semantics reproduced exactly
(app/milvus/vector_store.py:888-936, `_matches_text_filter`):
- tokenize the filter string on whitespace, lowercase;
- drop stop words unless include_stop_words;
- a hit passes iff the number of filter words that occur as SUBSTRINGS of
  the lowercased chunk is >= min(len(words), minimum_words_match);
- an empty post-stopword word list rejects every row
  (vector_store.py:919-921).

All pure Column expressions — broadcastable, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flouds_vectordb_spark.stopwords import DEFAULT_STOPWORDS


def tokenize(col: Column) -> Column:
    """Lowercase whitespace tokenization (reference vector_store.py:911-917)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def tokenize_sql(expr: str) -> str:
    """The DuckDB twin of tokenize(), byte-identical to the inline snippet
    every oracle uses — single source of truth for the cross-engine
    tokenization contract."""
    return (f"list_filter(string_split_regex(lower({expr}), '\\s+'), "
            f"x -> x <> '')")


def filter_words(text_filter: str, include_stop_words: bool = False, stop_words=None) -> list[str]:
    """Driver-side: the filter's effective word list (tiny, query-scoped)."""
    words = [w for w in text_filter.lower().split() if w]
    if include_stop_words:
        return words
    sw = DEFAULT_STOPWORDS if stop_words is None else stop_words
    return [w for w in words if w not in sw]


def text_filter_predicate(
    chunk: Column,
    text_filter: str,
    minimum_words_match: int = 2,
    include_stop_words: bool = False,
    stop_words=None,
) -> Column:
    """Boolean Column implementing `_matches_text_filter`."""
    words = filter_words(text_filter, include_stop_words, stop_words)
    if not words:
        return F.lit(False)  # all-stopword filter rejects everything
    required = min(len(words), minimum_words_match)
    low = F.lower(chunk)
    hits = sum((F.instr(low, w) > 0).cast("int") for w in words)
    return hits >= F.lit(required)


def text_filter_sql(
    chunk_expr: str,
    text_filter: str,
    minimum_words_match: int = 2,
    include_stop_words: bool = False,
    stop_words=None,
) -> str:
    """DuckDB oracle twin of text_filter_predicate."""
    words = filter_words(text_filter, include_stop_words, stop_words)
    if not words:
        return "FALSE"
    required = min(len(words), minimum_words_match)
    terms = " + ".join(
        f"(CASE WHEN instr(lower({chunk_expr}), '{w.replace(chr(39), chr(39) * 2)}') > 0 THEN 1 ELSE 0 END)"
        for w in words
    )
    return f"(({terms}) >= {required})"
