"""Cross-engine deterministic hashing primitives.

Spark's builtin ``hash()`` (murmur3) and DuckDB's ``hash()`` are different
functions, so every hash that feeds an oracle-checked operator is derived
from md5 — identical hex output in both engines — truncated to 60 bits
(15 hex chars, fits a signed BIGINT in both).

Spark:  conv(substring(md5(s), 1, 15), 16, 10) :: bigint
DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# contiguous range-bucketing of the 60-bit hash64 space, shared by every
# two-phase prefix-sum operator (sample_token_budget, pack_sequences):
# bucket order == hash order, so per-bucket driver prefix-sums compose
# into exact global offsets
RANGE_BUCKETS = 1024
RANGE_BUCKET_W = (1 << 60) // RANGE_BUCKETS + 1


def hash64(col: Column, seed: int = 0) -> Column:
    """60-bit deterministic hash of a string column (md5-derived)."""
    s = F.concat(F.lit(f"{seed}|"), col) if seed else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, seed: int = 0) -> str:
    s = f"('{seed}|' || {expr})" if seed else expr
    return f"('0x' || substr(md5({s}), 1, 15))::BIGINT"


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token-array column, joined by a space.

    NON-EMPTY arrays shorter than n yield a single shingle of the whole
    text, so every real document has at least one shingle (matters for
    Jaccard denominators). ZERO-token docs (empty/whitespace text) yield
    [] — NOT [''] — pinned explicitly on both engines because the twins
    used to disagree here: Spark's array_join([]) is '' while DuckDB's
    array_to_string(list_slice([], ..)) is NULL, which list_distinct then
    drops, so Spark paired all empty docs at jaccard 1.0 and the oracle
    paired none (found in review via dedup_minhash)."""
    k = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    return F.when(F.size(tokens) > 0, grams).otherwise(
        F.array().cast("array<string>"))


def shingles_sql(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin: word n-grams over a list-of-words expression; [] for
    zero-token docs (see shingles)."""
    grams = (
        f"list_transform(generate_series(1, greatest(len({tokens_expr}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' '))"
    )
    return (f"(CASE WHEN len({tokens_expr}) > 0 THEN {grams} "
            f"ELSE []::VARCHAR[] END)")


def py_hash64(s: str, seed: int = 0) -> int:
    """Driver-side twin of hash64: md5 over the UTF-8 bytes, first 15 hex
    chars as a 60-bit integer — bit-identical to both engines' columns
    (same hashlib md5, same truncation). Used by the r13 driver regimes
    to hash the handful of strings they synthesize (band keys, Gumbel
    ids) without a round trip through a Spark expression."""
    import hashlib

    if seed:
        s = f"{seed}|{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
