"""Arrow-batched Python twins of the tokenize -> shingle -> md5 pipeline.

The r13 driver regimes' ONE collect job ran tokenize/shingle/hash64 as
interpreted higher-order Column lambdas (~1 µs/element in the JVM — guide
§4's interpreted-HOF cost) and then paid py4j row pickling to fetch the
hash arrays. This module moves that boundary work to where it is cheap
(guide §4.2/§4.3):

- the hashing runs inside a pandas UDF per batch — hashlib's md5 is native
  C code, and the Python tokenize/shingle loop is ~3x faster than the
  interpreted JVM lambda chain it replaces;
- the fetch goes through ``DataFrame.toArrow()`` (Arrow IPC, columnar) —
  measured 0.84 s -> 0.58 s per minhash-family collect at sf0.1 vs
  ``collect()``'s per-row pickling;
- the driver side receives the list column as ONE flat int64 numpy array
  plus offsets (zero-copy out of Arrow), which is exactly the layout the
  vectorized signature/verify halves consume — no per-element Python int
  conversion.

EXACTNESS (the driver == distributed regime contract): every function
here replicates its Column twin bit-for-bit —
- ``py_tokens`` mirrors ``text.tokenize()`` = ``filter(split(lower(s),
  '\\s+'), w != '')``: Java regex ``\\s`` is the ASCII class
  ``[ \\t\\n\\x0B\\f\\r]`` (NOT Python's Unicode-aware ``\\s``, which
  would also split on NBSP etc.), and ``str.lower()`` matches
  UTF8String.toLowerCase's Unicode default case mapping (pinned on a
  mixed-script corpus by test_pyhash_twins_match_columns);
- ``_md5_64`` mirrors ``hashing.hash64()``: md5 over the UTF-8 bytes,
  first 15 hex chars = first 60 bits of the digest;
- shingle construction mirrors ``hashing.shingles()`` including the
  "non-empty arrays shorter than n yield one whole-text shingle" rule and
  the NULL/zero-token pinning.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# java.util.regex \s — the exact class F.split(lower(col), r"\s+") splits
# on (ASCII-only; Python's \s would also match U+00A0, U+2028, ...)
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _md5_64(data: bytes) -> int:
    """First 60 bits of md5 — int(hexdigest[:15], 16) via the raw digest."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big") >> 4


def py_tokens(text: str | None) -> list[str] | None:
    """Twin of functions.text.tokenize(): None -> None (split(NULL) is
    NULL), else lowercased non-empty whitespace-separated tokens."""
    if text is None:
        return None
    return [w for w in _JAVA_WS.split(text.lower()) if w]


def py_shingles(toks: list[str], n: int) -> list[str]:
    """Twin of hashing.shingles() over a token list: [] for zero tokens,
    one whole-text shingle for 0 < len < n, else the n-gram windows."""
    if not toks:
        return []
    k = len(toks) - (n - 1)
    if k < 1:
        k = 1
    return [" ".join(toks[i:i + n]) for i in range(k)]


def _hash_all(strs) -> list[int]:
    md5 = hashlib.md5
    return [int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big") >> 4
            for s in strs]


# pandas_udf objects are cached per parameterization: building one costs a
# py4j registration and each query build would otherwise re-pickle it
_UDF_CACHE: dict[tuple, object] = {}


def _cached(key, builder):
    u = _UDF_CACHE.get(key)
    if u is None:
        u = builder()
        _UDF_CACHE[key] = u
    return u


def shingle_hash64_udf(n: int):
    """text -> hash64 of each DISTINCT shingle in first-occurrence order —
    the twin of transform(array_distinct(shingles(tokenize(t), n)),
    hash64). NULL text -> [] (shingles() pins zero-token docs to [])."""
    def build():
        @F.pandas_udf(ArrayType(LongType()))
        def _f(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                toks = py_tokens(t)
                if not toks:
                    out.append([])
                    continue
                out.append(_hash_all(dict.fromkeys(py_shingles(toks, n))))
            return pd.Series(out)
        return _f
    return _cached(("shingle", n), build)


def sorted_shingle_hash64_udf(n: int):
    """text -> array_sort(array_distinct(transform(shingles(tokenize(t),
    n), hash64))) — dedup._shingle_hashes' twin (distinct over the HASH
    values, ascending). NULL text -> []."""
    def build():
        @F.pandas_udf(ArrayType(LongType()))
        def _f(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                toks = py_tokens(t)
                if not toks:
                    out.append([])
                    continue
                out.append(sorted(set(_hash_all(py_shingles(toks, n)))))
            return pd.Series(out)
        return _f
    return _cached(("sorted_shingle", n), build)


def token_hash64_udf():
    """text -> hash64 per token, duplicates kept — the twin of
    transform(tokenize(t), hash64). NULL text -> NULL (transform(NULL) is
    NULL — dedup_simhash's driver regime keys on that distinction)."""
    def build():
        @F.pandas_udf(ArrayType(LongType()))
        def _f(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                toks = py_tokens(t)
                out.append(None if toks is None else _hash_all(toks))
            return pd.Series(out)
        return _f
    return _cached(("token",), build)


def window_hash64_udf(k: int):
    """text -> hash64 of each k-token window joined by ' ', positioned
    1..len-k+1 — exact_substring_spans' gram twin. NULL or < k tokens
    -> [] (those docs emit no windows)."""
    def build():
        @F.pandas_udf(ArrayType(LongType()))
        def _f(texts: pd.Series) -> pd.Series:
            md5 = hashlib.md5
            out = []
            for t in texts:
                toks = py_tokens(t)
                if not toks or len(toks) < k:
                    out.append([])
                    continue
                out.append([
                    int.from_bytes(
                        md5(" ".join(toks[i:i + k]).encode("utf-8"))
                        .digest()[:8], "big") >> 4
                    for i in range(len(toks) - k + 1)])
            return pd.Series(out)
        return _f
    return _cached(("window", k), build)


def feature_bucket_udf(n_buckets: int, seed: int):
    """text -> pmod(hash64(seed|f), B) per unigram+bigram feature — the
    twin of transform(importance._features(t), pmod(hash64(f, seed), B)).
    NULL text -> NULL (concat(NULL, ...) is NULL); zero tokens -> []."""
    pre = f"{seed}|".encode("utf-8") if seed else b""

    def build():
        @F.pandas_udf(ArrayType(LongType()))
        def _f(texts: pd.Series) -> pd.Series:
            md5 = hashlib.md5
            out = []
            for t in texts:
                toks = py_tokens(t)
                if toks is None:
                    out.append(None)
                    continue
                feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
                out.append([
                    (int.from_bytes(md5(pre + f.encode("utf-8"))
                                    .digest()[:8], "big") >> 4) % n_buckets
                    for f in feats])
            return pd.Series(out)
        return _f
    return _cached(("feature", n_buckets, seed), build)


def _flatten_list_col(col):
    """(values int64 ndarray, offsets int64 ndarray, valid bool ndarray |
    None) from an Arrow list<int64> ChunkedArray. NULL entries contribute
    zero values (their offsets repeat); `valid` is None when no entry is
    NULL. pyarrow.compute handles chunk/slice offsets, so this is safe on
    any layout toArrow produces."""
    import numpy as np
    import pyarrow.compute as pc

    values = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False)
    lengths = pc.list_value_length(col)
    valid = None
    if lengths.null_count:
        valid = pc.is_valid(lengths).to_numpy(zero_copy_only=False)
        lengths = pc.fill_null(lengths, 0)
    ln = lengths.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    offsets = np.concatenate(([0], np.cumsum(ln)))
    return values, offsets, valid


def _to_arrow_no_aqe(df: DataFrame):
    """df.toArrow() with AQE disabled for just this action (see
    lifecycle.no_aqe: the fetch is a fixed tiny repartition + UDF/collect
    pair that AQE can only slow down with a stage-barrier job)."""
    from flouds_vectordb_spark.lifecycle import no_aqe

    with no_aqe(df.sparkSession):
        return df.toArrow()


def fetch_id_lists(df: DataFrame):
    """One Arrow-IPC fetch of a two-column (id, array<bigint>) frame:
    (ids list, values int64 ndarray, offsets int64 ndarray, valid bool
    ndarray | None). `values[offsets[i]:offsets[i+1]]` is row i's array.
    The flat layout is zero-copy out of Arrow and feeds the vectorized
    driver halves directly — no per-element Python int conversion."""
    tbl = _to_arrow_no_aqe(df)
    ids = tbl.column(0).to_pylist()
    values, offsets, valid = _flatten_list_col(tbl.column(1))
    return ids, values, offsets, valid


def fetch_tagged_lists(df: DataFrame):
    """fetch_id_lists for a three-column (tag, id, array<bigint>) frame:
    returns (tags ndarray, ids list, values, offsets, valid)."""
    tbl = _to_arrow_no_aqe(df)
    tags = tbl.column(0).to_numpy(zero_copy_only=False)
    ids = tbl.column(1).to_pylist()
    values, offsets, valid = _flatten_list_col(tbl.column(2))
    return tags, ids, values, offsets, valid
