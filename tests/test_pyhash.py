"""pyhash twins == Column pipeline, bit for bit (the r14 Arrow-batched
hashing that feeds every dedup/DSIR driver regime's one collect job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions import pyhash as P
from flouds_vectordb_spark.functions.hashing import hash64, py_hash64, shingles
from flouds_vectordb_spark.functions.text import tokenize


@pytest.fixture(scope="module")
def spark():
    from flouds_vectordb_spark.session import get_spark

    return get_spark("test_pyhash", shuffle_partitions=4)


# the drift surface: Java regex \s is ASCII-only, Python str.lower vs
# UTF8String.toLowerCase, UTF-8 md5 bytes — exercise all of it
_NASTY = [
    (0, "plain ascii words here"),
    (1, "  leading and   trailing  spaces  "),
    (2, "tabs\tand\nnewlines\rand\x0bvtab\x0cformfeed split"),
    (3, "nbsp stays inside one token"),  # Java \s does NOT split NBSP
    (4, "ideographic　space also glued"),
    (5, "MIXED Case And UPPER"),
    (6, "turkish İstanbul DOTTED İ"),
    (7, "greek ΟΔΥΣΣΕΥΣ word ΤΕΛΟΣ"),  # final sigma context rule
    (8, "german STRASSE ß ẞ"),
    (9, "emoji 😀 and 中文字符 mixed in"),
    (10, "combining áccents étoile"),
    (11, "a"),  # single token: whole-text shingle
    (12, "two words"),
    (13, ""),
    (14, None),
    (15, "dup dup dup dup words words"),
    (16, "x " * 200),  # long doc
]

_SCHEMA = "id bigint, text string"


def _col_rows(spark, expr):
    df = spark.createDataFrame(_NASTY, _SCHEMA)
    return {r[0]: (None if r[1] is None else list(r[1]))
            for r in df.select("id", expr.alias("v")).collect()}


def _udf_rows(spark, udf):
    df = spark.createDataFrame(_NASTY, _SCHEMA)
    return {r[0]: (None if r[1] is None else list(r[1]))
            for r in df.select("id", udf(F.col("text")).alias("v")).collect()}


def test_shingle_hash_udf_matches_column(spark):
    for n in (2, 3, 5):
        col = F.transform(
            F.array_distinct(shingles(tokenize(F.col("text")), n=n)),
            lambda s: hash64(s))
        assert _udf_rows(spark, P.shingle_hash64_udf(n)) == \
            _col_rows(spark, col)


def test_sorted_shingle_hash_udf_matches_column(spark):
    col = F.array_sort(F.array_distinct(F.transform(
        shingles(tokenize(F.col("text")), n=3), lambda s: hash64(s))))
    assert _udf_rows(spark, P.sorted_shingle_hash64_udf(3)) == \
        _col_rows(spark, col)


def test_token_hash_udf_matches_column(spark):
    col = F.transform(tokenize(F.col("text")), lambda t: hash64(t))
    got = _udf_rows(spark, P.token_hash64_udf())
    want = _col_rows(spark, col)
    assert got == want
    assert got[14] is None  # NULL text -> NULL array (simhash keys on it)
    assert got[13] == []


def test_window_hash_udf_matches_column(spark):
    k = 3
    toks = tokenize(F.col("text"))
    n = F.size(toks)
    col = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: hash64(F.array_join(F.slice(toks, i, k), " ")))) \
        .otherwise(F.array().cast("array<bigint>"))
    got = _udf_rows(spark, P.window_hash64_udf(k))
    want = {i: (v if v is not None else []) for i, v in
            _col_rows(spark, col).items()}
    # the Column form yields NULL for NULL text (when(NULL) -> otherwise
    # branch gives []) — pin [] on both sides
    assert got == want


def test_feature_bucket_udf_matches_column(spark):
    from flouds_vectordb_spark.operators.importance import _features

    B, seed = 256, 3
    col = F.transform(_features("text"),
                      lambda f: F.pmod(hash64(f, seed=seed), F.lit(B)))
    assert _udf_rows(spark, P.feature_bucket_udf(B, seed)) == \
        _col_rows(spark, col)


def test_md5_64_matches_py_hash64():
    for s in ("", "a", "hello world", "0|x", "中文", "emoji 😀"):
        assert P._md5_64(s.encode("utf-8")) == py_hash64(s)


def test_fetch_id_lists_flat_layout(spark):
    import numpy as np

    df = spark.createDataFrame(
        [(1, [5, 6]), (2, []), (3, None), (4, [7])],
        "id bigint, v array<bigint>")
    ids, values, offsets, valid = P.fetch_id_lists(df.orderBy("id"))
    assert ids == [1, 2, 3, 4]
    assert values.tolist() == [5, 6, 7]
    assert offsets.tolist() == [0, 2, 2, 2, 3]
    assert valid is not None and valid.tolist() == [True, True, False, True]
    np.testing.assert_array_equal(values[offsets[0]:offsets[1]], [5, 6])
