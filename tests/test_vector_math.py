"""Metric scores vs numpy, zero-norm guard, cross-engine hash determinism."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions import vector as V


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [-0.5, 0.25, 4.0]),
        (3, [0.0, 0.0, 0.0]),  # zero-norm: cosine must be NULL, not inf
    ]
    return spark.createDataFrame(rows, "id long, v array<double>")


Q = [0.3, -1.2, 2.5]


def _collect_scores(df, col):
    return {r["id"]: r["s"] for r in df.select("id", col.alias("s")).collect()}


def test_dot_matches_numpy(vec_df):
    got = _collect_scores(vec_df, V.metric_score_q("IP", F.col("v"), Q))
    assert got[1] == pytest.approx(np.dot([1, 2, 3], Q))
    assert got[2] == pytest.approx(np.dot([-0.5, 0.25, 4.0], Q))


def test_l2_matches_numpy(vec_df):
    # Milvus L2 unit: SQUARED distance, negated for larger-is-better
    got = _collect_scores(vec_df, V.metric_score_q("L2", F.col("v"), Q))
    assert got[1] == pytest.approx(
        -float(np.sum((np.array([1.0, 2.0, 3.0]) - np.array(Q)) ** 2)))


def test_cosine_matches_numpy(vec_df):
    got = _collect_scores(vec_df, V.metric_score_q("COSINE", F.col("v"), Q))
    a = np.array([1.0, 2.0, 3.0])
    q = np.array(Q)
    assert got[1] == pytest.approx(float(a @ q / (np.linalg.norm(a) * np.linalg.norm(q))))


def test_cosine_zero_norm_is_null(vec_df):
    got = _collect_scores(vec_df, V.metric_score_q("COSINE", F.col("v"), Q))
    assert got[3] is None


def test_query_norm_sequential_fold():
    assert V.query_norm([3.0, 4.0]) == pytest.approx(5.0)
    assert V.query_norm([]) == 0.0


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        V.metric_score_q("HAMMING", F.lit(None), Q)
    with pytest.raises(ValueError):
        V.metric_sql_q("HAMMING", "v", Q)


def test_sql_literal_is_parenthesized():
    # the round-1 killer: [..]::DOUBLE[][i] parses as a nested array TYPE
    lit = V.query_sql_literal([1.0, 2.0])
    assert lit.startswith("(") and lit.endswith(")")


def test_sql_twin_agrees_with_spark(vec_df):
    import duckdb

    for metric in ("COSINE", "L2", "IP"):
        spark_scores = _collect_scores(vec_df, V.metric_score_q(metric, F.col("v"), Q))
        con = duckdb.connect()
        sql = V.metric_sql_q(metric, "v", Q)
        oracle = {
            i: s
            for i, s in con.execute(
                f"SELECT id, {sql} FROM (VALUES (1, [1.0,2.0,3.0]::DOUBLE[]), "
                f"(2, [-0.5,0.25,4.0]::DOUBLE[]), (3, [0.0,0.0,0.0]::DOUBLE[])) t(id, v)"
            ).fetchall()
        }
        for i in (1, 2, 3):
            if spark_scores[i] is None:
                assert oracle[i] is None, (metric, i)
            else:
                assert spark_scores[i] == oracle[i], (metric, i)  # bit-identical
