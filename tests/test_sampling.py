"""Deterministic sampling: partitioning-invariance, quota exactness,
hash-membership reproducibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.sampling import (
    sample_fraction,
    sample_stratified,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", f"text {i}") for i in range(600)]
    return spark.createDataFrame(rows, "id long, lang string, text string")


def test_sample_fraction_is_partitioning_invariant(spark, docs):
    a = {r["id"] for r in sample_fraction(docs, 0.3, seed=5).collect()}
    b = {r["id"] for r in sample_fraction(docs.repartition(7), 0.3, seed=5).collect()}
    assert a == b and a  # same membership regardless of layout
    # roughly the requested fraction (Bernoulli, 600 draws)
    assert 0.2 < len(a) / 600 < 0.4
    # different seed -> different subset
    c = {r["id"] for r in sample_fraction(docs, 0.3, seed=6).collect()}
    assert a != c


def test_sample_fraction_bounds():
    with pytest.raises(ValueError, match="fraction"):
        sample_fraction(None, 1.5)


def test_sample_stratified_exact_quota_and_invariance(spark, docs):
    out = sample_stratified(docs, "lang", 10, seed=1)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"lang0": 10, "lang1": 10, "lang2": 10}
    again = {r["id"] for r in
             sample_stratified(docs.repartition(13), "lang", 10, seed=1).collect()}
    assert again == {r["id"] for r in out.collect()}


def test_sample_stratified_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")],
                               "id long, lang string")
    out = sample_stratified(df, "lang", 10)
    assert out.count() == 3
