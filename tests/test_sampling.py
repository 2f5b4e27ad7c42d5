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


# ---- corpus mixing: sample_token_budget (r8) ---------------------------------

def _mix_df(spark):
    import numpy as np
    rng = np.random.RandomState(5)
    rows = []
    for i in range(120):
        src = f"s{i % 3}"
        n = int(rng.randint(1, 30))
        rows.append((i, src, " ".join(f"w{j}" for j in range(n))))
    rows.append((200, "s0", ""))       # zero-token doc
    rows.append((201, "s9", "never kept"))  # unbudgeted source
    return spark.createDataFrame(rows, "id bigint, source string, text string")


def test_token_budget_prefix_rule_and_determinism(spark):
    from flouds_vectordb_spark.functions.hashing import hash64
    from flouds_vectordb_spark.operators.sampling import sample_token_budget

    df = _mix_df(spark)
    budgets = {"s0": 120, "s1": 60, "s2": 10_000}
    out = sample_token_budget(df, budgets, key_col="id", seed=3)
    got = {(r["id"], r["source"]) for r in out.select("id", "source").collect()}
    assert all(s != "s9" for _, s in got)

    # reference: single-pass greedy prefix computed driver-side
    h = hash64(F.col("id").cast("string"), seed=3)
    rows = (df.withColumn("_h", h)
            .select("id", "source", "_h", F.size(F.split(F.col("text"), r"\s+"))
                    .alias("_raw")).collect())
    ref = set()
    by_src: dict = {}
    for r in df.collect():
        by_src.setdefault(r["source"], []).append(r)
    hv = {r["id"]: r["_h"] for r in rows}
    for src, docs in by_src.items():
        if src not in budgets:
            continue
        cum = 0
        for r in sorted(docs, key=lambda r: (hv[r["id"]], r["id"])):
            n = len([t for t in r["text"].split() if t])
            if cum + n <= budgets[src]:
                cum += n
                ref.add((r["id"], src))
            else:
                break
    assert got == ref
    # determinism: same seed -> same set; different seed -> (almost surely) different
    again = {(r["id"], r["source"]) for r in
             sample_token_budget(df, budgets, key_col="id", seed=3)
             .select("id", "source").collect()}
    assert again == got


def test_token_budget_full_keep_and_validation(spark):
    import pytest as _pytest

    from flouds_vectordb_spark.operators.sampling import sample_token_budget

    df = _mix_df(spark)
    out = sample_token_budget(df, {"s0": 10**9}, key_col="id", seed=1)
    assert out.count() == df.filter(F.col("source") == "s0").count()
    with _pytest.raises(ValueError, match="at least one"):
        sample_token_budget(df, {})
    with _pytest.raises(ValueError, match="negative"):
        sample_token_budget(df, {"s0": -1})


def test_temperature_mix_upweights_small_sources(spark):
    import math

    import pytest as _pytest

    from flouds_vectordb_spark.operators.sampling import (
        sample_temperature_mix,
    )

    # big source: 90 docs x 10 tokens; small source: 10 docs x 10 tokens
    rows = [(i, "s_big", "tok " * 10) for i in range(90)] + \
           [(100 + i, "s_small", "tok " * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, source string, text string")
    out = sample_temperature_mix(df, total_budget=500, alpha=0.5,
                                 key_col="id", seed=4)
    kept = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    # alpha=0.5 weights: sqrt(900)=30, sqrt(100)=10 -> budgets 375/125
    # tokens = 37/12 docs (10 tokens each, greedy prefix)
    w_big, w_small = math.sqrt(900.0), math.sqrt(100.0)
    b_big = int(500 * w_big / (w_big + w_small))
    b_small = int(500 * w_small / (w_big + w_small))
    # budget may exceed a small source's supply: capped at available docs
    assert by_src == {"s_big": b_big // 10, "s_small": min(b_small // 10, 10)}
    # small source keeps a 3.3x larger fraction than proportional would
    assert by_src["s_small"] / 10 > by_src["s_big"] / 90

    # alpha=1 is proportional: budgets 450/50
    prop = {r["source"]: r["count"]
            for r in sample_temperature_mix(df, 500, alpha=1.0, key_col="id",
                                            seed=4)
            .groupBy("source").count().collect()}
    assert prop == {"s_big": 45, "s_small": 5}

    # non-string source column: budgets key on the NATIVE value
    idf = spark.createDataFrame(
        [(i, i % 2, "tok " * 10) for i in range(20)],
        "id long, source long, text string")
    ikept = sample_temperature_mix(idf, 100, alpha=0.5, key_col="id")
    assert 0 < ikept.count() <= 20

    # a source whose every row has NULL text gets weight 0 -> budget 0
    # (no crash); its 0-token docs ride along for free (0 <= 0), the
    # same rule the DuckDB twin applies
    ndf = spark.createDataFrame(
        [(1, "s_ok", "tok tok tok"), (2, "s_null", None), (3, "s_null", None)],
        "id long, source string, text string")
    nkept = {r["id"] for r in
             sample_temperature_mix(ndf, 100, alpha=0.5, key_col="id")
             .select("id").collect()}
    assert nkept == {1, 2, 3}

    with _pytest.raises(ValueError, match="alpha"):
        sample_temperature_mix(df, 100, alpha=0.0)
    with _pytest.raises(ValueError, match="total_budget"):
        sample_temperature_mix(df, -1)
    with _pytest.raises(ValueError, match="no tokens"):
        sample_temperature_mix(
            spark.createDataFrame([(1, "s", "")],
                                  "id long, source string, text string"), 10)
