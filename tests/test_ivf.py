"""IVF plan: determinism, partition pruning, exact-search equivalence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.dense_search import DenseSearchRequest, dense_search
from flouds_vectordb_spark.plans.ivf import IvfIndex, _kmeans, build_ivf, open_ivf


@pytest.fixture(scope="module")
def coll(spark):
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)], f"doc {i}")
            for i in range(200)]
    return spark.createDataFrame(rows, "id long, vector array<double>, chunk string")


def test_kmeans_deterministic():
    x = np.random.RandomState(0).standard_normal((100, 4))
    c1 = _kmeans(x, 4, seed=42)
    c2 = _kmeans(x, 4, seed=42)
    assert np.array_equal(c1, c2)


def test_build_open_roundtrip(spark, coll, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    idx = build_ivf(coll, path, nlist=4, metric="COSINE")
    reopened = open_ivf(path)
    assert np.array_equal(idx.centroids, reopened.centroids)
    assert reopened.metric == "COSINE"
    # every row got exactly one cell; all rows present
    assert spark.read.parquet(path).count() == 200


def test_probe_cells_orders_by_distance(spark, coll, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf2") / "idx")
    idx = build_ivf(coll, path, nlist=4, metric="COSINE")
    q = [1.0] * 8
    cells = idx.probe_cells(q, nprobe=4)
    assert sorted(cells) == [0, 1, 2, 3]
    assert idx.probe_cells(q, nprobe=2) == cells[:2]


def test_full_probe_equals_bruteforce(spark, coll, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf3") / "idx")
    idx = build_ivf(coll, path, nlist=4, metric="COSINE")
    req = DenseSearchRequest(query_vector=[0.5] * 8, metric="COSINE", limit=10,
                             output_fields=())
    exact = [(r["id"], r["score"]) for r in dense_search(coll, req).collect()]
    via_ivf = [(r["id"], r["score"])
               for r in idx.search(spark, req, nprobe=4).collect()]
    assert via_ivf == exact


def test_pruned_scan_reads_fewer_partitions(spark, coll, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf4") / "idx")
    idx = build_ivf(coll, path, nlist=4, metric="COSINE")
    pruned = idx.scan(spark, [0, 1])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter on centroid_id must reach the scan, not a post-filter
    assert "centroid_id" in plan
    assert pruned.select("centroid_id").distinct().count() <= 2


def test_incremental_append_matches_full_rebuild(spark, coll, tmp_path_factory):
    """append() must route new rows to exactly the cells a rebuild with the
    SAME centroids would choose, and searches over the appended index must
    equal brute force over the full data."""
    path = str(tmp_path_factory.mktemp("ivf5") / "idx")
    first = coll.filter(F.col("id") < 150)
    rest = coll.filter(F.col("id") >= 150)
    idx = build_ivf(first, path, nlist=4, metric="COSINE")
    idx.append(rest)

    appended = spark.read.parquet(path)
    assert appended.count() == 200
    # assignment parity: rebuild the full table with the same centroids
    path2 = str(tmp_path_factory.mktemp("ivf6") / "idx")
    from flouds_vectordb_spark.plans.ivf import _assign_udf
    expected = {r["id"]: r["cid"] for r in coll.select(
        "id", _assign_udf(idx.centroids, "COSINE")(F.col("vector")).alias("cid")).collect()}
    got = {r["id"]: r["centroid_id"] for r in appended.select("id", "centroid_id").collect()}
    assert got == expected

    req = DenseSearchRequest(query_vector=[0.5] * 8, metric="COSINE", limit=10,
                             output_fields=())
    exact = [(r["id"], r["score"]) for r in dense_search(coll, req).collect()]
    via_ivf = [(r["id"], r["score"])
               for r in idx.search(spark, req, nprobe=4).collect()]
    assert via_ivf == exact


def test_ip_metric_assigns_and_probes_by_inner_product(spark, tmp_path_factory):
    """IP must use max-inner-product cells end to end: a large-norm vector
    that is the true IP top-1 must be found even at nprobe=1, which L2
    cell assignment would miss."""
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(100)]
    # plant the IP winner: huge norm, pointing along the query
    q = [1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows.append((999, [50.0 * v for v in q]))
    coll2 = spark.createDataFrame(rows, "id long, vector array<double>")
    path = str(tmp_path_factory.mktemp("ivf_ip") / "idx")
    idx = build_ivf(coll2, path, nlist=4, metric="IP")
    req = DenseSearchRequest(query_vector=q, metric="IP", limit=1,
                             output_fields=(), score_threshold=None)
    hit = idx.search(spark, req, nprobe=1).first()
    assert hit["id"] == 999


def test_build_empty_collection_raises_distinct_message(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    empty = spark.createDataFrame([], "id long, vector array<double>, chunk string")
    with pytest.raises(ValueError, match="empty collection"):
        build_ivf(empty, path, nlist=4, metric="COSINE")


def test_build_duplicate_dominated_corpus_falls_back(spark, tmp_path_factory, monkeypatch):
    """A corpus of one repeated vector can land its shared hash off-stride
    (equal vectors survive or die together); the build must fall back to a
    bounded scan instead of failing with a misleading empty-collection
    error."""
    import flouds_vectordb_spark.plans.ivf as ivf_mod

    monkeypatch.setattr(ivf_mod, "SAMPLE_CAP", 4)
    # find a constant vector whose Spark hash is off-stride for stride=3
    # (n=12, cap=4) — deterministic: Spark's hash seed is fixed
    probe = spark.range(1).select(
        *[F.pmod(F.hash(F.array(*[F.lit(float(v))] * 8)), F.lit(3)).alias(f"h{v}")
          for v in range(1, 6)]).first()
    v = next(val for val in range(1, 6) if probe[f"h{val}"] != 0)
    rows = [(i, [float(v)] * 8, f"doc {i}") for i in range(12)]
    dupes = spark.createDataFrame(rows, "id long, vector array<double>, chunk string")
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    idx = build_ivf(dupes, path, nlist=2, metric="L2")
    assert idx.centroids.shape[1] == 8
    assert spark.read.parquet(path).count() == 12
