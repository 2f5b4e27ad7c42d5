"""Training-shard export: determinism, manifest, range/hash modes."""

from __future__ import annotations

import json
import os

import pytest

from flouds_vectordb_spark.operators.export import (
    read_training_shards,
    shard_assignments,
    write_training_shards,
)


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"text number {i}") for i in range(n)], "id long, text string")


def test_hash_shards_are_key_stable_and_partition_invariant(spark):
    df = _docs(spark)
    a = {r["id"]: r["shard"]
         for r in shard_assignments(df, 4, seed=1).collect()}
    b = {r["id"]: r["shard"]
         for r in shard_assignments(df.repartition(7), 4, seed=1).collect()}
    assert a == b and set(a.values()) == {0, 1, 2, 3}


def test_range_shards_keep_keys_contiguous(spark):
    df = _docs(spark, 40)
    out = shard_assignments(df, 4, mode="range").collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["id"])
    assert sorted(by_shard) == [0, 1, 2, 3]
    for s, ids in by_shard.items():
        assert sorted(ids) == list(range(s * 10, s * 10 + 10))


def test_write_read_roundtrip_with_manifest(spark, tmp_path):
    df = _docs(spark, 30)
    path = os.path.join(str(tmp_path), "export")
    manifest = write_training_shards(df, path, n_shards=3, seed=2)
    assert manifest["total_rows"] == 30
    assert sum(s["rows"] for s in manifest["shards"].values()) == 30
    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk["total_rows"] == 30

    back = read_training_shards(spark, path)
    assert back.count() == 30
    assert {r["id"] for r in back.collect()} == set(range(30))
    # shard-pruned read returns exactly the manifest's row count
    one = read_training_shards(spark, path, shards=[0])
    assert one.count() == manifest["shards"][0]["rows"]
    # key ranges in the manifest bound the shard's actual keys
    got = {r["id"] for r in one.collect()}
    lo = manifest["shards"][0]["key_min"]
    hi = manifest["shards"][0]["key_max"]
    assert min(got) == lo and max(got) == hi

    # re-export reproduces identical shard assignment (determinism)
    path2 = os.path.join(str(tmp_path), "export2")
    m2 = write_training_shards(df.repartition(5), path2, n_shards=3, seed=2)
    assert m2["shards"] == manifest["shards"]


def test_export_validation(spark):
    df = _docs(spark, 5)
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignments(df, 0)
    with pytest.raises(ValueError, match="mode"):
        shard_assignments(df, 2, mode="zigzag")


def test_export_evaluates_upstream_lineage_once(spark, tmp_path):
    # r8 VERDICT #2: the manifest stats must come from the written files —
    # the upstream lineage (here: an accumulator-counting UDF) runs exactly
    # once, at the write, not a second time for the per-shard aggregation.
    from pyspark.sql.functions import udf

    acc = spark.sparkContext.accumulator(0)

    def _count(x):
        acc.add(1)
        return x

    counted = udf(_count, "long").asNondeterministic()
    df = spark.range(100).select(counted("id").alias("id"))
    manifest = write_training_shards(df, str(tmp_path / "exp_once"), 4)
    assert manifest["total_rows"] == 100
    assert acc.value == 100
