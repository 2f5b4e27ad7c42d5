"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM; on a real cluster the same configs apply, with
shuffle partitions sized to cores × 2-3 and AQE coalescing the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "flouds_vectordb_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the testdata events table stores TIMESTAMP(NANOS) which the parquet
        # reader otherwise rejects; read as long and convert explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # codegen-heavy workload (37 bench queries; some generate very large
        # classes — 16 minhash sigs, 60 simhash bit-votes): the JVM's default
        # 240 MB JIT code cache fills mid-run, JIT compilation stops, and
        # every later query runs interpreted (measured 10-40x slowdowns on
        # late-registry bench queries). Same flag Spark's own build uses.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
