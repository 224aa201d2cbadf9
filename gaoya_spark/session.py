"""SparkSession factory with scale-oriented defaults.

On a real cluster these same configs apply (AQE, skew-join handling,
shuffle partitions sized to cores); locally we pin master to local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "gaoya_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # signatures tables of bench-scale corpora (<=~100MB) should
        # broadcast in the verify join; on a real cluster AQE's runtime
        # stats make this call per-query. 128MB (not higher): broadcast
        # builds live in the driver's unified pool alongside cached
        # signatures/buckets — a ~250MB build inside a small driver heap
        # fails outright (measured at 300k rows / 3g driver).
        .config("spark.sql.autoBroadcastJoinThreshold", str(128 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
