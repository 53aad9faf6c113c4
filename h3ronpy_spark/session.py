"""SparkSession factory tuned for the engine (local mode and cluster)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "h3ronpy_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Arrow-enabled session with AQE; defaults sized for local[N]."""
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    cores = os.cpu_count() or 8
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_CPUS", cores)
    )
    b = (
        b.config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("H3SPARK_DRIVER_MEM", "24g"))
    )
    return b.getOrCreate()
