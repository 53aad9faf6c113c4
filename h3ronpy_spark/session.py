"""SparkSession factory tuned for the engine (local mode and cluster)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_KERNEL_THREAD_VARS = (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
)


def pin_kernel_threads() -> None:
    """Parallelism comes from Spark tasks; each numpy kernel must stay
    single-threaded or N workers x M BLAS threads oversubscribe the box
    (measured: load avg 52 on 32 cores, negative scaling)."""
    for v in _KERNEL_THREAD_VARS:
        os.environ.setdefault(v, "1")
    # keep numpy batch buffers on the worker heap instead of mmap/munmap
    # per allocation: 32 workers churning mmap causes kernel page-zeroing
    # + TLB shootdown storms (measured 70% sys time, 4x slowdown)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "134217728")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "134217728")


def get_spark(
    master: str | None = None,
    app_name: str = "h3ronpy_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Arrow-enabled session with AQE; defaults sized for local[N]."""
    pin_kernel_threads()
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
    for v in _KERNEL_THREAD_VARS:
        b = b.config(f"spark.executorEnv.{v}", "1")
        b = b.config(f"spark.yarn.appMasterEnv.{v}", "1")
    for v in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        b = b.config(f"spark.executorEnv.{v}", "134217728")
    return b.getOrCreate()
