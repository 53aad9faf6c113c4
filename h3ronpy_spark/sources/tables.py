"""Table source abstraction: Iceberg when the runtime has the connector,
parquet otherwise.

The north-rule input is "Iceberg tables of image + caption pairs"; this
sandbox ships no Iceberg jars, so the reader probes for the connector and
degrades to parquet with identical downstream semantics.  On a real
cluster (`spark-submit --packages org.apache.iceberg:...`) the same call
reads the Iceberg table, and `snapshot_id=` pins the scan to a snapshot —
the id the checkpoint manifest records for lineage (plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg DataSource is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    path_or_table: str,
    snapshot_id: str | int | None = None,
) -> DataFrame:
    """Read an Iceberg table (by name or path) or a parquet path.

    With Iceberg present, `snapshot_id` gives a time-travel scan —
    resumable pipelines MUST pass the manifest's snapshot id so a resumed
    run reads the exact data the finished shards read.  The parquet
    fallback treats the path as immutable (the sandbox testdata is) and
    records the caller-provided pseudo snapshot id in the manifest
    instead."""
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(path_or_table)
    return spark.read.parquet(path_or_table)


def write_table(
    df: DataFrame,
    path_or_table: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write to Iceberg (ACID append/overwrite) or parquet fallback."""
    if iceberg_available(df.sparkSession):
        w = df.writeTo(path_or_table)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_table)
