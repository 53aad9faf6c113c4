"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.11) — its
"incremental" story is batch checkpointing, which lives in
plans/checkpoint.py.  This module demonstrates that the H3 kernels compose
with Structured Streaming unchanged: a stream of georeferenced events is
encoded to cells on the fly and rolled up in event-time windows with
late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import functions as H


def stream_cells_rollup(
    spark: SparkSession,
    input_dir: str,
    res: int = 7,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream over an events parquet directory -> per-(window, cell)
    rollup with a watermark for late data.

    Coordinates are derived from user_id via the same pinned hash mapping
    the batch queries use, so batch/stream results are comparable."""
    batch = spark.read.parquet(input_dir)
    stream = spark.readStream.schema(batch.schema).parquet(input_dir)
    enc = stream.select(
        # watermarks require TIMESTAMP (not NTZ); session tz is UTC
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
        H.coordinates_to_cells(
            (F.pmod(F.col("user_id") * 2654435761, F.lit(1700000)) / 10000.0
             - 85.0),
            (F.pmod(F.col("user_id") * 40503, F.lit(3600000)) / 10000.0
             - 180.0),
            F.lit(res),
        ).alias("cell"),
    )
    return (
        enc.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "cell")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "cell",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(df: DataFrame, checkpoint_dir: str):
    """Drain everything currently available (batch-equivalent semantics),
    writing to an in-memory sink; returns the finished query."""
    q = (
        df.writeStream.format("memory")
        .queryName("h3_stream_rollup")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
