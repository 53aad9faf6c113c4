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


def stream_user_sessions(
    spark: SparkSession,
    input_dir: str,
    gap_s: int = 1800,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    sessionization with a `gap_s` inactivity split, state carried across
    micro-batches.

    Emits one row per session: (user_id, session_start, session_end,
    n_events).  The in-flight session survives in GroupState between
    triggers, so a user whose events span micro-batches still gets ONE
    session — the semantics a batch window-lag job (events_sessions query)
    computes over the same data, which the test asserts."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    batch = spark.read.parquet(input_dir)
    stream = spark.readStream.schema(batch.schema).parquet(input_dir)
    ev = stream.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )

    out_type = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_type = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    def sessionize(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        out = []
        # accumulate EVERY Arrow chunk of the group before sorting: a
        # group larger than arrow.maxRecordsPerBatch arrives as multiple
        # chunks in arbitrary order, and per-chunk sorting would merge or
        # split sessions across the chunk boundary
        import numpy as _np

        all_ts = [
            (pdf["ts"].astype("int64") // 1000).to_numpy() for pdf in pdfs
        ]
        ts_us = (
            _np.sort(_np.concatenate(all_ts))
            if all_ts
            else _np.array([], dtype="int64")
        )
        for t in ts_us:
            t = int(t)
            if start_us < 0:
                start_us = last_us = t
                n = 1
            elif t - last_us > gap_s * 1_000_000:
                out.append((start_us, last_us, n))
                start_us = last_us = t
                n = 1
            else:
                last_us = max(last_us, t)
                n += 1
        # emit the in-flight session too (its row is refined if the user
        # reappears in a later trigger; the final trigger's emission is
        # the complete session) and keep it in state
        if start_us >= 0:
            out.append((start_us, last_us, n))
            state.update((start_us, last_us, n))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": pd.to_datetime(
                    [o[0] for o in out], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [o[1] for o in out], unit="us"
                ),
                "n_events": [o[2] for o in out],
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        sessionize,
        out_type,
        state_type,
        "update",
        GroupStateTimeout.NoTimeout,
    )
