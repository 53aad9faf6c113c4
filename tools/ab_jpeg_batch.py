"""A/B the lockstep batch JPEG decoder inside the fused flagship.

Same plan, same session; the only difference is whether the jpeg batch
codec is registered when the plan captures its codec snapshots (the
`decode_images_with` seam).  Prints min-of-N seconds per arm,
alternating arms to cancel co-tenant drift.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(os.environ.get("BENCH_IMAGES", "60000"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main():
    try:
        os.sched_setaffinity(0, set(range(CPUS)))
    except (AttributeError, OSError):
        pass
    from pyspark.sql import functions as F

    from h3ronpy_spark.operators.spatial_join import polyfill_polygons
    from h3ronpy_spark.plans.flagship import flagship
    from h3ronpy_spark.session import get_spark
    from h3ronpy_spark.sources.images import unregister_batch_codec
    from h3ronpy_spark.sources.jpeg import register_jpeg_codec
    from h3ronpy_spark.sources.polygons import synth_polygons

    spark = get_spark(
        f"local[{CPUS}]", app_name="ab_jpeg_batch", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    polys = synth_polygons(spark, 10, seed=42)
    cov = (
        polyfill_polygons(polys, 8, compact=True)
        .withColumnRenamed("cell", "__poly_cell")
        .persist()
    )
    cov.count()

    def build(batch: bool):
        register_jpeg_codec()
        if not batch:
            unregister_batch_codec("jpeg")
        try:
            return flagship(
                spark, n_images=N, n_polygons=10, res=8,
                partitions=256, coverage=cov, fmt="jpeg",
            )
        finally:
            register_jpeg_codec()

    dfs = {arm: build(arm == "batch") for arm in ("scalar", "batch")}
    for df in dfs.values():  # warm both
        df.agg(F.sum("n_tiles")).first()
    best = {a: float("inf") for a in dfs}
    sums = {}
    for _ in range(REPS):
        for arm, df in dfs.items():
            sc.setJobDescription(f"ab_jpeg_batch:{arm}")
            t0 = time.time()
            sums[arm] = df.agg(
                F.sum("n_tiles"), F.sum("sum_px")
            ).first()
            best[arm] = min(best[arm], time.time() - t0)
    assert sums["scalar"] == sums["batch"], sums
    for arm in ("scalar", "batch"):
        print(f"{arm:8s} {best[arm]:6.2f}s  (min of {REPS}, n={N})")
    print("sums equal:", tuple(sums["batch"]))
    spark.stop()


if __name__ == "__main__":
    main()
