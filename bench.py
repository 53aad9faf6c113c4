"""Benchmark: flagship pipeline + headline queries.

Runs the flagship image->tile->PIP-join pipeline plus the headline query
set at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship `value` is wall seconds; `rows_per_sec` (cells encoded +
PIP-joined per second — the BASELINE.json metric) is included per query.
Set SPARK_GRAFT_CPUS=8 vs 32 to produce the two-cluster-size scaling
evidence (see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "60000"))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from h3ronpy_spark.plans.flagship import flagship
    from h3ronpy_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="h3ronpy_spark_bench",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # guess sf from the dir name for the report
    sf = 0.1
    for tok in SF_DIR.split("/"):
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    results: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- flagship: tile N_IMAGES synthetic images at res 9, PIP join
    t0 = time.time()
    out = flagship(
        spark, n_images=N_IMAGES, n_polygons=60, res=9, partitions=CPUS * 4
    )
    agg = out.agg(
        F.sum("n_tiles").alias("tiles"), F.count("*").alias("polys")
    ).first()
    flag_secs = time.time() - t0
    results["flagship_pip_join"] = round(flag_secs, 2)
    joined_tiles = int(agg["tiles"] or 0)
    extra["flagship_joined_tiles"] = joined_tiles
    extra["flagship_rows_per_sec"] = round(joined_tiles / flag_secs, 1)
    extra["flagship_images_per_sec"] = round(N_IMAGES / flag_secs, 1)

    # --- headline queries over the sf tables
    qs = E.queries()
    headline = [
        "q1_pricing_summary",
        "q5_region_revenue",
        "top_customers_window",
        "events_sessions",
        "dedup_exact",
        "text_token_count",
        "similarity_topk_cosine",
        "h3_encode",
        "h3_parent_rollup",
        "h3_pip_join",
        "h3_tiling",
    ]
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        results[name] = round(time.time() - t0, 2)
        extra[f"{name}_rows"] = n

    # encode-kernel throughput at bench scale: encode every document point
    import h3ronpy_spark.functions as H

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pts = docs.select(
        F.expr("(doc_id * 2654435761) % 1700000 / 10000.0 - 85.0").alias("lat"),
        F.expr("(doc_id * 40503) % 3600000 / 10000.0 - 180.0").alias("lng"),
    )
    t0 = time.time()
    n_enc = (
        pts.select(H.coordinates_to_cells("lat", "lng", F.lit(9)).alias("c"))
        .filter(F.col("c").isNotNull())
        .count()
    )
    enc_secs = time.time() - t0
    results["encode_kernel"] = round(enc_secs, 2)
    extra["encode_rows_per_sec"] = round(n_enc / enc_secs, 1)

    total = round(sum(results.values()), 2)
    print(
        json.dumps(
            {
                "metric": "flagship+headline wall seconds "
                "(cells encoded + PIP-joined)",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "cpus": CPUS,
                "n_images": N_IMAGES,
                "stats": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
