"""Pin golden-parquet oracles for contract queries DuckDB cannot compute.

The H3 grid math and the 64-bit hash kernels (minhash/simhash/LSH) are
validated by the pytest golden suite (absolute parity literals + the
reference's own population parquet, tests/test_h3core.py).  This tool runs
each such contract query ONCE at sf0.01 and commits the result as
tests/golden/<name>.parquet; oracle_sql() then reads the pinned file, so
the driver's value-hash gate checks cross-run / cross-executor
determinism and guards every future kernel change against silent drift.

Regenerate deliberately (and only after the pytest suite is green) when a
kernel's output is *intended* to change:

    python tools/make_golden.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)

# every queries() entry whose oracle is a pinned golden parquet
GOLDEN_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "similarity_lsh_ann",
    "ann_recall_at_10",
    "ivf_recall_at_10",
    "image_resize_features",
    "video_frame_sample",
    "h3_encode",
    "h3_parent_rollup",
    "h3_compact_roundtrip",
    "h3_area_stats",
    "h3_pip_join",
    "h3_tiling",
    "h3_tiling_f64",
    "h3_wkb",
    "h3_grid_disk_agg",
    "h3_hulls",
    "h3_edges",
    "h3_vertexes",
    "h3_bounds",
    "h3_rasterize_roundtrip",
    "h3_linestrings",
    "h3_containment_modes",
]


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as E
    from h3ronpy_spark.session import get_spark

    names = sys.argv[1:] or GOLDEN_QUERIES
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("local[8]", app_name="make_golden", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for name in names:
        # folded queries (round-4: h3_containment_modes rides inside
        # h3_disk_size) keep their _q_* function for regeneration even
        # though they no longer have their own queries() key
        fn = qs.get(name) or getattr(E, "_q_" + name)
        df = fn(spark, SF_DIR)
        tbl = df.toArrow()
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(tbl, path, compression="zstd")
        print(f"wrote {path}: {tbl.num_rows} rows, cols={tbl.column_names}")
    spark.stop()


if __name__ == "__main__":
    main()
