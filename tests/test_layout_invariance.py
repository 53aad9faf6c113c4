"""Layout-invariance pins (round-4): contract-query results must be
bit-identical under different core counts / shuffle-partition counts.

Float aggregation order depends on partitioning; two real defects were
caught by cross-layout sweeps (ivf_recall scan_frac, part_brand_stats
avg_price — both round-half boundary flips) and fixed with exact
integer aggregation.  This test keeps the property from regressing on
the queries with the tightest numeric margins."""

import os

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

QUERIES = [
    "q1_pricing_summary",
    "part_brand_stats",
    "events_by_type",
    "text_quality",
    "embedding_norms",
    "ivf_recall_at_10",
]

LAYOUTS = [("local[2]", 3), ("local[4]", 4)]


def _run_layout(master, shuffle):
    import __spark_entry__ as E
    from h3ronpy_spark.session import get_spark

    spark = get_spark(
        master, app_name=f"h3spark_layout_{shuffle}",
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = {}
    try:
        for name in QUERIES:
            df = qs[name](spark, "/root/testdata/sf0.001").toPandas()
            sc = sorted(df.columns)
            out[name] = (
                df[sc].sort_values(sc).reset_index(drop=True)
            )
    finally:
        spark.stop()
    return out


@pytest.mark.slow
def test_contract_queries_layout_invariant():
    a = _run_layout(*LAYOUTS[0])
    b = _run_layout(*LAYOUTS[1])
    for name in QUERIES:
        # .equals is exact (bit-level for floats) — no tolerance
        assert a[name].equals(b[name]), (
            f"{name} differs between layouts:\n{a[name]}\nvs\n{b[name]}"
        )
