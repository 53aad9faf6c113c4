"""Physical-plan shape assertions: the properties that matter at 100 TB.

Checks .explain output: PIP join must be a BroadcastHashJoin on the int64
prefix key (big side never shuffles), parquet scans must show pushed
filters / pruned schemas, and the pure-SQL parent must stay inside
whole-stage codegen (no Python eval node)."""

import os

import pytest
from pyspark.sql import functions as F

import h3ronpy_spark.functions as H

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="module")
def spark():
    from h3ronpy_spark.session import get_spark

    s = get_spark("local[4]", app_name="h3spark_plans", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlans:
    def test_pip_join_is_broadcast(self, spark):
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        pts = spark.range(100).select(
            F.col("id"),
            H.coordinates_to_cells(
                F.lit(45.0), F.lit(10.0), F.lit(8)
            ).alias("cell"),
        )
        polys = synth_polygons(spark, 5, seed=1)
        j = pip_join(pts, polys, res=8)
        plan = _plan(j)
        assert "BroadcastHashJoin" in plan, plan
        # the probe side must NOT be exchanged (no shuffle of big side)
        probe_side = plan.split("BroadcastHashJoin")[1]
        assert "Exchange hashpartitioning" not in probe_side.split(
            "BroadcastExchange"
        )[0]

    def test_parent_is_pure_codegen(self, spark):
        df = spark.range(100).select(
            H.change_resolution_parent(
                (F.col("id") + 0x8828308281FFFFF), 4
            ).alias("p")
        )
        plan = _plan(df)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "WholeStageCodegen" in plan or "*(1)" in plan

    def test_parquet_filter_pushdown(self, spark):
        df = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .filter(F.col("l_orderkey") == 42)
            .select("l_orderkey", "l_quantity")
        )
        plan = _plan(df)
        assert "PushedFilters: [" in plan and "l_orderkey" in plan.split(
            "PushedFilters"
        )[1]
        # column pruning: read schema carries only the 2 needed columns
        rs = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_quantity" in rs and "l_extendedprice" not in rs

    def test_encode_single_python_eval(self, spark):
        # one ArrowEvalPython node, not one per downstream reference
        df = spark.range(100).select(
            F.col("id"),
            H.coordinates_to_cells(F.lit(45.0), F.lit(10.0), F.lit(9)).alias(
                "cell"
            ),
        )
        out = df.select(
            F.col("cell"),
            H.change_resolution_parent(F.col("cell"), 5).alias("p5"),
            H.change_resolution_parent(F.col("cell"), 6).alias("p6"),
            H.cells_resolution(F.col("cell")).alias("r"),
        )
        plan = _plan(out)
        assert plan.count("ArrowEvalPython") == 1, plan
