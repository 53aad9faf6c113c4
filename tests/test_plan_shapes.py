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


class TestFlagshipPlan:
    def test_no_expand_in_rollup(self, spark):
        """Two countDistinct in one agg would plan an Expand (x2 row blowup
        over every tile row); the two-stage rollup must not."""
        from h3ronpy_spark.plans.flagship import flagship

        df = flagship(spark, 32, n_polygons=5)
        plan = _plan(df)
        assert "Expand" not in plan, plan
        # still ends in a partial+final hash aggregation pair
        assert plan.count("HashAggregate") >= 4


class TestNonBroadcastBranches:
    """Round-5 (VERDICT r04 item 2): the branches that only fire beyond
    local test scale — flagship's >200k-image caption join and
    pip_join's salted shuffle join — pinned by plan shape so their
    execution strategy is verified without a 600k-row run (the sf1
    scale-stress in tools/scale_stress_sf1.py executes them for real)."""

    def test_flagship_caption_join_not_broadcast_past_200k(self, spark):
        """Past 200k images the caption join must be a SHUFFLED hash
        join (parallel build), never a driver-built BroadcastExchange
        (single-threaded hash relation — the round-3 Amdahl lesson).
        Dropping the broadcast hint alone is insufficient: Catalyst's
        size estimate propagates range's 8 B/row through mapInPandas
        and auto-broadcasts the really-~50 B/row caption side, so the
        branch pins an explicit shuffle_hash hint."""
        from h3ronpy_spark.plans.flagship import flagship

        # round-8: the fused path carries the caption in-kernel and has
        # no caption join at all; the join (and this strategy guard)
        # lives on in the fallback plan — force it with salt=
        big = flagship(spark, 200_001, n_polygons=3, res=6, salt=2)
        small = flagship(spark, 200_000, n_polygons=3, res=6, salt=2)
        plan_big = _plan(big)
        assert "ShuffledHashJoin" in plan_big, plan_big[:3000]
        # ...while at/below the threshold the driver broadcast is forced
        plan_small = _plan(small)
        n_bhj_small = plan_small.count("BroadcastHashJoin")
        n_bhj_big = plan_big.count("BroadcastHashJoin")
        assert n_bhj_small == n_bhj_big + 1, (n_bhj_small, n_bhj_big)

    def test_pip_join_salted_shuffle_branch(self, spark):
        """broadcast_threshold_rows exceeded + salt: the coverage is
        replicated per salt value, both sides shuffle on (prefix, salt)
        — bounded per-task fan-in under a hot prefix — and the output
        matches the broadcast path row-for-row."""
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        pts = spark.range(4000).select(
            F.col("id"),
            H.coordinates_to_cells(
                (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0
                 - 85.0),
                (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0
                 - 180.0),
                F.lit(8),
            ).alias("cell"),
        )
        polys = synth_polygons(spark, 8, seed=3)
        salted = pip_join(
            pts, polys, res=8, broadcast_threshold_rows=1, salt=4
        )
        plan = _plan(salted)
        assert "BroadcastHashJoin" not in plan.split("AdaptiveSparkPlan")[-1] \
            or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:3000]
        assert "__salt" in plan
        bcast = pip_join(pts, polys, res=8)
        got = sorted(
            map(tuple, salted.select("id", "poly_id").collect())
        )
        want = sorted(
            map(tuple, bcast.select("id", "poly_id").collect())
        )
        assert got == want and got

    def test_pip_join_prefilter_two_stage(self, spark):
        """Round-7 (VERDICT r06 item 5): past the broadcast threshold,
        a coarse ancestor prefilter (broadcast LEFT SEMI over the
        distinct coverage ancestors, codegen bit-math probe) drops
        non-matching rows BEFORE the shuffle.  Output must match the
        broadcast path row-for-row with the prefilter on (default) and
        off, and the prefilter leg must appear in the plan only when
        on."""
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        pts = spark.range(4000).select(
            F.col("id"),
            H.coordinates_to_cells(
                (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0
                 - 85.0),
                (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0
                 - 180.0),
                F.lit(8),
            ).alias("cell"),
        )
        polys = synth_polygons(spark, 8, seed=3)
        pref = pip_join(pts, polys, res=8, broadcast_threshold_rows=1)
        plan = _plan(pref)
        assert "__coarse_cell" in plan, plan[:3000]
        assert "LeftSemi" in plan, plan[:3000]
        raw = pip_join(
            pts, polys, res=8, broadcast_threshold_rows=1,
            prefilter=False,
        )
        assert "__coarse_cell" not in _plan(raw)
        want = sorted(map(tuple, pip_join(pts, polys, res=8)
                          .select("id", "poly_id").collect()))
        for df in (pref, raw):
            got = sorted(map(tuple, df.select("id", "poly_id").collect()))
            assert got == want and got
        # salted + prefilter compose
        sp = pip_join(pts, polys, res=8, broadcast_threshold_rows=1,
                      salt=4)
        plan_sp = _plan(sp)
        assert "__coarse_cell" in plan_sp and "__salt" in plan_sp
        got = sorted(map(tuple, sp.select("id", "poly_id").collect()))
        assert got == want

    def test_pip_join_semi_anti_partition(self, spark):
        """Round-5 regression: semi/anti must PARTITION the left rows
        exactly (semi distinct == inner distinct, anti == complement,
        no duplicated rows) — the pre-fix anti rode the prefix explode
        and returned every point once per non-matching coverage level,
        including matched points.  Salted path must agree."""
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        pts = spark.range(4000).select(
            F.col("id"),
            H.coordinates_to_cells(
                (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0
                 - 85.0),
                (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0
                 - 180.0),
                F.lit(8),
            ).alias("cell"),
        )
        polys = synth_polygons(spark, 8, seed=3)
        inner_ids = {
            r["id"]
            for r in pip_join(pts, polys, res=8).select("id").collect()
        }
        semi = [
            r["id"]
            for r in pip_join(pts, polys, res=8, how="left_semi")
            .select("id")
            .collect()
        ]
        anti = [
            r["id"]
            for r in pip_join(pts, polys, res=8, how="left_anti")
            .select("id")
            .collect()
        ]
        assert sorted(semi) == sorted(inner_ids)  # no dup, no loss
        assert len(anti) == 4000 - len(inner_ids)
        assert set(anti).isdisjoint(inner_ids)
        anti_salted = [
            r["id"]
            for r in pip_join(
                pts, polys, res=8, how="left_anti",
                broadcast_threshold_rows=1, salt=4,
            )
            .select("id")
            .collect()
        ]
        assert sorted(anti_salted) == sorted(anti)
        with pytest.raises(ValueError, match="how"):
            pip_join(pts, polys, res=8, how="full_outer")

    def test_pip_join_semi_anti_repartition_stable(self, spark):
        """Round-6 regression (ADVICE r05 high): semi/anti must be
        deterministic when the left side's partition layout differs
        between plan evaluations.  The round-5 implementation tagged
        rows with monotonically_increasing_id and evaluated the tagged
        subtree twice; a repartition/AQE re-plan between evaluations
        could skew ids and silently corrupt results.  The round-6
        matched-cell-set design has no per-row id at all, so any
        partitioning of the left must give byte-identical results."""
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        base = spark.range(3000).select(
            F.col("id"),
            H.coordinates_to_cells(
                (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0
                 - 85.0),
                (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0
                 - 180.0),
                F.lit(8),
            ).alias("cell"),
        )
        polys = synth_polygons(spark, 8, seed=3)
        want_semi = sorted(
            r["id"]
            for r in pip_join(base, polys, res=8, how="left_semi")
            .select("id").collect()
        )
        want_anti = sorted(
            r["id"]
            for r in pip_join(base, polys, res=8, how="left_anti")
            .select("id").collect()
        )
        assert want_semi and want_anti
        # adversarial layouts: hash-repartition, skew-to-1, range
        for adversarial in (
            base.repartition(7, "cell"),
            base.coalesce(1),
            base.repartitionByRange(5, F.col("id").desc()),
        ):
            got_semi = sorted(
                r["id"]
                for r in pip_join(
                    adversarial, polys, res=8, how="left_semi"
                ).select("id").collect()
            )
            got_anti = sorted(
                r["id"]
                for r in pip_join(
                    adversarial, polys, res=8, how="left_anti"
                ).select("id").collect()
            )
            assert got_semi == want_semi
            assert got_anti == want_anti
        # null cells never match: anti keeps them, semi drops them
        with_null = base.withColumn(
            "cell",
            F.when(F.col("id") < 10, F.lit(None)).otherwise(F.col("cell")),
        )
        semi_ids = {
            r["id"]
            for r in pip_join(with_null, polys, res=8, how="left_semi")
            .select("id").collect()
        }
        anti_ids = {
            r["id"]
            for r in pip_join(with_null, polys, res=8, how="left_anti")
            .select("id").collect()
        }
        assert semi_ids.isdisjoint(range(10))
        assert set(range(10)) <= anti_ids

    def test_pip_join_plain_shuffle_branch(self, spark):
        """Threshold exceeded WITHOUT salt: plain shuffle equi-join on
        the prefix, same rows as the broadcast path."""
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        pts = spark.range(2000).select(
            F.col("id"),
            H.coordinates_to_cells(
                (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0
                 - 85.0),
                (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0
                 - 180.0),
                F.lit(8),
            ).alias("cell"),
        )
        polys = synth_polygons(spark, 6, seed=9)
        shuffled = pip_join(pts, polys, res=8, broadcast_threshold_rows=1)
        got = sorted(map(tuple, shuffled.select("id", "poly_id").collect()))
        want = sorted(
            map(
                tuple,
                pip_join(pts, polys, res=8)
                .select("id", "poly_id")
                .collect(),
            )
        )
        assert got == want and got


class TestIVFPlan:
    def test_probe_side_broadcast_no_cartesian(self, spark):
        """The IVF candidate join must be a broadcast hash equi-join on the
        cluster id — never a cartesian/nested-loop product."""
        from h3ronpy_spark.operators.similarity import ivf_topk

        emb = spark.read.parquet(
            "/root/testdata/sf0.01/embeddings.parquet"
        )
        q = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        df = ivf_topk(emb, q, k=5, n_clusters=8, nprobe=2)
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestLiftedCoverage:
    def test_lifted_join_still_broadcast_with_fewer_prefixes(self, spark):
        from h3ronpy_spark.operators.spatial_join import (
            lift_coverage,
            pip_join,
            polyfill_polygons,
        )
        from h3ronpy_spark.sources.polygons import synth_polygons

        polys = synth_polygons(spark, 10, seed=42)
        cov = polyfill_polygons(polys, 7, compact=True).withColumnRenamed(
            "cell", "__poly_cell"
        )
        lifted = lift_coverage(cov, 5).persist()
        lifted.count()
        pts = spark.range(1000).select(
            H.coordinates_to_cells(
                (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0 - 85.0),
                (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0 - 180.0),
                F.lit(9),
            ).alias("cell")
        )
        joined = pip_join(pts, polys, res=7, coverage=lifted)
        plan = _plan(joined)
        assert "BroadcastHashJoin" in plan
        # lifting must not change results vs the unlifted coverage
        unlifted = pip_join(pts, polys, res=7, coverage=cov.persist())
        a = sorted(r["poly_id"] for r in joined.select("poly_id").collect())
        b = sorted(r["poly_id"] for r in unlifted.select("poly_id").collect())
        assert a == b
        # coverage resolutions are confined to [5, 7]
        rs = sorted(
            r["r"]
            for r in lifted.select(
                H.cells_resolution(F.col("__poly_cell")).alias("r")
            ).distinct().collect()
        )
        assert rs and rs[0] >= 5 and rs[-1] <= 7


class TestIvfTrainingPlan:
    def test_sample_plan_no_global_sort(self, spark):
        """train_ivf_centroids' sample scan (round-4): when the table is
        large relative to sample_cap, the plan must show (a) the
        pmod(xxhash64) prefilter and (b) TakeOrderedAndProject —
        per-partition top-K heads — with NO global Sort+Exchange."""
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        n = emb.count()
        # reproduce the exact sampling plan train_ivf_centroids builds,
        # with a cap small enough that the prefilter engages (m > 1)
        cap = max(4, n // 10)
        m = max(1, n // (2 * cap))
        assert m > 1
        nn = emb.filter(F.col("embedding").isNotNull()).filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)) == 0
        )
        plan = nn.orderBy("vec_id").limit(cap)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        assert "Sort [" not in plan.replace(
            "TakeOrderedAndProject", ""
        ), plan
        assert "xxhash64" in plan and "pmod" in plan, plan

    def test_prefilter_engages_and_trains(self, spark):
        """End-to-end: a tiny sample_cap forces m > 1 and training still
        produces a codebook deterministically."""
        import numpy as np

        from h3ronpy_spark.operators.similarity import train_ivf_centroids

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        c1 = train_ivf_centroids(emb, n_clusters=4, sample_cap=40)
        c2 = train_ivf_centroids(emb, n_clusters=4, sample_cap=40)
        assert np.array_equal(c1, c2)
        # expected_rows shortcut produces the same sample -> same codebook
        n = emb.count()
        c3 = train_ivf_centroids(
            emb, n_clusters=4, sample_cap=40, expected_rows=n
        )
        assert np.array_equal(c1, c3)


class TestRasterizeGuard:
    def test_rasterize_driver_collect_guard(self, spark):
        """VERDICT r05: rasterize_cells must refuse to collect more than
        max_cells rows to the driver (a continent at res 12 would OOM)
        — and still work under the cap."""
        import numpy as np

        from h3ronpy_spark.operators.rasterize import rasterize_cells
        from h3ronpy_spark.operators.tiling import tile_images
        from h3ronpy_spark.sources.images import (
            IMAGES_SCHEMA, PIXEL_DEG, georef_of_phash,
        )

        w, h = 60, 40
        band = np.zeros((h, w), dtype=np.uint8)
        band[5:20, 10:40] = 7
        band[25:35, 5:25] = 3
        phash = 424242
        images = spark.createDataFrame(
            [("g", bytearray(band.tobytes()), w, h, "raw8", "c", phash)],
            IMAGES_SCHEMA,
        )
        tiles = tile_images(images, res=11, nodata=0).select(
            "cell", F.col("px_value").alias("value")
        )
        lat, lng = georef_of_phash(np.array([phash], dtype=np.int64))
        tf = (PIXEL_DEG, 0.0, float(lng[0]), 0.0, -PIXEL_DEG, float(lat[0]))
        with pytest.raises(ValueError, match="max_cells guard"):
            rasterize_cells(tiles, (w, h), tf, max_cells=3)
        out = rasterize_cells(tiles, (w, h), tf, nodata_value=0)
        assert out.shape == (h, w) and (out == band).all()
