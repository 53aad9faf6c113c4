"""Spark-layer integration tests: flagship invariants (caption
byte-equality, PSNR), PIP join vs kernel ground truth, distributed
compact, checkpoint resume, streaming, UDF null handling.

One shared local[4] session for the module (Spark startup ~5 s)."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

import h3ronpy_spark.functions as H

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="module")
def spark():
    from h3ronpy_spark.session import get_spark

    s = get_spark("local[4]", app_name="h3spark_tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


class TestFunctions:
    def test_encode_decode_golden(self, spark):
        df = spark.createDataFrame([(45.5, 10.2, 5)], "lat double, lng double, res int")
        r = df.select(
            H.coordinates_to_cells("lat", "lng", "res").alias("cell")
        ).select(
            H.cells_to_string(F.col("cell")).alias("hex"),
            H.cells_resolution(F.col("cell")).alias("res"),
            H.cells_valid(F.col("cell")).alias("ok"),
        ).first()
        assert r["hex"] == "851f9923fffffff"
        assert r["res"] == 5 and r["ok"]

    def test_null_propagation(self, spark):
        df = spark.createDataFrame(
            [(None, 10.2, 5), (45.5, 10.2, None), (45.5, 10.2, 5)],
            "lat double, lng double, res int",
        )
        out = df.select(
            H.coordinates_to_cells("lat", "lng", "res").alias("cell")
        ).collect()
        assert out[0]["cell"] is None
        assert out[1]["cell"] is None
        assert out[2]["cell"] is not None

    def test_parent_sql_vs_kernel(self, spark):
        # the pure-SQL bit-math parent must equal the kernel parent
        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL

        rng = np.random.default_rng(5)
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 500)))
        lng = np.degrees(rng.uniform(-np.pi, np.pi, 500))
        cells = LL.latlng_to_cell(np.radians(lat), np.radians(lng), 9)
        want = IDX.cell_to_parent(cells, 4)
        df = spark.createDataFrame(
            [(int(c),) for c in cells], "cell long"
        ).select(H.change_resolution_parent(F.col("cell"), 4).alias("p"))
        got = np.array([r["p"] for r in df.collect()])
        assert (got == want).all()

    def test_sql_registration(self, spark):
        H.register_sql_functions(spark)
        r = spark.sql(
            "SELECT h3_coordinates_to_cells(45.5d, 10.2d, 5) AS c"
        ).first()
        assert r["c"] == 0x851F9923FFFFFFF


class TestFlagship:
    def test_flagship_invariants(self, spark):
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.operators.tiling import tile_images
        from h3ronpy_spark.sources.images import synth_images
        from h3ronpy_spark.sources.polygons import synth_polygons

        images = synth_images(spark, 400, seed=42, partitions=4)
        tiles = tile_images(images, res=8, nodata=0)
        polys = synth_polygons(spark, 15, seed=42)
        joined = pip_join(tiles, polys, res=8).persist()

        # caption byte-equality through the join: every joined row's
        # caption equals the caption regenerated from its image_id
        from h3ronpy_spark.sources.images import gen_images_pdf

        rows = joined.select("image_id", "caption").distinct().collect()
        assert rows, "join produced no rows"
        ids = np.array([int(r["image_id"][3:]) for r in rows])
        regen = gen_images_pdf(ids, seed=42)
        assert list(regen["caption"]) == [r["caption"] for r in rows]

        # every joined tile really is inside its polygon's coverage
        cov_rows = joined.groupBy("poly_id").count().collect()
        assert all(r["count"] > 0 for r in cov_rows)

    def test_decode_psnr(self, spark):
        # raw8 decode is exact => PSNR infinite (>= 40 dB requirement)
        from h3ronpy_spark.sources.images import (
            decode_image,
            gen_images_pdf,
            psnr,
        )

        pdf = gen_images_pdf(np.arange(50), seed=42)
        for i in range(len(pdf)):
            band = decode_image(
                pdf["bytes"][i], pdf["w"][i], pdf["h"][i], "raw8"
            )
            assert band.shape == (pdf["h"][i], pdf["w"][i])
            assert psnr(band, band) == float("inf")

    def test_codec_stub_raises(self, spark):
        from h3ronpy_spark.sources.images import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x00", 1, 1, "jpeg")

    def test_pip_join_matches_kernel_ground_truth(self, spark):
        """Spark PIP join == driver-side numpy polyfill + set membership."""
        from h3ronpy_spark.h3core.polyfill import wkb_to_cells
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import gen_polygons_pdf

        polys_pdf = gen_polygons_pdf(8, seed=3)
        rng = np.random.default_rng(0)
        lat = rng.uniform(-60, 60, 3000)
        lng = rng.uniform(-170, 170, 3000)
        pts = spark.createDataFrame(
            [(i, float(lat[i]), float(lng[i])) for i in range(3000)],
            "id int, lat double, lng double",
        ).select(
            "id", H.coordinates_to_cells("lat", "lng", F.lit(7)).alias("cell")
        )
        polys = spark.createDataFrame(polys_pdf)
        got = {
            (r["id"], r["poly_id"])
            for r in pip_join(pts, polys, res=7).select("id", "poly_id").collect()
        }
        # ground truth: exact polyfill at res 7 per polygon
        from h3ronpy_spark.h3core.latlng import latlng_to_cell

        cells = latlng_to_cell(np.radians(lat), np.radians(lng), 7)
        want = set()
        for _, row in polys_pdf.iterrows():
            cover = set(wkb_to_cells(row["wkb"], 7).tolist())
            for i in range(3000):
                if int(cells[i]) in cover:
                    want.add((i, row["poly_id"]))
        assert got == want

    def test_pip_join_salted_equals_broadcast(self, spark):
        from h3ronpy_spark.operators.spatial_join import pip_join
        from h3ronpy_spark.sources.polygons import synth_polygons

        rng = np.random.default_rng(2)
        pts = spark.createDataFrame(
            [
                (i, float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170)))
                for i in range(2000)
            ],
            "id int, lat double, lng double",
        ).select(
            "id", H.coordinates_to_cells("lat", "lng", F.lit(6)).alias("cell")
        )
        polys = synth_polygons(spark, 10, seed=9)
        a = {
            (r["id"], r["poly_id"])
            for r in pip_join(pts, polys, res=6).select("id", "poly_id").collect()
        }
        b = {
            (r["id"], r["poly_id"])
            for r in pip_join(
                pts, polys, res=6, broadcast_threshold_rows=1, salt=4
            ).select("id", "poly_id").collect()
        }
        assert a == b


class TestCompactDistributed:
    def test_compact_cells(self, spark):
        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.operators.compact import compact_cells, uncompact_cells

        h5 = LL.latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 5)
        _, kids = IDX.cell_to_children_flat(h5, 7)
        df = spark.createDataFrame([(int(c),) for c in kids], "cell long")
        out = compact_cells(df)
        got = sorted(r["cell"] for r in out.collect())
        assert got == [int(h5[0])]
        # uncompact back
        back = uncompact_cells(out, 7)
        assert back.count() == kids.size

    def test_compact_partial(self, spark):
        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.operators.compact import compact_cells

        h5 = LL.latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 5)
        _, kids = IDX.cell_to_children_flat(h5, 6)
        df = spark.createDataFrame(
            [(int(c),) for c in kids[:-1]], "cell long"
        )
        out = sorted(r["cell"] for r in compact_cells(df).collect())
        assert out == sorted(int(c) for c in kids[:-1])


class TestCheckpoint:
    def test_resume_skips_completed_shards(self, spark, tmp_path):
        from h3ronpy_spark.plans.checkpoint import (
            completed_shards,
            read_manifest,
            run_sharded,
        )

        base = str(tmp_path / "ckpt")
        calls = []

        def shard_fn(s, sid, lo, hi):
            calls.append(sid)
            return s.range(lo, hi).select(F.col("id").alias("x"))

        run_sharded(spark, base, n_rows=100, n_shards=4, cell_res=8,
                    shard_fn=shard_fn)
        assert sorted(calls) == [0, 1, 2, 3]
        assert completed_shards(spark, base) == {0, 1, 2, 3}
        m = read_manifest(spark, base)
        assert m.count() == 4
        row = m.first()
        assert row["rows_per_sec"] > 0 and row["snapshot_id"]

        # simulate a crash: drop one manifest entry, rerun -> only that
        # shard recomputes
        os.remove(os.path.join(base, "_manifest", "shard-00002.json"))
        calls.clear()
        run_sharded(spark, base, n_rows=100, n_shards=4, cell_res=8,
                    shard_fn=shard_fn)
        assert calls == [2]
        # output is complete
        total = spark.read.parquet(os.path.join(base, "shard=*")).count()
        assert total == 100

    def test_shard_computes_exactly_once(self, spark, tmp_path):
        """Round-5: the per-shard stats used to run a SEPARATE
        aggregation action before the write, executing the whole
        shard_fn plan twice; the row count now rides the write via
        Observation.  An accumulator inside the shard plan pins
        single-execution, and the footer-derived manifest stats stay
        populated."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from h3ronpy_spark.plans.checkpoint import read_manifest, run_sharded

        acc = spark.sparkContext.accumulator(0)

        def shard_fn(s, sid, lo, hi):
            @pandas_udf("long")
            def touch(x: pd.Series) -> pd.Series:
                acc.add(len(x))
                return x

            return s.range(lo, hi, 1, 2).select(touch(F.col("id")).alias("x"))

        base = str(tmp_path / "ckpt_once")
        run_sharded(spark, base, n_rows=80, n_shards=2, cell_res=8,
                    shard_fn=shard_fn)
        assert acc.value == 80, f"shard plan executed {acc.value/80:.1f}x"
        m = read_manifest(spark, base).collect()
        assert sum(r["rows"] for r in m) == 80
        assert all(r["skew_max_over_mean"] >= 1.0 for r in m)
        shutil.rmtree(base)

    def test_concurrent_writers_exactly_once(self, spark, tmp_path):
        """Round-6 (VERDICT r05 item 9): two drivers resuming the same
        manifest dir must partition the outstanding shards between them
        — every shard computed by EXACTLY one writer (O_EXCL claim files
        + manifest re-check under the claim), outputs complete."""
        import threading

        from h3ronpy_spark.plans.checkpoint import (
            completed_shards,
            read_manifest,
            run_sharded,
        )

        base = str(tmp_path / "ckpt_conc")
        calls = []
        lock = threading.Lock()

        def shard_fn(s, sid, lo, hi):
            with lock:
                calls.append(sid)
            return s.range(lo, hi).select(F.col("id").alias("x"))

        def runner():
            run_sharded(spark, base, n_rows=120, n_shards=6, cell_res=8,
                        shard_fn=shard_fn)

        ts = [threading.Thread(target=runner) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # exactly-once: each shard claimed and computed by one writer
        assert sorted(calls) == [0, 1, 2, 3, 4, 5], calls
        assert completed_shards(spark, base) == set(range(6))
        total = spark.read.parquet(os.path.join(base, "shard=*")).count()
        assert total == 120
        m = read_manifest(spark, base)
        assert m.count() == 6
        # all claims released after success
        mdir = os.path.join(base, "_manifest")
        assert not [f for f in os.listdir(mdir) if f.startswith("claim-")]
        shutil.rmtree(base)

    def test_live_claim_blocks_second_writer(self, spark, tmp_path):
        """A LIVE claim (flock held) makes a second writer SKIP the
        shard — no matter how long the holder runs (no stale timeout to
        outlive, ADVICE r06).  A dead writer's claim (lock released,
        file left behind) is reclaimed immediately."""
        from h3ronpy_spark.plans.checkpoint import (
            completed_shards,
            run_sharded,
            try_claim_shard,
        )

        base = str(tmp_path / "ckpt_claim")
        os.makedirs(os.path.join(base, "_manifest"), exist_ok=True)
        # writer A holds shard 1 mid-compute (lock held via open fd)
        hold = try_claim_shard(base, 1)
        assert hold
        assert try_claim_shard(base, 1) is None  # exclusion holds
        calls = []

        def shard_fn(s, sid, lo, hi):
            calls.append(sid)
            return s.range(lo, hi).select(F.col("id").alias("x"))

        run_sharded(spark, base, n_rows=90, n_shards=3, cell_res=8,
                    shard_fn=shard_fn)
        assert sorted(calls) == [0, 2]  # shard 1 skipped: A owns it
        assert completed_shards(spark, base) == {0, 2}
        # A hard-killed: kernel drops the lock, claim FILE stays behind.
        # Reclaim is immediate — no stale_claim_secs wait.
        hold.release(unlink=False)
        calls.clear()
        run_sharded(spark, base, n_rows=90, n_shards=3, cell_res=8,
                    shard_fn=shard_fn)
        assert calls == [1]
        assert completed_shards(spark, base) == {0, 1, 2}
        total = spark.read.parquet(os.path.join(base, "shard=*")).count()
        assert total == 90
        shutil.rmtree(base)

    def test_killed_writer_claim_reclaimed_exactly_once(self, spark, tmp_path):
        """Forced-stale race (VERDICT r06 item 6): a real subprocess
        claims a shard and is SIGKILLed mid-hold.  While it lives, the
        claim is un-stealable; the instant it dies the kernel releases
        the flock and a resumer reclaims with zero wait.  The shard is
        then computed exactly once even with two racing resumers."""
        import signal
        import subprocess
        import sys
        import threading
        import time as _time

        from h3ronpy_spark.plans.checkpoint import (
            completed_shards,
            run_sharded,
            try_claim_shard,
        )

        base = str(tmp_path / "ckpt_kill")
        os.makedirs(os.path.join(base, "_manifest"), exist_ok=True)
        ready = str(tmp_path / "ready")
        child = subprocess.Popen(
            [sys.executable, "-c", (
                "import sys, time; sys.path.insert(0, %r);"
                "from h3ronpy_spark.plans.checkpoint import try_claim_shard;"
                "c = try_claim_shard(%r, 1); assert c;"
                "open(%r, 'w').close(); time.sleep(600)"
            ) % ("/root/repo", base, ready)],
        )
        try:
            for _ in range(200):
                if os.path.exists(ready):
                    break
                _time.sleep(0.05)
            assert os.path.exists(ready), "child never claimed"
            # live child: claim is un-stealable from this process
            assert try_claim_shard(base, 1) is None
            child.send_signal(signal.SIGKILL)
            child.wait(timeout=30)
            # dead child: reclaim races — exactly one of two concurrent
            # resumers computes each outstanding shard, immediately
            calls, lock = [], threading.Lock()

            def shard_fn(s, sid, lo, hi):
                with lock:
                    calls.append(sid)
                return s.range(lo, hi).select(F.col("id").alias("x"))

            def runner():
                run_sharded(spark, base, n_rows=60, n_shards=3,
                            cell_res=8, shard_fn=shard_fn)

            ts = [threading.Thread(target=runner) for _ in range(2)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert sorted(calls) == [0, 1, 2], calls
            assert completed_shards(spark, base) == {0, 1, 2}
            total = spark.read.parquet(
                os.path.join(base, "shard=*")).count()
            assert total == 60
        finally:
            if child.poll() is None:
                child.kill()
        shutil.rmtree(base)

    def test_commit_abandoned_when_ownership_lost(self, tmp_path):
        """owner_check is re-verified before the manifest os.replace:
        an out-of-band replacement of the claim file (the old protocol's
        steal) makes the holder abandon, never mark the shard done."""
        from h3ronpy_spark.plans.checkpoint import try_claim_shard

        base = str(tmp_path / "ckpt_own")
        os.makedirs(os.path.join(base, "_manifest"), exist_ok=True)
        claim = try_claim_shard(base, 0)
        assert claim and claim.owner_check()
        # out-of-band unlink + recreate (different inode)
        os.unlink(claim.path)
        open(claim.path, "w").close()
        assert not claim.owner_check()
        claim.release(unlink=False)


class TestStreaming:
    def test_stream_rollup_matches_batch(self, spark, tmp_path):
        from h3ronpy_spark.streaming import run_available_now, stream_cells_rollup

        src = "/root/testdata/sf0.001/events.parquet"
        in_dir = str(tmp_path / "events_in")
        os.makedirs(in_dir)
        shutil.copy(src, os.path.join(in_dir, "part-0.parquet"))
        df = stream_cells_rollup(spark, in_dir, res=6, window="6 hours",
                                 watermark="1 hour")
        run_available_now(df, str(tmp_path / "ckpt"))
        got = spark.sql(
            "SELECT sum(n_events) AS n FROM h3_stream_rollup"
        ).first()["n"]
        # append mode emits only windows fully below the final watermark
        # (max event time - 1 hour); the last open window is withheld
        batch = spark.read.parquet(src).select(
            F.col("ts").cast("timestamp").alias("ts")
        )
        max_ts = batch.agg(F.max("ts")).first()[0]
        want = (
            batch.withColumn("w", F.window("ts", "6 hours"))
            .filter(
                F.col("w.end")
                <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
            )
            .count()
        )
        assert got == want
        assert got > 0


class TestHull:
    def test_distributed_hull_equals_local(self, spark):
        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.h3core.hull import (
            cells_convex_hull_wkb,
            spark_cells_convex_hull,
        )
        from h3ronpy_spark.h3core.wkb import parse_wkb

        h5 = LL.latlng_to_cell(np.radians([45.5, 45.8]), np.radians([10.2, 10.6]), 5)
        _, kids = IDX.cell_to_children_flat(h5, 7)
        df = spark.createDataFrame([(int(c),) for c in kids], "cell long").repartition(4)
        w_spark = spark_cells_convex_hull(df)
        w_local = cells_convex_hull_wkb(kids)
        ra = parse_wkb(w_spark)["polys"][0][0]
        rb = parse_wkb(w_local)["polys"][0][0]
        assert ra.shape == rb.shape
        assert np.allclose(np.sort(ra, axis=0), np.sort(rb, axis=0))

    def test_concave_hull_deterministic_across_partitionings(self, spark):
        # verdict r02 wrong-item 3: the hull of a cell set must be
        # byte-identical regardless of how the input is partitioned
        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.h3core.hull import spark_cells_concave_hull

        h5 = LL.latlng_to_cell(
            np.radians([45.5, 45.8]), np.radians([10.2, 10.6]), 5
        )
        _, kids = IDX.cell_to_children_flat(h5, 7)
        rows = [(int(c),) for c in kids]
        df2 = spark.createDataFrame(rows, "cell long").repartition(2)
        df9 = spark.createDataFrame(
            list(reversed(rows)), "cell long"
        ).repartition(9)
        wa = spark_cells_concave_hull(df2, concavity=2.0)
        wb = spark_cells_concave_hull(df9, concavity=2.0)
        assert wa == wb

    def test_concave_hull_max_points_guard_raises(self, spark):
        import pytest

        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.h3core.hull import spark_cells_concave_hull

        h5 = LL.latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 5)
        _, kids = IDX.cell_to_children_flat(h5, 7)
        df = spark.createDataFrame([(int(c),) for c in kids], "cell long")
        with pytest.raises(ValueError, match="max_points"):
            spark_cells_concave_hull(df, max_points=10)


class TestUnexecutedBranches:
    """Round-5 sweep: parameter branches no other test or contract query
    executes."""

    def test_resize_nearest_matches_numpy_oracle(self, spark):
        import numpy as np

        from h3ronpy_spark.operators.multimodal import resize_images
        from h3ronpy_spark.sources.images import gen_images_pdf, synth_images

        out = {
            r["image_id"]: (r["bytes"], r["w"], r["h"])
            for r in resize_images(
                synth_images(spark, 12, seed=5, partitions=2), 8, 6,
                method="nearest",
            ).collect()
        }
        pdf = gen_images_pdf(np.arange(12, dtype=np.int64), 5)
        for r in pdf.itertuples(index=False):
            band = np.frombuffer(r.bytes, np.uint8).reshape(r.h, r.w)
            ri = (np.arange(6) * r.h // 6).astype(int)
            ci = (np.arange(8) * r.w // 8).astype(int)
            want = band[np.ix_(ri, ci)]
            got, w, h = out[r.image_id]
            assert (w, h) == (8, 6)
            assert np.frombuffer(got, np.uint8).reshape(6, 8).tolist() == \
                want.tolist(), r.image_id

    def test_tile_images_bigint_value_type(self, spark):
        from h3ronpy_spark.operators.tiling import tile_images
        from h3ronpy_spark.sources.images import synth_images_typed

        imgs = synth_images_typed(spark, 20, fmt="raw_u32", seed=3,
                                  partitions=2)
        t_big = sorted(
            map(tuple, tile_images(imgs, res=11, value_type="bigint")
                .collect())
        )
        t_dbl = sorted(
            map(
                tuple,
                tile_images(imgs, res=11, value_type="double")
                .selectExpr(
                    "image_id", "cell", "cast(px_value as long) px_value",
                    "caption",
                )
                .collect(),
            )
        )
        assert t_big == t_dbl and t_big
        with pytest.raises(ValueError, match="value_type"):
            tile_images(imgs, res=11, value_type="float")

    def test_compact_no_persist_branch(self, spark):
        import numpy as np

        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.operators.compact import compact_cells

        h4 = LL.latlng_to_cell(
            np.radians([45.5, -12.0]), np.radians([10.2, 66.0]), 4
        )
        _, kids = IDX.cell_to_children_flat(h4, 6)
        df = spark.createDataFrame([(int(c),) for c in kids], "cell long")
        a = sorted(
            r["cell"]
            for r in compact_cells(df, persist_intermediate=False).collect()
        )
        b = sorted(r["cell"] for r in compact_cells(df).collect())
        assert a == b == sorted(int(c) for c in h4)


class TestGridDiskAggregateMax:
    def test_max_and_min_match_driver_oracle(self, spark):
        """Round-5: agg='max' had no executing caller anywhere (the
        contract query uses 'min').  Oracle: driver-side max/min of k
        over each cell's exploded disk."""
        import numpy as np

        from h3ronpy_spark.h3core import grid as G
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.operators.spatial_join import (
            grid_disk_aggregate_k,
        )

        cells = LL.latlng_to_cell(
            np.radians([43.1, 43.13, 47.6]),
            np.radians([7.2, 7.21, 11.0]),
            7,
        )
        df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
        want_min: dict = {}
        want_max: dict = {}
        _, disk, dist = G.grid_disk_distances(cells, 2)
        for cc, k in zip(disk.ravel(), dist.ravel()):
            if cc == -1:
                continue
            cc = int(cc)
            want_min[cc] = min(want_min.get(cc, 99), int(k))
            want_max[cc] = max(want_max.get(cc, -1), int(k))
        got_min = {
            r["cell"]: r["k"]
            for r in grid_disk_aggregate_k(df, 2, "min").collect()
        }
        got_max = {
            r["cell"]: r["k"]
            for r in grid_disk_aggregate_k(df, 2, "max").collect()
        }
        assert got_min == want_min
        assert got_max == want_max
        with pytest.raises(ValueError, match="min or max"):
            grid_disk_aggregate_k(df, 2, "avg")


class TestCompactMixed:
    def test_mixed_res_no_promotion_at_finest(self, spark):
        # 7 complete res-5 siblings + one unrelated res-9 cell: the res-9
        # level promotes nothing, but the res-5 set must still compact to
        # its res-4 parent (regression: early exit used to emit the 7
        # siblings uncompacted)
        import numpy as np

        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import latlng as LL
        from h3ronpy_spark.operators.compact import compact_cells

        p4 = LL.latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 4)
        _, k5 = IDX.cell_to_children_flat(p4, 5)
        lone9 = LL.latlng_to_cell(np.radians([-33.0]), np.radians([151.0]), 9)
        cells = np.concatenate([k5, lone9])
        df = spark.createDataFrame(
            [(int(c),) for c in cells], "cell long"
        )
        got = sorted(r["cell"] for r in compact_cells(df).collect())
        want = sorted(IDX.compact(cells).tolist())
        assert got == want == sorted([int(p4[0]), int(lone9[0])])


class TestSimhash:
    def test_deterministic_across_sessions(self, spark):
        from h3ronpy_spark.operators.dedup import _token_hash64

        # same tokens -> same hashes regardless of process salt; pinned
        # literal guards against accidental reintroduction of builtin hash()
        h = _token_hash64(["the", "quick", "brown", "fox"])
        h2 = _token_hash64(["the", "quick", "brown", "fox"])
        assert h.tolist() == h2.tolist()
        docs = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox")],
            "doc_id long, text string",
        )
        from h3ronpy_spark.operators.dedup import simhash64

        sig = docs.select(simhash64("text").alias("s")).collect()
        assert sig[0]["s"] == sig[1]["s"]

    def test_jvm_signature_operator_invariants(self, spark):
        # the zero-Python alternative (explode + SWAR agg): identical
        # texts agree, null/empty texts yield null, near-dups are close
        from h3ronpy_spark.operators.dedup import simhash_signatures

        base = "the quick brown fox jumps over the lazy dog " * 8
        far = "completely different words entirely unrelated content " * 8
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, None), (4, "   "),
             (5, base.replace("lazy", "sleepy")), (6, far)],
            "doc_id long, text string",
        )
        rows = {
            r["id"]: r["sim"]
            for r in simhash_signatures(docs).collect()
        }
        assert rows[1] == rows[2] and rows[1] is not None
        assert rows[3] is None and rows[4] is None
        # one token of nine swapped -> small hamming; unrelated text -> big
        near_ham = bin(rows[1] ^ rows[5]).count("1")
        far_ham = bin(rows[1] ^ rows[6]).count("1")
        assert near_ham <= 12 < far_ham

    def test_simhash_pairs_finds_near_dups(self, spark):
        from h3ronpy_spark.operators.dedup import simhash_pairs

        base = "the quick brown fox jumps over the lazy dog " * 8
        near = base.replace("lazy", "sleepy", 1)  # one token changed
        far = "completely different words entirely unrelated content " * 8
        docs = spark.createDataFrame(
            [(1, base), (2, near), (3, far), (4, base)],
            "doc_id long, text string",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(docs, max_hamming=6).collect()
        }
        assert (1, 4) in pairs and pairs[(1, 4)] == 0  # identical
        assert (1, 2) in pairs  # near-dup within hamming budget
        assert not any(3 in p for p in pairs)  # unrelated never pairs


class TestMultimodal:
    def test_resize_dims_and_integer_factor_exactness(self, spark):
        import numpy as np

        from h3ronpy_spark.operators.multimodal import resize_images
        from h3ronpy_spark.sources.images import decode_image, synth_images

        imgs = synth_images(spark, 4, seed=42)
        orig = {r["image_id"]: r for r in imgs.collect()}
        out = {r["image_id"]: r for r in resize_images(imgs, 16, 12, "nearest").collect()}
        assert set(out) == set(orig)
        for iid, r in out.items():
            assert (r["w"], r["h"], r["fmt"]) == (16, 12, "raw8")
            band = np.frombuffer(r["bytes"], np.uint8).reshape(12, 16)
            o = orig[iid]
            full = decode_image(bytes(o["bytes"]), o["w"], o["h"], o["fmt"])
            # nearest with integer factors picks exact source pixels
            fy, fx = full.shape[0] // 12, full.shape[1] // 16
            if full.shape[0] % 12 == 0 and full.shape[1] % 16 == 0:
                assert (band == full[::fy, ::fx][:12, :16]).all()

    def test_bilinear_constant_image_invariant(self, spark):
        import numpy as np

        from h3ronpy_spark.operators.multimodal import _resize_band

        const = np.full((20, 30), 77, np.uint8)
        assert (_resize_band(const, 13, 7, "bilinear") == 77).all()

    def test_features_deterministic_and_usable_by_ann(self, spark):
        from h3ronpy_spark.operators.multimodal import extract_image_features
        from h3ronpy_spark.operators.similarity import brute_force_topk
        from h3ronpy_spark.sources.images import synth_images

        imgs = synth_images(spark, 8, seed=42)
        f1 = extract_image_features(imgs).collect()
        f2 = extract_image_features(imgs).collect()
        e1 = {r["image_id"]: r["embedding"] for r in f1}
        e2 = {r["image_id"]: r["embedding"] for r in f2}
        assert e1 == e2 and all(len(v) == 12 for v in e1.values())
        # the embeddings plug straight into the similarity operators
        import pyspark.sql.functions as F

        emb = extract_image_features(imgs).select(
            F.col("image_id").alias("vec_id"), F.col("embedding")
        )
        q = emb.limit(1).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        top = brute_force_topk(emb, q, k=3)
        assert top.count() == 3

    def test_frame_sampling_exact_slices(self, spark):
        import numpy as np

        from h3ronpy_spark.operators.multimodal import sample_frames, synth_videos

        vids = synth_videos(spark, 6, n_frames=24, w=8, h=4, seed=7)
        frames = sample_frames(vids, every_n=10).collect()
        by_vid = {}
        for r in frames:
            by_vid.setdefault(r["video_id"], []).append(r)
        assert all(len(v) == 3 for v in by_vid.values())  # frames 0,10,20
        # frame fi = frame 0 + fi (clipped) by construction
        for vid, rows in by_vid.items():
            rows.sort(key=lambda r: r["frame_idx"])
            f0 = np.frombuffer(rows[0]["bytes"], np.uint8).astype(np.int64)
            for r in rows[1:]:
                fi = np.frombuffer(r["bytes"], np.uint8).astype(np.int64)
                assert (fi == np.clip(f0 + r["frame_idx"], 0, 255)).all()

    def test_codec_stub_raises_for_video(self, spark):
        import pytest as _pytest

        from h3ronpy_spark.operators.multimodal import sample_frames

        vids = spark.createDataFrame(
            [("v0", b"\x00" * 64, 8, 4, "h264", 2)],
            "video_id string, bytes binary, w int, h int, fmt string, n_frames int",
        )
        with _pytest.raises(Exception, match="not available"):
            sample_frames(vids, 1).collect()


class TestStatefulStreaming:
    def test_stateful_sessions_match_batch(self, spark, tmp_path):
        import shutil

        from h3ronpy_spark.streaming import stream_user_sessions

        src = "/root/testdata/sf0.001/events.parquet"
        d = str(tmp_path / "events")
        shutil.copytree(src, d) if os.path.isdir(src) else shutil.copy(
            src, d + ".parquet"
        ) or None
        in_dir = d if os.path.isdir(d) else str(tmp_path)
        sess = stream_user_sessions(spark, in_dir, gap_s=1800)
        q = (
            sess.writeStream.format("memory")
            .queryName("sessions_stateful")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from h3ronpy_spark.streaming import final_sessions

        got = (
            final_sessions("sessions_stateful", spark)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
            .toPandas()
            .set_index("user_id")
        )
        # batch ground truth: the events_sessions contract query
        import __spark_entry__ as E

        want = (
            E.queries()["events_sessions"](spark, "/root/testdata/sf0.001")
            .toPandas()
            .set_index("user_id")
        )
        assert set(got.index) == set(want.index)
        for uid in want.index:
            assert got.loc[uid, "n_sessions"] == want.loc[uid, "n_sessions"]
            assert got.loc[uid, "n_events"] == want.loc[uid, "n_events"]

    def test_stateful_sessions_out_of_order_batches(self, spark, tmp_path):
        """VERDICT r04 item 7: shuffled-input micro-batch sequence.  The
        per-user event log is PERMUTED across micro-batch files
        (maxFilesPerTrigger=1 forces one file per trigger), including the
        adversarial shapes: an event arriving > gap EARLIER than the
        in-flight session (must open a separate earlier session, not
        extend the current one) and a late event BRIDGING two
        already-emitted sessions (must merge them).  Final max-rev state
        must equal batch sessionization of the fully sorted log —
        session boundaries AND starts/ends, not just counts."""
        import pandas as pd

        from h3ronpy_spark.streaming import (
            final_sessions,
            stream_user_sessions,
        )

        GAP = 3600  # 60 min
        base = pd.Timestamp("2026-01-10 12:00:00")
        s = lambda mins: base + pd.Timedelta(minutes=mins)  # noqa: E731
        # user 1: batches arrive [t=100], then [t=0] (earlier by >gap ->
        #   separate session), then [t=50] (within gap of both -> bridges
        #   0 and 100 into ONE session of all 3)
        # user 2: [t=0], [t=200] (new session), [t=199] (joins session 2)
        # user 3: all in-order in one batch (control)
        batches = [
            [(1, s(100)), (2, s(0)), (3, s(0)), (3, s(10))],
            [(1, s(0)), (2, s(200))],
            [(1, s(50)), (2, s(199))],
        ]
        import glob
        import shutil

        src = tmp_path / "events_ooo"
        src.mkdir()
        flat = tmp_path / "flat"
        flat.mkdir()
        # drip one file in per drain: each availableNow run processes
        # only the newly arrived file, with GroupState carried across
        # query RESTARTS through the shared checkpoint — a strictly
        # stronger sequencing guarantee than maxFilesPerTrigger (which
        # availableNow ignores)
        all_rows = []
        for i, rows in enumerate(batches):
            pdf = spark.createDataFrame(
                [(u, t.to_pydatetime()) for u, t in rows],
                "user_id long, ts timestamp",
            )
            pdf.coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
            (part,) = glob.glob(
                str(src / f"b{i}.parquet" / "part-*.parquet")
            )
            shutil.copy(part, flat / f"batch_{i}.parquet")
            sess = stream_user_sessions(spark, str(flat), gap_s=GAP)
            # foreachBatch (checkpoint-recoverable, unlike the memory
            # sink) appends every emission to a driver-side list
            q = (
                sess.writeStream.foreachBatch(
                    lambda bdf, _bid: all_rows.extend(bdf.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        spark.createDataFrame(all_rows, sess.schema).createOrReplaceTempView(
            "sessions_ooo_all"
        )
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in final_sessions("sessions_ooo_all", spark).collect()
        }
        want = {
            # user 1: one merged session 0..100 with 3 events
            (1, s(0).to_pydatetime(), s(100).to_pydatetime(), 3),
            # user 2: session 0..0 (1 event) + session 199..200 (2 events)
            (2, s(0).to_pydatetime(), s(0).to_pydatetime(), 1),
            (2, s(199).to_pydatetime(), s(200).to_pydatetime(), 2),
            # user 3: one session 0..10 (2 events)
            (3, s(0).to_pydatetime(), s(10).to_pydatetime(), 2),
        }
        assert got == want
        # and the intermediate (pre-bridge) state really was split: some
        # earlier revision of user 1 carried 2 sessions
        revs = (
            spark.table("sessions_ooo_all")
            .filter(F.col("user_id") == 1)
            .groupBy("rev")
            .count()
            .collect()
        )
        assert any(r["count"] == 2 for r in revs), revs
        # three distinct revisions for user 1 = three micro-batches seen
        assert {r["rev"] for r in revs} == {1, 2, 3}, revs


class TestTableSource:
    def test_parquet_fallback_roundtrip(self, spark, tmp_path):
        from h3ronpy_spark.sources.tables import (
            iceberg_available,
            read_table,
            write_table,
        )

        assert not iceberg_available(spark)  # sandbox has no jars
        df = spark.range(100).withColumnRenamed("id", "k")
        p = str(tmp_path / "t")
        write_table(df, p, mode="overwrite")
        back = read_table(spark, p, snapshot_id="synth-0")
        assert back.count() == 100 and back.columns == ["k"]


class TestIVF:
    """IVF ANN: codebook training, partition-invariant assignment, recall."""

    def _emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    def test_assignment_partition_invariant(self, spark):
        """Cluster assignment must be bit-identical whatever the Arrow
        batch composition — the property the fixed-shape padded matmul
        buys (same lesson as the simhash tokenizer incident)."""
        from h3ronpy_spark.operators.similarity import (
            ivf_assign_udf,
            train_ivf_centroids,
        )
        import pyspark.sql.functions as F

        emb = self._emb(spark)
        cents = train_ivf_centroids(emb, n_clusters=8)
        udf = ivf_assign_udf(cents, nprobe=3)
        a1 = {
            r["vec_id"]: r["c"]
            for r in emb.repartition(1)
            .select("vec_id", udf(F.col("embedding")).alias("c"))
            .collect()
        }
        a7 = {
            r["vec_id"]: r["c"]
            for r in emb.repartition(7, "vec_id")
            .select("vec_id", udf(F.col("embedding")).alias("c"))
            .collect()
        }
        assert a1 == a7 and len(a1) == emb.count()

    def test_centroids_deterministic(self, spark):
        from h3ronpy_spark.operators.similarity import train_ivf_centroids
        import numpy as np

        emb = self._emb(spark)
        c1 = train_ivf_centroids(emb, n_clusters=8)
        c2 = train_ivf_centroids(emb, n_clusters=8)
        assert c1.shape == (8, 64) and np.array_equal(c1, c2)
        # unit-norm codebook (spherical k-means)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    def test_recall_beats_scan_fraction(self, spark):
        """IVF only earns its keep if recall far exceeds the fraction of
        the table scanned (random scanning would give recall ~= scan_frac)."""
        from h3ronpy_spark.operators.similarity import ivf_recall
        import pyspark.sql.functions as F

        emb = self._emb(spark)
        q = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        row = ivf_recall(emb, q, k=10, n_clusters=16, nprobe=6).collect()[0]
        assert row["n_queries"] == 8
        assert row["scan_frac"] < 0.75
        assert row["recall"] >= row["scan_frac"] + 0.15

    def test_ivf_topk_exact_when_probing_everything(self, spark):
        """nprobe == n_clusters degrades IVF to exact brute force."""
        from h3ronpy_spark.operators.similarity import brute_force_topk, ivf_topk
        import pyspark.sql.functions as F

        emb = self._emb(spark).filter(F.col("vec_id") < 200)
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        exact = {
            (r["qid"], r["rank"]): r["vec_id"]
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        ivf = {
            (r["qid"], r["rank"]): r["vec_id"]
            for r in ivf_topk(emb, q, k=5, n_clusters=4, nprobe=4).collect()
        }
        assert ivf == exact


class TestColumnWrapperSmoke:
    """Round-4: direct exercise of the thin Column wrappers that were
    previously only covered at the kernel level (wrapper-layer bugs —
    null handling, dtype coercion — are invisible to kernel tests)."""

    def test_wrappers_match_kernels(self, spark):
        import numpy as np

        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core.edges import (
            cells_to_edges as k_edges,
            edge_destination,
            vertex_owner,
        )
        from h3ronpy_spark.h3core.latlng import latlng_to_cell

        cell = int(latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 5)[0])
        pent = 0x851C0003FFFFFFF  # res-5 pentagon-rooted cell (base 14)
        df = spark.createDataFrame([(cell,)], "cell long")
        r = df.select(
            H.cells_base_cell(F.col("cell")).alias("bc"),
            H.cells_is_pentagon(F.col("cell")).alias("pent"),
            F.size(H.uncompact_list(F.col("cell"), F.lit(6))).alias("n_kids"),
            F.size(H.uncompact_list(F.col("cell"), F.lit(4))).alias("n_coarser"),
        ).first()
        assert r["bc"] == int(IDX.get_base_cell(np.array([cell]))[0])
        assert r["pent"] == bool(IDX.is_pentagon(np.array([cell]))[0])
        assert r["n_kids"] == 7 and r["n_coarser"] == 0

        # edges_destination + vertexes_owner against kernels
        e = int(k_edges(np.array([cell], dtype=np.int64))[1][0])
        from h3ronpy_spark.h3core.edges import cells_to_vertexes as k_c2v

        v = int(k_c2v(np.array([cell], dtype=np.int64))[1][0])
        df2 = spark.createDataFrame([(e, v)], "e long, v long")
        r2 = df2.select(
            H.edges_destination(F.col("e")).alias("dst"),
            H.vertexes_owner(F.col("v")).alias("own"),
        ).first()
        assert r2["dst"] == int(edge_destination(np.array([e]))[0])
        assert r2["own"] == int(vertex_owner(np.array([v]))[0])

        # vertexes_parse: hex roundtrip + failure -> null
        from h3ronpy_spark.h3core.strings import cells_to_string

        vhex = cells_to_string(np.array([v], dtype=np.int64))[0]
        df3 = spark.createDataFrame(
            [(vhex,), ("zznotacell",), (None,)], "s string"
        )
        got = [
            row["p"]
            for row in df3.select(
                H.vertexes_parse(F.col("s")).alias("p")
            ).collect()
        ]
        assert got[0] == v and got[1] is None and got[2] is None

        # wkb_to_cells_compact: compacted coverage uncompacts to the
        # plain coverage
        poly = df.select(
            H.cells_to_wkb_polygons(F.col("cell")).alias("wkb")
        )
        both = poly.select(
            F.size(
                H.wkb_to_cells(F.col("wkb"), F.lit(7), F.lit("containscentroid"))
            ).alias("n_plain"),
            H.wkb_to_cells_compact(
                F.col("wkb"), F.lit(7), F.lit("containscentroid")
            ).alias("compact"),
        ).first()
        import numpy as np_

        from h3ronpy_spark import arrays as A

        kids = A.uncompact(
            np_.array(both["compact"], dtype=np_.int64), 7
        )
        assert len(kids) == both["n_plain"] > 0


class TestStreamingMultimodal:
    def test_stream_image_features_matches_batch(self, spark, tmp_path):
        """The multimodal decode+feature kernel runs unchanged on a
        streaming DataFrame (map-only, append mode): streamed
        embeddings must equal the batch embeddings row-for-row."""
        import numpy as np

        from h3ronpy_spark.operators.multimodal import (
            extract_image_features,
        )
        from h3ronpy_spark.sources.images import synth_images
        from h3ronpy_spark.streaming import stream_image_features

        imgs = synth_images(spark, 40, seed=11)
        in_dir = str(tmp_path / "imgs_in")
        imgs.write.parquet(in_dir)

        df = stream_image_features(spark, in_dir)
        q = (
            df.writeStream.format("memory")
            .queryName("img_feats_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["image_id"]: r["embedding"]
            for r in spark.sql(
                "SELECT * FROM img_feats_stream"
            ).collect()
        }
        want = {
            r["image_id"]: r["embedding"]
            for r in extract_image_features(
                spark.read.parquet(in_dir)
            ).collect()
        }
        assert set(got) == set(want) and len(got) == 40
        for k in want:
            assert np.allclose(got[k], want[k], atol=0), k
