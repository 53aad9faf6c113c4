"""Extra stage-isolation benchmarks (guide §1.4: noop sink, §1.5: labels).

NOT part of the frozen driver bench — cite numbers in OPTIMIZATION_r08.md.
Usage: python bench_extra.py [stage ...]
Stages: synth, tiles, joined, flagship, kernel
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "60000"))
FMT = os.environ.get("BENCH_FMT", "raw8")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    stages = sys.argv[1:] or ["synth", "tiles", "joined", "flagship"]
    try:
        os.sched_setaffinity(0, set(range(CPUS)))
    except (AttributeError, OSError):
        pass

    if "kernel" in stages:
        kernel_profile()
        stages.remove("kernel")
        if not stages:
            return

    from pyspark.sql import functions as F

    from h3ronpy_spark.operators.spatial_join import (
        pip_join,
        polyfill_polygons,
    )
    from h3ronpy_spark.operators.tiling import tile_images
    from h3ronpy_spark.plans.flagship import flagship
    from h3ronpy_spark.session import get_spark
    from h3ronpy_spark.sources.images import (
        synth_images,
        synth_images_jpeg,
        synth_images_png,
    )
    from h3ronpy_spark.sources.polygons import synth_polygons

    spark = get_spark(
        f"local[{CPUS}]", app_name="bench_extra", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def imgs():
        if FMT == "png":
            from h3ronpy_spark.sources.png import register_png_codec

            register_png_codec()
            return synth_images_png(spark, N_IMAGES, seed=42, partitions=256)
        if FMT == "jpeg":
            from h3ronpy_spark.sources.jpeg import register_jpeg_codec

            register_jpeg_codec()
            return synth_images_jpeg(spark, N_IMAGES, seed=42, partitions=256)
        return synth_images(spark, N_IMAGES, seed=42, partitions=256)

    polys = synth_polygons(spark, 60, seed=42)
    cov = (
        polyfill_polygons(polys, 9, compact=True)
        .withColumnRenamed("cell", "__poly_cell")
        .persist()
    )
    cov.count()

    def run(name, build):
        df = build()
        noop(df)  # warm-up
        best = float("inf")
        for _ in range(2):
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            noop(df)
            best = min(best, time.time() - t0)
        print(f"{name:12s} {best:6.2f}s  (fmt={FMT})", flush=True)

    if "synth" in stages:
        run("synth", imgs)
    if "tiles" in stages:
        run("tiles", lambda: tile_images(imgs(), res=9, nodata=0).drop("caption"))
    if "joined" in stages:
        run(
            "joined",
            lambda: pip_join(
                tile_images(imgs(), res=9, nodata=0).drop("caption"),
                polys, res=9, coverage=cov,
            ),
        )
    if "flagship" in stages:
        def fl():
            return flagship(
                spark, n_images=N_IMAGES, n_polygons=60, res=9,
                partitions=256, coverage=cov, fmt=FMT,
            )
        df = fl()
        df.count()  # warm-up (count = the bench action)
        best = float("inf")
        for _ in range(2):
            sc.setJobDescription("bench_extra:flagship")
            t0 = time.time()
            fl().agg(F.sum("n_tiles")).first()
            best = min(best, time.time() - t0)
        print(f"{'flagship':12s} {best:6.2f}s  (fmt={FMT})", flush=True)
    spark.stop()


def kernel_profile():
    """Single-core component profile of rasters_to_cells_batch."""
    import numpy as np

    from h3ronpy_spark.h3core.latlng import cell_to_latlng, latlng_to_cell
    from h3ronpy_spark.h3core.rasterh3 import rasters_to_cells_batch
    from h3ronpy_spark.sources.images import (
        PIXEL_DEG,
        gen_images_pdf,
        georef_of_phash,
    )

    ids = np.arange(512, dtype=np.int64)
    pdf = gen_images_pdf(ids)
    lat, lng = georef_of_phash(pdf["phash"].to_numpy(np.int64))
    bands = [
        np.frombuffer(b, np.uint8).reshape(h, w)
        for b, w, h in zip(pdf["bytes"], pdf["w"], pdf["h"])
    ]
    tfs = np.zeros((len(bands), 6))
    tfs[:, 0] = PIXEL_DEG
    tfs[:, 2] = lng
    tfs[:, 4] = -PIXEL_DEG
    tfs[:, 5] = lat

    t0 = time.perf_counter()
    img_idx, vals, cells = rasters_to_cells_batch(bands, tfs, 9, 0)
    t1 = time.perf_counter()
    print(f"rasters_to_cells_batch: {(t1-t0)*1e3:.1f} ms / {len(bands)} imgs "
          f"({(t1-t0)/len(bands)*1e6:.0f} us/img, {cells.size} tiles)")

    # component timings
    deg_cell = 24.0 / (7.0 ** (9 / 2.0))
    step = deg_cell / PIXEL_DEG * 0.38
    n_samp = 0
    slat, slng = [], []
    t0 = time.perf_counter()
    for i in range(len(bands)):
        h, w = bands[i].shape
        cols = np.arange(0, w + step, step)
        rows = np.arange(0, h + step, step)
        cc, rr = np.meshgrid(cols, rows)
        slng.append(tfs[i, 0] * cc.ravel() + tfs[i, 2])
        slat.append(tfs[i, 4] * rr.ravel() + tfs[i, 5])
    lat_all = np.radians(np.concatenate(slat))
    lng_all = np.radians(np.concatenate(slng))
    t1 = time.perf_counter()
    n_samp = lat_all.size
    print(f"  sample-grid build : {(t1-t0)*1e3:.1f} ms ({n_samp} samples)")

    t0 = time.perf_counter()
    cand = latlng_to_cell(lat_all, lng_all, 9)
    t1 = time.perf_counter()
    print(f"  encode samples    : {(t1-t0)*1e3:.1f} ms "
          f"({n_samp/(t1-t0)/1e6:.2f} M/s)")

    t0 = time.perf_counter()
    u = np.unique(cand)
    t1 = time.perf_counter()
    print(f"  unique            : {(t1-t0)*1e3:.1f} ms -> {u.size}")

    t0 = time.perf_counter()
    cell_to_latlng(u)
    t1 = time.perf_counter()
    print(f"  decode centroids  : {(t1-t0)*1e3:.1f} ms "
          f"({u.size/(t1-t0)/1e6:.2f} M/s)")


if __name__ == "__main__":
    main()
