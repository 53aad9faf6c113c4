"""Round-8 optimization: the fused flagship path (generate -> decode ->
tile -> map-side PIP assign -> per-(poly, image) partial rollup in one
mapInPandas) must be ROW-IDENTICAL to the round-7 Catalyst plan
(tile_images -> pip_join -> groupBy) for every corpus format, and the
plan must keep its shape guarantees (no coverage BroadcastHashJoin, no
Expand, caption join strategy unchanged)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from h3ronpy_spark.session import get_spark

    s = get_spark("local[4]", app_name="test_flagship_fused",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _legacy_flagship(spark, n_images, n_polygons, res, fmt="raw8", seed=42):
    """The round-7 plan, reconstructed from its building blocks."""
    from h3ronpy_spark.operators.spatial_join import pip_join
    from h3ronpy_spark.operators.tiling import tile_images
    from h3ronpy_spark.sources.images import synth_captions, synth_images
    from h3ronpy_spark.sources.polygons import synth_polygons

    if fmt == "png":
        from h3ronpy_spark.sources.images import synth_images_png
        from h3ronpy_spark.sources.png import register_png_codec

        register_png_codec()
        images = synth_images_png(spark, n_images, seed=seed)
    elif fmt == "jpeg":
        from h3ronpy_spark.sources.images import synth_images_jpeg
        from h3ronpy_spark.sources.jpeg import register_jpeg_codec

        register_jpeg_codec()
        images = synth_images_jpeg(spark, n_images, seed=seed)
    else:
        images = synth_images(spark, n_images, seed=seed)
    tiles = tile_images(images, res=res, nodata=0).drop("caption")
    polys = synth_polygons(spark, n_polygons, seed=seed)
    joined = pip_join(tiles, polys, res=res)
    per_img = joined.groupBy("poly_id", "image_id").agg(
        F.count("*").alias("n_tiles"), F.sum("px_value").alias("sum_px")
    )
    caps = F.broadcast(synth_captions(spark, n_images, seed=seed))
    return (
        per_img.join(caps, "image_id")
        .groupBy("poly_id")
        .agg(
            F.sum("n_tiles").alias("n_tiles"),
            F.count("*").alias("n_images"),
            F.sum("sum_px").alias("sum_px"),
            F.countDistinct("caption").alias("n_captions"),
        )
        .orderBy("poly_id")
    )


@pytest.mark.parametrize("fmt", ["raw8", "png", "jpeg"])
def test_fused_equals_legacy(spark, fmt):
    from h3ronpy_spark.plans.flagship import flagship
    from h3ronpy_spark.sources.images import unregister_codec

    try:
        a = sorted(
            map(tuple, flagship(spark, 2000, n_polygons=40, res=9,
                                fmt=fmt).collect())
        )
        b = sorted(map(tuple, _legacy_flagship(spark, 2000, 40, 9,
                                               fmt=fmt).collect()))
    finally:
        # suite isolation: flagship(fmt=...) registers the codec in the
        # GLOBAL registry (same cleanup as test_skew_and_codecs)
        unregister_codec("png")
        unregister_codec("jpeg")
    assert a == b and len(a) > 3


def test_fused_plan_shape(spark):
    """Fused plan: the coverage join is map-side and the caption rides
    the rollup rows (round 8) — NO joins at all, no Expand, exactly
    one Python stage (the fused kernel)."""
    from h3ronpy_spark.plans.flagship import flagship

    df = flagship(spark, 400, n_polygons=8, res=9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 0, plan[:3000]
    assert "Join" not in plan, plan[:3000]
    assert "Expand" not in plan
    assert plan.count("MapInPandas") == 1, plan[:3000]


def test_fused_salt_falls_back(spark):
    """salt= requests the salted shuffle join — results must still be
    identical to the unsalted rollup."""
    from h3ronpy_spark.plans.flagship import flagship

    a = sorted(
        map(tuple, flagship(spark, 1000, n_polygons=20, res=9).collect())
    )
    b = sorted(
        map(
            tuple,
            flagship(spark, 1000, n_polygons=20, res=9, salt=4).collect(),
        )
    )
    assert a == b and len(a) > 0
