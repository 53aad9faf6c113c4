"""Deterministic synthetic polygon (region) table for PIP joins.

Mirrors FIXTURES.md F5: seeded convex vertex fans around seeded centers —
the stand-in for the reference's Natural-Earth country polygons
(h3ronpy/tests/__init__.py:8-10).  Schema: (poly_id string, wkb binary,
kind string).  Polygons are written by our own numpy WKB codec.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..h3core.wkb import write_polygon


def gen_polygons_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        clat = rng.uniform(-70, 70)
        clng = rng.uniform(-175, 175)
        nv = int(rng.integers(5, 24))
        radius = rng.uniform(0.5, 6.0)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rr = radius * rng.uniform(0.6, 1.0, nv)
        lng = clng + rr * np.cos(ang)
        lat = clat + rr * np.sin(ang) * 0.8
        ring = np.stack([lng, lat], axis=-1)
        ring = np.vstack([ring, ring[:1]])
        rows.append((f"poly{i:05d}", write_polygon([ring]), "polygon"))
    return pd.DataFrame(rows, columns=["poly_id", "wkb", "kind"])


def synth_polygons(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_polygons_pdf(n, seed))
