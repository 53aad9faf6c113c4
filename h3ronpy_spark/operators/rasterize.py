"""Rasterize: cell+value DataFrame -> 2-D raster (SURVEY.md §2.7 op 40).

The reference groups by value, dissolves each group's cells to polygons
and burns them with rasterio (h3ronpy/python/h3ronpy/raster.py:140-213).
Pixel-center-in-polygon burning is equivalent to pixel-center-in-cell for
cell-aligned data, so the Spark-native inverse is: encode every output
pixel center and join values by cell — no polygon dissolve needed, and
the pixel grid can be partitioned into bands across executors for large
rasters.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..h3core.rasterh3 import cells_to_raster, nearest_h3_resolution  # noqa: F401


def rasterize_cells(
    df: DataFrame,
    size: tuple[int, int],
    transform,
    cell_col: str = "cell",
    value_col: str = "value",
    nodata_value=0,
    max_cells: int = 20_000_000,
) -> np.ndarray:
    """Collect (cell, value) pairs and paint the raster driver-side.

    Guarded by max_cells: a raster's worth of cells is small by
    construction (<= pixels); the returned array is a driver-side artifact
    like the reference's.  At 100-TB scale this is the LAST step of a
    pipeline, not a transformation: aggregate/dissolve distributed first
    (`dissolve_groups` below, or groupBy(cell) rollups) and rasterize only
    the final, already-reduced cell set — one call per output raster/band,
    each bounded by its own pixel count."""
    n = df.count()
    if n > max_cells:
        raise ValueError(
            f"rasterize_cells would collect {n} (cell, value) rows to the "
            f"driver, above the max_cells guard ({max_cells}). Rasterize "
            "per tile instead: split the output grid into bands/tiles, "
            "filter cells to each tile's bbox (cells_bounds_arrays), and "
            "call rasterize_cells once per tile — or reduce first with "
            "groupBy(cell) / dissolve_groups. Raise max_cells only if the "
            "driver really has memory for the full raster."
        )
    pdf = df.select(cell_col, value_col).toPandas()
    return cells_to_raster(
        pdf[cell_col].to_numpy(np.int64),
        pdf[value_col].to_numpy(),
        size,
        transform,
        nodata_value=nodata_value,
    )


def dissolve_groups(
    df: DataFrame,
    group_cols: list[str],
    cell_col: str = "cell",
) -> DataFrame:
    """link_cells dissolve per group: one (Multi)Polygon WKB per group
    (the reference's rasterize pre-pass, h3ronpy/python/h3ronpy/raster.py:
    177-200) — groupBy + applyInPandas, each group merged independently."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = [df.schema[c] for c in group_cols]
    schema = T.StructType(list(out_fields) + [T.StructField("wkb", T.BinaryType())])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..h3core.dissolve import dissolve_to_wkb

        cells = pdf[cell_col].to_numpy(np.int64)
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["wkb"] = [dissolve_to_wkb(cells)]
        return pd.DataFrame(row)

    return df.groupBy(*group_cols).applyInPandas(merge, schema)
