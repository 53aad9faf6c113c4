"""Eager pandas-level parity API (reference `h3ronpy.pandas` surface).

Mirrors the reference's pandas/geopandas convenience layer
(h3ronpy/python/h3ronpy/pandas/raster.py, pandas/vector.py) with the same
signatures and defaults, on top of this engine's numpy kernels.  geopandas
and shapely are optional exactly as in a minimal reference install: when
absent, the geo-returning functions degrade to plain pandas objects whose
geometry column holds geoarrow-tagged WKB bytes (documented per function)
instead of failing at import time — this sandbox ships neither library,
and the Spark layer (operators/, functions/) is the production path; this
module exists so reference users' driver-side snippets port verbatim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import arrays as _A
from .h3core import index as _IDX
from .h3core import rasterh3 as _R
from .h3core.polyfill import wkb_to_cells as _wkb_to_cells_one

DEFAULT_CELL_COLUMN_NAME = "cell"
H3_CRS = "EPSG:4326"

nearest_h3_resolution = _R.nearest_h3_resolution


def _gpd():
    try:
        import geopandas as gpd  # noqa: F401

        return gpd
    except Exception:
        return None


def _shapely_from_wkb(wkb_series):
    try:
        import shapely

        return shapely.from_wkb(wkb_series)
    except Exception:
        return None


def raster_to_dataframe(
    in_raster: np.ndarray,
    transform,
    h3_resolution: int,
    nodata_value=None,
    axis_order: str = "yx",
    compact: bool = True,
    geo: bool = False,
) -> pd.DataFrame:
    """Raster band -> DataFrame of (cell, value), reference semantics
    (h3ronpy/python/h3ronpy/pandas/raster.py:16-55): centroid-in-pixel
    assignment, nodata dropped, optional compaction to mixed resolutions,
    optional geometry attach via cells_dataframe_to_geodataframe."""
    values, cells = _R.raster_to_cells(
        in_raster,
        transform,
        h3_resolution,
        nodata_value=nodata_value,
        axis_order=axis_order,
    )
    if compact and len(cells):
        # compact per distinct value (a compacted cell must represent a
        # uniform value area — same contract as the reference's rust
        # kernel, which compacts within value groups)
        out_c, out_v = [], []
        for v in pd.unique(values):
            mask = values == v
            cc = _IDX.compact(cells[mask])
            out_c.append(cc)
            out_v.append(np.full(len(cc), v, dtype=values.dtype))
        cells = np.concatenate(out_c) if out_c else cells
        values = np.concatenate(out_v) if out_v else values
    df = pd.DataFrame({DEFAULT_CELL_COLUMN_NAME: cells, "value": values})
    if geo:
        return cells_dataframe_to_geodataframe(df)
    return df


def raster_to_geodataframe(*a, **kw):
    """raster_to_dataframe(..., geo=True) — reference
    pandas/raster.py:58-63."""
    kw["geo"] = True
    return raster_to_dataframe(*a, **kw)


def cells_to_polygons(cells, radians: bool = False, link_cells: bool = False):
    """Cell array -> geometry series (shapely when available, else
    geoarrow-tagged WKB bytes) — reference pandas/vector.py
    cells_to_polygons."""
    wkb = _A.cells_to_wkb_polygons(
        np.asarray(cells, dtype=np.int64), radians=radians,
        link_cells=link_cells,
    )
    geom = _shapely_from_wkb(wkb)
    return pd.Series(geom if geom is not None else wkb, name="geometry")


def cells_to_points(cells, radians: bool = False):
    wkb = _A.cells_to_wkb_points(np.asarray(cells, dtype=np.int64),
                                 radians=radians)
    geom = _shapely_from_wkb(wkb)
    return pd.Series(geom if geom is not None else wkb, name="geometry")


def cells_dataframe_to_geodataframe(
    df: pd.DataFrame, cell_column_name: str = DEFAULT_CELL_COLUMN_NAME
):
    """Attach hexagon geometry for the cell column — reference
    pandas/vector.py:60-72.  Returns geopandas.GeoDataFrame when
    geopandas is installed, else the same pandas DataFrame with a
    `geometry` column of WKB bytes."""
    geom = cells_to_polygons(df[cell_column_name].to_numpy(np.int64))
    gpd = _gpd()
    is_wkb = len(geom) == 0 or isinstance(
        geom.iloc[0], (bytes, bytearray)
    )
    if gpd is not None and not is_wkb:
        return gpd.GeoDataFrame(df, geometry=geom, crs=H3_CRS)
    out = df.copy()
    out["geometry"] = geom.to_numpy()
    return out


def wkb_series_to_cells(
    wkb,
    resolution: int,
    containment_mode: str = "containscentroid",
    compact: bool = False,
) -> pd.Series:
    """Series/iterable of WKB blobs -> Series of cell-id arrays."""
    return pd.Series(
        [
            _wkb_to_cells_one(
                b, resolution, containment_mode=containment_mode,
                compact=compact,
            )
            for b in wkb
        ]
    )


def geoseries_to_cells(geoseries, resolution: int, **kw) -> pd.Series:
    """reference pandas/vector.py:52-57 — accepts a geopandas GeoSeries
    (via .to_wkb()) or any iterable of WKB blobs."""
    wkb = geoseries.to_wkb() if hasattr(geoseries, "to_wkb") else geoseries
    return wkb_series_to_cells(wkb, resolution, **kw)


def geodataframe_to_cells(
    gdf,
    resolution: int,
    containment_mode: str = "containscentroid",
    compact: bool = False,
    cell_column_name: str = DEFAULT_CELL_COLUMN_NAME,
) -> pd.DataFrame:
    """reference pandas/vector.py:74-97 — one output row per (input row,
    cell), all non-geometry columns carried through.  The ACTIVE
    geometry column is resolved via .geometry (so a geopandas frame
    with a renamed geometry column — reference
    tests/pandas/test_vector.py::test_non_standard_geometry_column_name
    — works, and the renamed column is dropped from the output instead
    of leaking through as data; round-5 fix)."""
    if "geometry" in gdf.columns:
        geom = gdf["geometry"]
        geom_name = "geometry"
    else:
        geom = gdf.geometry  # geopandas active geometry (any name)
        geom_name = getattr(geom, "name", "geometry")
    cells = geoseries_to_cells(
        geom, resolution, containment_mode=containment_mode, compact=compact
    )
    rest = gdf.drop(columns=[geom_name], errors="ignore")
    out = rest.loc[rest.index.repeat(cells.map(len))].reset_index(drop=True)
    out[cell_column_name] = np.concatenate(
        [c for c in cells if len(c)]
    ) if cells.map(len).sum() else np.array([], dtype=np.int64)
    return out
