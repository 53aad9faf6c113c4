"""Parity tests for the eager pandas-level API (reference
h3ronpy.pandas surface).  Pure numpy/pandas — no Spark session."""

import numpy as np
import pandas as pd

from h3ronpy_spark import arrays as A
from h3ronpy_spark import pandas_api as P


def _transform(px=0.01, lat=45.0, lng=10.0):
    return (px, 0.0, lng, 0.0, -px, lat)


class TestRaster:
    def test_raster_to_dataframe_uncompacted(self):
        band = np.zeros((20, 20), dtype=np.uint8)
        band[:10, :] = 7
        df = P.raster_to_dataframe(
            band, _transform(), 8, nodata_value=0, compact=False
        )
        assert set(df.columns) == {"cell", "value"}
        assert (df["value"] == 7).all() and len(df) > 0
        # every cell resolves to res 8 and its centroid maps to a 7-pixel
        from h3ronpy_spark.h3core.index import get_resolution

        assert (get_resolution(df["cell"].to_numpy(np.int64)) == 8).all()

    def test_raster_to_dataframe_compact_roundtrip(self):
        band = np.full((30, 30), 3, dtype=np.uint8)
        plain = P.raster_to_dataframe(
            band, _transform(), 8, nodata_value=0, compact=False
        )
        comp = P.raster_to_dataframe(
            band, _transform(), 8, nodata_value=0, compact=True
        )
        assert len(comp) <= len(plain)
        # uncompacting the compacted set recovers exactly the plain set
        back = np.sort(
            np.concatenate(
                [
                    A.uncompact(np.array([c], dtype=np.int64), 8)
                    for c in comp["cell"].to_numpy(np.int64)
                ]
            )
        )
        assert np.array_equal(
            back, np.sort(plain["cell"].to_numpy(np.int64))
        )
        assert (comp["value"] == 3).all()

    def test_raster_to_geodataframe_wkb_fallback(self):
        """Without geopandas in the sandbox the geo variant returns a
        pandas frame whose geometry column is WKB polygons."""
        band = np.full((5, 5), 9, dtype=np.uint8)
        g = P.raster_to_geodataframe(band, _transform(), 7, nodata_value=0)
        assert "geometry" in g.columns and len(g) > 0
        blob = g["geometry"].iloc[0]
        assert blob[0] == 1 and int.from_bytes(blob[1:5], "little") == 3

    def test_nearest_h3_resolution_reexport(self):
        assert P.nearest_h3_resolution(
            (100, 100), (0.001, 0.0, 10.0, 0.0, -0.001, 45.0), "yx",
            "min_diff",
        ) == 10


class TestVector:
    def test_geodataframe_to_cells_carries_columns(self):
        cell = A.coordinates_to_cells(
            np.array([45.5, 45.6]), np.array([10.2, 10.3]), 5
        )
        wkb = A.cells_to_wkb_polygons(cell)
        gdf = pd.DataFrame({"name": ["a", "b"], "geometry": wkb})
        out = P.geodataframe_to_cells(gdf, 6)
        assert set(out.columns) == {"name", "cell"}
        # each res-5 hexagon polyfills to its 7 res-6 children
        assert len(out) == 14
        assert sorted(out["name"].unique()) == ["a", "b"]
        from h3ronpy_spark.h3core.index import cell_to_parent

        for nm, c5 in zip(["a", "b"], cell):
            kids = out.loc[out["name"] == nm, "cell"].to_numpy(np.int64)
            assert (cell_to_parent(kids, 5) == c5).all()

    def test_geoseries_to_cells_accepts_wkb_iterable(self):
        cell = A.coordinates_to_cells(np.array([45.5]), np.array([10.2]), 5)
        wkb = A.cells_to_wkb_polygons(cell)
        cells = P.geoseries_to_cells(wkb, 6)
        assert len(cells) == 1 and len(cells.iloc[0]) == 7

    def test_cells_dataframe_to_geodataframe_fallback(self):
        cell = A.coordinates_to_cells(np.array([45.5]), np.array([10.2]), 5)
        df = pd.DataFrame({"cell": cell, "x": [1]})
        out = P.cells_dataframe_to_geodataframe(df)
        assert "geometry" in out.columns and out["x"].iloc[0] == 1
        blob = out["geometry"].iloc[0]
        assert blob[0] == 1 and int.from_bytes(blob[1:5], "little") == 3


class TestReferenceEdgeCases:
    """Round-5: the reference's own pandas edge-case tests mirrored
    (h3ronpy/tests/pandas/test_vector.py)."""

    def test_cells_dataframe_to_geodataframe_empty(self):
        # reference test_vector.py:30-35 (h3ron issue #17): must not raise
        import pandas as pd

        import h3ronpy_spark.pandas_api as P

        gdf = P.cells_dataframe_to_geodataframe(pd.DataFrame({"cell": []}))
        assert len(gdf) == 0

    def test_geometry_results_in_no_cells(self):
        # reference test_vector.py:78-97: a sub-cell polygon at res 4
        # with ContainsCentroid yields an empty frame, columns intact
        import pandas as pd

        import h3ronpy_spark.pandas_api as P
        from h3ronpy_spark.h3core import wkb as W

        poly = W.write_polygon(
            [
                [
                    [1.100000, 4.50000],
                    [1.100001, 4.50000],
                    [1.100001, 4.50001],
                    [1.100000, 4.50001],
                    [1.100000, 4.50000],
                ]
            ]
        )
        gdf = pd.DataFrame({"geometry": [poly], "col1": [1]})
        df = P.geodataframe_to_cells(gdf, 4)
        assert len(df) == 0
        assert "col1" in df.columns

    def test_non_standard_geometry_column_name(self):
        # reference test_vector.py:100-107: renamed active geometry —
        # resolved via .geometry, and the renamed column must NOT leak
        # into the output as data (round-5 fix)
        import pandas as pd

        import h3ronpy_spark.pandas_api as P
        from h3ronpy_spark.h3core import wkb as W

        poly = W.write_polygon(
            [
                [
                    [7.0, 43.0],
                    [7.3, 43.0],
                    [7.3, 43.3],
                    [7.0, 43.3],
                    [7.0, 43.0],
                ]
            ]
        )

        class _GdfLike(pd.DataFrame):
            @property
            def geometry(self):
                return self["something_else"]

        gdf = _GdfLike({"something_else": [poly], "k": [9]})
        df = P.geodataframe_to_cells(gdf, 5)
        assert len(df) > 1
        assert "something_else" not in df.columns
        assert set(df.columns) == {"k", "cell"}
