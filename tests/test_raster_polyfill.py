"""Raster<->H3 and polyfill invariants (reference behavior per
h3ronpy/tests/arrow/test_raster.py and tests/pandas/test_vector.py)."""

import numpy as np
import pytest

from h3ronpy_spark.h3core import index as IDX
from h3ronpy_spark.h3core import latlng as LL
from h3ronpy_spark.h3core import polyfill as PF
from h3ronpy_spark.h3core import rasterh3 as R
from h3ronpy_spark.h3core import wkb as W


class TestRaster:
    def test_block_raster_roundtrip_exact(self):
        w, h = 60, 40
        tf = (0.01, 0.0, 10.0, 0.0, -0.01, 45.0)
        band = np.zeros((h, w), dtype=np.uint8)
        band[5:20, 10:40] = 7
        band[25:35, 5:25] = 3
        vals, cells = R.raster_to_cells(band, tf, 9, nodata_value=0)
        assert cells.size > 1000
        out = R.cells_to_raster(cells, vals, (w, h), tf, nodata_value=0)
        assert (out == band).all()

    def test_centroid_semantics_and_completeness(self):
        rng = np.random.default_rng(11)
        for _ in range(8):
            res = int(rng.integers(6, 11))
            pix = 24.0 / 7 ** (res / 2) / rng.uniform(0.3, 6)
            la0 = float(rng.uniform(-75, 75))
            lo0 = float(rng.uniform(-170, 170))
            ww, hh = int(rng.integers(15, 40)), int(rng.integers(15, 40))
            tf = (pix, 0.0, lo0, 0.0, -pix, la0)
            band = rng.integers(1, 5, size=(hh, ww)).astype(np.uint8)
            vals, cells = R.raster_to_cells(band, tf, res, nodata_value=0)
            # every emitted value equals the band value at the centroid px
            cl, cg = LL.cell_to_latlng(cells)
            col = np.floor((np.degrees(cg) - lo0) / pix).astype(int)
            row = np.floor((la0 - np.degrees(cl)) / pix).astype(int)
            assert (band[row, col] == vals).all()
            # completeness: a 4x-denser sample grid finds no extra cells
            cc, rr = np.meshgrid(
                np.arange(0, ww, 0.2), np.arange(0, hh, 0.2)
            )
            dense = np.unique(
                LL.latlng_to_cell(
                    np.radians(la0 - pix * rr.ravel()),
                    np.radians(lo0 + pix * cc.ravel()),
                    res,
                )
            )
            dl, dg = LL.cell_to_latlng(dense)
            dcol = np.floor((np.degrees(dg) - lo0) / pix).astype(int)
            drow = np.floor((la0 - np.degrees(dl)) / pix).astype(int)
            inb = (dcol >= 0) & (dcol < ww) & (drow >= 0) & (drow < hh)
            expected = dense[inb]
            missing = set(expected.tolist()) - set(cells.tolist())
            assert not missing, (res, pix, len(missing))

    def test_nearest_h3_resolution(self):
        # ~100m pixels -> around res 9; modes ordered
        tf = (0.001, 0.0, 10.0, 0.0, -0.001, 45.0)
        r1 = R.nearest_h3_resolution((100, 100), tf, search_mode="min_diff")
        r2 = R.nearest_h3_resolution(
            (100, 100), tf, search_mode="smaller_than_pixel"
        )
        assert 8 <= r1 <= 10
        assert r2 >= r1

    def test_wgs84_bounds_rejected(self):
        band = np.ones((10, 10), dtype=np.uint8)
        with pytest.raises(ValueError):
            R.raster_to_cells(band, (40.0, 0, 0, 0, -40.0, 90), 5)

    def test_value_dtype_breadth(self):
        # reference converts {u,i}{8..64}, f32, f64 (raster.rs:210-219);
        # values must round-trip in their own dtype, NaN nodata dropped
        tf = (0.01, 0.0, 10.0, 0.0, -0.01, 45.0)
        for dt in (np.uint8, np.int16, np.uint32, np.int64,
                   np.float32, np.float64):
            band = (np.arange(1200).reshape(30, 40) % 250 + 1).astype(dt)
            nod = np.nan if np.dtype(dt).kind == "f" else 0
            if np.dtype(dt).kind == "f":
                band[0, :] = np.nan
            else:
                band[0, :] = 0
            vals, cells = R.raster_to_cells(band, tf, 9, nodata_value=nod)
            assert vals.dtype == np.dtype(dt)
            assert cells.size > 100
            if np.dtype(dt).kind == "f":
                assert np.isfinite(vals).all()
            else:
                assert (vals != 0).all()
            out = R.cells_to_raster(cells, vals, (40, 30), tf,
                                    nodata_value=nod)
            assert out.dtype == np.dtype(dt)

    def test_typed_tiling_f64_nan_nodata(self, ):
        from h3ronpy_spark.sources.images import (
            decode_image,
            gen_images_typed_pdf,
        )

        pdf = gen_images_typed_pdf(np.arange(5), "raw_f64", seed=3)
        b = decode_image(pdf["bytes"][0], pdf["w"][0], pdf["h"][0], "raw_f64")
        assert b.dtype == np.float64
        assert np.isnan(b[0, :]).all() and np.isnan(b[:, 0]).all()
        assert np.isfinite(b[1:, 1:]).all()
        # i16 variant decodes too
        pdf2 = gen_images_typed_pdf(np.arange(3), "raw_i16", seed=3)
        b2 = decode_image(pdf2["bytes"][0], pdf2["w"][0], pdf2["h"][0],
                          "raw_i16")
        assert b2.dtype == np.int16 and (b2[1:, 1:] > 0).all()

    def test_axis_order(self):
        band = np.arange(12, dtype=np.uint8).reshape(3, 4) + 1
        tf = (0.01, 0.0, 10.0, 0.0, -0.01, 45.0)
        v1, c1 = R.raster_to_cells(band, tf, 8, nodata_value=None)
        v2, c2 = R.raster_to_cells(band.T, tf, 8, nodata_value=None,
                                   axis_order="xy")
        assert np.array_equal(c1, c2) and np.array_equal(v1, v2)


class TestPolyfill:
    RECT = [np.array([[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]],
                     dtype=float)]

    def test_rect_res4_count(self):
        # crates/h3arrow/src/array/from_geo.rs:406-425: > 400 cells
        cells = PF.polygon_to_cells(self.RECT, 4)
        assert cells.size > 400
        assert IDX.is_valid_cell(cells).all()

    def test_mode_nesting(self):
        cont = PF.polygon_to_cells(self.RECT, 4, "containsboundary")
        cen = PF.polygon_to_cells(self.RECT, 4)
        inter = PF.polygon_to_cells(self.RECT, 4, "intersectsboundary")
        cov = PF.polygon_to_cells(self.RECT, 4, "covers")
        assert set(cont) <= set(cen) <= set(inter) <= set(cov)

    def test_centroid_mode_area_unbiased(self):
        from h3ronpy_spark.h3core.boundary import cell_area_km2

        cells = PF.polygon_to_cells(self.RECT, 4)
        area = cell_area_km2(cells).sum()
        R_km = 6371.007180918475
        poly = (
            np.radians(10)
            * (np.sin(np.radians(20)) - np.sin(np.radians(10)))
            * R_km**2
        )
        assert abs(area / poly - 1) < 0.01

    def test_hierarchical_equals_direct(self):
        comp = PF.polygon_to_cells_compact(self.RECT, 6)
        _, unc = IDX.uncompact(comp, 6)
        direct = PF.polygon_to_cells(self.RECT, 6)
        assert set(unc.tolist()) == set(direct.tolist())
        assert comp.size < direct.size / 5

    def test_sliver_smaller_than_cell(self):
        # tests/pandas/test_vector.py:78-97: 0 centroid cells, covers >= 1
        sliver = [np.array(
            [[10, 10], [10.001, 10], [10.001, 10.001], [10, 10]], dtype=float
        )]
        assert PF.polygon_to_cells(sliver, 4).size == 0
        assert PF.polygon_to_cells(sliver, 4, "covers").size >= 1

    def test_point_and_line(self):
        pt = W.write_point(10.2, 45.5)
        c = PF.wkb_to_cells(pt, 5)
        assert c.tolist() == [0x851F9923FFFFFFF]
        ln = W.write_linestring([[10.0, 45.0], [10.5, 45.2]])
        lc = PF.wkb_to_cells(ln, 7)
        assert lc.size > 10
        # line cells form a connected-ish path: consecutive samples adjacent
        assert IDX.is_valid_cell(lc).all()

    def test_empty_geometry(self):
        empty = W.write_geometrycollection([])
        assert PF.wkb_to_cells(empty, 5).size == 0
        assert PF.wkb_to_cells(None, 5).size == 0

    def test_multipolygon_and_hole(self):
        outer = np.array(
            [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float
        )
        hole = np.array(
            [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]],
            dtype=float,
        )
        with_hole = PF.wkb_to_cells(W.write_polygon([outer, hole]), 6)
        without = PF.wkb_to_cells(W.write_polygon([outer]), 6)
        assert 0 < with_hole.size < without.size
        mp = W.write_multipolygon([[outer], [outer + 5.0]])
        both = PF.wkb_to_cells(mp, 5)
        one = PF.wkb_to_cells(W.write_polygon([outer]), 5)
        assert both.size > one.size

    def test_compact_coverage_equal(self):
        blob = W.write_polygon(self.RECT)
        comp = PF.wkb_to_cells(blob, 5, compact=True)
        _, unc = IDX.uncompact(comp, 5)
        plain = PF.wkb_to_cells(blob, 5)
        assert set(unc.tolist()) == set(plain.tolist())


class TestDissolve:
    def test_children_dissolve_to_single_polygon(self):
        from h3ronpy_spark.h3core.dissolve import dissolve_cells, dissolve_to_wkb

        h5 = PF.latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 5)
        _, kids = IDX.cell_to_children_flat(h5, 7)
        polys = dissolve_cells(kids)
        assert len(polys) == 1 and len(polys[0]) == 1
        # polyfill of the dissolved polygon reproduces the exact cell set
        back = PF.wkb_to_cells(dissolve_to_wkb(kids), 7)
        assert set(back.tolist()) == set(kids.tolist())

    def test_donut_has_hole(self):
        from h3ronpy_spark.h3core.dissolve import dissolve_cells
        from h3ronpy_spark.h3core.grid import grid_disk_distances

        c = PF.latlng_to_cell(np.radians([45.5]), np.radians([10.2]), 7)
        _, cells, kk = grid_disk_distances(c, 2)
        polys = dissolve_cells(cells[kk > 0])
        assert len(polys) == 1 and len(polys[0]) == 2  # outer + hole

    def test_disjoint_cells_two_polygons(self):
        from h3ronpy_spark.h3core.dissolve import dissolve_cells

        c = PF.latlng_to_cell(
            np.radians([45.5, -10.0]), np.radians([10.2, 100.0]), 6
        )
        assert len(dissolve_cells(c)) == 2


class TestTransmeridian:
    """Round-5 fix: libh3-convention antimeridian handling — a loop with
    an edge spanning >180° of longitude CROSSES the antimeridian (the
    pre-fix planar fill returned the 359° complement: 17,436 cells for a
    1°-wide strip at ±180)."""

    RING = np.array(
        [[179.5, 10.0], [-179.5, 10.0], [-179.5, 11.0],
         [179.5, 11.0], [179.5, 10.0]]
    )

    def test_polygon_fill_stays_on_the_seam(self):
        from h3ronpy_spark.h3core import polyfill as P
        from h3ronpy_spark.h3core.latlng import cell_to_latlng

        cells = P.polygon_to_cells([self.RING], 5)
        # comparable to a same-size polygon away from the seam, not 17k
        ref = P.polygon_to_cells(
            [np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0],
                       [10.0, 11.0], [10.0, 10.0]])], 5
        )
        assert 0 < cells.size < 3 * ref.size
        lat, lng = cell_to_latlng(cells)
        latd, lngd = np.degrees(lat), np.degrees(lng)
        assert ((latd >= 10) & (latd <= 11)).all()
        assert ((lngd >= 179.5) | (lngd <= -179.5)).all()

    def test_compact_variant_matches_direct(self):
        from h3ronpy_spark.h3core import index as IDX
        from h3ronpy_spark.h3core import polyfill as P

        direct = P.polygon_to_cells([self.RING], 5)
        _, unc = IDX.uncompact(P.polygon_to_cells_compact([self.RING], 5), 5)
        assert sorted(unc.tolist()) == sorted(direct.tolist())

    def test_all_modes_nest(self):
        from h3ronpy_spark.h3core import polyfill as P

        cen = set(P.polygon_to_cells([self.RING], 5).tolist())
        full = set(
            P.polygon_to_cells([self.RING], 5, "containsboundary").tolist()
        )
        inter = set(
            P.polygon_to_cells([self.RING], 5, "intersectsboundary").tolist()
        )
        assert full <= cen <= inter

    def test_line_crossing_seam(self):
        from h3ronpy_spark.h3core import polyfill as P
        from h3ronpy_spark.h3core.latlng import cell_to_latlng

        lc = P.line_to_cells(np.array([[179.7, 10.0], [-179.7, 10.2]]), 5)
        _, lng = cell_to_latlng(lc)
        lngd = np.degrees(lng)
        assert lc.size and ((lngd > 179) | (lngd < -179)).all()

    def test_non_transmeridian_unchanged(self):
        """The gate must not perturb normal polygons: a polygon touching
        (but not crossing) lng 180 on one side."""
        from h3ronpy_spark.h3core import polyfill as P

        ring = np.array(
            [[178.5, 10.0], [179.9, 10.0], [179.9, 11.0],
             [178.5, 11.0], [178.5, 10.0]]
        )
        a = P.polygon_to_cells([ring], 5)
        from h3ronpy_spark.h3core.polyfill import _normalize_transmeridian
        _, shifted = _normalize_transmeridian([ring])
        assert not shifted and a.size > 0


class TestCoversMode:
    """Round-5: ContainmentMode::Covers vs IntersectsBoundary split
    (h3ronpy/src/vector.rs:59-60).  A geometry strictly inside one cell
    without touching its boundary is returned ONLY by covers; the
    compact refinement must also descend through covers, else a coarse
    cell containing the whole polygon terminates the descent empty."""

    def _sub_cell_triangle(self):
        from h3ronpy_spark.h3core.latlng import cell_to_latlng, latlng_to_cell

        c = latlng_to_cell(np.radians([43.6]), np.radians([7.1]), 5)
        lat, lng = cell_to_latlng(c)
        la, lo = np.degrees(lat)[0] + 0.01, np.degrees(lng)[0] + 0.01
        tri = np.array(
            [[lo, la], [lo + 1e-4, la], [lo + 5e-5, la + 1e-4], [lo, la]]
        )
        return tri, int(c[0])

    def test_only_covers_returns_covering_cell(self):
        from h3ronpy_spark.h3core import polyfill as P

        tri, cell = self._sub_cell_triangle()
        assert P.polygon_to_cells([tri], 5, "containscentroid").size == 0
        assert P.polygon_to_cells([tri], 5, "containsboundary").size == 0
        assert P.polygon_to_cells([tri], 5, "intersectsboundary").size == 0
        assert P.polygon_to_cells([tri], 5, "covers").tolist() == [cell]

    def test_compact_descends_through_covering_cells(self):
        from h3ronpy_spark.h3core import polyfill as P

        tri, _ = self._sub_cell_triangle()
        # the res-9 covering cell is found through 4 levels of coarse
        # cells that each strictly contain the triangle
        assert P.polygon_to_cells_compact([tri], 9, "covers").size == 1
        assert (
            P.polygon_to_cells_compact([tri], 9, "intersectsboundary").size
            == 0
        )

    def test_modes_nest_on_large_polygon(self):
        from h3ronpy_spark.h3core import polyfill as P

        ring = np.array(
            [[7.0, 43.0], [7.4, 43.0], [7.4, 43.3], [7.0, 43.3], [7.0, 43.0]]
        )
        full = set(P.polygon_to_cells([ring], 6, "containsboundary").tolist())
        cen = set(P.polygon_to_cells([ring], 6).tolist())
        inter = set(
            P.polygon_to_cells([ring], 6, "intersectsboundary").tolist()
        )
        cov = set(P.polygon_to_cells([ring], 6, "covers").tolist())
        assert full <= cen <= inter <= cov
        # larger-than-cell polygon: covers adds nothing over intersects
        assert cov == inter


class TestPoleCapGuard:
    """VERDICT r05 item 7: pole-enclosing rings must raise with the
    split-in-two workaround instead of silently filling 0 cells."""

    def _cap_ring(self, lat=80.0):
        import numpy as np

        lngs = np.arange(-180.0, 181.0, 30.0)
        return np.column_stack([lngs, np.full(lngs.size, lat)])

    def test_polar_cap_raises(self):
        import numpy as np
        import pytest

        from h3ronpy_spark.h3core import polyfill as P

        ring = self._cap_ring()
        with pytest.raises(ValueError, match="winds around a pole"):
            P.polygon_to_cells([ring], 2)
        with pytest.raises(ValueError, match="winds around a pole"):
            P.polygon_to_cells_compact([ring], 2)
        # south pole, reversed winding
        sring = np.column_stack([ring[::-1, 0], -ring[::-1, 1]])
        with pytest.raises(ValueError, match="winds around a pole"):
            P.polygon_to_cells([sring], 2)

    def test_two_half_polygons_fill_the_cap(self):
        import numpy as np

        from h3ronpy_spark.h3core import polyfill as P
        from h3ronpy_spark.h3core.latlng import cell_to_latlng, latlng_to_cell

        lat0 = 80.0
        west = np.array(
            [[-180.0, lat0], [-90.0, lat0], [0.0, lat0],
             [0.0, 90.0], [-180.0, 90.0], [-180.0, lat0]]
        )
        east = np.array(
            [[0.0, lat0], [90.0, lat0], [180.0, lat0],
             [180.0, 90.0], [0.0, 90.0], [0.0, lat0]]
        )
        cells = np.union1d(
            P.polygon_to_cells([west], 2), P.polygon_to_cells([east], 2)
        )
        assert cells.size > 0
        # the cell holding the pole itself is covered
        pole_cell = latlng_to_cell(
            np.radians(np.array([89.99])), np.radians(np.array([0.0])), 2
        )[0]
        assert pole_cell in cells
        # every returned centroid is inside the cap (tolerance one edge)
        clat, _ = cell_to_latlng(cells)
        assert np.degrees(clat).min() >= lat0 - 0.01
        # non-cap polygons are untouched by the guard (incl. antimeridian)
        seam = np.array(
            [[179.5, 10.0], [-179.5, 10.0], [-179.5, 11.0],
             [179.5, 11.0], [179.5, 10.0]]
        )
        assert P.polygon_to_cells([seam], 4).size > 0
