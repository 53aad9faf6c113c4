"""Eager array-level API with the reference's exact signatures and
error semantics (h3ronpy/python/h3ronpy/__init__.py + vector.py) so a
reference user can port call sites verbatim before moving to the Spark
Column API:

  * parse functions raise ValueError("non-parsable ...") by default;
    ``set_failing_to_invalid=True`` nulls failures instead
    (h3ronpy/tests/arrow/test_utf8.py:22-39)
  * ``compact`` rejects mixed-resolution input unless
    ``mixed_resolutions=True`` (h3ronpy/tests/arrow/test_compact.py:27-33)
  * coordinate / WKB functions take ``radians=`` pass-throughs
    (h3ronpy/python/h3ronpy/vector.py:11-66)
  * area in rads2 / km2 / m2 (h3ronpy/python/h3ronpy/__init__.py area trio)

All functions take and return plain numpy arrays.
"""

from __future__ import annotations

import numpy as np

from .h3core import index as _IDX
from .h3core import latlng as _LL
from .h3core import strings as _STR
from .h3core.boundary import (
    cell_area_km2 as _area_km2,
)
from .h3core.boundary import (
    cell_area_m2 as _area_m2,
)
from .h3core.boundary import (
    cell_area_rads2 as _area_rads2,
)


def cells_parse(strings, set_failing_to_invalid: bool = False) -> np.ndarray:
    """Parse cell strings; raises ValueError("non-parsable CellIndex")
    unless set_failing_to_invalid (then -1 marks failures)."""
    return _STR.cells_parse(strings, set_failing_to_invalid)


def compact(cells, mixed_resolutions: bool = False) -> np.ndarray:
    """Compact a cell set.  Mixed-resolution input raises unless
    ``mixed_resolutions=True`` (reference
    h3ronpy/python/h3ronpy/__init__.py:160-167)."""
    cells = np.asarray(cells, dtype=np.int64).ravel()
    if not mixed_resolutions and cells.size:
        res = _IDX.get_resolution(cells)
        if np.unique(res).size > 1:
            raise ValueError(
                "heterogeneous resolutions in input; pass "
                "mixed_resolutions=True to allow"
            )
    return _IDX.compact(cells)


def uncompact(cells, target_res: int) -> np.ndarray:
    _, kids = _IDX.uncompact(np.asarray(cells, dtype=np.int64), target_res)
    return kids


def cells_to_coordinates(cells, radians: bool = False):
    """-> (lat, lng) arrays, degrees by default (radians=True for rad)."""
    lat, lng = _LL.cell_to_latlng(np.asarray(cells, dtype=np.int64))
    if radians:
        return lat, lng
    return np.degrees(lat), np.degrees(lng)


def coordinates_to_cells(lat, lng, res, radians: bool = False) -> np.ndarray:
    """(lat, lng[, res]) -> cells; inputs in degrees unless radians=True."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    if not radians:
        lat = np.radians(lat)
        lng = np.radians(lng)
    return _LL.latlng_to_cell(lat, lng, np.asarray(res, dtype=np.int64))


def cells_to_wkb_polygons(
    cells, radians: bool = False, link_cells: bool = False
) -> list[bytes | None]:
    """Cell boundary polygons as WKB; with link_cells=True contiguous
    groups are dissolved into multipolygons (one blob for the whole
    array, reference vector.py:55-66)."""
    from .h3core.boundary import cell_boundary
    from .h3core.wkb import write_polygons

    h = np.asarray(cells, dtype=np.int64).ravel()
    if link_cells:
        from .h3core.dissolve import dissolve_cells
        from .h3core.wkb import write_multipolygon

        polys = dissolve_cells(h)  # rings in degrees lnglat
        if radians:
            polys = [[np.radians(r) for r in rings] for rings in polys]
        return [write_multipolygon(polys)]
    lats, lngs, counts = cell_boundary(h)
    if not radians:
        lats, lngs = np.degrees(lats), np.degrees(lngs)
    return write_polygons(lats, lngs, counts)


def cells_to_wkb_points(cells, radians: bool = False) -> list[bytes | None]:
    from .h3core.wkb import write_points

    lat, lng = _LL.cell_to_latlng(np.asarray(cells, dtype=np.int64))
    if not radians:
        lat, lng = np.degrees(lat), np.degrees(lng)
    return write_points(lng, lat)


def cells_area_rads2(cells) -> np.ndarray:
    return _area_rads2(np.asarray(cells, dtype=np.int64))


def cells_area_km2(cells) -> np.ndarray:
    return _area_km2(np.asarray(cells, dtype=np.int64))


def cells_area_m2(cells) -> np.ndarray:
    return _area_m2(np.asarray(cells, dtype=np.int64))


def wkb_to_geoarrow(wkb: list, name: str = "geometry"):
    """Wrap eager WKB output (cells_to_wkb_polygons / _points) as a
    (pyarrow.Field, pyarrow.Array) pair carrying the geoarrow.wkb
    extension tag the reference attaches to its WKB arrays
    (h3ronpy/src/vector.rs:282-283)."""
    import pyarrow as pa

    arr = pa.array(wkb, type=pa.binary())
    field = pa.field(
        name,
        pa.binary(),
        nullable=True,
        metadata={b"ARROW:extension:name": b"geoarrow.wkb"},
    )
    return field, arr
