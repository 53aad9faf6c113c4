"""Spark SQL function layer over the h3core kernels.

This is the engine's equivalent of h3ronpy's polars expression namespace
(SURVEY.md §2.9): every H3 kernel exposed as a Column function, Arrow-batch
vectorized via pandas UDFs — plus *pure Spark SQL fast paths* where the
operation is just int64 bit math (resolution extraction, parent truncation,
hex formatting, validity pre-filters).  Pure-SQL paths stay inside
whole-stage codegen and cost no Python round-trip.

Conventions (SURVEY.md §1.3):
  * H3 indexes are LongType; NULL = invalid/missing (reference uses Arrow
    validity bitmaps the same way).
  * lat/lng are degrees at this layer (radians inside the kernels).
  * list-returning kernels yield ArrayType(LongType) for explode().

All UDFs are registered for SQL use by ``register_sql_functions(spark)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# pure SQL fast paths (no Python worker involved)
# ---------------------------------------------------------------------------


def cells_resolution(cell: Column) -> Column:
    """Resolution of each cell — pure bit math (SURVEY.md §2.2 op 4)."""
    return F.shiftrightunsigned(cell, 52).bitwiseAND(F.lit(15)).cast("int")


def cells_to_string(cell: Column) -> Column:
    """Lowercase hex, no leading zeros (op 8) — pure SQL."""
    return F.lower(F.regexp_replace(F.hex(cell), "^0+", ""))


def change_resolution_parent(cell: Column, parent_res: int) -> Column:
    """Parent at coarser res (ops 1/18) — pure bit math, codegen'd.

    NULL where parent_res exceeds the cell's own resolution."""
    pr = int(parent_res)
    if not 0 <= pr <= 15:
        raise ValueError("resolution out of range")
    mask_low = (1 << (45 - 3 * pr)) - 1 if pr < 15 else 0
    cleared = cell.bitwiseAND(F.lit(~(0xF << 52))).bitwiseOR(F.lit(pr << 52))
    parent = cleared.bitwiseOR(F.lit(mask_low))
    return F.when(cells_resolution(cell) >= pr, parent)


# vertex/edge hex formatting is identical int64 hex (op 9)
vertexes_to_string = cells_to_string
directededges_to_string = cells_to_string


def cells_base_cell(cell: Column) -> Column:
    return F.shiftrightunsigned(cell, 45).bitwiseAND(F.lit(0x7F)).cast("int")


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-vectorized numpy kernels)
# ---------------------------------------------------------------------------


def _cells_np(s: pd.Series) -> np.ndarray:
    """Nullable int64 Series -> int64 ndarray with -1 for nulls."""
    return s.fillna(-1).to_numpy(dtype=np.int64, na_value=-1)


def _to_cells_series(h: np.ndarray) -> pd.Series:
    # nullable Int64, NOT .mask() on an int64 series: mask() coerces to
    # float64, which silently corrupts cell ids (> 2^53) in any batch that
    # contains a null row.  Round-8: batches with no invalid rows (the
    # overwhelming case on clean inputs) return a plain int64 Series —
    # the nullable IntegerArray's mask handling costs real time in the
    # Arrow write-back of large encode batches, and a -1 can only come
    # from the kernels' invalid-input sentinel, never a valid cell id.
    h = h.astype(np.int64, copy=False)
    mask = h == -1
    if not mask.any():
        return pd.Series(h)
    return pd.Series(pd.arrays.IntegerArray(h, mask=mask))


@pandas_udf(T.LongType())
def coordinates_to_cells(lat: pd.Series, lng: pd.Series, res: pd.Series) -> pd.Series:
    """(lat_deg, lng_deg, res) -> cell (op 28 — THE encode kernel)."""
    from h3ronpy_spark.h3core.latlng import latlng_to_cell

    la = np.radians(lat.to_numpy(dtype=np.float64, na_value=np.nan))
    lo = np.radians(lng.to_numpy(dtype=np.float64, na_value=np.nan))
    rs = res.fillna(-1).to_numpy(dtype=np.int64, na_value=-1)
    return _to_cells_series(latlng_to_cell(la, lo, rs))


@pandas_udf(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType()),
            T.StructField("lng", T.DoubleType()),
        ]
    )
)
def cells_to_coordinates(cell: pd.Series) -> pd.DataFrame:
    """cell -> centroid (degrees) (op 27)."""
    from h3ronpy_spark.h3core.latlng import cell_to_latlng

    lat, lng = cell_to_latlng(_cells_np(cell))
    return pd.DataFrame({"lat": np.degrees(lat), "lng": np.degrees(lng)})


@pandas_udf(T.BooleanType())
def cells_valid(cell: pd.Series) -> pd.Series:
    """Full H3 validity (op 12)."""
    from h3ronpy_spark.h3core.index import is_valid_cell

    return pd.Series(is_valid_cell(_cells_np(cell)) & cell.notna().to_numpy())


@pandas_udf(T.BooleanType())
def cells_is_pentagon(cell: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.index import is_pentagon, is_valid_cell

    h = _cells_np(cell)
    return pd.Series(is_pentagon(h) & is_valid_cell(h))


@pandas_udf(T.ArrayType(T.LongType()))
def change_resolution_list(cell: pd.Series, res: pd.Series) -> pd.Series:
    """Length-preserving resolution change: one list per row (op 2).
    Coarser target -> [parent]; finer -> all children; null -> null."""
    from h3ronpy_spark.h3core import index as IDX

    h = _cells_np(cell)
    r = res.fillna(-1).to_numpy(dtype=np.int64, na_value=-1)
    out: list = [None] * len(h)
    valid = IDX.is_valid_cell(h) & (r >= 0) & (r <= 15)
    cur = IDX.get_resolution(h)
    up = valid & (r <= cur)
    if up.any():
        pars = IDX.cell_to_parent(h[up], r[up])
        for i, p in zip(np.nonzero(up)[0], pars):
            out[i] = [int(p)]
    down = valid & (r > cur)
    if down.any():
        rows, kids = IDX.cell_to_children_flat(h[down], r[down])
        order = np.argsort(rows, kind="stable")
        rows, kids = rows[order], kids[order]
        d_idx = np.nonzero(down)[0]
        groups = np.split(kids, np.searchsorted(rows, np.arange(1, down.sum())))
        for gi, cells in enumerate(groups):
            out[d_idx[gi]] = cells.tolist()
    return pd.Series(out)


@pandas_udf(T.ArrayType(T.LongType()))
def uncompact_list(cell: pd.Series, res: pd.Series) -> pd.Series:
    """uncompact (op 11): children at target res; finer-than-target -> []."""
    from h3ronpy_spark.h3core import index as IDX

    h = _cells_np(cell)
    r = res.fillna(-1).to_numpy(dtype=np.int64, na_value=-1)
    out: list = [[]] * len(h)
    valid = IDX.is_valid_cell(h) & (r >= 0) & (r <= 15) & (
        IDX.get_resolution(h) <= r
    )
    if valid.any():
        rows, kids = IDX.cell_to_children_flat(h[valid], r[valid])
        order = np.argsort(rows, kind="stable")
        rows, kids = rows[order], kids[order]
        v_idx = np.nonzero(valid)[0]
        groups = np.split(kids, np.searchsorted(rows, np.arange(1, valid.sum())))
        for gi, cells in enumerate(groups):
            out[v_idx[gi]] = cells.tolist()
    return pd.Series([list(x) for x in out])


@pandas_udf(T.ArrayType(T.LongType()))
def grid_disk(cell: pd.Series, k: pd.Series) -> pd.Series:
    """grid_disk (op 23): all cells within grid distance k, as a list."""
    from h3ronpy_spark.h3core.grid import grid_disk_distances
    from h3ronpy_spark.h3core.index import is_valid_cell

    h = _cells_np(cell)
    kk = int(k.iloc[0]) if len(k) else 0
    valid = is_valid_cell(h)
    out: list = [None] * len(h)
    if valid.any():
        rows, cells, _ = grid_disk_distances(h[valid], kk)
        v_idx = np.nonzero(valid)[0]
        order = np.argsort(rows, kind="stable")
        rows, cells = rows[order], cells[order]
        groups = np.split(cells, np.searchsorted(rows, np.arange(1, valid.sum())))
        for gi, cs in enumerate(groups):
            out[v_idx[gi]] = cs.tolist()
    return pd.Series(out)


@pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("cell", T.LongType()),
                T.StructField("k", T.IntegerType()),
            ]
        )
    )
)
def grid_disk_distances(cell: pd.Series, k: pd.Series) -> pd.Series:
    """grid_disk_distances (op 24): disk + per-cell grid distance."""
    from h3ronpy_spark.h3core.grid import grid_disk_distances as gdd
    from h3ronpy_spark.h3core.index import is_valid_cell

    h = _cells_np(cell)
    kk = int(k.iloc[0]) if len(k) else 0
    valid = is_valid_cell(h)
    out: list = [None] * len(h)
    if valid.any():
        rows, cells, dist = gdd(h[valid], kk)
        v_idx = np.nonzero(valid)[0]
        order = np.argsort(rows, kind="stable")
        rows, cells, dist = rows[order], cells[order], dist[order]
        bounds = np.searchsorted(rows, np.arange(1, valid.sum()))
        cg = np.split(cells, bounds)
        dg = np.split(dist, bounds)
        for gi in range(len(cg)):
            out[v_idx[gi]] = [
                {"cell": int(c), "k": int(d)} for c, d in zip(cg[gi], dg[gi])
            ]
    return pd.Series(out)


@pandas_udf(T.DoubleType())
def cells_area_km2(cell: pd.Series) -> pd.Series:
    """Exact spherical area (op 15)."""
    from h3ronpy_spark.h3core.boundary import cell_area_km2 as area

    a = area(_cells_np(cell))
    return pd.Series(a).mask(~cell.notna().to_numpy())


@pandas_udf(T.DoubleType())
def cells_area_m2(cell: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.boundary import cell_area_m2 as area

    a = area(_cells_np(cell))
    return pd.Series(a).mask(~cell.notna().to_numpy())


@pandas_udf(T.DoubleType())
def cells_area_rads2(cell: pd.Series) -> pd.Series:
    """Exact spherical area in steradians (op 15, rads2 variant)."""
    from h3ronpy_spark.h3core.boundary import cell_area_rads2 as area

    a = area(_cells_np(cell))
    return pd.Series(a).mask(~cell.notna().to_numpy())


@pandas_udf(
    T.StructType(
        [
            T.StructField("minx", T.DoubleType()),
            T.StructField("miny", T.DoubleType()),
            T.StructField("maxx", T.DoubleType()),
            T.StructField("maxy", T.DoubleType()),
        ]
    )
)
def cells_bounds_arrays(cell: pd.Series) -> pd.DataFrame:
    """Per-cell bbox in degrees (op 30)."""
    from h3ronpy_spark.h3core.boundary import cells_bounds_arrays as cba

    b = cba(_cells_np(cell))
    return pd.DataFrame(
        {"minx": b[:, 0], "miny": b[:, 1], "maxx": b[:, 2], "maxy": b[:, 3]}
    )


@pandas_udf(T.BinaryType())
def cells_to_wkb_polygons(cell: pd.Series) -> pd.Series:
    """Hexagon polygon WKB per cell (op 31)."""
    from h3ronpy_spark.h3core.boundary import cell_boundary
    from h3ronpy_spark.h3core.wkb import write_polygons

    lats, lngs, counts = cell_boundary(_cells_np(cell))
    return pd.Series(
        write_polygons(np.degrees(lats), np.degrees(lngs), counts)
    )


@pandas_udf(T.BinaryType())
def cells_to_wkb_points(cell: pd.Series) -> pd.Series:
    """Centroid WKB point per cell (op 32)."""
    from h3ronpy_spark.h3core.latlng import cell_to_latlng
    from h3ronpy_spark.h3core.wkb import write_points

    lat, lng = cell_to_latlng(_cells_np(cell))
    return pd.Series(write_points(np.degrees(lng), np.degrees(lat)))


@pandas_udf(T.LongType())
def cells_parse(s: pd.Series) -> pd.Series:
    """Parse hex / decimal / "x, y, res" strings (op 5), nulling failures
    (set_failing_to_invalid semantics; the raising variant is driver-side)."""
    from h3ronpy_spark.h3core.strings import cells_parse as parse

    h = parse(s.tolist(), set_failing_to_invalid=True)
    return _to_cells_series(h)


@pandas_udf(T.ArrayType(T.LongType()))
def wkb_to_cells(wkb: pd.Series, res: pd.Series, mode: pd.Series) -> pd.Series:
    """Polyfill (op 35): WKB geometry -> covering cells at res."""
    from h3ronpy_spark.h3core.polyfill import wkb_to_cells as pf

    rr = res.fillna(-1).astype(np.int64)
    out = []
    for buf, r, m in zip(wkb, rr, mode):
        if buf is None or r < 0:
            out.append(None)
        else:
            out.append(pf(bytes(buf), int(r), str(m)).tolist())
    return pd.Series(out)


@pandas_udf(T.ArrayType(T.LongType()))
def wkb_to_cells_compact(wkb: pd.Series, res: pd.Series, mode: pd.Series) -> pd.Series:
    """Hierarchical polyfill -> mixed-resolution compact coverage (op 35
    with compact=True).  Cost scales with polygon perimeter, not area —
    the variant the PIP join planner uses at scale."""
    from h3ronpy_spark.h3core.polyfill import wkb_to_cells as pf

    rr = res.fillna(-1).astype(np.int64)
    out = []
    for buf, r, m in zip(wkb, rr, mode):
        if buf is None or r < 0:
            out.append(None)
        else:
            out.append(pf(bytes(buf), int(r), str(m), compact=True).tolist())
    return pd.Series(out)


@pandas_udf(
    T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("anchor", T.LongType()),
        ]
    )
)
def cells_to_localij(cell: pd.Series, anchor: pd.Series) -> pd.DataFrame:
    """Anchor-relative IJ coordinates (op 13)."""
    from h3ronpy_spark.h3core.localij import FAIL, cells_to_localij as clij

    h = _cells_np(cell)
    a = _cells_np(anchor)
    i, j = clij(a, h)
    i_s = pd.Series(i).mask(i == FAIL).astype("Int32")
    j_s = pd.Series(j).mask(j == FAIL).astype("Int32")
    return pd.DataFrame({"i": i_s, "j": j_s, "anchor": pd.Series(a)})


@pandas_udf(T.LongType())
def localij_to_cells(anchor: pd.Series, i: pd.Series, j: pd.Series) -> pd.Series:
    """Inverse of cells_to_localij (op 14)."""
    from h3ronpy_spark.h3core.localij import FAIL, localij_to_cells as lij

    a = _cells_np(anchor)
    ii = i.fillna(FAIL).to_numpy(dtype=np.int64)
    jj = j.fillna(FAIL).to_numpy(dtype=np.int64)
    return _to_cells_series(lij(a, ii, jj))


_SQL_FUNCS = {
    "h3_coordinates_to_cells": coordinates_to_cells,
    "h3_cells_to_coordinates": cells_to_coordinates,
    "h3_cells_valid": cells_valid,
    "h3_is_pentagon": cells_is_pentagon,
    "h3_change_resolution_list": change_resolution_list,
    "h3_uncompact": uncompact_list,
    "h3_grid_disk": grid_disk,
    "h3_grid_disk_distances": grid_disk_distances,
    "h3_cells_area_km2": cells_area_km2,
    "h3_cells_area_m2": cells_area_m2,
    "h3_cells_bounds": cells_bounds_arrays,
    "h3_cells_to_wkb_polygons": cells_to_wkb_polygons,
    "h3_cells_to_wkb_points": cells_to_wkb_points,
    "h3_cells_parse": cells_parse,
    "h3_wkb_to_cells": wkb_to_cells,
    "h3_wkb_to_cells_compact": wkb_to_cells_compact,
    "h3_cells_to_localij": cells_to_localij,
    "h3_localij_to_cells": localij_to_cells,
}


def register_sql_functions(spark: SparkSession) -> None:
    """Register every kernel for SQL, e.g.
    ``SELECT h3_coordinates_to_cells(lat, lng, 9) FROM t``."""
    for name, fn in _SQL_FUNCS.items():
        spark.udf.register(name, fn)


# ---------------------------------------------------------------------------
# directed-edge / vertex functions (SURVEY.md §2 ops 6-7, 9, 16, 20-21, 33-34)
# ---------------------------------------------------------------------------


@pandas_udf(T.ArrayType(T.LongType()))
def cells_to_edges(cell: pd.Series) -> pd.Series:
    """All directed edges originating at each cell."""
    from h3ronpy_spark.h3core.edges import cells_to_edges as c2e
    from h3ronpy_spark.h3core.index import is_valid_cell

    h = _cells_np(cell)
    valid = is_valid_cell(h)
    out: list = [None] * len(h)
    if valid.any():
        rows, eds = c2e(h[valid])
        v_idx = np.nonzero(valid)[0]
        order = np.argsort(rows, kind="stable")
        rows, eds = rows[order], eds[order]
        groups = np.split(eds, np.searchsorted(rows, np.arange(1, valid.sum())))
        for gi, es in enumerate(groups):
            out[v_idx[gi]] = es.tolist()
    return pd.Series(out)


@pandas_udf(T.LongType())
def edges_origin(edge: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import edge_origin, edges_valid

    e = _cells_np(edge)
    out = edge_origin(e)
    return _to_cells_series(np.where(edges_valid(e), out, -1))


@pandas_udf(T.LongType())
def edges_destination(edge: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import edge_destination, edges_valid

    e = _cells_np(edge)
    out = np.where(edges_valid(e), edge_destination(e), -1)
    return _to_cells_series(out)


@pandas_udf(T.BooleanType())
def directededges_valid(edge: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import edges_valid

    return pd.Series(edges_valid(_cells_np(edge)) & edge.notna().to_numpy())


@pandas_udf(T.DoubleType())
def edges_length_km(edge: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import edge_length_km

    out = edge_length_km(_cells_np(edge))
    return pd.Series(out).mask(~edge.notna().to_numpy())


@pandas_udf(T.DoubleType())
def edges_length_rads(edge: pd.Series) -> pd.Series:
    """Edge length in radians of arc (reference directededge.rs:17-33)."""
    from h3ronpy_spark.h3core.edges import edge_length_rads

    out = edge_length_rads(_cells_np(edge))
    return pd.Series(out).mask(~edge.notna().to_numpy())


def edges_length_m(edge: Column) -> Column:
    """Edge length in meters (km x 1000, reference directededge.rs:24)."""
    return edges_length_km(edge) * F.lit(1000.0)


@pandas_udf(T.BinaryType())
def directededges_to_wkb_linestrings(edge: pd.Series) -> pd.Series:
    """Edge -> 2-point WKB linestring along the shared cell boundary."""
    from h3ronpy_spark.h3core.edges import edge_boundary
    from h3ronpy_spark.h3core.wkb import write_linestrings

    lats, lngs = edge_boundary(_cells_np(edge))
    coords = []
    for i in range(len(edge)):
        if np.isfinite(lats[i]).all():
            coords.append(
                np.stack(
                    [np.degrees(lngs[i]), np.degrees(lats[i])], axis=-1
                )
            )
        else:
            coords.append(None)
    return pd.Series(write_linestrings(coords))


@pandas_udf(T.ArrayType(T.LongType()))
def cells_to_vertexes(cell: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import cells_to_vertexes as c2v
    from h3ronpy_spark.h3core.index import is_valid_cell

    h = _cells_np(cell)
    valid = is_valid_cell(h)
    out: list = [None] * len(h)
    if valid.any():
        rows, vs = c2v(h[valid])
        v_idx = np.nonzero(valid)[0]
        order = np.argsort(rows, kind="stable")
        rows, vs = rows[order], vs[order]
        groups = np.split(vs, np.searchsorted(rows, np.arange(1, valid.sum())))
        for gi, g in enumerate(groups):
            out[v_idx[gi]] = g.tolist()
    return pd.Series(out)


@pandas_udf(T.LongType())
def vertexes_owner(vertex: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import vertex_owner, vertexes_valid

    v = _cells_np(vertex)
    return _to_cells_series(np.where(vertexes_valid(v), vertex_owner(v), -1))


@pandas_udf(T.BooleanType())
def vertexes_valid(vertex: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import vertexes_valid as vv

    return pd.Series(vv(_cells_np(vertex)) & vertex.notna().to_numpy())


@pandas_udf(T.BinaryType())
def vertexes_to_wkb_points(vertex: pd.Series) -> pd.Series:
    from h3ronpy_spark.h3core.edges import vertexes_to_latlng
    from h3ronpy_spark.h3core.wkb import write_points

    lat, lng = vertexes_to_latlng(_cells_np(vertex))
    return pd.Series(write_points(np.degrees(lng), np.degrees(lat)))


@pandas_udf(T.LongType())
def vertexes_parse(s: pd.Series) -> pd.Series:
    """Parse vertex indexes from hex/decimal strings (op 6), nulling
    failures."""
    from h3ronpy_spark.h3core.edges import vertexes_valid as vv

    out = np.full(len(s), -1, dtype=np.int64)
    for i, x in enumerate(s):
        if x is None:
            continue
        try:
            v = int(str(x).strip(), 16)
        except ValueError:
            try:
                v = int(str(x).strip(), 10)
            except ValueError:
                continue
        if 0 <= v < (1 << 63):
            out[i] = v
    out = np.where(vv(out), out, -1)
    return _to_cells_series(out)


@pandas_udf(T.LongType())
def directededges_parse(s: pd.Series) -> pd.Series:
    """Parse directed-edge indexes from hex/decimal strings (op 7)."""
    from h3ronpy_spark.h3core.edges import edges_valid as ev

    out = np.full(len(s), -1, dtype=np.int64)
    for i, x in enumerate(s):
        if x is None:
            continue
        try:
            v = int(str(x).strip(), 16)
        except ValueError:
            try:
                v = int(str(x).strip(), 10)
            except ValueError:
                continue
        if 0 <= v < (1 << 63):
            out[i] = v
    out = np.where(ev(out), out, -1)
    return _to_cells_series(out)


_SQL_FUNCS.update(
    {
        "h3_cells_to_edges": cells_to_edges,
        "h3_edges_origin": edges_origin,
        "h3_edges_destination": edges_destination,
        "h3_directededges_valid": directededges_valid,
        "h3_edges_length_km": edges_length_km,
        "h3_edges_to_wkb_linestrings": directededges_to_wkb_linestrings,
        "h3_cells_to_vertexes": cells_to_vertexes,
        "h3_vertexes_owner": vertexes_owner,
        "h3_vertexes_valid": vertexes_valid,
        "h3_vertexes_to_wkb_points": vertexes_to_wkb_points,
        "h3_vertexes_parse": vertexes_parse,
        "h3_directededges_parse": directededges_parse,
    }
)


# ---------------------------------------------------------------------------
# composite Column helpers (ops 1, 3, 25, 29, 42-44 — thin combinations)
# ---------------------------------------------------------------------------


def change_resolution(df, cell_col: str, resolution: int):
    """Op 1: resolution change with explode semantics (output length !=
    input length; invalid/null omitted).  Returns a DataFrame."""
    lst = change_resolution_list(F.col(cell_col), F.lit(resolution))
    return (
        df.withColumn("__cr", lst)
        .withColumn(cell_col, F.explode("__cr"))
        .drop("__cr")
    )


def change_resolution_paired(df, cell_col: str, resolution: int):
    """Op 3: (cell_before, cell_after) pair table for cross-resolution
    joins — explode keeps the 'before' column, so the pairing is free
    (reference builds it manually: h3ronpy/src/op/resolution.rs:48-81)."""
    lst = change_resolution_list(F.col(cell_col), F.lit(resolution))
    return df.select(
        F.col(cell_col).alias("cell_before"),
        F.explode(lst).alias("cell_after"),
    )


def grid_ring_distances(cell: Column, k_min: int, k_max: int) -> Column:
    """Op 25: annulus k_min <= k <= k_max, as filter over the disk.
    Raises on an inverted/empty range like the reference
    (h3ronpy/src/op/neighbor.rs:62-64)."""
    if k_min >= k_max:
        raise ValueError("k_min must be less than k_max")
    disk = grid_disk_distances(cell, F.lit(k_max))
    return F.filter(disk, lambda s: s["k"] >= F.lit(k_min))


def cells_bounds(df, cell_col: str = "cell"):
    """Op 29: bbox of the whole cell column -> 1-row DataFrame
    (minx, miny, maxx, maxy) — a native aggregation over per-cell bounds."""
    b = cells_bounds_arrays(F.col(cell_col))
    return df.select(b.alias("b")).agg(
        F.min("b.minx").alias("minx"),
        F.min("b.miny").alias("miny"),
        F.max("b.maxx").alias("maxx"),
        F.max("b.maxy").alias("maxy"),
    )


def cells_dataframe_to_wkb(df, cell_col: str = "cell",
                           geom_col: str = "geometry"):
    """Op 44: attach hexagon polygon WKB geometry column (carrying the
    geoarrow.wkb extension tag, matching the reference's extension field
    on WKB outputs — h3ronpy/src/vector.rs:282-283).  An existing column
    named `geom_col` is replaced, not duplicated (ADVICE r04)."""
    base = df.drop(geom_col) if geom_col in df.columns else df
    return base.select(
        "*", as_geoarrow_wkb(cells_to_wkb_polygons(F.col(cell_col)), geom_col)
    )


# ---------------------------------------------------------------------------
# geoarrow interop (round-4, VERDICT r03 item 6).  The reference attaches a
# geoarrow extension field to every WKB array it emits
# (h3ronpy/src/vector.rs:282-283 via h3arrow's WKBArray); Spark itself has
# no Arrow extension types, so the tag travels as Spark column METADATA
# (visible in df.schema) and is re-attached as real Arrow field metadata by
# to_geoarrow_table() at the Arrow boundary — which is exactly where
# downstream geoarrow readers (geopandas/lonboard/geoarrow-rs) look for it.
# ---------------------------------------------------------------------------

GEOARROW_EXTENSION_KEY = "ARROW:extension:name"
GEOARROW_WKB = "geoarrow.wkb"


def as_geoarrow_wkb(col: Column, name: str) -> Column:
    """Alias a WKB-producing column with the geoarrow.wkb extension tag in
    its Spark column metadata."""
    return col.alias(name, metadata={GEOARROW_EXTENSION_KEY: GEOARROW_WKB})


def to_geoarrow_table(df):
    """df.toArrow() with any ARROW:extension:* tags from the Spark schema
    re-attached as Arrow field metadata (Spark's Arrow conversion drops
    column metadata, so the tag is restored here at the boundary)."""
    import pyarrow as pa

    tbl = df.toArrow()
    fields = []
    for sf in df.schema.fields:
        f = tbl.schema.field(sf.name)
        ext = {
            k: v
            for k, v in (sf.metadata or {}).items()
            if k.startswith("ARROW:extension:")
        }
        if ext:
            md = dict(f.metadata or {})
            md.update(
                {k.encode(): str(v).encode() for k, v in ext.items()}
            )
            f = f.with_metadata(md)
        fields.append(f)
    return pa.Table.from_arrays(tbl.columns, schema=pa.schema(fields))
