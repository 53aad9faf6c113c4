"""Raster <-> H3 conversion kernels.

Reproduces h3ronpy's raster surface (SURVEY.md §2.7 ops 38-40; reference
h3ronpy/python/h3ronpy/raster.py:63-213, h3ronpy/src/raster.rs):

  * nearest_h3_resolution: resolution whose cell area best matches the
    pixel area ("min_diff") or the finest with cells >= pixel
    ("smaller_than_pixel")
  * raster_to_cells: for every H3 cell whose centroid lands in a
    non-nodata pixel, emit (value, cell)
  * cells_to_raster: inverse — paint each output pixel with the value of
    the cell containing the pixel's center (same center-point semantics
    the reference gets from rasterio's polygon burn)

Transforms are 6-coefficient GDAL geotransforms (a, b, c, d, e, f):
  lng = a * col + b * row + c ; lat = d * col + e * row + f
with WGS84 coordinates enforced by a bounds sanity check (reference
h3ronpy/src/raster.rs:45-67).
"""

from __future__ import annotations

import numpy as np

from .boundary import cell_area_km2
from .constants import EARTH_RADIUS_KM
from .latlng import cell_to_latlng, latlng_to_cell

# average cell area (km^2) per res: sphere area / cell count
_NCELLS = 2 + 120 * 7 ** np.arange(0, 16, dtype=np.float64)
AVG_CELL_AREA_KM2 = 4.0 * np.pi * EARTH_RADIUS_KM**2 / _NCELLS


def check_wgs84_bounds(transform, w: int, h: int) -> None:
    a, b, c, d, e, f = transform
    xs = [c, a * w + b * h + c]
    ys = [f, d * w + e * h + f]
    if abs(xs[1] - xs[0]) > 361.0 or abs(ys[1] - ys[0]) > 181.0:
        raise ValueError(
            "raster bounds exceed WGS84 coordinate range - coordinates "
            "must be in degrees"
        )


def nearest_h3_resolution(
    shape: tuple[int, int],
    transform,
    axis_order: str = "yx",
    search_mode: str = "min_diff",
) -> int:
    """Resolution whose cells best match the raster's pixel size."""
    if axis_order.lower() == "yx":
        h, w = shape
    else:
        w, h = shape
    check_wgs84_bounds(transform, w, h)
    a, b, c, d, e, f = transform
    # pixel area in km^2 at the raster center (cos-lat corrected)
    lat_c = d * (w / 2) + e * (h / 2) + f
    deg_km = 2.0 * np.pi * EARTH_RADIUS_KM / 360.0
    px_w = abs(a) * deg_km * np.cos(np.radians(lat_c))
    px_h = abs(e) * deg_km
    px_area = px_w * px_h
    if px_area <= 0:
        raise ValueError("degenerate transform")
    if search_mode == "min_diff":
        return int(np.argmin(np.abs(AVG_CELL_AREA_KM2 - px_area)))
    if search_mode == "smaller_than_pixel":
        ok = np.nonzero(AVG_CELL_AREA_KM2 <= px_area)[0]
        return int(ok[0]) if ok.size else 15
    raise ValueError(f"unknown search_mode {search_mode!r}")


def raster_to_cells(
    band: np.ndarray,
    transform,
    h3_res: int,
    nodata_value=None,
    axis_order: str = "yx",
) -> tuple[np.ndarray, np.ndarray]:
    """2-D array -> (values, cells): one row per H3 cell whose centroid
    falls in a non-nodata pixel."""
    band = np.asarray(band)
    if axis_order.lower() == "xy":
        band = band.T
    h, w = band.shape
    check_wgs84_bounds(transform, w, h)
    a, b, c, d, e, f = (float(t) for t in transform)

    # candidate cells: dense sample grid at ~1/3 cell spacing over the
    # raster extent (every cell whose centroid is inside gets sampled;
    # no neighbor-dilation pass), then exact centroid -> pixel test
    deg_cell = 24.0 / (7.0 ** (h3_res / 2.0))  # ~cell spacing in degrees
    px_deg = min(abs(a), abs(e)) or 1e-12
    step_px = deg_cell / px_deg * 0.38  # may be < 1 px when cells are finer than pixels
    cols = np.arange(0, w + step_px, step_px, dtype=np.float64)
    rows = np.arange(0, h + step_px, step_px, dtype=np.float64)
    cc, rr = np.meshgrid(cols, rows)
    lng = a * cc + b * rr + c
    lat = d * cc + e * rr + f
    cand = latlng_to_cell(np.radians(lat.ravel()), np.radians(lng.ravel()), h3_res)
    cand = np.unique(cand[cand != -1])

    clat, clng = cell_to_latlng(cand)
    clatd, clngd = np.degrees(clat), np.degrees(clng)
    # invert the affine: col = (e*(x-c) - b*(y-f)) / (a*e - b*d)
    det = a * e - b * d
    col = (e * (clngd - c) - b * (clatd - f)) / det
    row = (a * (clatd - f) - d * (clngd - c)) / det
    ci = np.floor(col).astype(np.int64)
    ri = np.floor(row).astype(np.int64)
    inb = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
    cand, ci, ri = cand[inb], ci[inb], ri[inb]
    vals = band[ri, ci]
    if nodata_value is not None:
        if isinstance(nodata_value, float) and np.isnan(nodata_value):
            keep = ~np.isnan(vals)
        else:
            keep = vals != nodata_value
        cand, vals = cand[keep], vals[keep]
    return vals, cand


def rasters_to_cells_batch(
    bands: list[np.ndarray],
    transforms: np.ndarray,
    h3_res: int,
    nodata_value=0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched raster_to_cells: one vectorized encode/decode across ALL
    rasters in the batch.

    bands: list of (h_i, w_i) arrays (same dtype); transforms: (N, 6) GDAL
    coefficients.  Returns (img_idx, values, cells) flat arrays.  This is
    the hot path of the tiling operator — per-image Python overhead is two
    tiny loops; all H3 math happens in three whole-batch kernels."""
    n = len(bands)
    if n == 0:
        return (np.array([], np.int64),) * 3
    deg_cell = 24.0 / (7.0 ** (h3_res / 2.0))
    tf = np.asarray(transforms, dtype=np.float64)
    a, b, c = tf[:, 0], tf[:, 1], tf[:, 2]
    d, e, f = tf[:, 3], tf[:, 4], tf[:, 5]
    ws = np.array([bb.shape[1] for bb in bands], dtype=np.int64)
    hs = np.array([bb.shape[0] for bb in bands], dtype=np.int64)

    # --- per-image sample grids, concatenated
    samp_lat, samp_lng, samp_img = [], [], []
    for i in range(n):
        check_wgs84_bounds(tf[i], int(ws[i]), int(hs[i]))
        px_deg = min(abs(a[i]), abs(e[i])) or 1e-12
        step = deg_cell / px_deg * 0.38
        cols = np.arange(0, ws[i] + step, step)
        rows = np.arange(0, hs[i] + step, step)
        cc, rr = np.meshgrid(cols, rows)
        samp_lng.append(a[i] * cc.ravel() + b[i] * rr.ravel() + c[i])
        samp_lat.append(d[i] * cc.ravel() + e[i] * rr.ravel() + f[i])
        samp_img.append(np.full(cc.size, i, dtype=np.int64))
    lat_all = np.concatenate(samp_lat)
    lng_all = np.concatenate(samp_lng)
    img_all = np.concatenate(samp_img)

    # --- one whole-batch encode, then (img, cell) dedupe via sort
    cells = latlng_to_cell(np.radians(lat_all), np.radians(lng_all), h3_res)
    ok = cells != -1
    cells, img_all = cells[ok], img_all[ok]
    order = np.lexsort((cells, img_all))
    cells, img_all = cells[order], img_all[order]
    keep = np.ones(cells.shape, dtype=bool)
    keep[1:] = (cells[1:] != cells[:-1]) | (img_all[1:] != img_all[:-1])
    cells, img_all = cells[keep], img_all[keep]

    # --- one whole-batch decode + per-image affine inverse (gathered)
    clat, clng = cell_to_latlng(cells)
    clatd, clngd = np.degrees(clat), np.degrees(clng)
    ai, bi, ci = a[img_all], b[img_all], c[img_all]
    di, ei, fi = d[img_all], e[img_all], f[img_all]
    det = ai * ei - bi * di
    col = (ei * (clngd - ci) - bi * (clatd - fi)) / det
    row = (ai * (clatd - fi) - di * (clngd - ci)) / det
    ci_ = np.floor(col).astype(np.int64)
    ri_ = np.floor(row).astype(np.int64)
    inb = (ci_ >= 0) & (ci_ < ws[img_all]) & (ri_ >= 0) & (ri_ < hs[img_all])
    cells, img_all, ci_, ri_ = cells[inb], img_all[inb], ci_[inb], ri_[inb]

    # --- flattened value gather across all bands
    offsets = np.concatenate([[0], np.cumsum(ws * hs)[:-1]])
    flat = np.concatenate([bb.ravel() for bb in bands])
    vals = flat[offsets[img_all] + ri_ * ws[img_all] + ci_]
    if nodata_value is not None:
        if isinstance(nodata_value, float) and np.isnan(nodata_value):
            m = ~np.isnan(vals)
        else:
            m = vals != nodata_value
        cells, img_all, vals = cells[m], img_all[m], vals[m]
    return img_all, vals, cells


def cells_to_raster(
    cells: np.ndarray,
    values: np.ndarray,
    size: tuple[int, int],
    transform,
    nodata_value=0,
) -> np.ndarray:
    """Inverse: paint each pixel with the value of the cell containing its
    center; mixed input resolutions resolved finest-first."""
    from . import index as IDX

    cells = np.asarray(cells, dtype=np.int64)
    values = np.asarray(values)
    w, h = size
    a, b, c, d, e, f = (float(t) for t in transform)
    cc, rr = np.meshgrid(
        np.arange(w, dtype=np.float64) + 0.5, np.arange(h, dtype=np.float64) + 0.5
    )
    lng = a * cc + b * rr + c
    lat = d * cc + e * rr + f
    out = np.full((h, w), nodata_value, dtype=values.dtype)
    filled = np.zeros((h, w), dtype=bool)
    res_all = IDX.get_resolution(cells)
    for rv in sorted(np.unique(res_all).tolist(), reverse=True):
        m = res_all == rv
        sub_cells = cells[m]
        sub_vals = values[m]
        order = np.argsort(sub_cells)
        sub_cells, sub_vals = sub_cells[order], sub_vals[order]
        px = latlng_to_cell(
            np.radians(lat.ravel()), np.radians(lng.ravel()), int(rv)
        ).reshape(h, w)
        pos = np.searchsorted(sub_cells, px)
        pos = np.clip(pos, 0, sub_cells.size - 1)
        hit = (sub_cells[pos] == px) & ~filled
        out[hit] = sub_vals[pos[hit]]
        filled |= hit
    return out
