"""Round-8: rasters_to_cells_batch restructure (axial dedupe before the
digit unwind + constant-face outer-product projection) must be
BYTE-IDENTICAL — rows and order — to the round-7 full-encode algorithm,
which is reconstructed here verbatim as the reference."""

from __future__ import annotations

import numpy as np
import pytest

from h3ronpy_spark.h3core.latlng import latlng_to_cell
from h3ronpy_spark.h3core.rasterh3 import (
    check_wgs84_bounds,
    rasters_to_cells_batch,
)


def _reference_round7(bands, transforms, h3_res, nodata_value=0):
    """The round-7 implementation, verbatim (sample grid -> full encode
    -> (img, cell) dedupe -> decode -> affine inverse -> gather)."""
    from h3ronpy_spark.h3core.latlng import cell_to_latlng

    n = len(bands)
    if n == 0:
        return (np.array([], np.int64),) * 3
    deg_cell = 24.0 / (7.0 ** (h3_res / 2.0))
    tf = np.asarray(transforms, dtype=np.float64)
    a, b, c = tf[:, 0], tf[:, 1], tf[:, 2]
    d, e, f = tf[:, 3], tf[:, 4], tf[:, 5]
    ws = np.array([bb.shape[1] for bb in bands], dtype=np.int64)
    hs = np.array([bb.shape[0] for bb in bands], dtype=np.int64)
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
    cells = latlng_to_cell(np.radians(lat_all), np.radians(lng_all), h3_res)
    ok = cells != -1
    cells, img_all = cells[ok], img_all[ok]
    order = np.lexsort((cells, img_all))
    cells, img_all = cells[order], img_all[order]
    keep = np.ones(cells.shape, dtype=bool)
    keep[1:] = (cells[1:] != cells[:-1]) | (img_all[1:] != img_all[:-1])
    cells, img_all = cells[keep], img_all[keep]
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


def _synth_batch(n, seed, res_px=0.001):
    from h3ronpy_spark.sources.images import (
        gen_images_pdf,
        georef_of_phash,
    )

    pdf = gen_images_pdf(np.arange(n, dtype=np.int64) + seed * 1000)
    lat, lng = georef_of_phash(pdf["phash"].to_numpy(np.int64))
    bands = [
        np.frombuffer(b, np.uint8).reshape(h, w)
        for b, w, h in zip(pdf["bytes"], pdf["w"], pdf["h"])
    ]
    tfs = np.zeros((n, 6))
    tfs[:, 0] = res_px
    tfs[:, 2] = lng
    tfs[:, 4] = -res_px
    tfs[:, 5] = lat
    return bands, tfs


@pytest.mark.parametrize("res,n", [(7, 1000), (9, 1000), (11, 150)])
def test_v2_identical_synth_corpus(res, n):
    # (a 3000-image sweep at res 7/9/11 was run once during the round-8
    # optimization and was also byte-identical; trimmed for CI time)
    bands, tfs = _synth_batch(n, seed=res)
    ref = _reference_round7(bands, tfs, res, 0)
    new = rasters_to_cells_batch(bands, tfs, res, 0)
    for r, n_ in zip(ref, new):
        assert np.array_equal(r, n_)
    assert new[2].size > 0


def test_v2_identical_face_straddling():
    """Images planted near icosahedron face boundaries (corner-face
    mismatch -> fallback path) and spanning both hemispheres."""
    rng = np.random.default_rng(7)
    n = 400
    bands = []
    tfs = np.zeros((n, 6))
    for i in range(n):
        h, w = int(rng.integers(16, 65)), int(rng.integers(16, 65))
        band = rng.integers(0, 256, (h, w)).astype(np.uint8)
        band[0, :] = 0
        bands.append(band)
        tfs[i, 0] = 0.02  # big pixels: many images straddle faces
        tfs[i, 2] = rng.uniform(-179, 178)
        tfs[i, 4] = -0.02
        tfs[i, 5] = rng.uniform(-84, 85)
    ref = _reference_round7(bands, tfs, 6, 0)
    new = rasters_to_cells_batch(bands, tfs, 6, 0)
    for r, n_ in zip(ref, new):
        assert np.array_equal(r, n_)
    assert new[2].size > 0


def test_v2_identical_rotated_transform():
    """b/d != 0 geotransforms are not lat/lng-separable: must hit the
    fallback and stay identical."""
    rng = np.random.default_rng(11)
    bands = []
    tfs = np.zeros((50, 6))
    for i in range(50):
        h, w = 30, 40
        bands.append(rng.integers(1, 256, (h, w)).astype(np.uint8))
        tfs[i] = (0.001, 0.0002, rng.uniform(-170, 170),
                  0.0001, -0.001, rng.uniform(-80, 80))
    ref = _reference_round7(bands, tfs, 9, 0)
    new = rasters_to_cells_batch(bands, tfs, 9, 0)
    for r, n_ in zip(ref, new):
        assert np.array_equal(r, n_)
    assert new[2].size > 0


def test_v2_identical_nan_nodata_f64():
    from h3ronpy_spark.sources.images import (
        gen_images_typed_pdf,
        georef_of_phash,
    )

    pdf = gen_images_typed_pdf(np.arange(200, dtype=np.int64), "raw_f64",
                               seed=11)
    lat, lng = georef_of_phash(pdf["phash"].to_numpy(np.int64))
    bands = [
        np.frombuffer(b, np.float64).reshape(h, w)
        for b, w, h in zip(pdf["bytes"], pdf["w"], pdf["h"])
    ]
    tfs = np.zeros((200, 6))
    tfs[:, 0] = 0.001
    tfs[:, 2] = lng
    tfs[:, 4] = -0.001
    tfs[:, 5] = lat
    ref = _reference_round7(bands, tfs, 9, float("nan"))
    new = rasters_to_cells_batch(bands, tfs, 9, float("nan"))
    for r, n_ in zip(ref, new):
        assert np.array_equal(r, n_)
    assert new[2].size > 0
