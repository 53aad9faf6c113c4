"""Anchor-relative local IJ coordinates.

Reproduces h3ronpy's `cells_to_localij` / `localij_to_cells` (SURVEY.md
§2.2 ops 13-14) for the same-base-cell case: local IJK is the pure-lattice
digit unwind of the cell within its base cell's coordinate system, and
IJ = (i - k, j - k) — exactly the axial coordinates.

Cross-base-cell pairs require the base-cell neighbor rotation tables; they
currently yield null (i = j = INT32_MIN sentinel -> None in the Spark
layer), mirroring the reference's set_failing_to_invalid behavior for
unsupported pairs.  Golden parity: anchor 85283473fffffff with cell
8528342bfffffff -> (i=25, j=13) (h3ronpy/tests/arrow/test_localij.py:17-25).
"""

from __future__ import annotations

import numpy as np

from . import index as IDX
from .latlng import _DIGIT_AXIAL, _down7_axial, _up7_axial

FAIL = np.int64(np.iinfo(np.int32).min)


def cells_to_localij(anchor, cells) -> tuple[np.ndarray, np.ndarray]:
    """-> (i, j) int64 arrays; FAIL sentinel where unsupported/invalid."""
    anchor = np.asarray(anchor, dtype=np.int64).ravel()
    cells = np.asarray(cells, dtype=np.int64).ravel()
    anchor = np.broadcast_to(anchor, cells.shape)
    n = cells.shape[0]

    res_a = IDX.get_resolution(anchor)
    res_c = IDX.get_resolution(cells)
    bc_a = IDX.get_base_cell(anchor)
    bc_c = IDX.get_base_cell(cells)
    ok = (
        IDX.is_valid_cell(anchor)
        & IDX.is_valid_cell(cells)
        & (res_a == res_c)
        & (bc_a == bc_c)
    )

    digits = IDX.get_digits(cells)
    a = np.zeros(n, dtype=np.int64)
    b = np.zeros(n, dtype=np.int64)
    for rv in np.unique(res_c[ok]) if ok.any() else []:
        g = np.nonzero(ok & (res_c == rv))[0]
        aa = np.zeros(g.size, dtype=np.int64)
        bb = np.zeros(g.size, dtype=np.int64)
        for rr in range(1, int(rv) + 1):
            o = (rr & 1) == 1
            aa, bb = _down7_axial(aa, bb, o)
            d = digits[g, rr - 1]
            aa = aa + _DIGIT_AXIAL[d, 0]
            bb = bb + _DIGIT_AXIAL[d, 1]
        a[g] = aa
        b[g] = bb
    i = np.where(ok, a, FAIL)
    j = np.where(ok, b, FAIL)
    return i, j


def localij_to_cells(anchor, i, j) -> np.ndarray:
    """Inverse of cells_to_localij (same-base-cell range); -1 on failure."""
    anchor = np.asarray(anchor, dtype=np.int64).ravel()
    i = np.asarray(i, dtype=np.int64).ravel()
    j = np.asarray(j, dtype=np.int64).ravel()
    anchor = np.broadcast_to(anchor, i.shape)
    n = i.shape[0]

    res = IDX.get_resolution(anchor)
    bc = IDX.get_base_cell(anchor)
    ok = IDX.is_valid_cell(anchor) & (i != FAIL) & (j != FAIL)

    digits = np.full((n, 15), 7, dtype=np.int64)
    a_end = np.zeros(n, dtype=np.int64)
    b_end = np.zeros(n, dtype=np.int64)
    for rv in np.unique(res[ok]) if ok.any() else []:
        g = np.nonzero(ok & (res == rv))[0]
        aa, bb = i[g].copy(), j[g].copy()
        for rr in range(int(rv), 0, -1):
            o = (rr & 1) == 1
            ua, ub = _up7_axial(aa, bb, o)
            ca, cb = _down7_axial(ua, ub, o)
            da, db = aa - ca, bb - cb
            dig = _axial_digit(da, db)
            digits[g, rr - 1] = dig
            aa, bb = ua, ub
        a_end[g] = aa
        b_end[g] = bb
    # must unwind back to the base cell origin (same-base-cell range)
    ok &= (a_end == 0) & (b_end == 0)
    ok &= ~(digits == 8).any(axis=1)
    h = IDX.build_cell(bc, res, np.where(digits == 7, 7, digits))
    h = np.where(ok & IDX.is_valid_cell(h), h, np.int64(-1))
    return h


def _axial_digit(da, db) -> np.ndarray:
    from .latlng import _AXIAL_DIGIT

    idx = (da + 1) * 3 + (db + 1)
    bad = (da < -1) | (da > 1) | (db < -1) | (db > 1)
    idx = np.clip(idx, 0, 8)
    d = _AXIAL_DIGIT[idx].astype(np.int64)
    return np.where(bad, 8, d)
