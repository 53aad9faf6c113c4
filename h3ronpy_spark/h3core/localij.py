"""Anchor-relative local IJ coordinates.

Reproduces h3ronpy's `cells_to_localij` / `localij_to_cells` (SURVEY.md
§2.2 ops 13-14; reference crates/h3arrow/src/algorithm/localij.rs:94-144):
local IJK is the lattice position of the cell in the ANCHOR's base-cell
coordinate system, and IJ = (i - k, j - k) — exactly the axial coordinates.

Same base cell: pure digit unwind.  Cross base cell (anchor and cell on
NEIGHBORING base cells): the cell's axial coords are rotated from its own
base-cell frame into the anchor's frame and offset by the neighbor base
cell's center position (the direction unit vector scaled down the
aperture-7 tower to the cell resolution).  The base-cell neighbor and
frame-rotation tables are derived geometrically from the engine's own
encode/decode (no transcription): probing one lattice unit beyond each
base cell center and re-encoding at res 0 gives the neighbor per
direction; the rotation between frames falls out of the reverse-direction
lookup.  Rotation commutes with the aperture-7 scaling tower (verified
algebraically: rot60ccw (a,b)->(a-b,a) commutes with both down7 parities),
so digits rotate with the same LUT the encode uses.

Pairs whose base cells are not neighbors, or where either base cell is a
pentagon, yield the FAIL sentinel (-> NULL in the Spark layer) — the
reference errors on those too (h3o LocalIjError::Pentagon / BaseCell).

Golden parity: anchor 85283473fffffff with cell 8528342bfffffff ->
(i=25, j=13) (h3ronpy/tests/arrow/test_localij.py:17-25).  Cross-base
correctness is pinned by invariants: exact roundtrip over k-rings that
straddle base-cell boundaries, and axial hex distance == BFS grid
distance (tests/test_h3core.py::TestLocalIJCrossBase).
"""

from __future__ import annotations

import numpy as np

from . import index as IDX
from .latlng import _DIGIT_AXIAL, _down7_axial, _up7_axial

FAIL = np.int64(np.iinfo(np.int32).min)

# opposite direction digit: K<->IJ, J<->IK, JK<->I
_OPP = np.array([0, 6, 5, 4, 3, 2, 1], dtype=np.int64)

_BC_TABLES: tuple[np.ndarray, np.ndarray] | None = None
_PENT_BC: np.ndarray | None = None  # 122-entry pentagon LUT by base cell


def _pent_by_bc() -> np.ndarray:
    global _PENT_BC
    if _PENT_BC is None:
        base = IDX.build_cell(
            np.arange(122), np.zeros(122, dtype=np.int64), np.full((122, 15), 7)
        )
        _PENT_BC = IDX.is_pentagon(base)
    return _PENT_BC


def _rot60_axial(a, b, ccw_steps):
    """Rotate axial coords by ccw_steps * 60 deg ccw (vectorized,
    per-row step counts).  rot60ccw: (a, b) -> (a - b, a)."""
    a = np.asarray(a, dtype=np.int64).copy()
    b = np.asarray(b, dtype=np.int64).copy()
    steps = np.broadcast_to(np.asarray(ccw_steps, dtype=np.int64) % 6, a.shape)
    for s in range(1, 6):
        m = steps >= s
        if not m.any():
            break
        a2 = a[m] - b[m]
        b[m] = a[m]
        a[m] = a2
    return a, b


def _base_cell_tables() -> tuple[np.ndarray, np.ndarray]:
    """(neighbors, rotations): neighbors[bc, d] = base cell one lattice
    unit along direction d in bc's own frame (-1 where undefined);
    rotations[bc, d] = ccw 60-deg steps rotating a vector from the
    neighbor's frame into bc's frame (-1 where undefined)."""
    global _BC_TABLES
    if _BC_TABLES is not None:
        return _BC_TABLES
    from .latlng import cell_to_fijk, fijk_to_geo, latlng_to_cell

    base = IDX.build_cell(
        np.arange(122), np.zeros(122, dtype=np.int64), np.full((122, 15), 7)
    )
    face, c, _res = cell_to_fijk(base)
    a0 = c[:, 0] - c[:, 2]
    b0 = c[:, 1] - c[:, 2]
    pent = IDX.is_pentagon(base)

    nbr = np.full((122, 7), -1, dtype=np.int64)
    for d in range(1, 7):
        da, db = _DIGIT_AXIAL[d]
        ta, tb = a0 + da, b0 + db
        kk = -np.minimum(np.minimum(ta, tb), 0)
        cc = np.stack([ta + kk, tb + kk, kk], axis=1)
        # the neighbor's center is exactly one lattice unit away; the
        # gnomonic extension of the home face places it inside the correct
        # res-0 cell, so re-encoding recovers the neighbor id
        lat, lng = fijk_to_geo(face, cc, np.zeros(122, dtype=np.int64))
        nb = latlng_to_cell(lat, lng, 0)
        nbr[:, d] = IDX.get_base_cell(nb)
    # pentagon frames are not usable for cross-base localij (deleted K
    # subsequence + icosahedron-vertex distortion breaks the flat-lattice
    # probe): blank their rows — pentagon-involved pairs FAIL by design
    nbr[pent, :] = -1

    # validate the derived hexagon rows against the engine's geometric
    # neighbor finder: 6 distinct true neighbors per hexagon base cell
    from .grid import neighbors as _gr_neighbors

    gr_rows, gr_cells = _gr_neighbors(base)
    gr_bc = IDX.get_base_cell(gr_cells)
    for b in np.nonzero(~pent)[0]:
        derived = set(nbr[b, 1:].tolist())
        true_set = set(gr_bc[gr_rows == b].tolist())
        if len(derived) != 6 or derived != true_set:
            raise AssertionError(
                f"base-cell neighbor derivation failed for {b}: "
                f"{sorted(derived)} vs geometric {sorted(true_set)}"
            )

    rot = np.full((122, 7), -1, dtype=np.int64)
    for bc in range(122):
        for d in range(1, 7):
            nb = nbr[bc, d]
            if nb < 0 or pent[nb] or pent[bc]:
                continue
            back = np.nonzero(nbr[nb] == bc)[0]
            if back.size != 1:
                continue
            e = int(back[0])
            # rotation rho with rot60ccw^rho(unit(e)) == unit(opp(d))
            va, vb = _DIGIT_AXIAL[e]
            want = _DIGIT_AXIAL[_OPP[d]]
            for rho in range(6):
                if va == want[0] and vb == want[1]:
                    rot[bc, d] = rho
                    break
                va, vb = va - vb, va
    _BC_TABLES = (nbr, rot)
    return _BC_TABLES


def _unwind_axial(cells, res, sel) -> tuple[np.ndarray, np.ndarray]:
    """Digit unwind of selected rows -> axial coords within the cell's own
    base-cell frame."""
    n = cells.shape[0]
    digits = IDX.get_digits(cells)
    a = np.zeros(n, dtype=np.int64)
    b = np.zeros(n, dtype=np.int64)
    for rv in np.unique(res[sel]) if sel.any() else []:
        g = np.nonzero(sel & (res == rv))[0]
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
    return a, b


def _dir_offset(res) -> tuple[np.ndarray, np.ndarray]:
    """Axial offset of each direction's res-0 neighbor center, expressed
    at per-row resolution `res`: unit(d) scaled down the aperture-7 tower.
    Returns (a_off, b_off) of shape (len(res), 7)."""
    res = np.asarray(res, dtype=np.int64)
    a = np.broadcast_to(_DIGIT_AXIAL[:, 0], (res.shape[0], 7)).astype(np.int64).copy()
    b = np.broadcast_to(_DIGIT_AXIAL[:, 1], (res.shape[0], 7)).astype(np.int64).copy()
    max_r = int(res.max()) if res.size else 0
    for rr in range(1, max_r + 1):
        m = res >= rr
        if not m.any():
            break
        o = (rr & 1) == 1
        na, nb = _down7_axial(a[m], b[m], o)
        a[m], b[m] = na, nb
    return a, b


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
    valid = (
        IDX.is_valid_cell(anchor)
        & IDX.is_valid_cell(cells)
        & (res_a == res_c)
    )
    same = valid & (bc_a == bc_c)

    nbr, rot = _base_cell_tables()
    pent = _pent_by_bc()
    pent_a = pent[np.clip(bc_a, 0, 121)]
    pent_c = pent[np.clip(bc_c, 0, 121)]
    # cross-base: cell's base cell must be a neighbor of the anchor's, and
    # neither may be a pentagon (reference errors there too)
    dirs = np.zeros(n, dtype=np.int64)
    cross = valid & ~same & ~pent_a & ~pent_c
    if cross.any():
        match = nbr[np.clip(bc_a, 0, 121)] == bc_c[:, None]  # (n, 7)
        match[:, 0] = False
        has = match.any(axis=1)
        dirs = np.argmax(match, axis=1)
        cross &= has & (rot[np.clip(bc_a, 0, 121), dirs] >= 0)

    ok = same | cross
    a, b = _unwind_axial(cells, res_c, ok)

    if cross.any():
        g = np.nonzero(cross)[0]
        rho = rot[bc_a[g], dirs[g]]
        ra, rb = _rot60_axial(a[g], b[g], rho)
        oa, ob = _dir_offset(res_c[g])
        gi = np.arange(g.size)
        a[g] = ra + oa[gi, dirs[g]]
        b[g] = rb + ob[gi, dirs[g]]

    i = np.where(ok, a, FAIL)
    j = np.where(ok, b, FAIL)
    return i, j


def localij_to_cells(anchor, i, j) -> np.ndarray:
    """Inverse of cells_to_localij (anchor's base cell and its hexagonal
    neighbors' range); -1 on failure."""
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
    ok &= ~(digits == 8).any(axis=1)

    # base-level remainder: (0,0) -> anchor's base cell; a direction unit
    # vector -> that neighbor base cell with the digits rotated into the
    # neighbor's own frame
    at_home = (a_end == 0) & (b_end == 0)
    out_bc = np.where(ok, bc, 0).astype(np.int64)
    rot_cw = np.zeros(n, dtype=np.int64)
    if ok.any():
        nbr, rot = _base_cell_tables()
        # match remainder against the 6 direction units
        rem_match = (a_end[:, None] == _DIGIT_AXIAL[:, 0][None, :]) & (
            b_end[:, None] == _DIGIT_AXIAL[:, 1][None, :]
        )
        rem_match[:, 0] = False
        cross = ok & ~at_home & rem_match.any(axis=1)
        d = np.argmax(rem_match, axis=1)
        if cross.any():
            g = np.nonzero(cross)[0]
            nb = nbr[bc[g], d[g]]
            rho = rot[bc[g], d[g]]
            good = (nb >= 0) & (rho >= 0)
            cross_ok = np.zeros(n, dtype=bool)
            cross_ok[g[good]] = True
            out_bc[g[good]] = nb[good]
            rot_cw[g[good]] = rho[good]
            ok &= at_home | cross_ok
        else:
            ok &= at_home

    # rotate digits from the anchor frame into the target base cell frame
    # (cw rho steps = inverse of the forward ccw rotation)
    from . import ijk as IJK

    need = rot_cw > 0
    if need.any():
        t = IJK.DIGIT_ROT_CW.astype(np.int64)
        dg = digits[need]
        pad = dg == 7
        dg = np.where(pad, 0, dg)
        steps = rot_cw[need]
        for s in range(1, 6):
            m = steps >= s
            if not m.any():
                break
            dg[m] = t[dg[m]]
        digits[need] = np.where(pad, 7, dg)

    h = IDX.build_cell(out_bc, res, np.where(digits == 7, 7, digits))
    h = np.where(ok & IDX.is_valid_cell(h), h, np.int64(-1))
    return h


def _axial_digit(da, db) -> np.ndarray:
    from .latlng import _AXIAL_DIGIT

    idx = (da + 1) * 3 + (db + 1)
    bad = (da < -1) | (da > 1) | (db < -1) | (db > 1)
    idx = np.clip(idx, 0, 8)
    d = _AXIAL_DIGIT[idx].astype(np.int64)
    return np.where(bad, 8, d)
