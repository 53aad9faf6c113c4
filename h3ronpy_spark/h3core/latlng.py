"""Vectorized latlng <-> H3 cell conversion (the encode/decode kernels).

Reproduces the behavior of h3ronpy's `coordinates_to_cells` /
`cells_to_coordinates` (reference: h3ronpy/src/vector.rs:148-241, SURVEY.md
§2.6 ops 27-28) as pure-numpy batch kernels suitable for Spark pandas UDFs.
Implemented from the public H3 spec; parity pinned by golden values in
tests/test_h3core.py.

Performance notes: the hexagon-lattice walk runs in *axial* integer
coordinates (a, b) = (i - k, j - k), which makes every aperture step a
2-component integer linear map with no normalization, and the aperture-7
rounding is integer-exact (denominator 7 is odd, so exact .5 never occurs:
round(x/7) == floor((2x + 7) / 14)).  Rows are grouped by resolution so the
digit loops run mask-free.  Digits are held as (N, 15) int8 with padding 7
(the rotation LUTs map 7 -> 7, so padding survives rotations unchanged).

Input/output angles are radians here; degree wrappers live in the Spark
function layer.
"""

from __future__ import annotations

import numpy as np

from . import ijk as IJK
from . import index as IDX
from .constants import (
    BASE_CELL_HOME_FACE,
    BASE_CELL_HOME_IJK,
    BASE_CELL_IS_PENTAGON,
    FACE_CENTER_GEO,
    FACE_CENTER_XYZ,
    M_AP7_ROT_RADS,
    M_SQRT7,
    RES0_U_GNOMONIC,
)
from .tables import (
    AZ_FACE_I,
    FACE_IJK_BASE_CELL,
    FACE_IJK_CCWROT60,
    FACE_NEIGHBOR_CCWROT,
    FACE_NEIGHBOR_FACE,
    FACE_NEIGHBOR_TRANSLATE,
    IJ_QUAD,
    JK_QUAD,
    KI_QUAD,
    PENT_CW_OFFSET,
)

_NO_OVERAGE, _FACE_EDGE, _NEW_FACE = 0, 1, 2

_SQRT7_POW = M_SQRT7 ** np.arange(0, 17)
_POW7 = 7 ** np.arange(0, 9, dtype=np.int64)


def _face_bases() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-face orthonormal tangent bases (u along the face i-axis azimuth,
    v at azimuth - pi/2) plus their odd-resolution (Class III) rotations.

    Lets the encode hot path compute gnomonic face-plane coordinates as
      x = (p.u / p.c) * scale,  y = (p.v / p.c) * scale
    — three dot products and one divide per point — instead of the
    azimuth/arc formulation (atan2 + arccos + tan + mod), which profiling
    showed was ~20% of the kernel."""
    lng0 = FACE_CENTER_GEO[:, 1]
    c = FACE_CENTER_XYZ
    east = np.stack(
        [-np.sin(lng0), np.cos(lng0), np.zeros(lng0.shape[0])], axis=1
    )
    north = np.cross(c, east)
    az0 = AZ_FACE_I
    u = north * np.cos(az0)[:, None] + east * np.sin(az0)[:, None]
    v = north * np.sin(az0)[:, None] - east * np.cos(az0)[:, None]
    cr, sr = np.cos(M_AP7_ROT_RADS), np.sin(M_AP7_ROT_RADS)
    return u, v, u * cr + v * sr, v * cr - u * sr


_FACE_U, _FACE_V, _FACE_U_ODD, _FACE_V_ODD = _face_bases()

# axial diff -> digit LUT: index (da+1)*3 + (db+1)
_AXIAL_DIGIT = np.array([1, 3, 7, 5, 0, 2, 7, 4, 6], dtype=np.int8)
# digit -> axial unit vector
_DIGIT_AXIAL = np.array(
    [[0, 0], [-1, -1], [0, 1], [-1, 0], [1, 0], [0, -1], [1, 1]], dtype=np.int64
)
_ROT_CCW8 = IJK.DIGIT_ROT_CCW.astype(np.int8)
_ROT_CW8 = IJK.DIGIT_ROT_CW.astype(np.int8)

_PACK_W = (np.uint64(1) << (np.uint64(45) - np.uint64(3) * np.arange(1, 16, dtype=np.uint64))).astype(np.int64)


def _up7_axial(a, b, odd: bool):
    """One aperture-7 coarsening step in axial coords, integer exact."""
    if odd:  # counter-clockwise (class III step)
        na = np.floor_divide(2 * (3 * a - b) + 7, 14)
        nb = np.floor_divide(2 * (a + 2 * b) + 7, 14)
    else:  # clockwise
        na = np.floor_divide(2 * (2 * a + b) + 7, 14)
        nb = np.floor_divide(2 * (3 * b - a) + 7, 14)
    return na, nb


def _down7_axial(a, b, odd: bool):
    if odd:
        return 2 * a + b, 3 * b - a
    return 3 * a - b, a + 2 * b


def _lead_digit(digits: np.ndarray) -> np.ndarray:
    """First non-zero digit per row of an int8 (N, 15) digit array padded
    with 7 beyond each row's res; all-zero rows -> 0."""
    nz = digits != 0
    first = np.argmax(nz, axis=-1)
    val = np.take_along_axis(digits, first[:, None], axis=-1)[:, 0]
    return np.where(val == 7, 0, val).astype(np.int64)


def _rot_digits(digits: np.ndarray, rows: np.ndarray, ccw: bool) -> None:
    """In-place 60-deg digit rotation of selected rows (LUT maps 7->7)."""
    t = _ROT_CCW8 if ccw else _ROT_CW8
    digits[rows] = t[digits[rows]]


_CHUNK = 16384  # keep kernel temporaries cache-resident: the unchunked
# kernel is DRAM-bandwidth-bound and stops scaling past ~8 cores (measured
# 0.07 M rows/s/proc at 32 procs unchunked vs 0.38 M chunked)


def latlng_to_cell(lat: np.ndarray, lng: np.ndarray, res) -> np.ndarray:
    """(lat, lng) radians + res (scalar or per-row) -> int64 cell indexes.

    Invalid input (NaN coords / res out of range) yields -1."""
    lat = np.ascontiguousarray(lat, dtype=np.float64).ravel()
    if lat.shape[0] > _CHUNK:
        lng_a = np.ascontiguousarray(lng, dtype=np.float64).ravel()
        res_a = np.broadcast_to(np.asarray(res, dtype=np.int64), lat.shape)
        out = np.empty(lat.shape[0], dtype=np.int64)
        for i in range(0, lat.shape[0], _CHUNK):
            sl = slice(i, i + _CHUNK)
            out[sl] = _latlng_to_cell_chunk(lat[sl], lng_a[sl], res_a[sl])
        return out
    return _latlng_to_cell_chunk(lat, lng, res)


def _latlng_to_cell_chunk(lat: np.ndarray, lng: np.ndarray, res) -> np.ndarray:
    lat = np.ascontiguousarray(lat, dtype=np.float64).ravel()
    lng = np.ascontiguousarray(lng, dtype=np.float64).ravel()
    n = lat.shape[0]
    res_arr = np.broadcast_to(np.asarray(res, dtype=np.int64), (n,))

    bad = ~np.isfinite(lat) | ~np.isfinite(lng) | (res_arr < 0) | (res_arr > 15)
    if bad.any():
        lat = np.where(bad, 0.0, lat)
        lng = np.where(bad, 0.0, lng)
        res_arr = np.where(bad, 0, res_arr)

    # --- project to (face, hex2d): gnomonic coordinates in the face's
    # tangent basis (see _face_bases) — x = (p.u / p.c) * s, y likewise
    cl = np.cos(lat)
    xyz = np.empty((n, 3))
    xyz[:, 0] = cl * np.cos(lng)
    xyz[:, 1] = cl * np.sin(lng)
    xyz[:, 2] = np.sin(lat)
    scores = xyz @ FACE_CENTER_XYZ.T
    face = np.argmax(scores, axis=-1)
    pc = np.take_along_axis(scores, face[:, None], axis=-1)[:, 0]
    odd = (res_arr & 1) == 1
    ob = odd[:, None]
    U = np.where(ob, _FACE_U_ODD[face], _FACE_U[face])
    V = np.where(ob, _FACE_V_ODD[face], _FACE_V[face])
    s = _SQRT7_POW[res_arr] / (RES0_U_GNOMONIC * pc)
    x = np.einsum("ij,ij->i", xyz, U) * s
    y = np.einsum("ij,ij->i", xyz, V) * s

    a_all, b_all = IJK.hex2d_to_axial(x, y)
    return axial_to_cell(face, a_all, b_all, res_arr, bad)


def axial_to_cell(face, a_all, b_all, res_arr, bad=None) -> np.ndarray:
    """Face-plane axial lattice coords at res -> cell index (the back half
    of the encode pipeline; also used by the lattice-arithmetic neighbor
    finder)."""
    n = a_all.shape[0]
    res_arr = np.broadcast_to(np.asarray(res_arr, dtype=np.int64), (n,))
    if bad is None:
        bad = np.zeros(n, dtype=bool)

    digits = np.full((n, 15), 7, dtype=np.int8)
    a0 = np.empty(n, dtype=np.int64)
    b0 = np.empty(n, dtype=np.int64)

    # --- unwind digits, grouped by resolution (mask-free inner loop)
    for rv in np.unique(res_arr):
        g = np.nonzero(res_arr == rv)[0]
        a, b = a_all[g], b_all[g]
        dsub = np.full((g.size, int(rv)), 7, dtype=np.int8) if rv else None
        for rr in range(int(rv), 0, -1):
            o = (rr & 1) == 1
            ua, ub = _up7_axial(a, b, o)
            ca, cb = _down7_axial(ua, ub, o)
            da, db = a - ca, b - cb
            dsub[:, rr - 1] = _AXIAL_DIGIT[(da + 1) * 3 + (db + 1)]
            a, b = ua, ub
        if rv:
            digits[g, : int(rv)] = dsub
        a0[g] = a
        b0[g] = b

    # axial -> normalized ijk (res-0 coords are small)
    k0 = -np.minimum(np.minimum(a0, b0), 0)
    i0 = a0 + k0
    j0 = b0 + k0
    oob = (i0 < 0) | (i0 > 2) | (j0 < 0) | (j0 > 2) | (k0 < 0) | (k0 > 2)
    bad |= oob
    i0 = np.clip(i0, 0, 2)
    j0 = np.clip(j0, 0, 2)
    k0 = np.clip(k0, 0, 2)

    bc = FACE_IJK_BASE_CELL[face, i0, j0, k0]
    rots = FACE_IJK_CCWROT60[face, i0, j0, k0].copy()
    pent = BASE_CELL_IS_PENTAGON[bc]

    # --- pentagon: rotate out of the deleted K subsequence
    pidx = np.nonzero(pent)[0]
    if pidx.size:
        lead = _lead_digit(digits[pidx])
        k_lead = pidx[lead == IJK.K_AXES]
        if k_lead.size:
            cw_rows = k_lead[PENT_CW_OFFSET[bc[k_lead], face[k_lead]]]
            ccw_rows = k_lead[~PENT_CW_OFFSET[bc[k_lead], face[k_lead]]]
            _rot_digits(digits, cw_rows, ccw=False)
            _rot_digits(digits, ccw_rows, ccw=True)

    # --- frame rotations (hexagon: plain ccw; pentagon: ccw skipping K)
    hex_rows = np.nonzero(~pent & (rots > 0))[0]
    rcount = rots[hex_rows]
    for step in range(1, 6):
        sel = hex_rows[rcount >= step]
        if sel.size == 0:
            break
        _rot_digits(digits, sel, ccw=True)
    if pidx.size:
        prows = pidx[rots[pidx] > 0]
        pcount = rots[prows]
        for step in range(1, 5):
            sel = prows[pcount >= step]
            if sel.size == 0:
                break
            _rot_digits(digits, sel, ccw=True)
            lead = _lead_digit(digits[sel])
            again = sel[lead == IJK.K_AXES]
            if again.size:
                _rot_digits(digits, again, ccw=True)

    # --- pack (column-wise, no (N,15) int64 materialization)
    h = (
        (np.int64(IDX.MODE_CELL) << np.int64(59))
        | (res_arr << np.int64(52))
        | (bc << np.int64(45))
    )
    for rr in range(15):
        h |= digits[:, rr].astype(np.int64) * _PACK_W[rr]
    return np.where(bad, np.int64(-1), h)


def _adjust_overage(face, c, res_cii, pent_leading_4, substrate: bool):
    """Vectorized class-II overage adjustment (one pass) on ijk coords.

    Returns (overage_code, face, c); res_cii per-row even resolution."""
    face = face.copy()
    c = c.copy()
    unit_scale = _POW7[res_cii >> 1]
    max_dim = 2 * unit_scale
    if substrate:
        max_dim = max_dim * 3
        unit_scale = unit_scale * 3
    s = c.sum(axis=-1)
    ov = np.zeros(face.shape, dtype=np.int64)
    if substrate:
        ov = np.where(s == max_dim, _FACE_EDGE, ov)
    over = s > max_dim
    if not over.any():
        return ov, face, c

    i, j, k = c[:, 0], c[:, 1], c[:, 2]
    # quadrant is chosen BEFORE the pentagon leading-4 rotation and kept
    quad = np.where(k > 0, np.where(j > 0, JK_QUAD, KI_QUAD), IJ_QUAD)
    # pentagon leading-4 distortion: rotate about the pentagon vertex
    pl4 = over & pent_leading_4 & (quad == KI_QUAD)
    if pl4.any():
        md = np.broadcast_to(np.asarray(max_dim), face.shape)
        tmp_a = (c[pl4, 0] - md[pl4]) - c[pl4, 2]
        tmp_b = c[pl4, 1] - c[pl4, 2]
        # axial cw rotation: (a, b) -> (b, b - a)
        na, nb = tmp_b, tmp_b - tmp_a
        na = na + md[pl4]
        rot = np.stack([na, nb, np.zeros_like(na)], axis=-1)
        c[pl4] = IJK.normalize(rot)

    rot_n = np.where(over, FACE_NEIGHBOR_CCWROT[face, quad], 0)
    oidx = np.nonzero(over)[0]
    rcount = rot_n[oidx]
    for step in range(1, 6):
        sel = oidx[rcount >= step]
        if sel.size == 0:
            break
        c[sel] = IJK.rotate60ccw(c[sel])
    trans = FACE_NEIGHBOR_TRANSLATE[face[oidx], quad[oidx]] * np.broadcast_to(
        np.asarray(unit_scale), face.shape
    )[oidx, None]
    c[oidx] = IJK.normalize(c[oidx] + trans)
    face[oidx] = FACE_NEIGHBOR_FACE[face[oidx], quad[oidx]]
    s = c.sum(axis=-1)
    if substrate:
        ov = np.where(over, np.where(s == max_dim, _FACE_EDGE, _NEW_FACE), ov)
    else:
        ov = np.where(over, _NEW_FACE, ov)
    return ov, face, c


def cell_to_fijk(h) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized cell -> (face, ijk coord, res) with overage handling."""
    h = np.asarray(h, dtype=np.int64).ravel()
    n = h.shape[0]
    res = IDX.get_resolution(h)
    bc = np.clip(IDX.get_base_cell(h), 0, 121)
    digits = IDX.get_digits(h).astype(np.int8)
    pent = BASE_CELL_IS_PENTAGON[bc]

    lead = _lead_digit(np.where(
        np.arange(1, 16) <= res[:, None], digits, np.int8(7)
    ).astype(np.int8))
    lead5 = np.nonzero(pent & (lead == 5))[0]
    if lead5.size:
        _rot_digits(digits, lead5, ccw=False)
        lead = lead.copy()

    home = BASE_CELL_HOME_IJK[bc]
    a_all = home[:, 0] - home[:, 2]
    b_all = home[:, 1] - home[:, 2]
    face = BASE_CELL_HOME_FACE[bc].copy()

    out_a = np.empty(n, dtype=np.int64)
    out_b = np.empty(n, dtype=np.int64)
    for rv in np.unique(res):
        g = np.nonzero(res == rv)[0]
        a, b = a_all[g], b_all[g]
        for rr in range(1, int(rv) + 1):
            o = (rr & 1) == 1
            a, b = _down7_axial(a, b, o)
            d = digits[g, rr - 1]
            a = a + _DIGIT_AXIAL[d, 0]
            b = b + _DIGIT_AXIAL[d, 1]
        out_a[g] = a
        out_b[g] = b

    kk = -np.minimum(np.minimum(out_a, out_b), 0)
    c = np.stack([out_a + kk, out_b + kk, kk], axis=-1)

    home_origin = (home == 0).all(axis=-1)
    po = pent | ~((res == 0) | home_origin)
    if po.any():
        orig_c = c.copy()
        odd = (res & 1) == 1
        res2 = np.where(po & odd, res + 1, res)
        c_sub = c.copy()
        subm = po & odd
        if subm.any():
            c_sub[subm] = IJK.down_ap7r(c_sub[subm])
        # recompute lead only if the lead-5 rotation changed digits
        if lead5.size:
            lead_now = _lead_digit(np.where(
                np.arange(1, 16) <= res[:, None], digits, np.int8(7)
            ).astype(np.int8))
        else:
            lead_now = lead
        pl4 = pent & (lead_now == 4)
        ov, nface, nc = _adjust_overage(face, c_sub, res2, pl4, False)
        adj = po & (ov != _NO_OVERAGE)
        for _ in range(3):
            pend = adj & pent
            if not pend.any():
                break
            ov2, nface2, nc2 = _adjust_overage(
                nface, nc, res2, np.zeros_like(pl4), False
            )
            more = pend & (ov2 != _NO_OVERAGE)
            if not more.any():
                break
            nface = np.where(more, nface2, nface)
            nc = np.where(more[:, None], nc2, nc)
        face = np.where(adj, nface, face)
        c = np.where(adj[:, None], nc, c)
        back = adj & odd
        if back.any():
            c[back] = IJK.up_ap7r(c[back])
        no_adj = po & (ov == _NO_OVERAGE)
        c = np.where(no_adj[:, None], orig_c, c)
    return face, c, res


def _aligned_f64(n: int) -> np.ndarray:
    """A 64-byte-aligned float64 buffer of length n (over-allocate and
    slice to the aligned offset)."""
    raw = np.empty(n + 8, dtype=np.float64)
    off = (-raw.ctypes.data) % 64 // 8
    return raw[off : off + n]


def fijk_to_geo(face, c, res, substrate: bool = False):
    """Face-plane lattice coords -> (lat, lng) radians (no overage).

    Inverse gnomonic via the same tangent bases as the encode: the sphere
    direction is c + s*(x*U + y*V) (un-normalized is fine for atan2), which
    replaces the azimuth/great-circle trig (arctan + geo_az_distance).

    BIT-STABILITY (round-4): numpy's elementwise kernels can return
    last-ulp-different results for value-identical inputs at different
    heap addresses (SIMD peel/remainder split follows alignment; caught
    by a flaky concave-hull byte-equality test, ~10% of fresh
    processes).  Boundary coordinates are compared BYTE-EXACTLY
    downstream (WKB goldens, hull determinism), so every float op here
    runs through 64-byte-ALIGNED buffers with out= — identical
    alignment -> identical code path -> identical bits, regardless of
    allocator state."""
    shape = np.asarray(face).shape
    face = np.asarray(face, dtype=np.int64).ravel()
    res = np.asarray(res, dtype=np.int64).ravel()
    v = IJK.ijk_to_hex2d(np.asarray(c, dtype=np.int64))
    n = face.shape[0]
    x = _aligned_f64(n)
    y = _aligned_f64(n)
    np.copyto(x, v[..., 0].reshape(n))
    np.copyto(y, v[..., 1].reshape(n))
    odd = (res & 1) == 1
    s = _aligned_f64(n)
    np.divide(RES0_U_GNOMONIC, _SQRT7_POW[res], out=s)
    if substrate:
        # substrate grids scale r instead of rotating theta for odd res
        np.divide(s, 3.0, out=s)
        np.divide(s, M_SQRT7, out=s, where=odd)
        U = _FACE_U[face]
        V = _FACE_V[face]
    else:
        ob = odd[..., None]
        U = np.where(ob, _FACE_U_ODD[face], _FACE_U[face])
        V = np.where(ob, _FACE_V_ODD[face], _FACE_V[face])
    C = FACE_CENTER_XYZ[face]
    np.multiply(x, s, out=x)  # x*s
    np.multiply(y, s, out=y)  # y*s
    d0 = _aligned_f64(n)
    d1 = _aligned_f64(n)
    d2 = _aligned_f64(n)
    t = _aligned_f64(n)
    col = _aligned_f64(n)
    for out_d, k in ((d0, 0), (d1, 1), (d2, 2)):
        # D_k = C_k + x*s*U_k + y*s*V_k, every operand/result aligned
        np.copyto(col, U[:, k])
        np.multiply(x, col, out=out_d)
        np.copyto(col, V[:, k])
        np.multiply(y, col, out=t)
        np.add(out_d, t, out=out_d)
        np.copyto(col, C[:, k])
        np.add(out_d, col, out=out_d)
    hyp = _aligned_f64(n)
    np.hypot(d0, d1, out=hyp)
    lat = _aligned_f64(n)
    lng = _aligned_f64(n)
    np.arctan2(d2, hyp, out=lat)
    np.arctan2(d1, d0, out=lng)
    return lat.copy().reshape(shape), lng.copy().reshape(shape)


def cell_to_latlng(h) -> tuple[np.ndarray, np.ndarray]:
    """int64 cells -> (lat, lng) radians of cell centers. Invalid -> NaN."""
    h = np.asarray(h, dtype=np.int64).ravel()
    if h.shape[0] > _CHUNK:
        lat = np.empty(h.shape[0])
        lng = np.empty(h.shape[0])
        for i in range(0, h.shape[0], _CHUNK):
            sl = slice(i, i + _CHUNK)
            lat[sl], lng[sl] = _cell_to_latlng_chunk(h[sl])
        return lat, lng
    return _cell_to_latlng_chunk(h)


def _cell_to_latlng_chunk(h) -> tuple[np.ndarray, np.ndarray]:
    h = np.asarray(h, dtype=np.int64).ravel()
    valid = IDX.is_valid_cell(h)
    face, c, res = cell_to_fijk(np.where(valid, h, np.int64(0x08001FFFFFFFFFFF)))
    lat, lng = fijk_to_geo(face, c, res)
    if not valid.all():
        lat = np.where(valid, lat, np.nan)
        lng = np.where(valid, lng, np.nan)
    return lat, lng
