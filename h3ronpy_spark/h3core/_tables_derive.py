"""Geometric derivation of the H3 lookup tables.

Rather than transcribing the large generated lookup tables of the public H3
spec (540-entry face/ijk -> base-cell map, face-neighbor orientation map),
this module *derives* them from first principles:

  * the 20 face centers (constants.FACE_CENTER_GEO, validated as an exact
    regular icosahedron),
  * the 122-entry base-cell placement list (home face + home ijk),
  * the anchor fact that each face's class-II i-axis points at an
    icosahedron vertex at exactly 2 res-0 lattice units (where the
    pentagon base cells sit).

Every derived table is validated against golden fragments from the public
H3 grid definition (constants.FACE0_LOOKUP_FRAGMENT) plus structural
invariants: the 12 pentagons occupy the 12 icosahedron vertices
bijectively, all 122 base-cell centers are distinct and uniformly spaced,
and encode/decode roundtrips close globally (tests/test_h3core.py).

Reference behavior being reproduced: crates/h3arrow & h3o per SURVEY.md §1;
no code is taken from there — this is an independent derivation.
"""

from __future__ import annotations

import numpy as np

from . import ijk as IJK
from .constants import (
    BASE_CELL_HOME_FACE,
    BASE_CELL_HOME_IJK,
    BASE_CELL_IS_PENTAGON,
    FACE0_LOOKUP_FRAGMENT,
    FACE_CENTER_GEO,
    FACE_CENTER_XYZ,
    FACE_I_AXIS_AZ_HINT,
    M_SQRT7,
    NUM_BASE_CELLS,
    NUM_FACES,
    RES0_U_GNOMONIC,
    geo_az_distance,
    geo_azimuth,
    latlng_to_xyz,
    pos_angle,
)

# ---------------------------------------------------------------------------
# Icosahedron vertices
# ---------------------------------------------------------------------------


def _derive_vertices() -> tuple[np.ndarray, np.ndarray]:
    """Return (verts_xyz[12, 3], face_verts[20, 3] vertex ids per face)."""
    X = FACE_CENTER_XYZ
    cosadj = np.sqrt(5.0) / 3.0  # cos of adjacent face-center angle
    adj = (X @ X.T > cosadj - 1e-9) & ~np.eye(NUM_FACES, dtype=bool)

    # vertex sits at exact angle atan(2 * RES0_U_GNOMONIC) from each face
    # center it touches; each adjacent face pair shares an edge whose two
    # endpoints solve v.Xf = v.Xg = cos(theta_v), |v| = 1
    cos_v = np.cos(np.arctan(2.0 * RES0_U_GNOMONIC))
    verts = []
    for a in range(NUM_FACES):
        for b in range(a + 1, NUM_FACES):
            if not adj[a, b]:
                continue
            d = float(X[a] @ X[b])
            alpha = cos_v / (1.0 + d)
            cross = np.cross(X[a], X[b])
            beta2 = (1.0 - alpha * alpha * 2.0 * (1.0 + d)) / (1.0 - d * d)
            assert beta2 > 0
            beta = np.sqrt(beta2)
            base = alpha * (X[a] + X[b])
            verts.append(base + beta * cross)
            verts.append(base - beta * cross)
    verts = np.array(verts)
    # dedupe
    uniq: list[np.ndarray] = []
    for v in verts:
        if not any(np.dot(v, u) > 1.0 - 1e-9 for u in uniq):
            uniq.append(v)
    V = np.array(uniq)
    assert V.shape == (12, 3), V.shape

    # vertices of each face: the 3 nearest vertices
    d = X @ V.T
    face_verts = np.argsort(-d, axis=1)[:, :3]
    return V, face_verts


VERT_XYZ, FACE_VERTS = _derive_vertices()


def _derive_axes() -> np.ndarray:
    """Azimuth (radians) of each face's class-II i-axis: snaps the
    published approximate azimuths to the exact vertex azimuths."""
    az_i = np.zeros(NUM_FACES)
    flat, flng = FACE_CENTER_GEO[:, 0], FACE_CENTER_GEO[:, 1]
    for f in range(NUM_FACES):
        best = None
        for vid in FACE_VERTS[f]:
            v = VERT_XYZ[vid]
            vlat = np.arctan2(v[2], np.hypot(v[0], v[1]))
            vlng = np.arctan2(v[1], v[0])
            az = pos_angle(geo_azimuth(flat[f], flng[f], vlat, vlng))
            diff = np.abs(np.angle(np.exp(1j * (az - FACE_I_AXIS_AZ_HINT[f]))))
            if best is None or diff < best[0]:
                best = (diff, az)
        assert best[0] < 0.3, (f, best)  # hint must closely match a vertex
        az_i[f] = best[1]
    return az_i


AZ_FACE_I = _derive_axes()

# ---------------------------------------------------------------------------
# Raw (no-overage) face-plane <-> sphere projection helpers
# ---------------------------------------------------------------------------


def fijk_to_geo_raw(
    face: np.ndarray, ijk: np.ndarray, res, substrate: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Project face-plane lattice coords to (lat, lng) WITHOUT overage
    adjustment.  `res` scalar or array; class III handled."""
    face = np.asarray(face, dtype=np.int64)
    res = np.asarray(res, dtype=np.int64)
    v = IJK.ijk_to_hex2d(np.asarray(ijk, dtype=np.int64))
    x, y = v[..., 0], v[..., 1]
    r = np.hypot(x, y)
    theta = np.arctan2(y, x)
    r = r / (M_SQRT7**res)
    if substrate:
        r = r / 3.0
        r = np.where(res % 2 == 1, r / M_SQRT7, r)
    r = r * RES0_U_GNOMONIC
    r = np.arctan(r)
    if not substrate:
        from .constants import M_AP7_ROT_RADS

        theta = np.where(res % 2 == 1, theta + M_AP7_ROT_RADS, theta)
    az = AZ_FACE_I[face] - theta
    lat0 = FACE_CENTER_GEO[face, 0]
    lng0 = FACE_CENTER_GEO[face, 1]
    lat, lng = geo_az_distance(lat0, lng0, az, r)
    # exactly-at-center guard
    at_c = r < 1e-16
    lat = np.where(at_c, lat0, lat)
    lng = np.where(at_c, lng0, lng)
    return lat, lng


def geo_to_face(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """Nearest icosahedron face for each point."""
    p = latlng_to_xyz(lat, lng)
    return np.argmax(p @ FACE_CENTER_XYZ.T, axis=-1)


def geo_to_hex2d(
    lat: np.ndarray, lng: np.ndarray, res, face: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Project (lat, lng) onto (face, hex2d) at `res` (scalar or array)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    res = np.asarray(res, dtype=np.int64)
    if face is None:
        face = geo_to_face(lat, lng)
    p = latlng_to_xyz(lat, lng)
    cosd = np.clip(np.sum(p * FACE_CENTER_XYZ[face], axis=-1), -1.0, 1.0)
    r = np.arccos(cosd)
    flat = FACE_CENTER_GEO[face, 0]
    flng = FACE_CENTER_GEO[face, 1]
    az = geo_azimuth(flat, flng, lat, lng)
    theta = pos_angle(AZ_FACE_I[face] - pos_angle(az))
    from .constants import M_AP7_ROT_RADS

    theta = np.where(res % 2 == 1, pos_angle(theta - M_AP7_ROT_RADS), theta)
    r = np.tan(r) / RES0_U_GNOMONIC
    r = r * (M_SQRT7**res)
    x = r * np.cos(theta)
    y = r * np.sin(theta)
    zero = r < 1e-16
    x = np.where(zero, 0.0, x)
    y = np.where(zero, 0.0, y)
    return face, np.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# Base cell centers
# ---------------------------------------------------------------------------


def _derive_base_centers() -> np.ndarray:
    lat, lng = fijk_to_geo_raw(
        BASE_CELL_HOME_FACE, BASE_CELL_HOME_IJK, np.zeros(NUM_BASE_CELLS, np.int64)
    )
    return latlng_to_xyz(lat, lng)


BASE_CELL_XYZ = _derive_base_centers()


def _validate_base_centers() -> None:
    X = BASE_CELL_XYZ
    d = X @ X.T
    np.fill_diagonal(d, -1)
    # all centers distinct and well separated (res-0 spacing >= ~15 deg)
    maxcos = d.max()
    assert maxcos < np.cos(np.radians(10.0)), np.degrees(np.arccos(maxcos))
    # pentagons sit bijectively on the 12 icosahedron vertices
    pent = X[BASE_CELL_IS_PENTAGON]
    m = pent @ VERT_XYZ.T
    hits = (m > 1.0 - 1e-9).sum()
    assert hits == 12, hits
    assert (m.max(axis=1) > 1.0 - 1e-9).all()
    assert len(np.unique(np.argmax(m, axis=1))) == 12


_validate_base_centers()

# ---------------------------------------------------------------------------
# Face neighbor orientation (for overage adjustment): derived exactly from
# shared res-0 edge lattice points (2 vertices + midpoint per edge).
# ---------------------------------------------------------------------------

# quadrant order matches the overage logic: 0=central, 1=IJ, 2=KI, 3=JK
IJ_QUAD, KI_QUAD, JK_QUAD = 1, 2, 3

# res-0 face-frame coords of the corners: i-vertex, j-vertex, k-vertex
_CORNER_IJK = {
    "i": np.array([2, 0, 0], dtype=np.int64),
    "j": np.array([0, 2, 0], dtype=np.int64),
    "k": np.array([0, 0, 2], dtype=np.int64),
}
_EDGE_OF_QUAD = {IJ_QUAD: ("i", "j"), KI_QUAD: ("k", "i"), JK_QUAD: ("j", "k")}


def _axial(ijk: np.ndarray) -> np.ndarray:
    return np.stack([ijk[..., 0] - ijk[..., 2], ijk[..., 1] - ijk[..., 2]], axis=-1)


def _rot_axial_ccw(ab: np.ndarray, times: int) -> np.ndarray:
    a, b = ab[..., 0], ab[..., 1]
    for _ in range(times % 6):
        a, b = a - b, a
    return np.stack([a, b], axis=-1)


def _derive_face_neighbors() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (neighbor_face[20,4], translate[20,4,3], ccw_rot[20,4]).

    Entry q=0 is the identity; entries 1..3 describe re-expressing res-0
    lattice coords that overflow across the IJ/KI/JK edge in the adjacent
    face's frame: new = rot60ccw^r(old) + translate (coords in res-0 units;
    scale translate by 7^(res/2) for class II res, x3 for substrate).
    """
    nf = np.zeros((NUM_FACES, 4), dtype=np.int64)
    tr = np.zeros((NUM_FACES, 4, 3), dtype=np.int64)
    rr = np.zeros((NUM_FACES, 4), dtype=np.int64)
    nf[:, 0] = np.arange(NUM_FACES)

    # positions of each face's corners + edge midpoints (exact)
    def corner_xyz(f: int, name: str) -> np.ndarray:
        lat, lng = fijk_to_geo_raw(
            np.array([f]), _CORNER_IJK[name][None, :], np.array([0])
        )
        return latlng_to_xyz(lat, lng)[0]

    face_corner_pos = {
        (f, n): corner_xyz(f, n) for f in range(NUM_FACES) for n in "ijk"
    }

    for f in range(NUM_FACES):
        for q, (c0, c1) in _EDGE_OF_QUAD.items():
            p0 = face_corner_pos[(f, c0)]
            p1 = face_corner_pos[(f, c1)]
            # adjacent face g: shares both corners, not f
            g = -1
            for h in range(NUM_FACES):
                if h == f:
                    continue
                names0 = [n for n in "ijk" if face_corner_pos[(h, n)] @ p0 > 1 - 1e-9]
                names1 = [n for n in "ijk" if face_corner_pos[(h, n)] @ p1 > 1 - 1e-9]
                if names0 and names1:
                    g = h
                    gn0, gn1 = names0[0], names1[0]
                    break
            assert g >= 0, (f, q)
            nf[f, q] = g
            # correspondence: f-frame coords of p0/p1/midpoint ->
            # g-frame coords of same sphere points
            src = np.stack(
                [
                    _CORNER_IJK[c0],
                    _CORNER_IJK[c1],
                    (_CORNER_IJK[c0] + _CORNER_IJK[c1]) // 2,
                ]
            )
            dst = np.stack(
                [
                    _CORNER_IJK[gn0],
                    _CORNER_IJK[gn1],
                    (_CORNER_IJK[gn0] + _CORNER_IJK[gn1]) // 2,
                ]
            )
            sa = _axial(src)
            da = _axial(dst)
            found = False
            for r in range(6):
                rot = _rot_axial_ccw(sa, r)
                t = da - rot
                if np.all(t == t[0]):
                    # back to ijk translate (i=a, j=b, k=0 normalized)
                    ti, tj = int(t[0, 0]), int(t[0, 1])
                    vec = np.array([ti, tj, 0], dtype=np.int64)
                    vec = vec - vec.min()
                    tr[f, q] = vec
                    rr[f, q] = r
                    found = True
                    break
            assert found, (f, q)
    return nf, tr, rr


FACE_NEIGHBOR_FACE, FACE_NEIGHBOR_TRANSLATE, FACE_NEIGHBOR_CCWROT = (
    _derive_face_neighbors()
)


def _validate_face_neighbors() -> None:
    # known fragment: faceNeighbors[0] = central, IJ->face 4 (2,0,2) rot 1,
    # KI->face 1 (2,2,0) rot 5, JK->face 5 (0,2,2) rot 3
    assert FACE_NEIGHBOR_FACE[0, IJ_QUAD] == 4
    assert FACE_NEIGHBOR_FACE[0, KI_QUAD] == 1
    assert FACE_NEIGHBOR_FACE[0, JK_QUAD] == 5
    assert tuple(FACE_NEIGHBOR_TRANSLATE[0, IJ_QUAD]) == (2, 0, 2), tuple(
        FACE_NEIGHBOR_TRANSLATE[0, IJ_QUAD]
    )
    assert tuple(FACE_NEIGHBOR_TRANSLATE[0, KI_QUAD]) == (2, 2, 0)
    assert tuple(FACE_NEIGHBOR_TRANSLATE[0, JK_QUAD]) == (0, 2, 2)
    assert FACE_NEIGHBOR_CCWROT[0, IJ_QUAD] == 1, FACE_NEIGHBOR_CCWROT[0]
    assert FACE_NEIGHBOR_CCWROT[0, KI_QUAD] == 5
    assert FACE_NEIGHBOR_CCWROT[0, JK_QUAD] == 3


_validate_face_neighbors()

# ---------------------------------------------------------------------------
# faceIjkBaseCells equivalent: FACE_IJK_BASE_CELL / FACE_IJK_CCWROT60
# ---------------------------------------------------------------------------


def _res1_child_dirs_xyz(face: int, ijk_res0: np.ndarray) -> np.ndarray:
    """Sphere positions of the 6 res-1 'digit' lattice points around a res-0
    lattice coordinate, as seen in `face`'s plane (digits 1..6)."""
    center1 = IJK.down_ap7(np.asarray(ijk_res0, dtype=np.int64))
    pts = IJK.neighbor(
        np.broadcast_to(center1, (6, 3)).copy(), np.arange(1, 7, dtype=np.int64)
    )
    lat, lng = fijk_to_geo_raw(np.full(6, face), pts, np.ones(6, np.int64))
    return latlng_to_xyz(lat, lng)


def _derive_face_ijk_base_cells() -> tuple[np.ndarray, np.ndarray]:
    """For every face and raw (i, j, k) in 0..2^3: the base cell whose
    center the coordinate denotes, and the number of ccw 60-deg rotations
    translating digits from that face's frame into the cell's home frame."""
    bc_tab = np.full((NUM_FACES, 3, 3, 3), -1, dtype=np.int64)
    rot_tab = np.full((NUM_FACES, 3, 3, 3), -1, dtype=np.int64)

    home_child = {}  # base cell -> (6, 3) xyz of home-frame digit points

    def resolve_overage(f: int, ijk: np.ndarray) -> tuple[int, np.ndarray, int]:
        """Re-express a res-0 coord that overflows face `f` on the adjacent
        face; returns (face, coord, accumulated ccw rotations)."""
        rot_acc = 0
        for _ in range(4):
            c = IJK.normalize(ijk)
            if int(c.sum()) <= 2:
                return f, c, rot_acc
            i, j, k = (int(x) for x in c)
            if k > 0:
                q = JK_QUAD if j > 0 else KI_QUAD
            else:
                q = IJ_QUAD
            r = int(FACE_NEIGHBOR_CCWROT[f, q])
            for _ in range(r):
                c = IJK.rotate60ccw(c)
            c = IJK.normalize(c + FACE_NEIGHBOR_TRANSLATE[f, q])
            f = int(FACE_NEIGHBOR_FACE[f, q])
            rot_acc += r
            ijk = c
        raise AssertionError("overage did not converge")

    for f in range(NUM_FACES):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    ijk = np.array([i, j, k], dtype=np.int64)
                    g, c, rot_acc = resolve_overage(f, ijk)
                    lat, lng = fijk_to_geo_raw(
                        np.array([g]), c[None, :], np.array([0])
                    )
                    p = latlng_to_xyz(lat, lng)[0]
                    cos = BASE_CELL_XYZ @ p
                    order = np.argsort(-cos)
                    bc = int(order[0])
                    # on-face coords are exact lattice points of a center
                    a0 = np.arccos(np.clip(cos[order[0]], -1, 1))
                    assert a0 < 1e-6, (f, i, j, k, g, c, a0)
                    bc_tab[f, i, j, k] = bc

                    if BASE_CELL_IS_PENTAGON[bc]:
                        # rotation derived separately by encode/decode
                        # consistency (see _derive_pentagon_rotations)
                        rot_tab[f, i, j, k] = -1
                        continue

                    # rotation: match digit arrangement face-frame vs home
                    if bc not in home_child:
                        home_child[bc] = _res1_child_dirs_xyz(
                            int(BASE_CELL_HOME_FACE[bc]), BASE_CELL_HOME_IJK[bc]
                        )
                    hc = home_child[bc]
                    fc = _res1_child_dirs_xyz(g, c)
                    # digit d in face frame corresponds to home digit m[d]
                    cosm = fc @ hc.T
                    m = np.argmax(cosm, axis=1)
                    assert len(set(m.tolist())) == 6, (f, i, j, k, m)
                    # rotation r such that ccw^r(d_face) == d_home for all d
                    rot = -1
                    for r in range(6):
                        dd = np.arange(1, 7, dtype=np.int64)
                        for _ in range(r):
                            dd = IJK.DIGIT_ROT_CCW[dd]
                        if np.array_equal(dd - 1, m):
                            rot = r
                            break
                    assert rot >= 0, (f, i, j, k, m)
                    rot_tab[f, i, j, k] = (rot_acc + rot) % 6
    return bc_tab, rot_tab


FACE_IJK_BASE_CELL, FACE_IJK_CCWROT60 = _derive_face_ijk_base_cells()


def _validate_face0_fragment() -> None:
    for (i, j, k), (bc, rot) in FACE0_LOOKUP_FRAGMENT.items():
        got_bc = int(FACE_IJK_BASE_CELL[0, i, j, k])
        got_rot = int(FACE_IJK_CCWROT60[0, i, j, k])
        assert got_bc == bc, ((i, j, k), got_bc, bc)
        if not BASE_CELL_IS_PENTAGON[bc]:
            # pentagon rotations are derived by encode/decode consistency
            # and validated by the global sphere-tiling test instead
            # (tests/test_h3core.py); hexagon rotations must match exactly.
            assert got_rot == rot, ((i, j, k), got_rot, rot)



# ---------------------------------------------------------------------------
# Pentagon rotations + cw-offset faces, derived by encode/decode consistency
# ---------------------------------------------------------------------------
#
# Around an icosahedron vertex there are five 72-deg face sectors, so the
# hexagonal digit-matching above cannot apply to pentagon base cells.
# Instead: decode (which needs only the home placements + face-neighbor
# orientation, both already derived) defines the ground-truth centers of a
# pentagon's res-1/res-2 descendants; the rotation entry and the
# "clockwise offset" flag are then the unique values that make the encode
# pipeline reproduce each descendant's canonical digits.

_PENT_MAXDIM = [2 * 7 ** (r // 2) for r in range(0, 34, 2)]  # class II only


def _leading_nonzero(digits: list[int]) -> int:
    for d in digits:
        if d != 0:
            return d
    return 0


def _digits_rot60(digits: list[int], ccw: bool) -> list[int]:
    t = IJK.DIGIT_ROT_CCW if ccw else IJK.DIGIT_ROT_CW
    return [int(t[d]) for d in digits]


def _rot_pent60ccw(digits: list[int]) -> list[int]:
    """Faithful scalar version of the pentagon ccw index rotation."""
    out = list(digits)
    found = False
    for idx in range(len(out)):
        out[idx] = int(IJK.DIGIT_ROT_CCW[out[idx]])
        if not found and out[idx] != 0:
            found = True
            if out[idx] == IJK.K_AXES:
                out = _digits_rot60(out, True)
    return out


def _adjust_overage_scalar(face, coord, res, pent_leading_4, substrate):
    """Class-II overage adjustment; returns (overage, face, coord).
    overage: 0 none, 1 face edge, 2 new face."""
    max_dim = 2 * 7 ** (res // 2)
    unit_scale = 7 ** (res // 2)
    if substrate:
        max_dim *= 3
        unit_scale *= 3
    c = IJK.normalize(np.asarray(coord, dtype=np.int64))
    s = int(c.sum())
    if substrate and s == max_dim:
        return 1, face, c
    if s <= max_dim:
        return 0, face, c
    i, j, k = (int(x) for x in c)
    # quadrant chosen BEFORE the pentagon leading-4 rotation and kept
    if k > 0:
        q = JK_QUAD if j > 0 else KI_QUAD
    else:
        q = IJ_QUAD
    if pent_leading_4 and q == KI_QUAD:
        origin = np.array([max_dim, 0, 0], dtype=np.int64)
        tmp = c - origin
        a, b = int(tmp[0] - tmp[2]), int(tmp[1] - tmp[2])
        # axial cw rotation: inverse of ccw (a,b)->(a-b,a) is (a,b)->(b, b-a)
        a, b = b, b - a
        c = IJK.normalize(
            np.array([a + origin[0], b + origin[1], origin[2]], dtype=np.int64)
        )
    r = int(FACE_NEIGHBOR_CCWROT[face, q])
    for _ in range(r):
        c = IJK.rotate60ccw(c)
    c = IJK.normalize(c + FACE_NEIGHBOR_TRANSLATE[face, q] * unit_scale)
    nface = int(FACE_NEIGHBOR_FACE[face, q])
    ov = 2
    if substrate and int(c.sum()) == max_dim:
        ov = 1
    return ov, nface, c


def _cell_to_fijk_scalar(bc: int, digits: list[int]):
    """Decode: (base cell, digits res1..r) -> (face, ijk, res). Faithful to
    the published cell->FaceIJK algorithm incl. pentagon adjustments."""
    res = len(digits)
    digs = list(digits)
    is_pent = bool(BASE_CELL_IS_PENTAGON[bc])
    if is_pent and _leading_nonzero(digs) == 5:
        digs = _digits_rot60(digs, ccw=False)
    f = int(BASE_CELL_HOME_FACE[bc])
    c = BASE_CELL_HOME_IJK[bc].copy()
    possible_overage = True
    if not is_pent and (res == 0 or tuple(c) == (0, 0, 0)):
        possible_overage = False
    for r in range(1, res + 1):
        if r % 2 == 1:
            c = IJK.down_ap7(c)
        else:
            c = IJK.down_ap7r(c)
        c = IJK.neighbor(c, digs[r - 1])
    if not possible_overage:
        return f, c, res
    orig = c.copy()
    res2 = res
    if res % 2 == 1:
        c = IJK.down_ap7r(c)
        res2 = res + 1
    pent_leading_4 = is_pent and _leading_nonzero(digs) == 4
    ov, f2, c2 = _adjust_overage_scalar(f, c, res2, pent_leading_4, False)
    if ov != 0:
        f, c = f2, c2
        if is_pent:
            while True:
                ov, f, c = _adjust_overage_scalar(f, c, res2, False, False)
                if ov == 0:
                    break
        if res2 != res:
            c = IJK.up_ap7r(c)
    else:
        if res2 != res:
            c = orig
    return f, c, res


def _cell_center_scalar(bc: int, digits: list[int]):
    f, c, res = _cell_to_fijk_scalar(bc, digits)
    lat, lng = fijk_to_geo_raw(np.array([f]), c[None, :], np.array([res]))
    return float(lat[0]), float(lng[0])


def _encode_unwind_scalar(lat: float, lng: float, res: int):
    """Encode front-half: point -> (face, res0 ijk, raw face-frame digits)."""
    face, v = geo_to_hex2d(np.array([lat]), np.array([lng]), np.array([res]))
    c = IJK.hex2d_to_ijk(v)[0]
    face = int(face[0])
    digits = [0] * res
    for r in range(res, 0, -1):
        last = c.copy()
        if r % 2 == 1:
            c = IJK.up_ap7(c)
            center = IJK.down_ap7(c)
        else:
            c = IJK.up_ap7r(c)
            center = IJK.down_ap7r(c)
        digits[r - 1] = int(IJK.unit_ijk_to_digit(IJK.normalize(last - center)))
    return face, c, digits


def _derive_pentagon_rotations():
    """Fill pentagon entries of FACE_IJK_CCWROT60 and derive the per-face
    cw-offset flags by requiring encode == canonical digits for every res-2
    descendant of every pentagon."""
    cw_offset = np.zeros((NUM_BASE_CELLS, NUM_FACES), dtype=bool)
    pent_coords = [(2, 0, 0), (0, 2, 0), (0, 0, 2)]

    import itertools

    def tests_at(bc: int, res: int):
        by_face: dict[int, list] = {}
        for digs in itertools.product(range(7), repeat=res):
            digs = list(digs)
            if _leading_nonzero(digs) == IJK.K_AXES:
                continue
            lat, lng = _cell_center_scalar(bc, digs)
            face, c0, raw = _encode_unwind_scalar(lat, lng, res)
            by_face.setdefault(face, []).append((digs, c0, raw))
        return by_face

    for bc in np.nonzero(BASE_CELL_IS_PENTAGON)[0]:
        bc = int(bc)
        by_face = tests_at(bc, 2)
        by_face3 = None
        for face, items in by_face.items():
            # the pentagon's coord on this face
            coord = None
            for pc in pent_coords:
                if FACE_IJK_BASE_CELL[face][pc] == bc:
                    coord = pc
            assert coord is not None, (bc, face, items[:1])
            ok_combos = []
            # pentagon index rotation has period 5, so R in 0..4 is canonical
            for R in range(5):
                for cw in (False, True):
                    good = True
                    for digs, c0, raw in items:
                        if tuple(c0) != coord:
                            good = False
                            break
                        h = list(raw)
                        if _leading_nonzero(h) == IJK.K_AXES:
                            h = _digits_rot60(h, ccw=not cw)
                        for _ in range(R):
                            h = _rot_pent60ccw(h)
                        if h != digs:
                            good = False
                            break
                    if good:
                        ok_combos.append((R, cw))
            assert ok_combos, (bc, face)
            rots = sorted({r for r, _ in ok_combos})
            if len(rots) > 1:
                # disambiguate with the res-3 descendants
                if by_face3 is None:
                    by_face3 = tests_at(bc, 3)
                items3 = by_face3.get(face, [])
                kept = []
                for R, cw in ok_combos:
                    good = True
                    for digs, c0, raw in items3:
                        if tuple(c0) != coord:
                            good = False
                            break
                        h = list(raw)
                        if _leading_nonzero(h) == IJK.K_AXES:
                            h = _digits_rot60(h, ccw=not cw)
                        for _ in range(R):
                            h = _rot_pent60ccw(h)
                        if h != digs:
                            good = False
                            break
                    if good:
                        kept.append((R, cw))
                ok_combos = kept
                rots = sorted({r for r, _ in ok_combos})
            assert len(rots) == 1, (bc, face, ok_combos)
            cws = sorted({c for _, c in ok_combos})
            R = rots[0]
            i, j, k = coord
            FACE_IJK_CCWROT60[face, i, j, k] = R
            if len(cws) == 1:
                cw_offset[bc, face] = cws[0]
    return cw_offset


PENT_CW_OFFSET = _derive_pentagon_rotations()
assert (FACE_IJK_CCWROT60 >= 0).all()


def _validate_stage2() -> None:
    _validate_face0_fragment()
    # remembered cw-offset pairs from the public base-cell data must agree
    from .constants import BASE_CELL_CW_OFFSET

    for bc in np.nonzero(BASE_CELL_IS_PENTAGON)[0]:
        want = {int(x) for x in BASE_CELL_CW_OFFSET[bc] if x >= 0}
        got = {int(f) for f in np.nonzero(PENT_CW_OFFSET[int(bc)])[0]}
        assert got == want, (int(bc), got, want)


_validate_stage2()
