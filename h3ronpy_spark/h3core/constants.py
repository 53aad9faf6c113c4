"""Icosahedron geometry constants for the from-scratch H3 core.

Implements the public H3 grid-system specification (the H3 discrete global
grid of Uber's Apache-2.0 `uber/h3`; see h3geo.org/docs/core-library) on top
of NumPy only.  Nothing here is ported from the reference engine at
/root/reference (a Rust/arrow kernel library, see SURVEY.md §1) — the
reference defines *what* the operators compute, the math below is the public
spec: a gnomonic projection per icosahedron face and an aperture-7
hexagonal lattice in IJK+ coordinates.

All angles are radians, latitudes/longitudes WGS84.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.007180918475  # authalic sphere radius used by H3

# Number of 60-deg rotations between class II and class III grids:
# asin(sqrt(3/28)).
M_AP7_ROT_RADS = float(np.arcsin(np.sqrt(3.0 / 28.0)))
M_SQRT7 = float(np.sqrt(7.0))
M_SIN60 = float(np.sqrt(3.0) / 2.0)

# Scaling of a res-0 unit length (distance between adjacent cell centers on
# the gnomonic plane) to gnomonic radians: equals (3 - sqrt(5)) / 2 — half
# the gnomonic distance from a face center to an icosahedron vertex, since a
# res-0 pentagon sits exactly 2 lattice units up the i-axis on its vertex.
RES0_U_GNOMONIC = float((3.0 - np.sqrt(5.0)) / 2.0)

EPSILON = 1e-14

NUM_FACES = 20
NUM_BASE_CELLS = 122
MAX_RES = 15

# --- Icosahedron face centers (lat, lng) in radians, H3 face numbering.
# These 40 numbers define the (Dymaxion-derived) orientation of the H3
# icosahedron on Earth; they are part of the published H3 grid definition.
# Validated in tables.py: pairwise angular distances must reproduce exact
# icosahedron geometry (adjacent-center angle arccos(sqrt(5)/3)), north and
# south caps must mirror, and derived vertices must form a regular
# icosahedron; golden cell values from the reference test-suite pin the
# absolute orientation (SURVEY.md §5.2).
FACE_CENTER_GEO = np.array(
    [
        [0.803582649718989942, 1.248397419617396099],  # face  0
        [1.307747883455638156, 2.536945009877921159],  # face  1
        [1.054751253523952054, -1.347517358900396623],  # face  2
        [0.600191595538186799, -0.450603909469755746],  # face  3
        [0.491715428198773866, 0.401988202911306943],  # face  4
        [0.172745327415618701, 1.678146885280433686],  # face  5
        [0.605929321571350690, 2.953923329812411617],  # face  6
        [0.427370518328979641, -1.888876200336285401],  # face  7
        [-0.079066118549212831, -0.733429513380867741],  # face  8
        [-0.230961644455383637, 0.506495587332349035],  # face  9
        [0.079066118549212831, 2.408163140208925497],  # face 10
        [0.230961644455383637, -2.635097066257444203],  # face 11
        [-0.172745327415618701, -1.463445768309359553],  # face 12
        [-0.605929321571350690, -0.187669323777381622],  # face 13
        [-0.427370518328979641, 1.252716453253507838],  # face 14
        [-0.600191595538186799, 2.690988744120037492],  # face 15
        [-0.491715428198773866, -2.739604450678486295],  # face 16
        [-0.803582649718989942, -1.893195233972397139],  # face 17
        [-1.307747883455638156, -0.604647643711872080],  # face 18
        [-1.054751253523952054, 1.794075294689396615],  # face 19
    ],
    dtype=np.float64,
)

# Approximate azimuths (radians) from each face center to the vertex its
# class-II i-axis points at.  Only used to *select* one of the three
# geometrically-derived vertex azimuths per face in tables.py (snap
# tolerance ~0.5 rad); the exact axis azimuths are recomputed from the
# icosahedron vertices, so small errors here are harmless and large errors
# are caught by the base-cell tiling checks.
FACE_I_AXIS_AZ_HINT = np.array(
    [
        5.619958268523939,  # face  0
        5.760339081714187,  # face  1
        0.780213654393430,  # face  2
        0.430469363979999,  # face  3
        6.130269123335111,  # face  4
        2.692877706530642,  # face  5
        2.982963003477243,  # face  6
        3.532912002790141,  # face  7
        3.494305004259568,  # face  8
        3.003214169499538,  # face  9
        5.930472956509811,  # face 10
        0.138378484090254,  # face 11
        0.448714947059150,  # face 12
        0.158629650112549,  # face 13
        5.891865957979238,  # face 14
        2.711123289609793,  # face 15
        3.294508837434268,  # face 16
        3.804819692245439,  # face 17
        3.664438879055192,  # face 18
        2.361378999196363,  # face 19
    ],
    dtype=np.float64,
)

# --- Base cell placement: (home_face, home_i, home_j, home_k) per base cell,
# pentagon flag, and for pentagons the two "clockwise offset" faces.
# This 122-row placement is the published base-cell layout of the H3 grid.
# Geometric validation in tables.py: all 122 centers distinct and uniformly
# spaced, the 12 pentagons sit bijectively on the 12 icosahedron vertices,
# and every face-lattice coordinate within range maps exactly onto one
# center (cross-face lattice agreement).
_B = [
    # (face, i, j, k, pent, cw0, cw1)
    (1, 1, 0, 0, 0, -1, -1),  # 0
    (2, 1, 1, 0, 0, -1, -1),  # 1
    (1, 0, 0, 0, 0, -1, -1),  # 2
    (2, 1, 0, 0, 0, -1, -1),  # 3
    (0, 2, 0, 0, 1, -1, -1),  # 4 (pentagon, polar — no cw offset)
    (1, 1, 1, 0, 0, -1, -1),  # 5
    (1, 0, 0, 1, 0, -1, -1),  # 6
    (2, 0, 0, 0, 0, -1, -1),  # 7
    (0, 1, 0, 0, 0, -1, -1),  # 8
    (2, 0, 1, 0, 0, -1, -1),  # 9
    (1, 0, 1, 0, 0, -1, -1),  # 10
    (1, 0, 1, 1, 0, -1, -1),  # 11
    (3, 1, 0, 0, 0, -1, -1),  # 12
    (3, 1, 1, 0, 0, -1, -1),  # 13
    (11, 2, 0, 0, 1, 2, 6),  # 14
    (4, 1, 0, 0, 0, -1, -1),  # 15
    (0, 0, 0, 0, 0, -1, -1),  # 16
    (6, 0, 1, 0, 0, -1, -1),  # 17
    (0, 0, 0, 1, 0, -1, -1),  # 18
    (2, 0, 1, 1, 0, -1, -1),  # 19
    (7, 0, 0, 1, 0, -1, -1),  # 20
    (2, 0, 0, 1, 0, -1, -1),  # 21
    (0, 1, 1, 0, 0, -1, -1),  # 22
    (6, 0, 0, 1, 0, -1, -1),  # 23
    (10, 2, 0, 0, 1, 1, 5),  # 24
    (6, 0, 0, 0, 0, -1, -1),  # 25
    (3, 0, 0, 0, 0, -1, -1),  # 26
    (11, 1, 0, 0, 0, -1, -1),  # 27
    (4, 1, 1, 0, 0, -1, -1),  # 28
    (3, 0, 1, 0, 0, -1, -1),  # 29
    (0, 0, 1, 1, 0, -1, -1),  # 30
    (4, 0, 0, 0, 0, -1, -1),  # 31
    (5, 0, 1, 0, 0, -1, -1),  # 32
    (0, 0, 1, 0, 0, -1, -1),  # 33
    (7, 0, 1, 0, 0, -1, -1),  # 34
    (11, 1, 1, 0, 0, -1, -1),  # 35
    (7, 0, 0, 0, 0, -1, -1),  # 36
    (10, 1, 0, 0, 0, -1, -1),  # 37
    (12, 2, 0, 0, 1, 3, 7),  # 38
    (6, 1, 0, 1, 0, -1, -1),  # 39
    (7, 1, 0, 1, 0, -1, -1),  # 40
    (4, 0, 0, 1, 0, -1, -1),  # 41
    (3, 0, 0, 1, 0, -1, -1),  # 42
    (3, 0, 1, 1, 0, -1, -1),  # 43
    (4, 0, 1, 0, 0, -1, -1),  # 44
    (6, 1, 0, 0, 0, -1, -1),  # 45
    (11, 0, 0, 0, 0, -1, -1),  # 46
    (8, 0, 0, 1, 0, -1, -1),  # 47
    (5, 0, 0, 1, 0, -1, -1),  # 48
    (14, 2, 0, 0, 1, 0, 9),  # 49
    (5, 0, 0, 0, 0, -1, -1),  # 50
    (12, 1, 0, 0, 0, -1, -1),  # 51
    (10, 1, 1, 0, 0, -1, -1),  # 52
    (4, 0, 1, 1, 0, -1, -1),  # 53
    (12, 1, 1, 0, 0, -1, -1),  # 54
    (7, 1, 0, 0, 0, -1, -1),  # 55
    (11, 0, 1, 0, 0, -1, -1),  # 56
    (10, 0, 0, 0, 0, -1, -1),  # 57
    (13, 2, 0, 0, 1, 4, 8),  # 58
    (10, 0, 0, 1, 0, -1, -1),  # 59
    (11, 0, 0, 1, 0, -1, -1),  # 60
    (9, 0, 1, 0, 0, -1, -1),  # 61
    (8, 0, 1, 0, 0, -1, -1),  # 62
    (6, 2, 0, 0, 1, 11, 15),  # 63
    (8, 0, 0, 0, 0, -1, -1),  # 64
    (9, 0, 0, 1, 0, -1, -1),  # 65
    (14, 1, 0, 0, 0, -1, -1),  # 66
    (5, 1, 0, 1, 0, -1, -1),  # 67
    (16, 0, 1, 1, 0, -1, -1),  # 68
    (8, 1, 0, 1, 0, -1, -1),  # 69
    (5, 1, 0, 0, 0, -1, -1),  # 70
    (12, 0, 0, 0, 0, -1, -1),  # 71
    (7, 2, 0, 0, 1, 12, 16),  # 72
    (12, 0, 1, 0, 0, -1, -1),  # 73
    (10, 0, 1, 0, 0, -1, -1),  # 74
    (9, 0, 0, 0, 0, -1, -1),  # 75
    (13, 1, 0, 0, 0, -1, -1),  # 76
    (16, 0, 0, 1, 0, -1, -1),  # 77
    (15, 0, 1, 1, 0, -1, -1),  # 78
    (15, 0, 1, 0, 0, -1, -1),  # 79
    (16, 0, 1, 0, 0, -1, -1),  # 80
    (14, 1, 1, 0, 0, -1, -1),  # 81
    (13, 1, 1, 0, 0, -1, -1),  # 82
    (5, 2, 0, 0, 1, 10, 19),  # 83
    (8, 1, 0, 0, 0, -1, -1),  # 84
    (14, 0, 0, 0, 0, -1, -1),  # 85
    (9, 1, 0, 1, 0, -1, -1),  # 86
    (14, 0, 0, 1, 0, -1, -1),  # 87
    (17, 0, 0, 1, 0, -1, -1),  # 88
    (12, 0, 0, 1, 0, -1, -1),  # 89
    (16, 0, 0, 0, 0, -1, -1),  # 90
    (17, 0, 1, 1, 0, -1, -1),  # 91
    (15, 0, 0, 1, 0, -1, -1),  # 92
    (16, 1, 0, 1, 0, -1, -1),  # 93
    (9, 1, 0, 0, 0, -1, -1),  # 94
    (15, 0, 0, 0, 0, -1, -1),  # 95
    (13, 0, 0, 0, 0, -1, -1),  # 96
    (8, 2, 0, 0, 1, 13, 17),  # 97
    (13, 0, 1, 0, 0, -1, -1),  # 98
    (17, 1, 0, 1, 0, -1, -1),  # 99
    (19, 0, 1, 0, 0, -1, -1),  # 100
    (14, 0, 1, 0, 0, -1, -1),  # 101
    (19, 0, 1, 1, 0, -1, -1),  # 102
    (17, 0, 1, 0, 0, -1, -1),  # 103
    (13, 0, 0, 1, 0, -1, -1),  # 104
    (17, 0, 0, 0, 0, -1, -1),  # 105
    (16, 1, 0, 0, 0, -1, -1),  # 106
    (9, 2, 0, 0, 1, 14, 18),  # 107
    (15, 1, 0, 1, 0, -1, -1),  # 108
    (15, 1, 0, 0, 0, -1, -1),  # 109
    (18, 0, 1, 1, 0, -1, -1),  # 110
    (18, 0, 0, 1, 0, -1, -1),  # 111
    (19, 0, 0, 1, 0, -1, -1),  # 112
    (17, 1, 0, 0, 0, -1, -1),  # 113
    (19, 0, 0, 0, 0, -1, -1),  # 114
    (18, 0, 1, 0, 0, -1, -1),  # 115
    (18, 1, 0, 1, 0, -1, -1),  # 116
    (19, 2, 0, 0, 1, -1, -1),  # 117 (pentagon, polar — no cw offset)
    (19, 1, 0, 0, 0, -1, -1),  # 118
    (18, 0, 0, 0, 0, -1, -1),  # 119
    (19, 1, 0, 1, 0, -1, -1),  # 120
    (18, 1, 0, 0, 0, -1, -1),  # 121
]

_BA = np.array(_B, dtype=np.int64)
BASE_CELL_HOME_FACE = _BA[:, 0].copy()
BASE_CELL_HOME_IJK = _BA[:, 1:4].copy()
BASE_CELL_IS_PENTAGON = _BA[:, 4].astype(bool)
BASE_CELL_CW_OFFSET = _BA[:, 5:7].copy()

PENTAGON_BASE_CELLS = np.nonzero(BASE_CELL_IS_PENTAGON)[0]

# Known fragment of the (face, i, j, k) -> (base cell, ccw 60-deg rotations)
# lookup for face 0, used as an anchor to pin the sign/orientation
# conventions of the geometric derivation in tables.py.
FACE0_LOOKUP_FRAGMENT = {
    (0, 0, 0): (16, 0),
    (0, 0, 1): (18, 0),
    (0, 0, 2): (24, 3),
    (0, 1, 0): (33, 0),
    (0, 1, 1): (30, 0),
    (0, 1, 2): (32, 3),
    (0, 2, 0): (49, 1),
    (0, 2, 1): (48, 3),
    (0, 2, 2): (50, 3),
    (1, 0, 0): (8, 0),
    (1, 0, 1): (5, 5),
    (1, 0, 2): (10, 5),
    (1, 1, 0): (22, 0),
    (1, 1, 1): (16, 0),
    (1, 1, 2): (18, 0),
    (1, 2, 0): (41, 1),
    (1, 2, 1): (33, 0),
    (1, 2, 2): (30, 0),
    (2, 0, 0): (4, 0),
    (2, 0, 1): (0, 5),
    (2, 0, 2): (2, 5),
    (2, 1, 0): (15, 1),
    (2, 1, 1): (8, 0),
    (2, 1, 2): (5, 5),
    (2, 2, 0): (31, 1),
    (2, 2, 1): (22, 0),
    (2, 2, 2): (16, 0),
}


def latlng_to_xyz(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """(..., ) lat/lng radians -> (..., 3) unit vectors."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


def xyz_to_latlng(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(v, dtype=np.float64)
    lat = np.arctan2(v[..., 2], np.hypot(v[..., 0], v[..., 1]))
    lng = np.arctan2(v[..., 1], v[..., 0])
    return lat, lng


def pos_angle(a: np.ndarray) -> np.ndarray:
    """Normalize angle(s) into [0, 2*pi)."""
    two_pi = 2.0 * np.pi
    return np.mod(a, two_pi)


def geo_azimuth(lat1, lng1, lat2, lng2):
    """Initial great-circle azimuth from point 1 to point 2 (radians)."""
    return np.arctan2(
        np.cos(lat2) * np.sin(lng2 - lng1),
        np.cos(lat1) * np.sin(lat2)
        - np.sin(lat1) * np.cos(lat2) * np.cos(lng2 - lng1),
    )


def geo_az_distance(lat, lng, az, dist):
    """Point at great-circle `dist` along azimuth `az` from (lat, lng)."""
    lat = np.asarray(lat, np.float64)
    lng = np.asarray(lng, np.float64)
    az = np.asarray(az, np.float64)
    dist = np.asarray(dist, np.float64)
    sin_lat = np.sin(lat) * np.cos(dist) + np.cos(lat) * np.sin(dist) * np.cos(az)
    sin_lat = np.clip(sin_lat, -1.0, 1.0)
    lat2 = np.arcsin(sin_lat)
    y = np.sin(az) * np.sin(dist) * np.cos(lat)
    x = np.cos(dist) - np.sin(lat) * sin_lat
    lng2 = lng + np.arctan2(y, x)
    return lat2, np.mod(lng2 + np.pi, 2.0 * np.pi) - np.pi


FACE_CENTER_XYZ = latlng_to_xyz(FACE_CENTER_GEO[:, 0], FACE_CENTER_GEO[:, 1])
