"""Minimal WKB reader/writer in numpy (no shapely in the environment).

Supports 2-D Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection — the geometry set h3ronpy's polyfill
handles (crates/h3arrow/src/array/from_geo.rs:329-386, SURVEY.md §2.6).

Reader output is a normalized dict per geometry:
  {"type": str, "points": (N,2) lnglat, "lines": [(N,2)...],
   "polys": [ [outer(N,2), hole(N,2), ...] ... ]}
Writer emits little-endian WKB.
"""

from __future__ import annotations

import struct

import numpy as np

PT, LS, PG, MPT, MLS, MPG, GC = 1, 2, 3, 4, 5, 6, 7

_EMPTY = {"points": None, "lines": None, "polys": None}


def parse_wkb(buf: bytes) -> dict:
    """Parse one WKB blob into the normalized geometry dict."""
    out = {"points": [], "lines": [], "polys": []}
    _parse_into(memoryview(buf), 0, out)
    pts = np.array(out["points"]).reshape(-1, 2) if out["points"] else None
    return {
        "points": pts,
        "lines": out["lines"] or None,
        "polys": out["polys"] or None,
    }


def _parse_into(mv: memoryview, off: int, out: dict) -> int:
    bo = "<" if mv[off] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", mv, off + 1)
    dim = 2
    if gtype & 0x80000000:  # EWKB Z flag
        dim += 1
    if gtype & 0x40000000:  # EWKB M flag
        dim += 1
    base = gtype & 0x0FFFFFFF
    if base >= 1000:  # ISO: 1000=Z, 2000=M, 3000=ZM
        iso = base // 1000
        dim = 4 if iso == 3 else 3
        base = base % 1000
    off += 5

    def rd_pts(n, off):
        arr = np.frombuffer(mv, dtype=bo + "f8", count=n * dim, offset=off)
        off += n * dim * 8
        return arr.reshape(n, dim)[:, :2].copy(), off

    if base == PT:
        p, off = rd_pts(1, off)
        if np.isfinite(p).all():
            out["points"].append(p[0])
    elif base == LS:
        (n,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        p, off = rd_pts(n, off)
        if n:
            out["lines"].append(p)
    elif base == PG:
        (nr,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", mv, off)
            off += 4
            p, off = rd_pts(n, off)
            rings.append(p)
        if rings and len(rings[0]) >= 4:
            out["polys"].append(rings)
    elif base in (MPT, MLS, MPG, GC):
        (n,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        for _ in range(n):
            off = _parse_into(mv, off, out)
    else:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    return off


# ---------------------------------------------------------------------------
# Writers (vectorized batch emission)
# ---------------------------------------------------------------------------

_PT_HDR = struct.pack("<BI", 1, PT)


def write_points(lng: np.ndarray, lat: np.ndarray) -> list[bytes | None]:
    """(N,) coords -> list of 21-byte WKB points (None where NaN)."""
    lng = np.asarray(lng, dtype="<f8")
    lat = np.asarray(lat, dtype="<f8")
    n = lng.shape[0]
    body = np.empty((n, 21), dtype=np.uint8)
    hdr = np.frombuffer(_PT_HDR, dtype=np.uint8)
    body[:, :5] = hdr
    body[:, 5:13] = lng.view(np.uint8).reshape(n, 8)
    body[:, 13:21] = lat.view(np.uint8).reshape(n, 8)
    ok = np.isfinite(lng) & np.isfinite(lat)
    raw = body.tobytes()
    return [raw[i * 21 : (i + 1) * 21] if ok[i] else None for i in range(n)]


def write_polygons(
    lats: np.ndarray, lngs: np.ndarray, counts: np.ndarray
) -> list[bytes | None]:
    """Padded boundary arrays (degrees) -> single-ring WKB polygons."""
    n = lats.shape[0]
    out: list[bytes | None] = []
    for i in range(n):
        k = int(counts[i])
        if k < 3:
            out.append(None)
            continue
        ring = np.empty((k + 1, 2), dtype="<f8")
        ring[:k, 0] = lngs[i, :k]
        ring[:k, 1] = lats[i, :k]
        ring[k] = ring[0]
        out.append(
            struct.pack("<BIII", 1, PG, 1, k + 1) + ring.tobytes()
        )
    return out


def write_linestrings(coords: list[np.ndarray | None]) -> list[bytes | None]:
    """List of (N,2) lnglat arrays -> WKB linestrings."""
    out: list[bytes | None] = []
    for c in coords:
        if c is None or len(c) == 0:
            out.append(None)
            continue
        a = np.ascontiguousarray(c, dtype="<f8")
        out.append(struct.pack("<BII", 1, LS, len(a)) + a.tobytes())
    return out


def write_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (N,2) lnglat (first outer). Closes rings if needed."""
    parts = [struct.pack("<BII", 1, PG, len(rings))]
    for r in rings:
        a = np.asarray(r, dtype="<f8")
        if not np.array_equal(a[0], a[-1]):
            a = np.vstack([a, a[:1]])
        parts.append(struct.pack("<I", len(a)) + a.tobytes())
    return b"".join(parts)


def write_point(lng: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, PT, lng, lat)


def write_linestring(coords) -> bytes:
    a = np.asarray(coords, dtype="<f8")
    return struct.pack("<BII", 1, LS, len(a)) + a.tobytes()


def write_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    parts = [struct.pack("<BII", 1, MPG, len(polys))]
    for rings in polys:
        parts.append(write_polygon(rings))
    return b"".join(parts)


def write_geometrycollection(blobs: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, GC, len(blobs)) + b"".join(blobs)
