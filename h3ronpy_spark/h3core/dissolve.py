"""Dissolve (link_cells): merge adjacent same-res cells into polygons.

Reproduces the reference's `cells_to_wkb_polygons(link_cells=True)`
(SURVEY.md §2.6 op 31; h3o `dissolve`, used by rasterize_cells at
h3ronpy/python/h3ronpy/raster.py:200): boundary-edge cancellation — every
interior edge appears twice (once per orientation) and cancels; surviving
directed edges stitch into closed rings.  Vertex identity uses the
canonical H3 vertex *indexes* (edges.cells_to_vertexes), so matching is
exact int64 equality, no floating-point tolerance — which also makes the
algorithm distributable (cancel within partitions, then once globally).
"""

from __future__ import annotations

import numpy as np

from .edges import cells_to_vertexes, vertexes_to_latlng


def dissolve_cells(cells: np.ndarray) -> list[list[np.ndarray]]:
    """-> list of polygons, each a list of rings as (N, 2) lnglat degrees
    (first ring outer/CCW, following rings holes)."""
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    if cells.size == 0:
        return []
    rows, verts = cells_to_vertexes(cells)
    # per-cell vertex cycles -> directed edges (vertex ids)
    starts = np.searchsorted(rows, np.arange(cells.size))
    ends = np.append(starts[1:], rows.size)
    e_from, e_to = [], []
    for i in range(cells.size):
        vv = verts[starts[i] : ends[i]]
        e_from.append(vv)
        e_to.append(np.roll(vv, -1))
    ef = np.concatenate(e_from)
    et = np.concatenate(e_to)
    # cancel edges that appear in both orientations (interior)
    fwd = set(zip(ef.tolist(), et.tolist()))
    boundary = [(a, b) for a, b in fwd if (b, a) not in fwd]
    if not boundary:
        return []
    nxt = {}
    for a, b in boundary:
        nxt[a] = b
    # stitch rings
    rings_vids = []
    unused = set(a for a, _ in boundary)
    while unused:
        start = next(iter(unused))
        ring = [start]
        unused.discard(start)
        cur = nxt[start]
        while cur != start:
            ring.append(cur)
            unused.discard(cur)
            cur = nxt[cur]
        rings_vids.append(ring)
    # vertex ids -> coordinates
    out_rings = []
    for ring in rings_vids:
        vids = np.array(ring, dtype=np.int64)
        la, lo = vertexes_to_latlng(vids)
        coords = np.stack([np.degrees(lo), np.degrees(la)], axis=-1)
        coords = np.vstack([coords, coords[:1]])
        out_rings.append(coords)

    # classify outer (CCW, positive signed area) vs hole and nest
    def signed_area(r):
        x, y = r[:, 0], r[:, 1]
        return 0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])

    outers = [(r, signed_area(r)) for r in out_rings if signed_area(r) > 0]
    holes = [r for r in out_rings if signed_area(r) <= 0]
    polys: list[list[np.ndarray]] = [[r] for r, _ in outers]
    from .polyfill import _pip

    for h in holes:
        px, py = h[0, 0], h[0, 1]
        for poly in polys:
            if _pip(np.array([px]), np.array([py]), [poly[0]])[0]:
                poly.append(h)
                break
    return polys


def dissolve_to_wkb(cells: np.ndarray) -> bytes | None:
    """Dissolve a cell set to one (Multi)Polygon WKB blob."""
    from .wkb import write_multipolygon, write_polygon

    polys = dissolve_cells(cells)
    if not polys:
        return None
    if len(polys) == 1:
        return write_polygon(polys[0])
    return write_multipolygon(polys)
