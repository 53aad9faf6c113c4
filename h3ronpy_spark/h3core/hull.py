"""Whole-array geometry aggregates (SURVEY.md §2.10 item 47):
centroid, convex hull over cell sets.

The reference computes these as single-array eager aggregates via the geo
crate (crates/h3arrow/src/algorithm/{centroid,convex_hull}.rs); here the
kernels are plain numpy (monotone-chain hull), and the Spark operator does
the classic two-phase distributed hull: per-partition hull (drops almost
every point) then a final merge on the driver — hull(hull(A) u hull(B)) ==
hull(A u B).
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull of (N, 2) lnglat points -> CCW ring
    (M, 2), not closed."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if pts.shape[0] <= 2:
        return pts
    # lexicographic sort by (x, y) — np.unique already sorts rows
    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2 and np.cross(
                out[-1] - out[-2], p - out[-2]
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def cells_centroid(cells: np.ndarray) -> tuple[float, float]:
    """Mean position of cell centers (3-D mean renormalized) in degrees."""
    from .constants import latlng_to_xyz, xyz_to_latlng
    from .latlng import cell_to_latlng

    lat, lng = cell_to_latlng(np.asarray(cells, dtype=np.int64))
    v = latlng_to_xyz(lat, lng).mean(axis=0)
    v = v / np.linalg.norm(v)
    la, lo = xyz_to_latlng(v)
    return float(np.degrees(la)), float(np.degrees(lo))


def cells_convex_hull_wkb(cells: np.ndarray) -> bytes | None:
    """Convex hull polygon (WKB) over all boundary vertices of the cells."""
    from .boundary import cell_boundary
    from .wkb import write_polygon

    lats, lngs, counts = cell_boundary(np.asarray(cells, dtype=np.int64))
    pts = []
    for i in range(lats.shape[0]):
        k = int(counts[i])
        if k:
            pts.append(
                np.stack(
                    [np.degrees(lngs[i, :k]), np.degrees(lats[i, :k])], axis=-1
                )
            )
    if not pts:
        return None
    hull = convex_hull(np.vstack(pts))
    if hull.shape[0] < 3:
        return None
    return write_polygon([hull])


def spark_cells_convex_hull(df, cell_col: str = "cell") -> bytes | None:
    """Two-phase distributed hull: per-partition hulls -> driver merge."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("lng", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]
    )

    def partial(batches):
        from .boundary import cell_boundary

        for b in batches:
            cells = b[cell_col].to_numpy(np.int64)
            lats, lngs, counts = cell_boundary(cells)
            pts = []
            for i in range(cells.shape[0]):
                k = int(counts[i])
                if k:
                    pts.append(
                        np.stack(
                            [np.degrees(lngs[i, :k]), np.degrees(lats[i, :k])],
                            axis=-1,
                        )
                    )
            if pts:
                h = convex_hull(np.vstack(pts))
                yield pd.DataFrame({"lng": h[:, 0], "lat": h[:, 1]})

    parts = df.select(cell_col).mapInPandas(partial, schema).toPandas()
    if parts.empty:
        return None
    hull = convex_hull(parts[["lng", "lat"]].to_numpy())
    if hull.shape[0] < 3:
        return None
    from .wkb import write_polygon

    return write_polygon([hull])


def _cross2(v, w) -> np.ndarray:
    """2-D cross product of a single vector v with rows of w."""
    return v[0] * w[..., 1] - v[1] * w[..., 0]


def concave_hull(points: np.ndarray, concavity: float = 2.0) -> np.ndarray:
    """Concave hull of (N, 2) lnglat points -> CCW ring (M, 2), not closed.

    Edge-digging refinement (Park & Oh; the algorithm behind the geo
    crate's ConcaveHull used by the reference,
    crates/h3arrow/src/algorithm/concave_hull.rs:9-31): start from the
    convex hull; an exterior edge is split at the nearest interior point
    while edge_length / point_distance > concavity.  Larger concavity =>
    fewer digs => closer to the convex hull."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    hull = convex_hull(pts)
    if hull.shape[0] < 3 or concavity <= 0:
        return hull
    on_hull = np.zeros(pts.shape[0], dtype=bool)
    # map hull vertices back to point indices (unique rows are sorted)
    for hv in hull:
        k = np.nonzero((pts[:, 0] == hv[0]) & (pts[:, 1] == hv[1]))[0]
        on_hull[k] = True

    def _seg_dist(p, a, b):
        """Distance of points p (M,2) to segment ab."""
        d = b - a
        ll = float(d @ d)
        if ll == 0.0:
            return np.hypot(*(p - a).T)
        t = np.clip(((p - a) @ d) / ll, 0.0, 1.0)
        return np.hypot(*(p - a - t[:, None] * d).T)

    ring: list[np.ndarray] = [hull[i] for i in range(hull.shape[0])]
    interior = list(np.nonzero(~on_hull)[0])
    # sequential edge-digging: process one edge at a time, remove each dug
    # point from the interior set immediately (a batched pass can insert
    # the same point into two edges and never terminate)
    i = 0
    sweeps_since_change = 0
    while interior and sweeps_since_change <= len(ring):
        m = len(ring)
        a = ring[i % m]
        b = ring[(i + 1) % m]
        ip = pts[interior]
        dist = _seg_dist(ip, a, b)
        j = int(np.argmin(dist))
        dd = float(dist[j])
        seg_len = float(np.hypot(*(b - a)))
        dig = dd > 0 and seg_len / dd > concavity
        if dig:
            # the dig point must project strictly inside the edge (keeps
            # the cut triangle within the edge's strip)
            d = b - a
            t_un = float((pts[interior[j]] - a) @ d) / float(d @ d)
            dig = 1e-12 < t_un < 1.0 - 1e-12
        if dig:
            # direct containment check: the cut triangle (a, p, b) must
            # hold no other point (interior or ring vertex) — digging can
            # never strand a point outside
            p = pts[interior[j]]
            others = np.vstack(
                [np.delete(ip, j, axis=0)] + ([np.array(ring)] if ring else [])
            )
            if others.size:
                s1 = _cross2(b - a, others - a)
                s2 = _cross2(p - b, others - b)
                s3 = _cross2(a - p, others - p)
                in_tri = ((s1 > 1e-12) & (s2 > 1e-12) & (s3 > 1e-12)) | (
                    (s1 < -1e-12) & (s2 < -1e-12) & (s3 < -1e-12)
                )
                dig = not bool(in_tri.any())
        if dig:
            # the candidate must be nearer to THIS edge than to any other
            # ring edge, else digging here tunnels past its proper edge
            # and strands points outside the hull
            p = pts[interior[j]]
            for e in range(m):
                if e == i % m:
                    continue
                if _seg_dist(p[None, :], ring[e], ring[(e + 1) % m])[0] < dd - 1e-12:
                    dig = False
                    break
        if dig:
            ring.insert((i % m) + 1, p)
            interior.pop(j)
            sweeps_since_change = 0
            # reprocess the first half-edge (a, p) next
        else:
            i += 1
            sweeps_since_change += 1
        if m and i >= 4 * len(pts):
            break
    return np.array(ring)


def cells_concave_hull_wkb(
    cells: np.ndarray, concavity: float = 2.0
) -> bytes | None:
    """Concave hull polygon (WKB) over all boundary vertices of the cells
    (mirrors the reference's cells -> multipolygon -> concave_hull)."""
    from .boundary import cell_boundary
    from .wkb import write_polygon

    lats, lngs, counts = cell_boundary(np.asarray(cells, dtype=np.int64))
    pts = []
    for i in range(lats.shape[0]):
        k = int(counts[i])
        if k:
            pts.append(
                np.stack(
                    [np.degrees(lngs[i, :k]), np.degrees(lats[i, :k])], axis=-1
                )
            )
    if not pts:
        return None
    hull = concave_hull(np.vstack(pts), concavity)
    if hull.shape[0] < 3:
        return None
    return write_polygon([hull])


def spark_cells_concave_hull(
    df, cell_col: str = "cell", concavity: float = 2.0,
    max_points: int = 2_000_000,
) -> bytes | None:
    """Distributed gather for the concave hull: per-partition the cells are
    reduced to their DISTINCT boundary vertices (a near-boundary cell set
    of size O(perimeter)), which are collected and hulled on the driver.

    Unlike the convex hull, concave hulls do not merge two-phase
    (hull(hull(A) u hull(B)) != hull(A u B)), so the reduction is dedupe
    only; `max_points` guards the driver collect and the operator RAISES
    when exceeded (silent truncation would hull an arbitrary,
    partition-order-dependent subset).

    Determinism across partitionings is achieved by deduping on exact
    int64 H3 VERTEX IDS (shared corners canonicalize to one id), not on
    floating-point coordinates: numpy's SIMD trig gives position-in-batch
    dependent last-ulp jitter, so the same vertex computed in two batch
    layouts can compare unequal as a double (caught by the
    two-partitionings test).  Coordinates are computed ONCE on the
    driver from the sorted distinct ids — the same input array every
    run.  At 100-TB scale, pre-compact the cell set (operators.compact)
    or hull per spatial bucket."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("vertex", T.LongType())])

    def partial(batches):
        from .edges import cells_to_vertexes

        for b in batches:
            cells = np.unique(b[cell_col].to_numpy(np.int64))
            _, verts = cells_to_vertexes(cells)
            yield pd.DataFrame({"vertex": np.unique(verts)})

    # bounded collect: fetch max_points + 1 rows so an overflow is
    # detected without pulling an unbounded vertex set to the driver
    parts = (
        df.select(cell_col)
        .mapInPandas(partial, schema)
        .distinct()  # global dedupe so the guard counts DISTINCT vertices
        .limit(max_points + 1)
        .toPandas()
    )
    if len(parts) > max_points:
        raise ValueError(
            f"concave hull input exceeds max_points={max_points} distinct "
            "boundary vertices; pre-compact the cell set or raise the limit"
        )
    if parts.empty:
        return None
    from .edges import vertexes_to_latlng

    vids = np.sort(parts["vertex"].to_numpy(np.int64))
    vlat, vlng = vertexes_to_latlng(vids)
    pts = np.stack([np.degrees(vlng), np.degrees(vlat)], axis=-1)
    pts = pts[np.isfinite(pts).all(axis=1)]
    hull = concave_hull(pts, concavity)
    if hull.shape[0] < 3:
        return None
    from .wkb import write_polygon

    return write_polygon([hull])
