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
