"""Grid traversal: neighbors, grid_disk, grid_ring, grid distances.

Reproduces h3ronpy's `grid_disk` / `grid_disk_distances` /
`grid_ring_distances` / `grid_disk_aggregate_k` input kernels (SURVEY.md
§2.5 ops 23-26).  Instead of porting H3's per-base-cell neighbor rotation
tables, neighbors come from *lattice arithmetic*: translate the cell's
face-plane axial coordinates by each unit direction and re-encode; rows
that don't settle cleanly (pentagons, face-corner overflows) fall back to
a geometric boundary-probe method.  Both agree exactly at every
resolution (validated by equivalence + symmetry + disk-size invariants in
tests/test_h3core.py).
"""

from __future__ import annotations

import numpy as np

from . import index as IDX
from .boundary import cell_boundary
from .constants import latlng_to_xyz, xyz_to_latlng
from .latlng import cell_to_latlng, latlng_to_cell


def neighbors(h) -> tuple[np.ndarray, np.ndarray]:
    """All edge-adjacent cells of each input cell.

    Returns (row_index, neighbor_cell) flat arrays; 6 per hexagon,
    5 per pentagon.  Fast path: translate the cell's face-plane axial
    coords by each unit direction and re-encode (pure lattice arithmetic,
    ~10x cheaper than boundary probing); rows that do not produce a clean
    neighbor set (pentagons, far-corner overflows) fall back to the
    geometric boundary-probe method."""
    h = np.asarray(h, dtype=np.int64).ravel()
    import h3ronpy_spark.h3core.index as IDXm

    from .latlng import axial_to_cell, cell_to_fijk

    n = h.shape[0]
    face, c, res = cell_to_fijk(h)
    a = c[:, 0] - c[:, 2]
    b = c[:, 1] - c[:, 2]
    # 6 unit translations per cell
    from .latlng import _DIGIT_AXIAL

    offs = _DIGIT_AXIAL[1:7]  # (6, 2)
    aa = (a[:, None] + offs[:, 0][None, :]).ravel()
    bb = (b[:, None] + offs[:, 1][None, :]).ravel()
    ff = np.repeat(face, 6)
    rr_ = np.repeat(res, 6)
    cand = axial_to_cell(ff, aa, bb, rr_).reshape(n, 6)

    rows_out = []
    cells_out = []
    pent = IDXm.is_pentagon(h)
    valid_c = (cand != -1) & (cand != h[:, None])
    # count distinct valid non-self candidates per row
    sc = np.sort(np.where(valid_c, cand, np.int64(-1)), axis=1)
    distinct = (sc[:, 1:] != sc[:, :-1]) & (sc[:, 1:] != -1)
    ndist = distinct.sum(axis=1) + (sc[:, 0] != -1).astype(np.int64)
    want = np.where(pent, 5, 6)
    clean = ndist == want
    if clean.any():
        m = np.nonzero(clean)[0]
        cm = cand[m]
        vm = valid_c[m]
        # emit distinct (row, cell) pairs
        r6 = np.repeat(m, 6)
        c6 = cm.ravel()
        keep = vm.ravel()
        r6, c6 = r6[keep], c6[keep]
        order = np.lexsort((c6, r6))
        r6, c6 = r6[order], c6[order]
        dup = np.zeros(r6.shape, dtype=bool)
        dup[1:] = (r6[1:] == r6[:-1]) & (c6[1:] == c6[:-1])
        rows_out.append(r6[~dup])
        cells_out.append(c6[~dup])
    fb = np.nonzero(~clean)[0]
    if fb.size:
        fr, fc = _neighbors_geometric(h[fb])
        rows_out.append(fb[fr])
        cells_out.append(fc)
    if not rows_out:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    rows = np.concatenate(rows_out)
    cells = np.concatenate(cells_out)
    order = np.lexsort((cells, rows))
    return rows[order], cells[order]


def _neighbors_geometric(h) -> tuple[np.ndarray, np.ndarray]:
    """Boundary-probe neighbor finding (reference implementation and
    fallback for rows the lattice fast path cannot settle)."""
    h = np.asarray(h, dtype=np.int64).ravel()
    lats, lngs, counts = cell_boundary(h)
    res = IDX.get_resolution(h)

    # Use only the true corner vertices: distortion vertices inserted on
    # icosahedron edges are *interior* to an edge, and probing beyond them
    # still lands in the adjacent cell; so probing every consecutive vertex
    # pair may yield duplicate neighbors — dedupe below.
    n = h.shape[0]
    clat, clng = cell_to_latlng(h)
    cxyz = latlng_to_xyz(clat, clng)

    maxc = int(counts.max()) if n else 0
    rows_l, cells_l = [], []
    vxyz = latlng_to_xyz(lats, lngs)
    for v in range(maxc):
        act = counts > np.maximum(v, 1)  # rows with enough vertices
        act = v < counts
        idx = np.nonzero(act)[0]
        if idx.size == 0:
            continue
        nxt = np.where(v + 1 < counts[idx], v + 1, 0)
        a = vxyz[idx, v]
        b = vxyz[idx, nxt]
        mid = a + b
        mid /= np.linalg.norm(mid, axis=-1, keepdims=True)
        probe = mid + 0.35 * (mid - cxyz[idx])
        probe /= np.linalg.norm(probe, axis=-1, keepdims=True)
        plat, plng = xyz_to_latlng(probe)
        nb = latlng_to_cell(plat, plng, res[idx])
        rows_l.append(idx)
        cells_l.append(nb)
    if not rows_l:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    rows = np.concatenate(rows_l)
    cells = np.concatenate(cells_l)
    # drop self-hits and duplicates per row
    keep = cells != h[rows]
    rows, cells = rows[keep], cells[keep]
    order = np.lexsort((cells, rows))
    rows, cells = rows[order], cells[order]
    dup = np.zeros(rows.shape, dtype=bool)
    dup[1:] = (rows[1:] == rows[:-1]) & (cells[1:] == cells[:-1])
    return rows[~dup], cells[~dup]


def grid_disk_distances(h, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BFS disk: returns (row_index, cell, grid_distance) flat arrays,
    including the center cells at distance 0."""
    h = np.asarray(h, dtype=np.int64).ravel()
    n = h.shape[0]
    out_rows = [np.arange(n)]
    out_cells = [h.copy()]
    out_k = [np.zeros(n, dtype=np.int64)]

    # visited set per row via structured dedupe against accumulated results
    frontier_rows = np.arange(n)
    frontier_cells = h.copy()
    seen_rows = frontier_rows
    seen_cells = frontier_cells
    for dist in range(1, k + 1):
        r2, c2 = neighbors(frontier_cells)
        rows = frontier_rows[r2]
        cells = c2
        # dedupe within the new frontier
        order = np.lexsort((cells, rows))
        rows, cells = rows[order], cells[order]
        dup = np.zeros(rows.shape, dtype=bool)
        dup[1:] = (rows[1:] == rows[:-1]) & (cells[1:] == cells[:-1])
        rows, cells = rows[~dup], cells[~dup]
        if rows.size == 0:
            break
        # remove already-seen (rows, cells) — exact two-key anti-join via
        # a merged lexsort (a packed/XOR key can collide and silently drop
        # genuine disk cells)
        seen_n = seen_rows.size
        all_rows = np.concatenate([seen_rows, rows])
        all_cells = np.concatenate([seen_cells, cells])
        morder = np.lexsort((all_cells, all_rows))
        sr, sc = all_rows[morder], all_cells[morder]
        change = np.ones(sr.size, dtype=bool)
        change[1:] = (sr[1:] != sr[:-1]) | (sc[1:] != sc[:-1])
        gid = np.cumsum(change) - 1
        is_new = morder >= seen_n
        has_seen = np.bincount(gid[~is_new], minlength=int(gid[-1]) + 1).astype(bool)
        new_idx = morder[is_new & ~has_seen[gid]] - seen_n
        rows, cells = rows[new_idx], cells[new_idx]
        if rows.size == 0:
            break
        out_rows.append(rows)
        out_cells.append(cells)
        out_k.append(np.full(rows.shape, dist, dtype=np.int64))
        seen_rows = np.concatenate([seen_rows, rows])
        seen_cells = np.concatenate([seen_cells, cells])
        frontier_rows, frontier_cells = rows, cells
    return (
        np.concatenate(out_rows),
        np.concatenate(out_cells),
        np.concatenate(out_k),
    )


def grid_disk(h, k: int) -> tuple[np.ndarray, np.ndarray]:
    rows, cells, _ = grid_disk_distances(h, k)
    return rows, cells


def grid_ring_distances(
    h, k_min: int, k_max: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if k_min > k_max:
        raise ValueError("k_min must be <= k_max")
    rows, cells, kk = grid_disk_distances(h, k_max)
    m = kk >= k_min
    return rows[m], cells[m], kk[m]


def grid_distance(a, b) -> np.ndarray:
    """Grid distance between same-res cell pairs via bounded BFS from `a`.

    Intended for small distances (tests/verification); -1 if not found
    within 2 * angular-estimate + 4 steps."""
    a = np.asarray(a, dtype=np.int64).ravel()
    b = np.asarray(b, dtype=np.int64).ravel()
    out = np.full(a.shape, -1, dtype=np.int64)
    done = a == b
    out[done] = 0
    frontier_rows = np.nonzero(~done)[0]
    frontier_cells = a[~done]
    seen = {}
    for i, c in zip(frontier_rows, frontier_cells):
        seen.setdefault(int(i), set()).add(int(c))
    dist = 0
    while frontier_rows.size and dist < 64:
        dist += 1
        r2, c2 = neighbors(frontier_cells)
        rows = frontier_rows[r2]
        nxt_rows, nxt_cells = [], []
        for i, c in zip(rows.tolist(), c2.tolist()):
            s = seen[i]
            if c in s:
                continue
            s.add(c)
            if c == int(b[i]):
                out[i] = dist
            else:
                nxt_rows.append(i)
                nxt_cells.append(c)
        mask_live = out[np.array(nxt_rows, dtype=np.int64)] == -1 if nxt_rows else np.array([], dtype=bool)
        frontier_rows = np.array(nxt_rows, dtype=np.int64)[mask_live]
        frontier_cells = np.array(nxt_cells, dtype=np.int64)[mask_live]
    return out
