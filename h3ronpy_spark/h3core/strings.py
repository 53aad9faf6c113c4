"""String parse/format kernels for H3 indexes.

Reproduces h3ronpy's `cells_parse` / `cells_to_string` (SURVEY.md §2.2 ops
5-9): parse hex strings, decimal integer strings, or "x, y, res" coordinate
triples; format to lowercase hex with no leading zeros.
"""

from __future__ import annotations

import re

import numpy as np

from . import index as IDX
from .latlng import latlng_to_cell

_COORD_RE = re.compile(
    r"^\s*(-?\d+(?:\.\d+)?)\s*[,;]\s*(-?\d+(?:\.\d+)?)\s*[,;]\s*(\d+)\s*$"
)

# Digit-strict (ADVICE r06): Python's int(s, base) accepts '0x' prefixes,
# signs, and '_' separators that Rust's u64::from_str_radix (the
# reference's parse path, crates/h3arrow/src/algorithm/string.rs) rejects.
_HEX_DIGITS_RE = re.compile(r"[0-9a-fA-F]+\Z")
_DEC_DIGITS_RE = re.compile(r"[0-9]+\Z")


def cells_to_string(h) -> np.ndarray:
    """int64 cells -> lowercase hex strings (object array); None for null
    (-1) input."""
    h = np.asarray(h, dtype=np.int64).ravel()
    out = np.empty(h.shape, dtype=object)
    for i, v in enumerate(h.tolist()):
        out[i] = format(v & 0xFFFFFFFFFFFFFFFF, "x") if v != -1 else None
    return out


def cells_parse(strings, set_failing_to_invalid: bool = False) -> np.ndarray:
    """Parse cells from hex / decimal-int / "x, y, res" strings.

    x, y order in coordinate triples is (lng, lat) to mirror the reference
    parser's axis order (its golden test equates the cell at
    (lat=45.5, lng=10.2) with the string "10.2, 45.5, 5";
    h3ronpy/tests/arrow/test_utf8.py:9-13).

    Precedence mirrors the reference parser (h3arrow parse_cell,
    crates/h3arrow/src/algorithm/string.rs:20-37): hex if it forms a valid
    cell, else decimal if it forms a valid cell, else coordinate triple.

    Returns int64 cells (-1 for nulls); failures are -1 when
    set_failing_to_invalid, else raise ValueError("non-parsable CellIndex").
    """

    def _as_valid(v: int | None) -> int | None:
        if v is None or v < 0 or (v >> 63):
            return None
        a = np.array([v], dtype=np.int64)
        return v if IDX.is_valid_cell(a)[0] else None

    out = np.full(len(strings), -1, dtype=np.int64)
    coord_rows = []
    coord_vals = []
    failed = []
    is_null = np.zeros(len(strings), dtype=bool)
    for i, s in enumerate(strings):
        if s is None:
            is_null[i] = True
            continue
        s = str(s).strip()
        hv = dv = None
        if _HEX_DIGITS_RE.fullmatch(s):
            hv = int(s, 16)
        v = _as_valid(hv)
        if v is None:
            if _DEC_DIGITS_RE.fullmatch(s):
                dv = int(s, 10)
            v = _as_valid(dv)
        if v is not None:
            out[i] = v
            continue
        m = _COORD_RE.match(s)
        if m:
            coord_rows.append(i)
            coord_vals.append(
                (float(m.group(2)), float(m.group(1)), int(m.group(3)))
            )
            continue
        failed.append(s)
        if not set_failing_to_invalid:
            raise ValueError(f"non-parsable CellIndex: {s!r}")
    if coord_rows:
        lat, lng, res = zip(*coord_vals)
        cells = latlng_to_cell(
            np.radians(np.array(lat)),
            np.radians(np.array(lng)),
            np.array(res, dtype=np.int64),
        )
        if (cells == -1).any() and not set_failing_to_invalid:
            raise ValueError("non-parsable CellIndex: bad coordinate triple")
        out[np.array(coord_rows)] = cells
    return out
