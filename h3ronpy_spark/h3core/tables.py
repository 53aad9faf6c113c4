"""Derived H3 lookup tables, with an .npz fast-load cache.

The geometric derivation (see _tables_derive.py) takes ~0.8 s; Spark
re-imports this package in every Python UDF worker, so the derived arrays
are cached to disk at first build.  Set H3SPARK_NO_CACHE=1 to force a fresh
derivation + full validation (tests do this once).
"""

from __future__ import annotations

import os

import numpy as np

IJ_QUAD, KI_QUAD, JK_QUAD = 1, 2, 3

_CACHE = os.path.join(os.path.dirname(__file__), "_tables_cache.npz")
_NAMES = [
    "VERT_XYZ",
    "FACE_VERTS",
    "AZ_FACE_I",
    "BASE_CELL_XYZ",
    "FACE_IJK_BASE_CELL",
    "FACE_IJK_CCWROT60",
    "FACE_NEIGHBOR_FACE",
    "FACE_NEIGHBOR_TRANSLATE",
    "FACE_NEIGHBOR_CCWROT",
    "PENT_CW_OFFSET",
]


def _read_cache_bytes() -> bytes | None:
    """Cache bytes via importlib.resources so the .npz also loads when the
    package is zipimported (spark-submit --py-files ships a zip; a
    __file__-relative os.path.exists is always False there)."""
    try:
        from importlib import resources

        ref = resources.files(__package__).joinpath("_tables_cache.npz")
        if ref.is_file():
            return ref.read_bytes()
    except Exception:
        pass
    if os.path.exists(_CACHE):
        with open(_CACHE, "rb") as f:
            return f.read()
    return None


def _load_or_derive() -> dict:
    if not os.environ.get("H3SPARK_NO_CACHE"):
        raw = _read_cache_bytes()
        if raw is not None:
            import io

            with np.load(io.BytesIO(raw)) as z:
                return {k: z[k] for k in _NAMES}
    from . import _tables_derive as D

    data = {k: getattr(D, k) for k in _NAMES}
    try:
        np.savez_compressed(_CACHE, **data)
    except OSError:
        pass
    return data


_data = _load_or_derive()
VERT_XYZ = _data["VERT_XYZ"]
FACE_VERTS = _data["FACE_VERTS"]
AZ_FACE_I = _data["AZ_FACE_I"]
BASE_CELL_XYZ = _data["BASE_CELL_XYZ"]
FACE_IJK_BASE_CELL = _data["FACE_IJK_BASE_CELL"]
FACE_IJK_CCWROT60 = _data["FACE_IJK_CCWROT60"]
FACE_NEIGHBOR_FACE = _data["FACE_NEIGHBOR_FACE"]
FACE_NEIGHBOR_TRANSLATE = _data["FACE_NEIGHBOR_TRANSLATE"]
FACE_NEIGHBOR_CCWROT = _data["FACE_NEIGHBOR_CCWROT"]
PENT_CW_OFFSET = _data["PENT_CW_OFFSET"]
del _data
