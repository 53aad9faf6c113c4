"""h3ronpy_spark: PySpark-native H3 spatial-join + tiling engine."""

import os as _os

# The numpy kernels must stay single-threaded under Spark (N workers x M
# BLAS threads oversubscribes; see BENCH.md).  setdefault here so ANY
# entry point — including a driver-created SparkSession — inherits sane
# settings if this package is imported before the JVM starts.
for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    _os.environ.setdefault(_v, "1")
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "134217728")
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "134217728")

# reference parity: every symbol of the reference's top-level __all__
# (h3ronpy/python/h3ronpy/__init__.py:286-314) is importable from the
# package root, so `from h3ronpy import X` call sites port with the
# package rename only.
from .h3core.polyfill import ContainmentMode  # noqa: E402,F401
from .arrays import (  # noqa: E402,F401
    cells_area_km2,
    cells_area_m2,
    cells_area_rads2,
    cells_parse,
    cells_resolution,
    cells_to_localij,
    cells_to_string,
    cells_valid,
    change_resolution,
    change_resolution_list,
    change_resolution_paired,
    compact,
    directededges_parse,
    directededges_to_string,
    directededges_valid,
    grid_disk,
    grid_disk_aggregate_k,
    grid_disk_distances,
    grid_ring_distances,
    localij_to_cells,
    uncompact,
    version,
    vertexes_parse,
    vertexes_to_string,
    vertexes_valid,
)

DEFAULT_CELL_COLUMN_NAME = "cell"
H3_CRS = "EPSG:4326"
__version__ = version()
