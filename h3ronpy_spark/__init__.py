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

# reference parity: `from h3ronpy import ContainmentMode` call sites port
# as `from h3ronpy_spark import ContainmentMode`
# (h3ronpy/python/h3ronpy/__init__.py:15)
from .h3core.polyfill import ContainmentMode  # noqa: E402,F401
