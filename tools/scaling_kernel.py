"""Kernel-level scaling evidence: the encode kernel at N vs 4N processes.

The cluster-size criterion (BASELINE.json north_rule) cannot use a real
multi-node cluster in this sandbox; this harness runs the *same kernel on
the same input* at two parallelism levels as separate OS processes (the
closest single-box analogue of executors on separate nodes) and reports
throughput + scaling efficiency.

Usage: python tools/scaling_kernel.py [rows_per_proc]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "MALLOC_MMAP_THRESHOLD_",
    "MALLOC_TRIM_THRESHOLD_",
):
    os.environ.setdefault(v, "1" if "THREADS" in v else "134217728")


def work(n: int) -> float:
    import numpy as np

    from h3ronpy_spark.h3core.latlng import latlng_to_cell

    rng = np.random.default_rng(os.getpid())
    la = np.arcsin(rng.uniform(-1, 1, n))
    lo = rng.uniform(-3.14, 3.14, n)
    t = time.time()
    for _ in range(3):
        latlng_to_cell(la, lo, 9)
    return 3 * n / (time.time() - t)


def run(procs: int, n: int) -> float:
    with mp.Pool(procs) as p:
        p.map(work, [1000] * procs)  # warm imports
        t = time.time()
        p.map(work, [n] * procs)
        wall = time.time() - t
    return procs * 3 * n / wall


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    r8 = run(8, n)
    r32 = run(32, n)
    eff = (r32 / r8) / 4.0
    print(
        f"encode kernel: N=8 procs {r8 / 1e6:.2f} M rows/s | "
        f"4N=32 procs {r32 / 1e6:.2f} M rows/s | "
        f"scaling efficiency {eff:.2f}"
    )


if __name__ == "__main__":
    main()
