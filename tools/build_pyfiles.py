"""Package the engine for `spark-submit --py-files`.

Produces dist/h3ronpy_spark.zip containing the package (sources only, no
tests); submit a pipeline with:

    spark-submit --py-files dist/h3ronpy_spark.zip your_job.py

Spark adds the zip to every executor's python path (zipimport — the
archive is not unpacked), so the pandas/Arrow UDFs resolve
`h3ronpy_spark.*` without a cluster-side install; the derived-table .npz
cache is read through importlib.resources, which works from inside the
zip (h3core/tables.py).
"""

from __future__ import annotations

import os

import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "h3ronpy_spark.zip")
    pkg = os.path.join(ROOT, "h3ronpy_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith((".py", ".npz")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
