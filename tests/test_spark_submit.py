"""End-to-end `spark-submit --py-files` evidence (north rule: the engine
runs via spark-submit on multi-executor clusters).  Builds
dist/h3ronpy_spark.zip, then spark-submits a job FROM A NEUTRAL CWD with
only the zip on the python path — executors resolve every kernel
(including the derived-table .npz via importlib.resources) through
zipimport, exactly as on a real cluster."""

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

out_dir = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("pyfiles_smoke")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import h3ronpy_spark.functions as H
from h3ronpy_spark.operators.spatial_join import pip_join
from h3ronpy_spark.sources.polygons import synth_polygons

pts = spark.range(5000).select(
    F.col("id"),
    (-60.0 + (F.col("id") % 1200) * 0.1).alias("lat"),
    (-170.0 + ((F.col("id") * 7) % 3400) * 0.1).alias("lng"),
)
cells = pts.select(
    "id", H.coordinates_to_cells("lat", "lng", F.lit(8)).alias("cell")
)
golden = cells.filter(F.col("id") == 0).select(
    H.cells_to_string(F.col("cell")).alias("hex")
).first()["hex"]
polys = synth_polygons(spark, 40, seed=42)
joined = pip_join(cells, polys, res=8)
joined.groupBy("poly_id").count().write.mode("overwrite").parquet(out_dir)
spark.range(1).select(F.lit(golden).alias("hex")).write.mode(
    "overwrite"
).parquet(out_dir + "_golden")
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_end_to_end():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import build_pyfiles

    zip_path = build_pyfiles.main()
    assert os.path.exists(zip_path)
    with tempfile.TemporaryDirectory() as tmp:
        job = os.path.join(tmp, "job.py")
        with open(job, "w") as f:
            f.write(JOB)
        out = os.path.join(tmp, "out.parquet")
        env = dict(os.environ)
        # neutral cwd + no repo on PYTHONPATH: the zip must satisfy all
        # h3ronpy_spark imports on driver AND executors
        env.pop("PYTHONPATH", None)
        env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
        r = subprocess.run(
            [
                "spark-submit",
                "--master",
                "local[2]",
                "--py-files",
                zip_path,
                job,
                out,
            ],
            cwd=tmp,
            env=env,
            capture_output=True,
            text=True,
            timeout=240,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        import pandas as pd

        res = pd.read_parquet(out)
        assert len(res) > 0 and (res["count"] > 0).all()
        golden = pd.read_parquet(out + "_golden")["hex"].iloc[0]
        # encode golden: id 0 -> (-60.0, -170.0) at res 8, pinned
        # against the in-process kernel
        import numpy as np

        from h3ronpy_spark import arrays as A
        from h3ronpy_spark.h3core.strings import cells_to_string

        want = cells_to_string(
            A.coordinates_to_cells(
                np.array([-60.0]), np.array([-170.0]), 8
            )
        )[0]
        assert golden == want
