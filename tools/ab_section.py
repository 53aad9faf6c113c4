"""Generalized same-window alternating A/B harness (VERDICT r06 item 1).

Round 6 proved the methodology on similarity_lsh_ann (tools/ab_lsh_ann.py):
alternate the two code trees inside ONE co-tenancy window, a fresh
subprocess (fresh JVM + python worker pool) per leg, min-of-reps per leg,
and an executed-plan identity hash so "environmental drift" vs "plan
regression" is decided by evidence.  This generalizes it to any bench
workload:

Usage:
    python tools/ab_section.py <workload> <tree_a> <tree_b> \
        [alternations] [reps]

workload:
  query:<name>        any __spark_entry__.queries() entry, run at
                      $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
                      with .count() as the action
  flagship[:<n>]      the bench flagship_pip_join shape: n raw8 images
                      (default $BENCH_IMAGES or 60000), 60 polygons,
                      res 9, compact coverage built UNTIMED per leg —
                      identical to bench.py's flagship section

Order-bias control: alternation i runs the legs as (a,b) for even i and
(b,a) for odd i, so a monotonic window drift cannot masquerade as a tree
difference.  Prints one JSON line per alternation and a final summary
with per-leg times, mins, ratio, and plan-hash identity.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_LEG_CODE = r"""
import hashlib, json, os, re, sys, time
sys.path.insert(0, os.environ["AB_TREE"])
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from h3ronpy_spark.session import get_spark
spark = get_spark("local[32]", app_name="ab_leg", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
workload = os.environ["AB_WORKLOAD"]
reps = int(os.environ.get("AB_REPS", "3"))
if workload.startswith("query:"):
    import __spark_entry__ as E
    name = workload.split(":", 1)[1]
    q = E.queries()[name]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def build():
        return q(spark, sf)
    def run():
        q(spark, sf).count()
elif workload.startswith("flagship"):
    n_images = (int(workload.split(":", 1)[1]) if ":" in workload
                else int(os.environ.get("BENCH_IMAGES", "60000")))
    from pyspark.sql import functions as F
    from h3ronpy_spark.plans.flagship import flagship
    from h3ronpy_spark.operators.spatial_join import polyfill_polygons
    from h3ronpy_spark.sources.polygons import synth_polygons
    polys = synth_polygons(spark, 60, seed=42)
    cov = (polyfill_polygons(polys, 9, compact=True)
           .withColumnRenamed("cell", "__poly_cell").persist())
    cov.count()
    def build():
        return flagship(spark, n_images=n_images, n_polygons=60, res=9,
                        partitions=256, coverage=cov)
    def run():
        build().agg(F.sum("n_tiles")).first()
else:
    raise SystemExit(f"unknown workload {workload!r}")
df = build()
plan = df._jdf.queryExecution().executedPlan().toString()
norm = re.sub(r"#\d+", "#x", re.sub(r"\[plan_id=\d+\]", "", plan))
run()  # warm-up, untimed
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    run()
    times.append(round(time.perf_counter() - t0, 3))
print(json.dumps({
    "tree": os.environ["AB_TREE"],
    "times": times,
    "min": min(times),
    "plan_sha": hashlib.sha256(norm.encode()).hexdigest()[:16],
}))
spark.stop()
"""


def run_leg(tree: str, workload: str, reps: int) -> dict:
    env = dict(os.environ)
    env["AB_TREE"] = tree
    env["AB_WORKLOAD"] = workload
    env["AB_REPS"] = str(reps)
    env["PYTHONPATH"] = tree
    out = subprocess.run(
        [sys.executable, "-c", _LEG_CODE],
        env=env, capture_output=True, text=True, cwd=tree,
    )
    line = next(
        (ln for ln in reversed(out.stdout.strip().splitlines())
         if ln.startswith("{")), None,
    )
    if line is None:
        raise RuntimeError(f"leg in {tree} failed:\n{out.stderr[-2000:]}")
    return json.loads(line)


def main() -> None:
    workload, tree_a, tree_b = sys.argv[1], sys.argv[2], sys.argv[3]
    alternations = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    legs: dict = {"a": [], "b": []}
    for i in range(alternations):
        order = [("a", tree_a), ("b", tree_b)]
        if i % 2:  # reversed-order control
            order.reverse()
        for key, tree in order:
            legs[key].append(run_leg(tree, workload, reps))
        print(json.dumps({
            "alt": i,
            "order": [k for k, _ in order],
            "a_min": legs["a"][-1]["min"],
            "b_min": legs["b"][-1]["min"],
        }), flush=True)
    a_min = min(x["min"] for x in legs["a"])
    b_min = min(x["min"] for x in legs["b"])
    print(json.dumps({
        "workload": workload,
        "tree_a": tree_a, "tree_b": tree_b,
        "a_all": [x["times"] for x in legs["a"]],
        "b_all": [x["times"] for x in legs["b"]],
        "a_min": a_min, "b_min": b_min,
        "ratio_b_over_a": round(b_min / a_min, 3),
        "plan_identical":
            legs["a"][0]["plan_sha"] == legs["b"][0]["plan_sha"],
        "plan_sha_a": legs["a"][0]["plan_sha"],
        "plan_sha_b": legs["b"][0]["plan_sha"],
    }))


if __name__ == "__main__":
    main()
