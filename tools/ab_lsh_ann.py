"""Same-window alternating A/B of similarity_lsh_ann (VERDICT r05 item 1).

Round-5 certified windows showed 1.12 -> 1.55 s on this query while
similarity.py changed (+43 lines).  The delta is an ADDED function
(lsh_posting_list_stats) that lsh_topk never calls, so a code regression
should be impossible — this harness proves it the same way the round-5
flagship A/B did: alternate the two trees inside one window, min-of-reps
per leg, plus an executed-plan identity check.

Usage:
    python tools/ab_lsh_ann.py <tree_a> <tree_b> [alternations]

Each leg runs in a fresh subprocess (fresh JVM + worker pool) with
PYTHONPATH pointed at its tree; inside, the driver-registered
similarity_lsh_ann query runs 1 warm-up + 3 timed reps at sf0.1 on
local[32].  Prints one JSON line with per-leg times and the plan hash.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_LEG_CODE = r"""
import hashlib, json, os, sys, time
sys.path.insert(0, os.environ["AB_TREE"])
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from h3ronpy_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark("local[32]", app_name="ab_lsh", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
q = E.queries()["similarity_lsh_ann"]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
df = q(spark, sf)
plan = df._jdf.queryExecution().executedPlan().toString()
# strip plan ids / exchange ids that differ run-to-run
import re
norm = re.sub(r"#\d+", "#x", re.sub(r"\[plan_id=\d+\]", "", plan))
df.count()  # warm-up
times = []
for _ in range(3):
    t0 = time.perf_counter()
    q(spark, sf).count()
    times.append(round(time.perf_counter() - t0, 3))
print(json.dumps({
    "tree": os.environ["AB_TREE"],
    "times": times,
    "min": min(times),
    "plan_sha": hashlib.sha256(norm.encode()).hexdigest()[:16],
}))
spark.stop()
"""


def run_leg(tree: str) -> dict:
    env = dict(os.environ)
    env["AB_TREE"] = tree
    env["PYTHONPATH"] = tree
    out = subprocess.run(
        [sys.executable, "-c", _LEG_CODE],
        env=env, capture_output=True, text=True, cwd=tree,
    )
    line = next(
        (l for l in reversed(out.stdout.strip().splitlines())
         if l.startswith("{")), None,
    )
    if line is None:
        raise RuntimeError(f"leg in {tree} failed:\n{out.stderr[-2000:]}")
    return json.loads(line)


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    alternations = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    legs = {"a": [], "b": []}
    for i in range(alternations):
        legs["a"].append(run_leg(tree_a))
        legs["b"].append(run_leg(tree_b))
        print(json.dumps({
            "alt": i,
            "a_min": legs["a"][-1]["min"],
            "b_min": legs["b"][-1]["min"],
        }), flush=True)
    a_min = min(x["min"] for x in legs["a"])
    b_min = min(x["min"] for x in legs["b"])
    print(json.dumps({
        "tree_a": tree_a, "tree_b": tree_b,
        "a_all": [x["times"] for x in legs["a"]],
        "b_all": [x["times"] for x in legs["b"]],
        "a_min": a_min, "b_min": b_min,
        "ratio_b_over_a": round(b_min / a_min, 3),
        "plan_identical": legs["a"][0]["plan_sha"] == legs["b"][0]["plan_sha"],
        "plan_sha_a": legs["a"][0]["plan_sha"],
        "plan_sha_b": legs["b"][0]["plan_sha"],
    }))


if __name__ == "__main__":
    main()
