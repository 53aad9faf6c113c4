"""Alternating same-window 2-vs-8-core scaling ladder (VERDICT r05 item 4).

Round-5 measured the c2 and c8 legs in separate windows and got 0.74
efficiency (vs 0.81 in round 4, rule >= 0.8); the c8 leg's reps (5.7-6.0 s
vs 4.42 s round-4) look window-inflated.  This harness interleaves the
legs so both see the same co-tenant pressure, then computes efficiency
from each leg's best QUIET rep across alternations:

    eff(2->8) = (t2_min / t8_min) / 4

Usage: python tools/ladder_pair.py [alternations] [--cpus a,b]
Prints one JSON line per leg run and a final summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_leg(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_ONLY"] = "scaling"
    env["BENCH_SUBPROC"] = "1"
    env.setdefault("BENCH_REP_BUDGET", "150")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py")],
        env=env, capture_output=True, text=True, cwd=here,
    )
    line = next(
        (l for l in reversed(out.stdout.strip().splitlines())
         if l.startswith("{")), None,
    )
    if line is None:
        raise RuntimeError(f"c{cpus} leg failed:\n{out.stderr[-2000:]}")
    d = json.loads(line)
    s = d.get("stats", {})
    return {
        "cpus": cpus,
        "best": d["queries"]["scaling_pip"],
        "quiet": s.get("scaling_quiet_window"),
        "runs": s.get("scaling_runs"),
        "ratios": s.get("scaling_calib_ratios"),
    }


def main() -> None:
    alts = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
    cpus = (2, 8)
    if "--cpus" in sys.argv:
        a, b = sys.argv[sys.argv.index("--cpus") + 1].split(",")
        cpus = (int(a), int(b))
    legs: dict[int, list[dict]] = {c: [] for c in cpus}
    for i in range(alts):
        for c in cpus:
            r = run_leg(c)
            legs[c].append(r)
            print(json.dumps({"alt": i, **r}), flush=True)
    summary: dict = {"alternations": alts}
    best = {}
    for c in cpus:
        quiet = [x["best"] for x in legs[c] if x["quiet"]]
        pool = quiet or [x["best"] for x in legs[c]]
        best[c] = min(pool)
        summary[f"c{c}_best"] = best[c]
        summary[f"c{c}_all_quiet"] = bool(quiet)
    lo, hi = cpus
    summary["efficiency"] = round((best[lo] / best[hi]) / (hi / lo), 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
