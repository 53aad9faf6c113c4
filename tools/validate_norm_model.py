"""Validate the steal-normalization model (VERDICT r05 item 6).

The bench reports `normalized = wall * ratio` next to raw walls, where
`ratio` is the min flanking calibration (single-core, 8-thread parallel,
and memory-bandwidth probes vs their pinned quiet floors).  The round-5
flagship claim (5.98 s normalized) leans on this model, so this tool
checks it against every stored capture instead of assuming it:

  model:  wall(ratio) = Q / ratio        (alpha = 1 by construction)
  fit:    log(wall) = log(Q) - alpha * log(ratio)  over all stored reps

For each rep it prints predicted-vs-actual wall and the relative error;
the fitted alpha says whether probe slowdown under-/over-states job
slowdown (alpha < 1: the probes exaggerate pressure; > 1: understate).
Only round-4/5 captures are pooled — the round-5 same-window A/B showed
those trees code-identical on this workload; round-3 trees predate the
broadcast-coverage fix and would mix code deltas into the window model.

Usage: python tools/validate_norm_model.py [--all-rounds]
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# round-4/5 flagship captures: code-identical per the round-5 A/B
DEFAULT_FILES = [
    "BENCH_round4_local32.json",
    "BENCH_round4_local32_membw.json",
    "BENCH_round5_local32.json",
]


def reps_from(path: str):
    try:
        d = json.load(open(path))
    except (OSError, json.JSONDecodeError):
        return []
    s = d.get("stats", d)
    runs = s.get("flagship_runs")
    ratios = s.get("flagship_calib_ratios")
    if not runs or not ratios or len(runs) != len(ratios):
        return []
    press = s.get("flagship_rep_pressure") or [{}] * len(runs)
    return [
        {
            "file": os.path.basename(path),
            "wall": float(w),
            "ratio": float(r),
            "steal": p.get("steal"),
        }
        for w, r, p in zip(runs, ratios, press)
        if r and r > 0
    ]


def main() -> None:
    if "--all-rounds" in sys.argv:
        files = sorted(glob.glob(os.path.join(REPO, "BENCH_round*_local32*.json")))
    else:
        files = [os.path.join(REPO, f) for f in DEFAULT_FILES]
    reps = [r for f in files for r in reps_from(f)]
    if len(reps) < 4:
        raise SystemExit("not enough stored reps with per-rep ratios")

    # least-squares fit of log(wall) = log(Q) - alpha*log(ratio)
    xs = [math.log(r["ratio"]) for r in reps]
    ys = [math.log(r["wall"]) for r in reps]
    n = len(reps)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    alpha = -sxy / sxx
    q_fit = math.exp(my + alpha * mx)

    rows = []
    for r in reps:
        pred_unit = r["wall"] * r["ratio"]          # alpha=1 model
        pred_fit = r["wall"] * (r["ratio"] ** alpha)
        rows.append({**r, "norm_a1": round(pred_unit, 2),
                     "norm_fit": round(pred_fit, 2)})
    a1 = [r["norm_a1"] for r in rows]
    af = [r["norm_fit"] for r in rows]

    def spread(v):
        m = sum(v) / len(v)
        return m, min(v), max(v), max(abs(x - m) / m for x in v)

    m1, lo1, hi1, e1 = spread(a1)
    mf, lof, hif, ef = spread(af)
    out = {
        "n_reps": n,
        "files": [os.path.basename(f) for f in files],
        "fitted_alpha": round(alpha, 3),
        "fitted_quiet_wall_s": round(q_fit, 2),
        "alpha1_normalized": {
            "mean": round(m1, 2), "min": round(lo1, 2),
            "max": round(hi1, 2), "max_rel_err": round(e1, 3),
        },
        "alphafit_normalized": {
            "mean": round(mf, 2), "min": round(lof, 2),
            "max": round(hif, 2), "max_rel_err": round(ef, 3),
        },
        "round4_calm_record_s": 6.05,
        "reps": rows,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
