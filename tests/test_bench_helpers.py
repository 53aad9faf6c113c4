"""Unit tests for bench.py's measurement helpers (no Spark needed)."""

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_rep_pressure_fractions():
    b = _load_bench()
    ncpu = b._NCPU_HOST
    # 10 s window: 20% steal, our tree used 50%, others 10%
    cap = ncpu * 10.0 * 100.0
    glob0 = [0] * 8
    glob1 = [int(cap * 0.6), 0, 0, 0, 0, 0, 0, int(cap * 0.2)]
    ours0, ours1 = 0, int(cap * 0.5)
    p = b.rep_pressure((glob0, ours0), (glob1, ours1), 10.0)
    assert abs(p["steal"] - 0.2) < 0.01
    assert abs(p["ours"] - 0.5) < 0.01
    assert abs(p["extern"] - 0.1) < 0.01


def test_rep_pressure_clamps_negative_extern():
    b = _load_bench()
    # our-tree jiffies can exceed global busy (pid-reap races): clamp to 0
    glob0 = [0] * 8
    glob1 = [100, 0, 0, 0, 0, 0, 0, 0]
    p = b.rep_pressure((glob0, 0), (glob1, 500), 1.0)
    assert p["extern"] == 0.0


def test_machine_snapshot_shape():
    b = _load_bench()
    glob, ours = b._machine_snapshot()
    assert len(glob) == 8 and all(isinstance(x, int) for x in glob)
    assert isinstance(ours, int) and ours > 0


def test_is_calm_threshold():
    b = _load_bench()
    assert b._is_calm({"steal": 0.02, "extern": 0.02, "ours": 0.5})
    assert not b._is_calm({"steal": 0.04, "extern": 0.04, "ours": 0.5})


def test_pick_time_prefers_calm_quiet_rep():
    b = _load_bench()
    times = [5.0, 3.0, 4.0]
    ratios = [0.9, 0.9, 0.5]
    # rep 2 is fastest but its window had 20% steal: headline must be
    # the best CALM quiet rep (rep 1), normalized the global min estimate
    press = [
        {"steal": 0.0, "extern": 0.0, "ours": 0.9},
        {"steal": 0.2, "extern": 0.0, "ours": 0.7},
        {"steal": 0.0, "extern": 0.0, "ours": 0.9},
    ]
    headline, norm, quiet = b.pick_time(times, ratios, press)
    assert quiet and headline == 5.0
    assert norm <= 3.0 * 0.9 + 1e-9


def test_pick_time_raw_min_when_no_quiet():
    b = _load_bench()
    headline, norm, quiet = b.pick_time([5.0, 3.0], [0.5, 0.5], None)
    assert not quiet and headline == 3.0


def test_pick_headline_times_prefers_quiet_pass():
    import bench

    hl = {"q1": [0.5, 1.0], "q2": [2.0, 3.0]}
    ratios = [0.5, 0.95]  # pass 0 noisy, pass 1 quiet
    press = [
        {"steal": 0.2, "extern": 0.0, "ours": 0.8},
        {"steal": 0.0, "extern": 0.0, "ours": 0.9},
    ]
    picked, quiet = bench.pick_headline_times(hl, ratios, press)
    # q1's raw min (0.5) came from the noisy pass and must NOT be used
    assert picked == {"q1": 1.0, "q2": 3.0} and quiet


def test_pick_headline_times_raw_min_when_no_quiet():
    import bench

    hl = {"q1": [0.5, 1.0]}
    ratios = [0.5, 0.6]
    press = [{"steal": 0.2, "extern": 0.0, "ours": 0.8}] * 2
    picked, quiet = bench.pick_headline_times(hl, ratios, press)
    assert picked == {"q1": 0.5} and not quiet


def test_pick_headline_times_short_pass_lists():
    import bench

    # a query added mid-run (shorter list) must not index out of range
    hl = {"q1": [0.5], "q2": [2.0, 1.5]}
    ratios = [0.9, 0.95]
    press = [{"steal": 0.0, "extern": 0.0, "ours": 0.9}] * 2
    picked, quiet = bench.pick_headline_times(hl, ratios, press)
    assert picked == {"q1": 0.5, "q2": 1.5} and quiet
