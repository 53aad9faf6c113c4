"""Benchmark: flagship pipeline + headline queries + scaling workload.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads:
  * scaling_pip    — the BASELINE.json metric job: N points -> encode at a
                     res 7..12 sweep -> PIP join against a 60-polygon
                     compact coverage -> rollup.  Compute-bound (pure
                     encode kernel + broadcast hash join), so it is the
                     workload used for the N-vs-4N scaling-efficiency
                     criterion.
  * flagship_pip_join — the full image pipeline: decode -> tile every
                     pixel-grid to H3 -> PIP join captions -> rollup.
                     Arrow/memory-bandwidth heavy by design (reported at
                     both parallelism levels, see BENCH.md).
  * headline queries — operator coverage over the sf tables.

The process pins itself to $SPARK_GRAFT_CPUS cores (sched_setaffinity) so
local[8] emulates an 8-core cluster honestly instead of letting 8 workers
float across all 32 physical cores.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "60000"))
N_POINTS = int(os.environ.get("BENCH_POINTS", "24000000"))
SECTIONS = set(
    os.environ.get("BENCH_ONLY", "scaling,flagship,headline,png").split(",")
)
# the png section decodes a real compressed stream per image; its image
# count is separately tunable (defaults to the flagship count)
N_IMAGES_PNG = int(os.environ.get("BENCH_IMAGES_PNG", str(N_IMAGES)))
# wall-clock budget (seconds) each calibrated section may spend hunting for
# a quiet window before settling for steal-normalized reporting (raised
# 300 -> 420 in round 5: co-tenant windows were observed to stay noisy
# for several minutes at a stretch, and the extra two minutes of hunting
# is what turns a "normalized-only" capture into a certified-quiet one)
REP_BUDGET = float(os.environ.get("BENCH_REP_BUDGET", "420"))

# ---------------------------------------------------------------------------
# co-tenant steal calibration
#
# This box shares CPUs with co-tenants; whole bench windows can run
# uniformly 2-4x slow (round-1/2 verdicts), which min-of-N reps cannot
# detect when EVERY rep is degraded.  A tiny single-core numpy kernel is
# timed immediately before and after every measured repetition; its ratio
# to the pinned quiet-window reference time (floor of 100 runs on this box,
# re-derivable via `python bench.py --calibrate`) says how much of the CPU
# the bench actually got.  A rep is "quiet" when both flanking calibrations
# (each = min(single-core, 8-thread parallel) probe) read >= 0.85; sections
# keep buying reps (bounded by BENCH_REP_BUDGET) until one quiet rep lands,
# else they report the steal-normalized time (wall * ratio) alongside the
# raw wall time.
# ---------------------------------------------------------------------------

_CALIB_REF_SECS = 0.2575  # quiet-window floor of _calib_once() on this box
# quiet floor of the PARALLEL probe (aggregate seconds for 8 threads x
# _calib_once-sized streaming work); round-3 finding: this box degrades
# 2-8x on parallel/bandwidth-heavy work (kernel sys-time 40-80%) while a
# single core still reads quiet, so a single-core probe alone cannot
# certify a window.
# Floors re-pinned late round 3 (was 0.249 / 0.28): a --calibrate run in
# a /proc-verified calm window (steal+extern == 0) measured the parallel
# floor 22% higher — with the stale floor no calm window could ever read
# >= 0.85, which matched the observed always-False quiet flags while
# in-rep pressure showed the reps were calm.  Re-derive with
# `python bench.py --calibrate` whenever quiet flags and pressure fields
# disagree.
_CALIB_PAR_REF_SECS = 0.34


def _calib_once() -> float:
    import numpy as np

    x = np.arange(2_000_000, dtype=np.uint64)
    acc = 0.0
    for _ in range(4):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        y = (x & np.uint64(0xFFFFFF)).astype(np.float64)
        acc += float(np.sin(y * 1e-6).sum())
    return acc


def calib_ratio() -> float:
    """Observed single-core throughput as a fraction of the quiet floor
    (1.0 = quiet; 0.5 = the bench only got half the CPU)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _calib_once()
        best = min(best, time.perf_counter() - t0)
    return round(_CALIB_REF_SECS / best, 3)


def calib_par_ratio(nthreads: int | None = None) -> float:
    """Parallel (memory-streaming, GIL-releasing) probe: up to 8 threads of
    the same kernel, wall-clock vs pinned quiet floor.  Catches the box's
    parallel-capacity/bandwidth degradation that the single-core probe
    misses (observed: 1-core ratio 1.0 while 32-way workloads ran 4x
    slow at 40-80% kernel sys time).

    Thread count is capped at the process's pinned core count: the quiet
    floor assumes each probe thread gets its own core, so running 8
    threads inside a 2-core-pinned bench would read ~0.25 on a perfectly
    quiet box and wrongly 'normalize' every 2-core wall by 4x (caught in
    the round-3 pairB c2 run)."""
    import threading

    if nthreads is None:
        nthreads = min(8, CPUS)

    best = float("inf")
    for _ in range(2):
        threads = [
            threading.Thread(target=_calib_once) for _ in range(nthreads)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        best = min(best, time.perf_counter() - t0)
    return round(_CALIB_PAR_REF_SECS / best, 3)


_MEMBW_ARR = None


def _membw_once() -> float:
    """One streaming pass over a 256 MB array — pure DRAM bandwidth.
    Round-4 finding: a co-tenant's memory traffic can inflate EVERY
    bench query 15-25% while steal reads 0.0, /proc/stat is calm, and
    the cache-resident CPU probes read quiet — only a probe that
    actually streams memory sees it."""
    global _MEMBW_ARR
    import numpy as np

    if _MEMBW_ARR is None:
        _MEMBW_ARR = np.ones(32_000_000, dtype=np.float64)  # 256 MB
    t0 = time.perf_counter()
    float(_MEMBW_ARR.sum())
    return time.perf_counter() - t0


# quiet floor of _membw_once() (seconds); re-derive via --calibrate.
# Pinned from 6 bursts of 30 reps over a minute (0.0323-0.0337, ~7.9
# GB/s single-thread streaming sum) in a window whose CPU probes read
# quiet; if quiet flags ever contradict a uniformly-inflated cross-query
# profile again, re-derive this first.
_MEMBW_REF_SECS = 0.0323


def membw_ratio() -> float:
    """Observed DRAM-streaming throughput as a fraction of the quiet
    floor (1.0 = quiet)."""
    _membw_once()  # touch/fault the array outside the timed runs
    best = min(_membw_once() for _ in range(3))
    return round(_MEMBW_REF_SECS / best, 3)


def window_ratio() -> float:
    """min(single-core, 8-thread-parallel, DRAM-streaming) calibration —
    a window is only quiet if ALL read quiet (round-3: parallel capacity
    degrades independently of per-core speed; round-4: DRAM bandwidth
    degrades independently of both)."""
    return min(calib_ratio(), calib_par_ratio(), membw_ratio())


# --------------------------------------------------------------------------
# Direct in-rep external-pressure measurement (round-3 hardening #2).
#
# Flanking probes bracket a rep but cannot see a steal burst INSIDE a long
# rep (observed: a 14.5 s flagship rep flagged "quiet" by 0.86 flanks on a
# box that two minutes later measured 3x degraded).  /proc/stat on this
# host is hypervisor- and host-wide: the `steal` column counts cycles the
# hypervisor withheld, and user+sys include same-kernel co-tenant load.
# Subtracting OUR process tree's jiffies (every pid visible in our pid
# namespace) from global busy jiffies yields the co-tenant share directly.
# A rep is quiet only if the flanks read quiet AND the in-rep external
# pressure (steal + co-tenant busy) is < 5% of machine capacity.
# --------------------------------------------------------------------------

_NCPU_HOST = os.cpu_count() or 32


def _machine_snapshot():
    """(global [user,nice,sys,idle,iowait,irq,softirq,steal], our-tree
    utime+stime jiffies summed over every visible pid)."""
    with open("/proc/stat") as f:
        glob = [int(x) for x in f.readline().split()[1:9]]
    ours = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                parts = f.read().rsplit(b")", 1)[1].split()
            ours += int(parts[11]) + int(parts[12])  # utime, stime
        except (OSError, IndexError, ValueError):
            continue  # pid exited mid-walk
    return glob, ours


def rep_pressure(before, after, wall: float) -> dict:
    """Fractions of total machine capacity over the rep window: `steal`
    (hypervisor), `extern` (co-tenant user+sys = global busy minus our
    process tree), `ours`."""
    cap = max(_NCPU_HOST * wall * 100.0, 1.0)  # USER_HZ jiffies
    dg = [b - a for a, b in zip(before[0], after[0])]
    d_ours = max(after[1] - before[1], 0)
    busy = dg[0] + dg[1] + dg[2]  # user + nice + sys
    return {
        "steal": round(dg[7] / cap, 3),
        "extern": round(max(busy - d_ours, 0) / cap, 3),
        "ours": round(d_ours / cap, 3),
    }


_PRESSURE_QUIET = 0.05  # max tolerated external fraction for a quiet rep


def timed_reps(
    run_once,
    min_reps: int,
    max_reps: int,
    budget_s: float,
    quiet_thresh: float = 0.85,
):
    """Run `run_once` repeatedly with flanking calibrations + in-rep
    /proc/stat pressure accounting until a quiet rep lands (>= min_reps)
    or the budget/max_reps cap hits.  Returns (times, ratios, pressures):
    ratios[i] = min(flanking calibrations of rep i); pressures[i] =
    {'steal','extern','ours'} machine-capacity fractions DURING rep i."""
    times: list[float] = []
    ratios: list[float] = []
    pressures: list[dict] = []
    t_section = time.time()
    time.sleep(1.5)  # settle after the caller's untimed warm-up rep
    r_prev = window_ratio()
    while len(times) < max_reps:
        snap0 = _machine_snapshot()
        t0 = time.time()
        run_once()
        dt = time.time() - t0
        snap1 = _machine_snapshot()
        # settle before the flanking probe: right after a heavy Spark rep
        # the JVM is still unwinding (GC, shuffle cleanup, python worker
        # teardown) and depresses the probes even on a perfectly quiet
        # box — the round-4 driver capture showed calm in-rep pressure
        # (extern 0.0) yet flanks 0.6-0.8, i.e. the probe was measuring
        # OUR tail, not co-tenants.  1.5 s lets the JVM quiesce; real
        # external pressure persists across the pause and is still caught.
        time.sleep(1.5)
        r_next = window_ratio()
        times.append(dt)
        ratios.append(min(r_prev, r_next))
        pressures.append(rep_pressure(snap0, snap1, dt))
        r_prev = r_next
        have_quiet = any(
            r >= quiet_thresh and _is_calm(p)
            for r, p in zip(ratios, pressures)
        )
        if len(times) >= min_reps and have_quiet:
            break
        if time.time() - t_section > budget_s:
            break
        if not have_quiet and r_next < quiet_thresh:
            time.sleep(6)  # let the steal burst pass before the next rep
            r_prev = window_ratio()
    return times, ratios, pressures


def _is_calm(p: dict) -> bool:
    return (p["steal"] + p["extern"]) <= _PRESSURE_QUIET


def pick_time(times, ratios, pressures=None, quiet_thresh: float = 0.85):
    """(headline_secs, normalized_secs, quiet_flag): headline = best quiet
    rep when one exists (quiet = flanks >= thresh AND in-rep external
    pressure calm), else the raw min; normalized = min over reps of
    wall * min(ratio, 1) — the quiet-window estimate."""
    if pressures is None:
        pressures = [{"steal": 0.0, "extern": 0.0, "ours": 1.0}] * len(times)
    quiet = [
        t
        for t, r, p in zip(times, ratios, pressures)
        if r >= quiet_thresh and _is_calm(p)
    ]
    raw_min = min(times)
    normalized = min(t * min(r, 1.0) for t, r in zip(times, ratios))
    if quiet:
        return min(quiet), round(normalized, 2), True
    return raw_min, round(normalized, 2), False


def pick_headline_times(
    hl_times: dict, ratios, pressures, quiet_thresh: float = 0.85
):
    """Per-query headline selection mirroring pick_time (ADVICE r03):
    each query's reported time is its best time from a QUIET pass when
    one exists, else the raw min.  Returns ({name: secs}, quiet_flag) —
    quiet_flag=True guarantees EVERY reported time came from a
    certified-quiet pass."""
    quiet_passes = [
        i
        for i, (r, p) in enumerate(zip(ratios, pressures))
        if r >= quiet_thresh and _is_calm(p)
    ]
    picked = {}
    all_quiet = bool(quiet_passes)
    for name, times in hl_times.items():
        pool = [times[i] for i in quiet_passes if i < len(times)]
        picked[name] = min(pool) if pool else min(times)
        if not pool:
            # this query's reported time did NOT come from a quiet pass
            # (ADVICE r04: the flag must certify every reported number)
            all_quiet = False
    return picked, all_quiet


def _emit(meta: dict) -> None:
    """Print the bench result.  Inside a section subprocess the FULL json
    goes to stdout (the parent merges `stats`).  At top level the full
    json is written to BENCH_detail.json and the printed line is a
    COMPACT summary: the driver that records BENCH_r{N}.json captures
    only the last ~2000 chars of stdout and parses from there — rounds 3
    and 4 overflowed that with the full stats blob and were recorded as
    parsed=null (unparseable tail), losing the headline metric."""
    if os.environ.get("BENCH_SUBPROC") == "1":
        print(json.dumps(meta))
        return
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_detail.json"), "w") as f:
        json.dump(meta, f, indent=1)
    compact = {
        k: meta[k]
        for k in (
            "metric", "value", "unit", "queries", "sf", "cpus",
            "n_images", "n_points",
        )
        if k in meta
    }
    s = meta.get("stats", {})
    keep = [
        "scaling_quiet_window", "scaling_pip_normalized",
        "scaling_rows_per_sec", "scaling_joined_rows",
        "flagship_quiet_window", "flagship_normalized",
        "flagship_images_per_sec", "flagship_joined_tiles",
        "flagship_runs", "scaling_runs",
        "headline_quiet_window",
        "png_quiet_window", "png_normalized", "png_images_per_sec",
        "png_decode_mpx_per_sec",
        "jpeg_quiet_window", "jpeg_normalized", "jpeg_images_per_sec",
        "jpeg_decode_mpx_per_sec",
        "jpeg_codec_share_decode_only", "jpeg_codec_share_vs_native_floor",
    ]
    compact["stats"] = {k: s[k] for k in keep if k in s}
    compact["detail"] = "BENCH_detail.json"
    line = json.dumps(compact)
    if len(line) >= 1900:  # stay inside the driver's 2000-char tail
        compact.pop("stats", None)
        line = json.dumps(compact)
    print(line)


def _run_sections_in_subprocesses() -> None:
    """One OS process (= one fresh JVM + python worker pool) per section.

    spark.stop() keeps the JVM alive in-process, so a section measured
    after the 24M-row scaling scan inherits a heap-grown, fragmented JVM —
    measured 1.5-2x slower flagship than the same section in a fresh
    process.  Sub-processing each section makes the full-bench numbers
    match the section-isolated ones."""
    import subprocess

    merged_q: dict = {}
    merged_extra: dict = {}
    meta: dict = {}
    for sec in ("scaling", "flagship", "headline", "png"):
        if sec not in SECTIONS:
            continue
        env = dict(os.environ)
        env["BENCH_ONLY"] = sec
        env["BENCH_SUBPROC"] = "1"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = next(
            (
                ln
                for ln in reversed(out.stdout.strip().splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if line is None:
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"bench section {sec} produced no JSON")
        d = json.loads(line)
        merged_q.update(d["queries"])
        merged_extra.update(d.get("stats", {}))
        meta = d
    meta["queries"] = merged_q
    meta["stats"] = merged_extra
    meta["value"] = round(sum(merged_q.values()), 2)
    _emit(meta)


def main() -> None:
    if "--calibrate" in sys.argv:
        # re-derive the quiet floor: run the kernel 100x, print the min;
        # paste into _CALIB_REF_SECS if the box changes
        _calib_once()
        best = min(
            (lambda t0: (_calib_once(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(100)
        )
        import threading

        par_best = float("inf")
        for _ in range(30):
            ts = [threading.Thread(target=_calib_once) for _ in range(8)]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            par_best = min(par_best, time.perf_counter() - t0)
        mem_best = min(_membw_once() for _ in range(100))
        print(json.dumps({"calib_floor_secs": round(best, 4),
                          "pinned": _CALIB_REF_SECS,
                          "calib_par_floor_secs": round(par_best, 4),
                          "pinned_par": _CALIB_PAR_REF_SECS,
                          "membw_floor_secs": round(mem_best, 5),
                          "pinned_membw": _MEMBW_REF_SECS}))
        return
    if len(SECTIONS) > 1:
        _run_sections_in_subprocesses()
        return
    try:
        os.sched_setaffinity(0, set(range(CPUS)))
    except (AttributeError, OSError):
        pass

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    import h3ronpy_spark.functions as H
    from h3ronpy_spark.operators.spatial_join import pip_join
    from h3ronpy_spark.plans.flagship import flagship
    from h3ronpy_spark.session import get_spark
    from h3ronpy_spark.sources.polygons import synth_polygons

    spark = get_spark(
        f"local[{CPUS}]", app_name="h3ronpy_spark_bench", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = 0.1
    for tok in SF_DIR.split("/"):
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    results: dict[str, float] = {}
    extra: dict[str, float] = {}

    if "scaling" in SECTIONS:
        # --- scaling workload: encode res sweep + PIP join (compute-bound).
        # Runs FIRST in a clean session: heavy mixed workloads leave the
        # worker pool in a degraded state (heap fragmentation) that perturbs
        # throughput measurements 2-3x; rep 1 of 3 doubles as warm-up.
        points = spark.range(0, N_POINTS, 1, CPUS * 2).select(
            F.col("id"),
            (F.pmod(F.col("id") * 2654435761, F.lit(1700000)) / 10000.0 - 85.0).alias(
                "lat"
            ),
            (F.pmod(F.col("id") * 40503, F.lit(3600000)) / 10000.0 - 180.0).alias(
                "lng"
            ),
        )
        from h3ronpy_spark.operators.spatial_join import polyfill_polygons

        from h3ronpy_spark.operators.spatial_join import lift_coverage

        polys = synth_polygons(spark, 60, seed=42)
        # one compact coverage per coverage resolution; res-9 coverage serves
        # every finer point resolution via ancestor prefixes.  Coverage is
        # built once and reused across the whole scan (as it would be across a
        # 10^12-image table), so it is outside the throughput timing.  The
        # coarse tail is lifted to res >= target-2 (lift_coverage): fewer
        # exploded probe rows on the 24M-point side — measured 1.5x.
        covs = {}
        for r in (7, 8, 9):
            covs[r] = (
                lift_coverage(
                    polyfill_polygons(polys, r, compact=True)
                    .withColumnRenamed("cell", "__poly_cell"),
                    r - 2,
                )
                .persist()
            )
            covs[r].count()

        # single-branch plan: every row carries its own sweep resolution
        # (res = 7 + id % 6), so the whole res-7..12 sweep is ONE encode pass
        # and ONE prefix join against the res-7 coverage
        sweep_pts = points.withColumn(
            "res", (F.pmod(F.col("id"), F.lit(6)) + 7).cast("int")
        )
        enc = sweep_pts.select(
            "id", H.coordinates_to_cells("lat", "lng", "res").alias("cell")
        )
        job = (
            pip_join(enc, polys, res=7, coverage=covs[7])
            .groupBy("poly_id")
            .agg(F.count("*").alias("n"))
            .agg(F.sum("n"))
        )
        # warm-up rep (worker pool spin-up), then calibrated reps: keep
        # buying reps until one lands in a quiet co-tenant window (both
        # flanking single-core calibrations >= 0.9 of the pinned floor) or
        # the budget runs out — uniform steal windows are invisible to
        # min-of-N alone (round-2 verdict, What's wrong #1)
        state = {"n": 0}

        def _run_once():
            state["n"] = job.first()[0]

        _run_once()  # warm-up, untimed
        runs, cratios, cpress = timed_reps(
            _run_once, min_reps=3, max_reps=12, budget_s=REP_BUDGET
        )
        scaling_secs, scaling_norm, scaling_quiet = pick_time(
            runs, cratios, cpress
        )
        extra["scaling_rep_pressure"] = cpress
        n_joined = state["n"]
        total_rows = N_POINTS
        results["scaling_pip"] = round(scaling_secs, 2)
        extra["scaling_cells_encoded"] = total_rows
        extra["scaling_joined_rows"] = int(n_joined or 0)
        extra["scaling_rows_per_sec"] = round(total_rows / scaling_secs, 1)
        extra["scaling_runs"] = [round(x, 2) for x in runs]
        extra["scaling_calib_ratios"] = cratios
        extra["scaling_quiet_window"] = scaling_quiet
        extra["scaling_pip_normalized"] = scaling_norm
        extra["scaling_rows_per_sec_normalized"] = round(
            total_rows / scaling_norm, 1
        )

    # --- fresh session for the remaining sections: long mixed-UDF
    # sessions degrade python worker throughput (see BENCH.md caveat);
    # stopping the context recycles the worker pool
    spark.stop()
    spark = get_spark(
        f"local[{CPUS}]", app_name="h3ronpy_spark_bench2",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "flagship" in SECTIONS:
        flagship(spark, n_images=2000, n_polygons=10, res=8, partitions=CPUS).count()
        # the polygon coverage is an index built once per polygon set and
        # amortized across the whole 10^12-image scan (same treatment as
        # the scaling workload's covs) — built outside the rep timing
        from h3ronpy_spark.operators.spatial_join import polyfill_polygons

        # ROUND-3 finding: do NOT lift this coverage.  Lifting [7..9] grew
        # the broadcast side 468k -> 2.29M rows, and the broadcast hash
        # relation is built SINGLE-THREADED on the driver per query — a
        # 7-12 s serial stage (caught via /proc sampling: machine at R=0
        # while one broadcast-exchange thread built a LongToUnsafeRowMap).
        # The compact coverage costs ~5 extra probe levels on the tile
        # side, but that work is codegen'd and embarrassingly parallel —
        # the trade every 100-TB run wants.  Measured: 9.0 s vs 14.4 s
        # per rep on identical hardware/window.
        flag_polys = synth_polygons(spark, 60, seed=42)
        flag_cov = (
            polyfill_polygons(flag_polys, 9, compact=True)
            .withColumnRenamed("cell", "__poly_cell")
            .persist()
        )
        flag_cov.count()

        # --- flagship image pipeline: calibrated reps (see scaling section)
        fstate = {"tiles": 0}

        def _flag_once():
            out = flagship(
                spark, n_images=N_IMAGES, n_polygons=60, res=9,
                partitions=256, coverage=flag_cov,
            )
            fstate["tiles"] = int(
                out.agg(F.sum("n_tiles").alias("tiles")).first()["tiles"] or 0
            )

        _flag_once()  # warm-up, untimed
        flag_runs, fratios, fpress = timed_reps(
            _flag_once, min_reps=2, max_reps=10, budget_s=REP_BUDGET
        )
        flag_secs, flag_norm, flag_quiet = pick_time(
            flag_runs, fratios, fpress
        )
        extra["flagship_rep_pressure"] = fpress
        results["flagship_pip_join"] = round(flag_secs, 2)
        extra["flagship_runs"] = [round(x, 2) for x in flag_runs]
        extra["flagship_calib_ratios"] = fratios
        extra["flagship_quiet_window"] = flag_quiet
        extra["flagship_normalized"] = flag_norm
        extra["flagship_joined_tiles"] = fstate["tiles"]
        extra["flagship_images_per_sec"] = round(N_IMAGES / flag_secs, 1)
        extra["flagship_images_per_sec_normalized"] = round(
            N_IMAGES / flag_norm, 1
        )

    if "png" in SECTIONS:
        # --- PNG flagship (round 6, VERDICT r05 item 2): the identical
        # pipeline over the PNG-compressed twin of the images table —
        # zlib + unfilter decode per image through the codec registry.
        # Same pixels => row-identical rollup (asserted in tests); the
        # delta vs flagship_pip_join is the real compressed-decode cost
        # a 100-TB image corpus pays.
        from h3ronpy_spark.operators.spatial_join import polyfill_polygons

        png_polys = synth_polygons(spark, 60, seed=42)
        png_cov = (
            polyfill_polygons(png_polys, 9, compact=True)
            .withColumnRenamed("cell", "__poly_cell")
            .persist()
        )
        png_cov.count()
        # exact pixel volume for decode-throughput reporting (untimed)
        from h3ronpy_spark.sources.images import synth_images

        total_px = int(
            synth_images(spark, N_IMAGES_PNG, seed=42, partitions=CPUS)
            .select((F.col("w").cast("long") * F.col("h")).alias("px"))
            .agg(F.sum("px"))
            .first()[0]
        )
        pstate = {"tiles": 0}

        def _png_once():
            out = flagship(
                spark, n_images=N_IMAGES_PNG, n_polygons=60, res=9,
                partitions=256, coverage=png_cov, fmt="png",
            )
            pstate["tiles"] = int(
                out.agg(F.sum("n_tiles").alias("t")).first()["t"] or 0
            )

        _png_once()  # warm-up, untimed
        png_runs, pratios, ppress = timed_reps(
            _png_once, min_reps=2, max_reps=8, budget_s=REP_BUDGET
        )
        png_secs, png_norm, png_quiet = pick_time(png_runs, pratios, ppress)
        results["flagship_png"] = round(png_secs, 2)
        extra["png_rep_pressure"] = ppress
        extra["png_runs"] = [round(x, 2) for x in png_runs]
        extra["png_calib_ratios"] = pratios
        extra["png_quiet_window"] = png_quiet
        extra["png_normalized"] = png_norm
        extra["png_joined_tiles"] = pstate["tiles"]
        extra["png_total_pixels"] = total_px
        extra["png_images_per_sec"] = round(N_IMAGES_PNG / png_secs, 1)
        extra["png_decode_mpx_per_sec"] = round(total_px / png_secs / 1e6, 2)
        extra["png_images_per_sec_normalized"] = round(
            N_IMAGES_PNG / png_norm, 1
        )

        # --- JPEG flagship (round 6): the LOSSY baseline codec under
        # the same load; structure-identical pipeline, decode adds
        # Huffman entropy decode + IDCT per image
        jstate = {"tiles": 0}

        def _jpeg_once():
            out = flagship(
                spark, n_images=N_IMAGES_PNG, n_polygons=60, res=9,
                partitions=256, coverage=png_cov, fmt="jpeg",
            )
            jstate["tiles"] = int(
                out.agg(F.sum("n_tiles").alias("t")).first()["t"] or 0
            )

        _jpeg_once()  # warm-up, untimed
        jpeg_runs, jratios, jpress = timed_reps(
            _jpeg_once, min_reps=2, max_reps=6, budget_s=REP_BUDGET / 2
        )
        jpeg_secs, jpeg_norm, jpeg_quiet = pick_time(
            jpeg_runs, jratios, jpress
        )
        results["flagship_jpeg"] = round(jpeg_secs, 2)
        extra["jpeg_rep_pressure"] = jpress
        extra["jpeg_runs"] = [round(x, 2) for x in jpeg_runs]
        extra["jpeg_calib_ratios"] = jratios
        extra["jpeg_quiet_window"] = jpeg_quiet
        extra["jpeg_normalized"] = jpeg_norm
        extra["jpeg_joined_tiles"] = jstate["tiles"]
        extra["jpeg_images_per_sec"] = round(N_IMAGES_PNG / jpeg_secs, 1)
        extra["jpeg_decode_mpx_per_sec"] = round(
            total_px / jpeg_secs / 1e6, 2
        )

        # --- codec share isolation (round 7, VERDICT r06 item 7): two
        # independent measurements of the decoder's share of the
        # flagship_jpeg wall.
        # (a) decode-only pass: the same JPEG table through the SAME
        #     registry dispatch, no tiling/join — the codec's cost.
        # (b) native-stub flagship: the full pipeline with a
        #     memcpy-class fake decoder plugged through codec_override
        #     — the pipeline's non-decode floor.  The stub's constant
        #     raster keeps nodata pixels, so its tile volume is
        #     slightly HIGHER than real decode: the floor is an upper
        #     bound, the share estimate conservative.
        import pandas as pd

        from h3ronpy_spark.sources.images import (
            codec_snapshot,
            synth_images_jpeg,
        )
        from h3ronpy_spark.sources.jpeg import register_jpeg_codec

        register_jpeg_codec()
        _dec_codecs = codec_snapshot()

        def _jpeg_decode_only():
            imgs = synth_images_jpeg(
                spark, N_IMAGES_PNG, seed=42, partitions=256
            )

            def run(batches):
                from h3ronpy_spark.sources.images import decode_image_with

                for b in batches:
                    acc = 0
                    for blob, w_, h_, f_ in zip(
                        b["bytes"], b["w"], b["h"], b["fmt"]
                    ):
                        a = decode_image_with(
                            _dec_codecs, blob, int(w_), int(h_), f_
                        )
                        acc += int(a[0, 0])
                    yield pd.DataFrame({"n": [acc]})

            imgs.mapInPandas(run, "n long").agg(F.sum("n")).first()

        _jpeg_decode_only()  # warm-up, untimed
        dec_runs, _, _ = timed_reps(
            _jpeg_decode_only, min_reps=2, max_reps=3,
            budget_s=REP_BUDGET / 4,
        )
        dec_secs = min(dec_runs)

        def _native_stub(blob, w_, h_, fmt_):
            import numpy as np

            return np.full((int(h_), int(w_)), 170, np.uint8)

        def _jpeg_native_once():
            out = flagship(
                spark, n_images=N_IMAGES_PNG, n_polygons=60, res=9,
                partitions=256, coverage=png_cov, fmt="jpeg",
                codec_override={"jpeg": _native_stub},
            )
            out.agg(F.sum("n_tiles").alias("t")).first()

        _jpeg_native_once()  # warm-up, untimed
        nat_runs, _, _ = timed_reps(
            _jpeg_native_once, min_reps=2, max_reps=3,
            budget_s=REP_BUDGET / 4,
        )
        nat_secs = min(nat_runs)
        extra["jpeg_decode_only_secs"] = round(dec_secs, 2)
        extra["jpeg_native_stub_secs"] = round(nat_secs, 2)
        extra["jpeg_codec_share_decode_only"] = round(
            dec_secs / jpeg_secs, 3
        )
        extra["jpeg_codec_share_vs_native_floor"] = round(
            max(0.0, (jpeg_secs - nat_secs)) / jpeg_secs, 3
        )

    if "headline" in SECTIONS:
        # --- headline queries over the sf tables
        qs = E.queries()
        # amortized-coverage pattern: the pip-join polygon coverage is built
        # once per polygon set and reused across the whole scan (identical to
        # the scaling workload's covs above), so it is outside the per-query
        # timing
        E._pip_coverage(spark, 120, 7, 8)
        headline = [
            "q1_pricing_summary",
            "q5_region_revenue",
            "top_customers_window",
            "events_sessions",
            "dedup_exact",
            "text_token_count",
            "similarity_topk_cosine",
            "h3_encode",
            "h3_parent_rollup",
            "h3_pip_join",
            "h3_tiling",
            # round-4 (VERDICT r03 item 9): the dedup/ANN signature
            # kernels in the per-round capture so regressions are visible
            "dedup_minhash_lsh",
            "similarity_lsh_ann",
        ]
        # up to BENCH_HEADLINE_PASSES (default 3) calibrated passes;
        # stop early once a pass ran in a
        # quiet window (flanking ratios >= 0.85, calm pressure).  Times
        # are tracked PER PASS (round-4, ADVICE r03): each query's
        # reported number is its best time from a QUIET pass when one
        # exists (falling back to the raw min with quiet=False),
        # mirroring pick_time — so headline_quiet_window=True guarantees
        # every per-query time came from a certified-quiet pass.
        hl_ratios = []
        hl_press = []
        hl_times: dict = {name: [] for name in headline}
        t_section = time.time()
        # round-7: the 3-pass cap was the structural reason headline
        # never certified quiet while every other section (6-12 reps)
        # did; the cap is now tunable so a stretched-budget capture can
        # keep buying passes until one lands in a quiet window.
        max_passes = int(os.environ.get("BENCH_HEADLINE_PASSES", "3"))
        for pass_i in range(max_passes):
            r_before = window_ratio()
            snap0 = _machine_snapshot()
            t_pass = time.time()
            for name in headline:
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                n = df.count()
                hl_times[name].append(round(time.time() - t0, 2))
                extra[f"{name}_rows"] = n
            snap1 = _machine_snapshot()
            time.sleep(1.5)  # settle (see timed_reps): probe co-tenants,
            # not our own JVM unwind
            r_after = window_ratio()
            hl_ratios.append(min(r_before, r_after))
            hl_press.append(
                rep_pressure(snap0, snap1, time.time() - t_pass)
            )
            pass_quiet = any(
                r >= 0.85 and _is_calm(p)
                for r, p in zip(hl_ratios, hl_press)
            )
            # pass 1 doubles as warm-up (python worker spin-up, broadcast
            # builds): never stop before a second, warmed pass — the other
            # sections all run an untimed warm-up rep for the same reason
            if (pass_i >= 1 and pass_quiet) or time.time() - t_section > REP_BUDGET:
                break
        picked, hl_quiet = pick_headline_times(hl_times, hl_ratios, hl_press)
        results.update(picked)
        extra["headline_calib_ratios"] = hl_ratios
        extra["headline_rep_pressure"] = hl_press
        extra["headline_times_per_pass"] = hl_times
        extra["headline_quiet_window"] = hl_quiet

    total = round(sum(results.values()), 2)
    _emit(
        {
            "metric": "cells encoded + PIP-joined (scaling_pip) + "
            "flagship + headline wall seconds",
            "value": total,
            "unit": "sec",
            "queries": results,
            "sf": sf,
            "cpus": CPUS,
            "n_images": N_IMAGES,
            "n_points": N_POINTS,
            "stats": extra,
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
