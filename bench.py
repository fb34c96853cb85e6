#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "validation": {...}, "scaling": {...}}

Two parts:
1. Headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
2. The north-rule scaling evidence: the full constraint-validation job
   on a deterministic tokens table at two parallelism levels
   (N vs 4N cores), reporting validated sequences/sec at both and the
   scaling efficiency throughput_4N / (4 * throughput_N). Each level
   runs in its own pinned subprocess (one JVM cannot change local[N]
   masters); single timed passes ALTERNATE between the two parked JVMs
   so both levels sample the same host-weather window (see
   _worker_loop docstring).

   The pair defaults to local[1] vs local[4], NOT 8 vs 32: this sandbox
   is a VM whose 32 vCPUs are host-overcommitted — measured zero
   aggregate throughput gain beyond ~8 busy workers, and the per-core
   grant at 8 threads oscillates 2-6x on a minutes timescale (BENCH.md
   "Host CPU evidence"), so higher pairs measure the host scheduler,
   not the engine. 1→4 stays inside the host's reliably-granted
   capacity. Override with SPARK_GRAFT_SCALE_CPUS=2,8 etc.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 8M rows (~10 GB parquet): large enough that the ~2.7s fixed driver
# overhead per pass (plan/scheduling of ~4 jobs, measured with a
# 10k-row input) stays under 10% of the shortest timed config, small
# enough that 5 interleaved pass-pairs finish in ~15 min
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "8000000"))
TOKENS_PATH = os.environ.get("SPARK_GRAFT_TOKENS_PATH", "/tmp/kglids_bench_tokens8")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "profile_stats",
    "group_count_customers_per_nation",
    "topk_revenue_customers",
    "join_multiway_region",
    "topk_orders_per_priority",
    "latest_event_per_user",
    "sessionize_events",
    "tumbling_window_events",
    "histogram_n_chars",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_knn_join",
    "ann_lsh_topk",
    "text_quality",
    "token_counts",
    "drift_ks_events",
    "drift_psi_events",
    "constraints_documents",
]


def _worker_validate(cpus: int, tokens_path: str, repeats: int = 4) -> dict:
    """Runs in a subprocess: one warmup + ``repeats`` timed passes.

    Reports best-of-N: this sandbox's vCPUs are host-overcommitted with
    highly variable steal time (BENCH.md "Host CPU evidence"), so the
    minimum approximates the uncontended capability of the config."""
    from kglids_spark.session import get_spark
    from kglids_spark.operators import constraints as C
    from kglids_spark.operators.validate import validate
    from kglids_spark.sources.tokens import SOURCES

    spark = get_spark(app_name=f"bench_validate_{cpus}", cpus=cpus)
    df = spark.read.parquet(tokens_path)
    suite = C.default_suite(SOURCES)
    # warmup: full-size pass (codegen/JIT, parquet footers, page cache)
    # so timed runs start at the floor; violations skipped to save time
    validate(df, suite, n_buckets=64, extract_violation_rows=False)
    times, rows, n_viol, est = [], 0, 0, 0
    for _ in range(repeats):
        t0 = time.time()
        res = validate(df, suite, n_buckets=64, extract_violation_rows=True)
        n_viol = res.violations.count()
        times.append(time.time() - t0)
        rows = res.metrics["rows_validated"]
        est = res.metrics["distinct_key_estimate"]
    best = min(times)
    out = {
        "cpus": cpus,
        "rows": rows,
        "elapsed_sec": round(best, 3),
        "all_runs_sec": [round(t, 2) for t in times],
        "sequences_per_sec": round(rows / best, 1),
        "violations": n_viol,
        "distinct_estimate": est,
    }
    spark.stop()
    return out


def _worker_loop(cpus: int, tokens_path: str) -> None:
    """Long-lived pinned worker: parks between passes and runs one
    timed validate pass per "run" command on stdin.

    Why a loop instead of N back-to-back passes: this host's effective
    CPU/memory bandwidth wobbles 2-3x on a minutes timescale (identical
    cached scans measured 14.5-39s — BENCH.md "Host CPU evidence"), so
    timing all local[N] passes, THEN all local[4N] passes confounds the
    scaling ratio with host weather. The orchestrator alternates single
    passes between two parked JVMs so both levels sample the same
    weather window; best-of-per-level then compares like with like."""
    from kglids_spark.session import get_spark
    from kglids_spark.operators import constraints as C
    from kglids_spark.operators.validate import validate
    from kglids_spark.sources.tokens import SOURCES

    spark = get_spark(app_name=f"bench_validate_{cpus}", cpus=cpus)
    df = spark.read.parquet(tokens_path)
    suite = C.default_suite(SOURCES)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd == "warmup":
            # full-size pass (codegen/JIT, parquet footers, page cache)
            validate(df, suite, n_buckets=64, extract_violation_rows=False)
            print(json.dumps({"ok": True}), flush=True)
            continue
        if cmd == "run":
            t0 = time.time()
            res = validate(df, suite, n_buckets=64, extract_violation_rows=True)
            n_viol = res.violations.count()
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "t": round(dt, 3),
                        "rows": res.metrics["rows_validated"],
                        "violations": n_viol,
                        "distinct_estimate": res.metrics["distinct_key_estimate"],
                    }
                ),
                flush=True,
            )
    spark.stop()


class _PinnedWorker:
    """Handle on a taskset-pinned ``--worker-loop`` subprocess. Worker
    stderr is captured to a tempfile so a dead JVM reports its actual
    failure (tail of stderr) instead of a bare 'worker died'; the
    tempfile is removed in quit() (ADVICE r3: one leaked file per
    worker per bench run)."""

    def __init__(self, cpus: int, extra_env: dict[str, str] | None = None):
        self.cpus = cpus
        self._errf = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f"_w{cpus}.err", delete=False
        )
        env = dict(os.environ)
        if extra_env:
            env.update(extra_env)
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__),
            "--worker-loop", "--cpus", str(cpus),
        ]
        self.proc = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self._errf,
            text=True,
            env=env,
        )

    def _stderr_tail(self, n: int = 2000) -> str:
        try:
            self._errf.flush()
            with open(self._errf.name) as f:
                return f.read()[-n:]
        except Exception:
            return "<stderr unavailable>"

    def _cmd(self, cmd: str) -> dict:
        assert self.proc.stdin and self.proc.stdout
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()
        line = self.proc.stdout.readline()
        if not line:
            raise RuntimeError(
                f"worker local[{self.cpus}] died; stderr tail:\n{self._stderr_tail()}"
            )
        return json.loads(line)

    def warmup(self) -> None:
        self._cmd("warmup")

    def run(self) -> dict:
        return self._cmd("run")

    def quit(self) -> None:
        try:
            assert self.proc.stdin
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()
        try:
            self._errf.close()
            os.unlink(self._errf.name)
        except OSError:
            pass


def _steady_pair_indices(
    low_ts: list[float], high_ts: list[float], tol: float = 0.15
) -> tuple[list[int], float]:
    """(indices, tol_used): the pairs usable for the scaling ratio —
    BOTH sides within ``tol_used`` of their series minimum — plus the
    tolerance that actually admitted them (the widening ladder below).

    Two contamination modes, one predicate. (1) Warm-up: the driver's
    round-3 series showed BOTH levels still improving at pass 6
    (local[4] went 102→37 s) — a monotone trend that order-alternation
    cannot cancel, because warm-up inflates the slow side of every pair
    in the same direction regardless of order; the contaminated median
    read 0.596 while converged same-binary local series read 0.84-0.93
    (VERDICT r3 #1). Warm-up pairs fail this predicate at the head of
    the series. (2) Mid-series weather spikes: a prefix-only gate
    re-admits them (observed: one local[4] pass at 55 s vs its 30 s
    steady state dragged a 3-pair converged median to 0.79 while the
    cross-pair minima read 0.908), so the filter is applied PER PAIR.
    It is symmetric by construction — a spiked low side (which would
    inflate the ratio) is dropped exactly as a spiked high side (which
    would deflate it) — so it cannot bias the median's direction; it
    only removes pairs that do not measure the steady-state engine.

    The predicate needs a COMMON index near both minima; when the two
    sides' minima land on different passes and no pair is near both
    (e.g. low=[10,20], high=[20,10]), the window would be empty — the
    filter then WIDENS the tolerance (2×, then 4×, then everything)
    until pairs qualify, and reports the tolerance actually used so a
    degenerate series is visible in the artifact instead of silently
    collapsing to one arbitrary pair. Returns (indices, tol_used)."""
    for t in (tol, tol * 2, tol * 4):
        lo_min, hi_min = min(low_ts), min(high_ts)
        idx = [
            i
            for i in range(len(low_ts))
            if low_ts[i] <= lo_min * (1 + t) and high_ts[i] <= hi_min * (1 + t)
        ]
        if idx:
            return idx, t
    return list(range(len(low_ts))), float("inf")


def _scaling_measurement(
    low_cpus: int,
    high_cpus: int,
    passes: int = 6,
    max_passes: int = 12,
    min_converged: int = 3,
) -> tuple[dict, dict, dict]:
    """Interleaved paired sampling: one warmup per JVM, then alternate
    single timed passes low/high. Only one worker computes at a time
    (the other JVM is parked on a blocking stdin read), so passes never
    contend; interleaving puts both levels in the same weather window.

    The within-pair ORDER alternates per pass (low-high, high-low, ...):
    with a fixed order, a monotone weather drift across the ~3-minute
    pair window biases every pair's ratio the same way (a round-3
    series with improving weather read pairs 1.6→3.65 under fixed
    order); alternating flips the sign of the drift term pair to pair
    so the median cancels it.

    Warm-up (unlike weather drift) is monotone and order-immune, so the
    series is additionally steady-state-gated: every pair where either
    side is >15% above its series minimum is discarded — per pair, not
    prefix-only, so a mid-series weather spike is excluded exactly like
    a leading warm-up pass (``_steady_pair_indices``) — and, if fewer
    than ``min_converged`` pairs survive — or the final pair is still
    setting a >5% new minimum — extra pairs run, up to ``max_passes``
    total. The third return value carries the convergence evidence for
    the parsed JSON."""
    w_low, w_high = _PinnedWorker(low_cpus), _PinnedWorker(high_cpus)
    runs_low: list[dict] = []
    runs_high: list[dict] = []
    try:
        w_low.warmup()
        w_high.warmup()
        i = 0
        while True:
            if i % 2 == 0:
                runs_low.append(w_low.run())
                runs_high.append(w_high.run())
            else:
                runs_high.append(w_high.run())
                runs_low.append(w_low.run())
            i += 1
            print(
                f"[bench] pass {i}: local[{low_cpus}]={runs_low[-1]['t']}s "
                f"local[{high_cpus}]={runs_high[-1]['t']}s",
                file=sys.stderr,
                flush=True,
            )
            if i < passes:
                continue
            if i >= max_passes:
                break
            lo = [r["t"] for r in runs_low]
            hi = [r["t"] for r in runs_high]
            n_converged = len(_steady_pair_indices(lo, hi)[0])
            still_descending = any(
                ts[-1] <= min(ts) and (len(ts) < 2 or min(ts[:-1]) > ts[-1] * 1.05)
                for ts in (lo, hi)
            )
            if n_converged >= min_converged and not still_descending:
                break
            print(
                f"[bench] extending: {n_converged} converged pairs"
                f"{' and final pass still descending' if still_descending else ''}",
                file=sys.stderr,
                flush=True,
            )
    finally:
        w_low.quit()
        w_high.quit()

    steady, steady_tol = _steady_pair_indices(
        [r["t"] for r in runs_low], [r["t"] for r in runs_high]
    )
    convergence = {
        "steady_pair_indices": steady,
        "steady_tol": steady_tol,
        "warmup_pairs_discarded": steady[0] if steady else 0,
        "mid_series_pairs_discarded": len(runs_low) - len(steady) - (steady[0] if steady else 0),
        "pairs_total": len(runs_low),
        "pairs_converged": len(steady),
    }

    def summarize(cpus: int, runs: list[dict]) -> dict:
        best = min(r["t"] for r in runs)
        rows = runs[0]["rows"]
        return {
            "cpus": cpus,
            "rows": rows,
            "elapsed_sec": best,
            "all_runs_sec": [r["t"] for r in runs],
            "converged_runs_sec": [runs[i]["t"] for i in steady],
            "sequences_per_sec": round(rows / best, 1),
            "violations": runs[0]["violations"],
            "distinct_estimate": runs[0]["distinct_estimate"],
        }

    return summarize(low_cpus, runs_low), summarize(high_cpus, runs_high), convergence


def _worker_headline(cpus: int, sf_dir: str, timed_passes: int = 2) -> dict:
    """Runs in a taskset-pinned subprocess: one FULL warm-up pass over
    every headline query, then ``timed_passes`` timed passes, best-of.

    Round 3's suite warmed only one light query, so each query's first
    timed try paid its own codegen compile + parquet footer reads + page
    -cache fill — and the driver's r3 numbers showed those costs landing
    in the artifact (dedup_minhash_lsh 4.1 s driver vs 1.9 s warmed
    builder-local, contradicting a measured 6x family-scale improvement
    — VERDICT r3 #2). A full warm-up pass puts every timed number on
    the warmed floor; pinning mirrors the scaling workers."""
    from kglids_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench_queries", cpus=cpus)
    qs = entry_mod.queries()
    t0 = time.time()
    for name in HEADLINE:
        qs[name](spark, sf_dir).collect()
    warm_sec = round(time.time() - t0, 3)
    print(f"[bench] warm-up pass: {warm_sec}s", file=sys.stderr, flush=True)
    query_secs: dict[str, float] = {}
    for name in HEADLINE:
        best: float | None = None
        for _ in range(timed_passes):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        query_secs[name] = round(best, 3)
        print(f"[bench] {name}: {query_secs[name]}s", file=sys.stderr, flush=True)
    spark.stop()
    return {"queries": query_secs, "warmup_pass_sec": warm_sec}


def _worker_generate(cpus: int, rows: int, tokens_path: str) -> dict:
    from kglids_spark.session import get_spark
    from kglids_spark.sources.tokens import generate_tokens

    spark = get_spark(app_name="bench_generate", cpus=cpus)
    t0 = time.time()
    generate_tokens(spark, rows, partitions=cpus * 2).write.mode("overwrite").parquet(
        tokens_path
    )
    out = {"generated_rows": rows, "gen_sec": round(time.time() - t0, 2)}
    spark.stop()
    return out


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def _host_cpu_speedup(low: int, high: int, seconds: float = 4.0) -> dict:
    """Measure the host's achievable pure-CPU scaling between ``low``
    and ``high`` busy processes (this VM's vCPUs are overcommitted, so
    the achievable ratio is < high/low; an engine cannot scale past the
    CPU the host actually grants). Python busy-loops, one per process.

    Best-of-3 per level: a single probe can land in a steal spike and
    report a physically impossible ratio (observed host_efficiency 1.9
    at 2 trials, and 1.116 even with best-of-2 — the low side is one
    process, so one stall poisons it); taking the max per level
    measures capability, not luck. The speedup used downstream is
    additionally CLAMPED to the theoretical maximum high/low: a
    measured ratio above it proves residual probe contamination, and
    an inflated host ceiling would unfairly deflate the normalized
    engine efficiency."""
    import multiprocessing as mp

    out = {low: 0, high: 0}
    for _ in range(3):
        for n in (low, high):
            with mp.Pool(n) as p:
                out[n] = max(out[n], sum(p.map(_burn, [seconds] * n)))
    raw = out[high] / out[low]
    return {
        "loops_low": out[low],
        "loops_high": out[high],
        "host_speedup_raw": round(raw, 3),
        "host_speedup": round(min(raw, high / low), 3),
        "host_efficiency": round(min(raw, high / low) / (high / low), 3),
    }


def _spawn(args: list[str], pin_cpus: int | None = None) -> dict:
    """Run a worker subprocess; with ``pin_cpus`` the whole JVM is
    pinned to that many cores (taskset), so local[N] faithfully
    emulates an N-core executor — otherwise Spark's GC/shuffle/IO
    threads leak beyond the N task slots and deflate the measured
    scaling ratio."""
    env = dict(os.environ)
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    if pin_cpus:
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    # stderr inherits the parent's so worker progress streams live
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, text=True, env=env, timeout=1800
    )
    if proc.returncode != 0:
        raise RuntimeError(f"worker {args[0]} failed: see stderr above")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--worker-validate" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(_worker_validate(cpus, TOKENS_PATH)))
        return
    if "--worker-loop" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        _worker_loop(cpus, TOKENS_PATH)
        return
    if "--worker-generate" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(_worker_generate(cpus, BENCH_ROWS, TOKENS_PATH)))
        return
    if "--worker-headline" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(_worker_headline(cpus, SF_DIR)))
        return

    # ---- part 1: headline operator queries -----------------------------
    # pinned subprocess, full warm-up pass, best-of-2 warmed (VERDICT r3
    # #2 — see _worker_headline docstring)
    headline = _spawn(
        ["--worker-headline", "--cpus", str(CPUS)], pin_cpus=CPUS
    )
    query_secs: dict[str, float] = headline["queries"]
    total = round(sum(query_secs.values()), 3)

    # ---- part 2: validation throughput + scaling evidence ----------------
    def _existing_rows(path: str) -> int:
        try:
            import pyarrow.dataset as ds

            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                return -1
            return sum(
                f.metadata.num_rows
                for f in ds.dataset(path, format="parquet").get_fragments()
            )
        except Exception:
            return -1

    gen = (
        _spawn(["--worker-generate", "--cpus", str(CPUS)])
        if _existing_rows(TOKENS_PATH) != BENCH_ROWS
        else {"generated_rows": BENCH_ROWS, "gen_sec": 0.0}
    )
    scale_pair = os.environ.get("SPARK_GRAFT_SCALE_CPUS", "1,4")
    low_cpus, high_cpus = (int(x) for x in scale_pair.split(","))
    host = _host_cpu_speedup(low_cpus, high_cpus)
    print(f"[bench] host probe: {host}", file=sys.stderr, flush=True)
    v_low, v_high, convergence = _scaling_measurement(
        low_cpus,
        high_cpus,
        passes=int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "6")),
        max_passes=int(os.environ.get("SPARK_GRAFT_SCALE_MAX_PASSES", "12")),
    )
    print(f"[bench] local[{low_cpus}]: {v_low}", file=sys.stderr, flush=True)
    print(f"[bench] local[{high_cpus}]: {v_high}", file=sys.stderr, flush=True)
    print(f"[bench] convergence: {convergence}", file=sys.stderr, flush=True)
    # peak = best measured config. An unpinned local[32] run was tried
    # and measures WORSE than pinned local[8] (310k vs 394k seq/s):
    # past ~8 busy workers the host grants no additional CPU, so extra
    # task slots only add scheduler/GC contention.
    v_peak = max((v_low, v_high), key=lambda v: v["sequences_per_sec"])
    # Headline ratio = MEDIAN pairwise speedup over the CONVERGED
    # window: pass i at the low level runs immediately before/after
    # pass i at the high level, so the pair shares the host-weather
    # window and their ratio cancels it; warm-up pairs and mid-series
    # weather spikes (either side >15% above its series minimum) are
    # discarded per-pair by _steady_pair_indices before the median
    # (VERDICT r3 #1; symmetric, so it cannot bias the ratio). The median
    # over converged pairs is the unbiased headline (max over noisy
    # ratios is upward-biased — ADVICE r2); max/min are reported as the
    # window range. Cross-pair minima are also reported — when weather
    # shifts between a low pass and the best high pass, min-low/min-high
    # compares different windows and has measured anywhere from 0.60 to
    # 0.93 for identical binaries.
    pair_speedups = [
        round(tl / th, 3)
        for tl, th in zip(v_low["all_runs_sec"], v_high["all_runs_sec"])
    ]
    converged_pairs = [
        round(tl / th, 3)
        for tl, th in zip(v_low["converged_runs_sec"], v_high["converged_runs_sec"])
    ]
    speedup = statistics.median(converged_pairs)
    speedup_minima = v_high["sequences_per_sec"] / v_low["sequences_per_sec"]
    efficiency = speedup / (high_cpus / low_cpus)
    # efficiency relative to the CPU the host actually grants at each
    # level — the cluster-equivalent number (on a real cluster, 4N
    # executors bring real CPUs; this VM's do not)
    normalized = speedup / host["host_speedup"] if host["host_speedup"] else None

    # Full evidence (run series, convergence, host probe, protocol)
    # goes to a SIDE FILE: the driver records only the last ~2000
    # chars of stdout, and round 4's everything-in-one-line JSON
    # outgrew that buffer — BENCH_r04.json landed with parsed=null and
    # the gate numbers legible only in a truncated tail (VERDICT r4
    # "What's wrong" #1 / "Next round" #1).
    detail = {
        "metric": "headline operator suite wall time + N-vs-4N scaling evidence",
        "value": total,
        "unit": "sec",
        "queries": query_secs,
        "suite_protocol": {
            "warm_full_pass": True,
            "warmup_pass_sec": headline.get("warmup_pass_sec"),
            "timed_passes": 2,
            "pinned_cpus": CPUS,
        },
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "validation": {
            "rows": v_high["rows"],
            "generate": gen,
            "peak_sequences_per_sec": v_peak["sequences_per_sec"],
            f"local[{low_cpus}]": v_low,
            f"local[{high_cpus}]": v_high,
            "speedup": round(speedup, 3),
            "converged_median_speedup": round(speedup, 3),
            "pair_speedups": pair_speedups,
            "converged_pair_speedups": converged_pairs,
            "convergence": convergence,
            "pair_speedup_range": [min(converged_pairs), max(converged_pairs)],
            "speedup_cross_pair_minima": round(speedup_minima, 3),
            "parallelism_ratio": high_cpus // low_cpus,
            "scaling_efficiency_raw": round(efficiency, 3),
            "host_cpu_probe": host,
            "scaling_efficiency_vs_host_ceiling": round(normalized, 3),
        },
    }
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail_last.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=2)
    print(f"[bench] detail written to {detail_path}", file=sys.stderr, flush=True)
    print(_compact_line(detail, low_cpus, high_cpus))


def _compact_line(detail: dict, low_cpus: int, high_cpus: int) -> str:
    """COMPACT final stdout line — the machine-readable artifact: suite
    total, per-query dict, and the five scaling scalars. Everything is
    a scalar or a flat float dict (~1.0 kB measured); a defensive cap
    truncates the query dict if it ever grows past the driver's
    2000-char tail buffer (the r4 failure mode)."""
    v = detail["validation"]
    result = {
        "metric": "headline suite sec (full evidence: bench_detail_last.json)",
        "value": detail["value"],
        "unit": "sec",
        "sf": detail["sf"],
        "queries": detail["queries"],
        "scaling_efficiency_raw": v["scaling_efficiency_raw"],
        "speedup_cross_pair_minima": v["speedup_cross_pair_minima"],
        "scaling_efficiency_vs_host_ceiling": v["scaling_efficiency_vs_host_ceiling"],
        "peak_sequences_per_sec": v["peak_sequences_per_sec"],
        "pairs_converged": v["convergence"]["pairs_converged"],
        "seq_per_sec": {
            f"local[{low_cpus}]": v[f"local[{low_cpus}]"]["sequences_per_sec"],
            f"local[{high_cpus}]": v[f"local[{high_cpus}]"]["sequences_per_sec"],
        },
        "rows": v["rows"],
    }
    line = json.dumps(result)
    if len(line) > 1800:
        result["queries"] = dict(sorted(detail["queries"].items())[:15])
        result["queries_truncated_see_detail"] = True
        line = json.dumps(result)
    return line


if __name__ == "__main__":
    main()
