#!/usr/bin/env python
"""Same-window A/B of session configs (VERDICT r2 "What's wrong #3").

Round 2's headline suite ran ~1.5-1.9x slower than round 1 while the
only bench-relevant config delta was the GC profile + the global
``columnarReaderBatchSize=1024`` (tuned for the ~7 MB token-array
vectors, applied to every scan). On a host whose throughput wobbles
2-6x on a minutes timescale, sequential before/after timing cannot
attribute that: this script interleaves FULL suite passes between two
parked, pinned JVMs that differ ONLY in the config under test, so both
configs sample the same weather window (the same protocol as bench.py's
scaling measurement).

Per pass each worker runs (a) the 22-query headline suite at sf0.1
(narrow-row scans — where the suspected 1024-batch tax would land) and
(b) a wide-array tokens scan (sum(size(tokens)) over the 2M-row bench
table — what 1024 was tuned FOR), reported separately.

Usage:
  python bench_ab.py                 # batch 4096 vs 1024, current GC
  python bench_ab.py --gc            # default GC vs ParallelGC profile
Prints ONE JSON line with per-config medians and the per-pass ratios.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

CPUS = int(os.environ.get("SPARK_GRAFT_AB_CPUS", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TOKENS_PATH = os.environ.get("SPARK_GRAFT_AB_TOKENS", "/tmp/kglids_ab_tokens2m")
TOKENS_ROWS = int(os.environ.get("SPARK_GRAFT_AB_ROWS", "2000000"))
PASSES = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "4"))


def _suite_names() -> list[str]:
    from bench import HEADLINE

    return HEADLINE


def _worker_loop(batch_size: int, gc_mode: str) -> None:
    from pyspark.sql import functions as F

    from kglids_spark.session import get_spark

    extra = {"spark.sql.parquet.columnarReaderBatchSize": str(batch_size)}
    if gc_mode == "default":
        # JVM-default G1, no -Xms/-Xmn: the r1-era GC profile
        extra["spark.driver.extraJavaOptions"] = ""
        extra["spark.executor.extraJavaOptions"] = ""
    spark = get_spark(
        app_name=f"ab_{batch_size}_{gc_mode}", cpus=CPUS, extra_conf=extra
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = _suite_names()
    tokens = spark.read.parquet(TOKENS_PATH)

    def one_pass() -> dict:
        t0 = time.time()
        per_q = {}
        for n in names:
            tq = time.time()
            qs[n](spark, SF_DIR).collect()
            per_q[n] = round(time.time() - tq, 3)
        suite = round(time.time() - t0, 3)
        t0 = time.time()
        tokens.select(F.sum(F.size("tokens"))).collect()
        wide = round(time.time() - t0, 3)
        return {"suite": suite, "wide_scan": wide, "queries": per_q}

    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd == "warmup":
            one_pass()
            print(json.dumps({"ok": True}), flush=True)
        elif cmd == "run":
            print(json.dumps(one_pass()), flush=True)
    spark.stop()


class _Worker:
    def __init__(self, label: str, batch_size: int, gc_mode: str):
        self.label = label
        self._errf = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f"_ab_{label}.err", delete=False
        )
        cmd = [
            "taskset", "-c", f"0-{CPUS - 1}",
            sys.executable, os.path.abspath(__file__),
            "--worker", "--batch", str(batch_size), "--gc-mode", gc_mode,
        ]
        self.proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self._errf, text=True,
        )

    def cmd(self, c: str) -> dict:
        self.proc.stdin.write(c + "\n")
        self.proc.stdin.flush()
        line = self.proc.stdout.readline()
        if not line:
            self._errf.flush()
            tail = open(self._errf.name).read()[-2000:]
            raise RuntimeError(f"worker {self.label} died; stderr tail:\n{tail}")
        return json.loads(line)

    def quit(self):
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()


def _ensure_tokens() -> None:
    import pyarrow.dataset as ds

    try:
        if os.path.exists(os.path.join(TOKENS_PATH, "_SUCCESS")):
            have = sum(
                f.metadata.num_rows
                for f in ds.dataset(TOKENS_PATH, format="parquet").get_fragments()
            )
            if have == TOKENS_ROWS:
                return
    except Exception:
        pass
    from kglids_spark.session import get_spark
    from kglids_spark.sources.tokens import generate_tokens

    spark = get_spark(app_name="ab_generate", cpus=CPUS)
    generate_tokens(spark, TOKENS_ROWS, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet(TOKENS_PATH)
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
        gc_mode = sys.argv[sys.argv.index("--gc-mode") + 1]
        _worker_loop(batch, gc_mode)
        return

    if "--gc" in sys.argv:
        # isolate the GC profile: batch fixed at 1024
        a = ("gc_default", 1024, "default")
        b = ("gc_parallel", 1024, "tuned")
        factor = "gc_profile"
    else:
        # isolate the reader batch: GC fixed at the tuned profile
        a = ("batch4096", 4096, "tuned")
        b = ("batch1024", 1024, "tuned")
        factor = "columnarReaderBatchSize"

    _ensure_tokens()
    wa, wb = _Worker(*a), _Worker(*b)
    runs_a, runs_b = [], []
    try:
        wa.cmd("warmup")
        wb.cmd("warmup")
        for i in range(PASSES):
            # alternate within-pair order so a monotone weather drift
            # flips sign pair-to-pair and the median cancels it (same
            # fix as bench.py's scaling pairs, BENCH.md round 3)
            if i % 2 == 0:
                runs_a.append(wa.cmd("run"))
                runs_b.append(wb.cmd("run"))
            else:
                runs_b.append(wb.cmd("run"))
                runs_a.append(wa.cmd("run"))
            print(
                f"[ab] pass {i+1}/{PASSES}: {a[0]} suite={runs_a[-1]['suite']}s "
                f"wide={runs_a[-1]['wide_scan']}s | {b[0]} suite={runs_b[-1]['suite']}s "
                f"wide={runs_b[-1]['wide_scan']}s",
                file=sys.stderr, flush=True,
            )
    finally:
        wa.quit()
        wb.quit()

    def summarize(runs: list[dict]) -> dict:
        return {
            "suite_all": [r["suite"] for r in runs],
            "suite_median": round(statistics.median(r["suite"] for r in runs), 3),
            "suite_best": min(r["suite"] for r in runs),
            "wide_all": [r["wide_scan"] for r in runs],
            "wide_median": round(statistics.median(r["wide_scan"] for r in runs), 3),
            "queries_best": {
                n: min(r["queries"][n] for r in runs) for n in runs[0]["queries"]
            },
        }

    sa, sb = summarize(runs_a), summarize(runs_b)
    pair_suite = [round(x["suite"] / y["suite"], 3) for x, y in zip(runs_a, runs_b)]
    pair_wide = [
        round(x["wide_scan"] / y["wide_scan"], 3) for x, y in zip(runs_a, runs_b)
    ]
    print(
        json.dumps(
            {
                "factor": factor,
                "cpus": CPUS,
                "passes": PASSES,
                a[0]: sa,
                b[0]: sb,
                # ratio > 1 means config A is slower than config B in
                # that shared-weather pass
                "pairwise_a_over_b_suite": pair_suite,
                "pairwise_a_over_b_wide": pair_wide,
                "suite_median_ratio_a_over_b": round(
                    statistics.median(pair_suite), 3
                ),
                "wide_median_ratio_a_over_b": round(statistics.median(pair_wide), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
