"""Run-over-run metric anomaly detection on the validation lineage.

Every ``validate()`` run appends one lineage row — (run_id,
constraint_hash, n_buckets, ts, metrics-JSON) — to the ledger's
``runs`` table (validate.py). This module turns that history into a
point-anomaly check in the Deequ ``AnomalyDetection`` shape: the
LATEST run's numeric metrics are compared against the trailing window
of prior runs, and a metric whose z-score against the window exceeds
``k`` (or whose window has no spread and the value moved at all) is
flagged. The reference (CoDS-GCS/kglids) has no run-history surface —
its closest notion of "a prior run" is the profiler skipping
already-profiled columns by filename
(kg_governor/data_profiling/profile_data.py:65-80, the
`replace_existing_profiles` else-branch), which never compares the
values it computed; the north_star's "lineage (snapshot id, constraint-set
hash, executor metrics) are persisted" is the enabler here — this is
what persisting them is FOR: yesterday's valid run defines today's
normal.

Scale shape: the runs table holds ONE row per validation run by
construction (it is the lineage, not data), so reading it to the
driver is O(runs) — a few KB per year of daily runs. No Spark job
beyond the bounded table read; the statistics are pure Python over
≤window points per metric. Restricting to one ``constraint_hash``
keeps the series comparable (a suite change is a new normal).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

from pyspark.sql import functions as F

from kglids_spark.sources.tables import TableStore

# lineage keys that are identities/timings, not data metrics — never
# anomaly-flagged (sequences_per_sec and elapsed vary with the host,
# not the data; opt in explicitly via `metrics=` to monitor them)
DEFAULT_EXCLUDE = frozenset(
    {
        "run_id",
        "constraint_hash",
        "n_buckets",
        "buckets_completed_prior",
        "buckets_this_run",
        "elapsed_sec",
        "sequences_per_sec",
        "stats_snapshot",
        "executors",
    }
)


@dataclass(frozen=True)
class Anomaly:
    metric: str
    value: float
    window_mean: float
    window_std: float
    z: float  # inf when the window has zero spread and the value moved


def _numeric_metrics(metrics_json: str, include: list[str] | None) -> dict[str, float]:
    try:
        m = json.loads(metrics_json)
    except (TypeError, ValueError):
        return {}
    out = {}
    for key, v in m.items():
        if include is not None:
            if key not in include:
                continue
        elif key in DEFAULT_EXCLUDE:
            continue
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            continue
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            continue
        out[key] = float(v)
    return out


def detect_anomalies(
    store: TableStore,
    *,
    window: int = 7,
    k: float = 3.0,
    metrics: list[str] | None = None,
    constraint_hash: str | None = None,
    min_history: int = 3,
) -> tuple[dict, list[Anomaly]]:
    """Compare the latest run's metrics against the trailing ``window``
    prior runs of the same constraint suite. Returns (context, flags):
    context identifies the latest run and how much history backed the
    check; flags is the list of metrics outside ``k`` standard
    deviations of their window (z = inf when the window is constant
    and the value moved — a spread-free history means ANY move is
    news). Metrics with fewer than ``min_history`` prior observations
    are skipped rather than guessed at. ``metrics`` restricts (and
    overrides DEFAULT_EXCLUDE for) the keys monitored."""
    if not store.exists("runs"):
        raise ValueError(f"no runs table in ledger {store.root}")
    runs = store.read("runs")
    if constraint_hash is None:
        head = runs.orderBy(F.desc("ts")).limit(1).collect()
        if not head:
            raise ValueError(f"runs table in ledger {store.root} is empty")
        constraint_hash = head[0].constraint_hash
    series = (
        runs.filter(F.col("constraint_hash") == constraint_hash)
        .orderBy(F.desc("ts"))
        .limit(window + 1)
        .collect()
    )
    if not series:
        raise ValueError(f"no runs recorded for constraint_hash {constraint_hash}")
    latest, prior = series[0], series[1:]
    latest_m = _numeric_metrics(latest.metrics, metrics)
    history: dict[str, list[float]] = {}
    for r in prior:
        for key, v in _numeric_metrics(r.metrics, metrics).items():
            history.setdefault(key, []).append(v)

    flags: list[Anomaly] = []
    checked = 0
    for key, value in sorted(latest_m.items()):
        h = history.get(key, [])
        if len(h) < min_history:
            continue
        checked += 1
        mean = sum(h) / len(h)
        var = sum((x - mean) ** 2 for x in h) / len(h)
        std = math.sqrt(var)
        if std == 0.0:
            if value != mean:
                flags.append(Anomaly(key, value, mean, 0.0, math.inf))
            continue
        z = (value - mean) / std
        if abs(z) > k:
            flags.append(Anomaly(key, value, mean, std, z))
    context = {
        "run_id": latest.run_id,
        "constraint_hash": constraint_hash,
        "n_prior_runs": len(prior),
        "n_metrics_checked": checked,
        "window": window,
        "k": k,
    }
    return context, sorted(flags, key=lambda a: -abs(a.z))
