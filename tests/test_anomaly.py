"""Run-over-run metric anomaly detection on the lineage runs table:
window stats, z/inf flagging, hash pinning, include/exclude rules, and
the CLI exit-code surface."""

import json
import math
import time

import pytest

from kglids_spark.operators.anomaly import Anomaly, detect_anomalies
from kglids_spark.sources.tables import TableStore

RUNS_SCHEMA = "run_id string, constraint_hash string, n_buckets int, ts double, metrics string"


def _append_run(store, run_id, metrics, chash="h1", ts=None):
    store.append(
        "runs",
        store.spark.createDataFrame(
            [(run_id, chash, 16, ts if ts is not None else time.time(), json.dumps(metrics))],
            RUNS_SCHEMA,
        ),
    )


def _mk(rows_validated, extra=None, **kw):
    m = {
        "run_id": "x",
        "constraint_hash": "h1",
        "rows_validated": rows_validated,
        "distinct_key_estimate": rows_validated,
        "n_tok_median_kll": 400.0,
        "elapsed_sec": 5.0,  # excluded by default
        "sequences_per_sec": 1e5,  # excluded by default
    }
    m.update(extra or {})
    return m


def test_flags_shifted_metric_and_orders_by_z(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "led"))
    for i in range(5):
        _append_run(store, f"r{i}", _mk(20000 + (i % 2)), ts=1000.0 + i)
    # latest run: rows collapse AND the median shifts (rows shift harder)
    _append_run(
        store, "latest", _mk(5000, {"n_tok_median_kll": 402.0}), ts=2000.0
    )
    ctx, flags = detect_anomalies(store, window=5, k=3.0)
    assert ctx["run_id"] == "latest" and ctx["n_prior_runs"] == 5
    names = [a.metric for a in flags]
    assert "rows_validated" in names and "distinct_key_estimate" in names
    # constant-window metric that moved -> inf z, sorted first
    med = next(a for a in flags if a.metric == "n_tok_median_kll")
    assert math.isinf(med.z) and med.window_std == 0.0
    assert abs(flags[0].z) >= abs(flags[-1].z)
    # host timings never flag by default even though they moved
    assert "elapsed_sec" not in names and "sequences_per_sec" not in names


def test_stable_series_is_quiet_and_min_history_guards(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "led"))
    for i in range(4):
        _append_run(store, f"r{i}", _mk(20000 + i * 3), ts=1000.0 + i)
    _append_run(store, "latest", _mk(20004, {"brand_new_metric": 1.0}), ts=2000.0)
    ctx, flags = detect_anomalies(store, window=7, k=3.0)
    assert flags == []
    # brand_new_metric has zero prior observations -> skipped, not flagged
    assert ctx["n_metrics_checked"] >= 1


def test_hash_pinning_isolates_suites(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "led"))
    for i in range(4):
        _append_run(store, f"a{i}", _mk(20000), chash="hA", ts=1000.0 + i)
    # a different suite with wildly different rows must not pollute hA
    _append_run(store, "b0", _mk(99), chash="hB", ts=1500.0)
    _append_run(store, "latest", _mk(20000), chash="hA", ts=2000.0)
    ctx, flags = detect_anomalies(store, window=7)
    assert ctx["constraint_hash"] == "hA" and flags == []
    with pytest.raises(ValueError, match="no runs"):
        detect_anomalies(store, constraint_hash="missing")


def test_metric_include_overrides_default_exclude(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "led"))
    for i in range(3):
        _append_run(store, f"r{i}", _mk(20000), ts=1000.0 + i)
    _append_run(store, "latest", _mk(20000, {"elapsed_sec": 500.0}), ts=2000.0)
    _, flags = detect_anomalies(store, metrics=["elapsed_sec"])
    assert [a.metric for a in flags] == ["elapsed_sec"]


def test_cli_anomaly_exit_codes(spark, tmp_path):
    import subprocess
    import sys

    led = str(tmp_path / "cled")
    store = TableStore(spark, led)
    for i in range(4):
        _append_run(store, f"r{i}", _mk(20000), ts=1000.0 + i)
    _append_run(store, "latest", _mk(20000), ts=2000.0)

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "kglids_spark.cli", "anomaly",
             "--ledger", led, *extra],
            capture_output=True, text=True,
        )

    r = run("--fail-on-anomaly")
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["anomalies"] == {} and out["run_id"] == "latest"

    _append_run(store, "bad", _mk(2000), ts=3000.0)
    r = run("--fail-on-anomaly")
    assert r.returncode == 2
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # constant window -> strict-JSON null z (never the Infinity literal)
    assert "rows_validated" in out["anomalies"]
    assert out["anomalies"]["rows_validated"]["z"] is None
    assert "Infinity" not in r.stdout
