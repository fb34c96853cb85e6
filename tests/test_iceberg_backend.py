"""Real-Iceberg TableStore contract (VERDICT r3 #4, round-2 #6).

Runs the full store-contract suite (snapshot ids, time travel,
overwrite truncation, bucket(N, col) transform, validate() resume
round trip) against an ACTUAL Iceberg catalog whenever an
iceberg-spark-runtime jar resolves — via SPARK_GRAFT_ICEBERG_JAR or a
jar already on the classpath. In this sandbox no jar exists on disk
and the network is unreachable (probe below), so the test records a
skip with that reason rather than silently passing.

The run happens in a SUBPROCESS session because the catalog configs
and jar must be present at JVM launch and the shared test session is
already up.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    candidates = []
    for root in (
        os.path.expanduser("~/.ivy2"),
        os.path.expanduser("~/.m2"),
        "/opt/spark/jars",
        "/opt/spark-4.1.2-bin-hadoop3/jars",
    ):
        candidates += glob.glob(
            os.path.join(root, "**", "iceberg-spark-runtime*.jar"), recursive=True
        )
    return candidates[0] if candidates else None


def test_iceberg_store_contract():
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar on this image and no network to "
            "resolve one (recorded sandbox state, sources/iceberg.py); set "
            "SPARK_GRAFT_ICEBERG_JAR to run the real-catalog contract"
        )
    env = dict(os.environ, SPARK_GRAFT_ICEBERG_JAR=jar, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "kglids_spark.sources.iceberg"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"], result
