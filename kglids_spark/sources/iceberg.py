"""Real-Iceberg backend for the TableStore ledger contract.

``sources/tables.py`` emulates the parts of Iceberg the validation
engine needs (atomic snapshot appends, time-travel reads, bucket
partitioning metadata) over plain parquet + a manifest. north_rule
names the real storage layer, so this module provides the same
contract over an actual Iceberg catalog (SparkCatalog + warehouse dir,
hadoop catalog type — fully local, no services):

- ``iceberg_available(spark)``   — classpath probe
- ``IcebergTableStore``          — exists / snapshot_id / append /
  overwrite / read(snapshot_id) with NATIVE snapshots and time travel;
  bucket layouts use Iceberg's real ``bucket(N, col)`` transform via
  DataFrameWriterV2 instead of the hive-dir emulation.
- ``run_contract_check()``       — the store-contract suite, runnable
  as ``python -m kglids_spark.sources.iceberg`` inside a session whose
  classpath carries an iceberg-spark-runtime jar. The pytest wrapper
  (tests/test_iceberg_backend.py) launches it in a subprocess with
  ``SPARK_GRAFT_ICEBERG_JAR`` and skips when no jar resolves.

Sandbox status (recorded 2026-08-18, round 4): no
iceberg-spark-runtime jar exists anywhere on this image and the
network is unreachable (maven resolution impossible), so the contract
check cannot execute here — it is wired to run automatically the
moment a jar is present.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on this JVM's classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def iceberg_session(
    warehouse: str,
    jar: Optional[str] = None,
    catalog: str = "kgl",
    cpus: int = 4,
) -> SparkSession:
    """A local session with a hadoop-type Iceberg catalog rooted at
    ``warehouse``. ``jar`` is a local iceberg-spark-runtime jar path
    (offline); omit it if the jar is already on the classpath."""
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("kglids_iceberg")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config(
            f"spark.sql.catalog.{catalog}", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config(f"spark.sql.catalog.{catalog}.type", "hadoop")
        .config(f"spark.sql.catalog.{catalog}.warehouse", warehouse)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
    )
    if jar:
        b = b.config("spark.jars", jar)
    return b.getOrCreate()


class IcebergTableStore:
    """TableStore's ledger contract over a real Iceberg catalog.

    Drop-in for the duck-typed ledger surface validate() consumes
    (``exists`` / ``read`` / ``append`` / ``snapshot_id``): appends are
    Iceberg commits, snapshot ids are Iceberg's own, and
    ``read(snapshot_id=...)`` is a native time-travel read, so the
    resume / baseline-drift machinery runs unchanged on a real catalog.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "ledger"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "IcebergTableStore requires an iceberg-spark-runtime jar on "
                "the session classpath (see sources/iceberg.py docstring)"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _fq(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(table))

    def snapshot_id(self, table: str) -> str | None:
        if not self.exists(table):
            return None
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._fq(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(rows[0][0]) if rows else None

    def _writer(
        self,
        df: DataFrame,
        table: str,
        bucket_by: tuple[int, str] | None,
        partition_by: list[str] | None = None,
    ):
        """All partition transforms go through ONE partitionedBy call:
        DataFrameWriterV2.partitionedBy REPLACES the writer's
        partitioning on each call, so a second call for identity
        columns would silently drop a previously-set bucket transform."""
        w = df.writeTo(self._fq(table))
        transforms = []
        if bucket_by is not None:
            n, col = bucket_by
            transforms.append(F.bucket(n, F.col(col)))
        transforms.extend(F.col(c) for c in (partition_by or []))
        if transforms:
            w = w.partitionedBy(*transforms)
        return w

    def append(
        self,
        table: str,
        df: DataFrame,
        op: str = "append",
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, str] | None = None,
    ) -> str:
        """One Iceberg commit; returns its snapshot id. ``bucket_by``
        (n, col) uses the real bucket transform — the layout north_rule
        names — instead of the emulation's materialized bucket_id dir
        column; plain ``partition_by`` columns map to identity
        transforms."""
        if not self.exists(table):
            self._writer(df, table, bucket_by, partition_by).create()
        else:
            df.writeTo(self._fq(table)).append()
        return self.snapshot_id(table)

    def overwrite(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> str:
        w = df.writeTo(self._fq(table))
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return self.snapshot_id(table)

    def read(self, table: str, snapshot_id: str | None = None) -> DataFrame:
        if snapshot_id is not None:
            return (
                self.spark.read.option("snapshot-id", int(snapshot_id))
                .format("iceberg")
                .load(self._fq(table))
            )
        return self.spark.table(self._fq(table))


def run_contract_check(warehouse: str) -> dict:
    """The store-contract suite from tests/test_validate.py's resume
    family, against a REAL catalog: append → exists/snapshot ids,
    snapshot isolation (time travel sees only the first batch),
    overwrite truncation, bucket-transform partitioning, and the
    validate() ledger round trip (second run skips all buckets)."""
    spark = SparkSession.getActiveSession()
    assert spark is not None, "call inside an iceberg_session"
    out: dict = {}
    store = IcebergTableStore(spark, "kgl")

    df1 = spark.range(100).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.col("id").alias("v")
    )
    df2 = spark.range(100, 150).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.col("id").alias("v")
    )
    s1 = store.append("probe", df1)
    s2 = store.append("probe", df2)
    out["two_snapshots"] = s1 is not None and s2 is not None and s1 != s2
    out["exists"] = store.exists("probe") and not store.exists("absent")
    out["latest_reads_all"] = store.read("probe").count() == 150
    out["time_travel_first"] = store.read("probe", snapshot_id=s1).count() == 100
    store.overwrite("probe2", df1)
    store.overwrite("probe2", df2)
    out["overwrite_truncates"] = store.read("probe2").count() == 50

    store.append("bucketed", df1, bucket_by=(8, "doc_id"))
    parts = spark.sql("SELECT partition FROM kgl.ledger.bucketed.files").collect()
    out["bucket_transform"] = len(parts) > 0

    # validate() resume round trip on the real ledger
    from kglids_spark.operators import constraints as C
    from kglids_spark.operators.validate import validate
    from kglids_spark.sources.tokens import SOURCES, generate_tokens

    tok = generate_tokens(spark, 5000, partitions=4)
    suite = C.default_suite(SOURCES)
    r1 = validate(tok, suite, n_buckets=8, ledger=store, extract_violation_rows=False)
    r2 = validate(tok, suite, n_buckets=8, ledger=store, extract_violation_rows=False)
    out["resume_skips_all"] = (
        r1.metrics["buckets_completed_prior"] == 0
        and r2.metrics["buckets_completed_prior"] == 8
        and r1.metrics["rows_validated"] == r2.metrics["rows_validated"]
    )
    out["ok"] = all(bool(v) for v in out.values())
    return out


if __name__ == "__main__":
    import sys
    import tempfile

    jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR") or (
        sys.argv[1] if len(sys.argv) > 1 else None
    )
    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    spark = iceberg_session(wh, jar=jar)
    if not iceberg_available(spark):
        print(json.dumps({"ok": False, "error": "iceberg runtime not on classpath"}))
        sys.exit(2)
    print(json.dumps(run_contract_check(wh)))
