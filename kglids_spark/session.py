"""SparkSession factory with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster: the same conf
(AQE, skew-join handling, Arrow batching) applies unchanged under
spark-submit on a real cluster. The reference sizes its local mode
from physical RAM (reference: kg_governor/data_global_schema_builder/
build_data_global_schema.py:36,81-82); we instead expose parallelism
explicitly so the N-vs-4N scaling evidence is reproducible.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kglids_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for columnar validation.

    - AQE on: runtime partition coalescing + skew-join splitting (the
      reference hand-rolls skew balance by shuffling pair indexes,
      build_data_global_schema.py:156-158; AQE subsumes that).
    - Arrow on, with a bounded batch size because ``tokens`` arrays
      are wide (avg ~500 ints/row): 10k rows/batch keeps Arrow
      buffers ~20 MB.
    - shuffle partitions default to 2x cores locally; on a real
      cluster this is set per-job from input size.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # G1 (the JVM default) collapses under many threads allocating
        # the ~10MB column vectors that wide array<int> parquet scans
        # produce (humongous-allocation thrash): measured 24-65s for a
        # 1M-row tokens scan at local[32] vs 0.97s with ParallelGC.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
