"""Incremental validation with Structured Streaming.

The reference is batch-only (SURVEY.md §2.8); its closest incremental
behaviors are skip-existing-profiles (profile_data.py:66-84) and the
on-demand Flask profiler (kglids_server.py:70-99). This module gives
the engine a streaming ingestion path anyway, because a 10^12-row
training table is appended continuously in practice:

- validate_stream: file-source stream over a tokens directory →
  foreachBatch(validate) → each micro-batch appends verdicts to the
  same resumable ledger as batch runs (exactly-once per bucket via the
  idempotent sketch merge; the stream checkpoint gives at-least-once
  batch delivery, and the ledger dedupe makes the merge idempotent).
- windowed_event_counts: watermarked tumbling-window aggregation, the
  canonical late-data pattern, used by tests as a streaming smoke.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kglids_spark.operators import constraints as C
from kglids_spark.operators.validate import validate
from kglids_spark.sources.tables import TableStore
from kglids_spark.sources.tokens import TOKENS_SCHEMA


def validate_stream(
    spark: SparkSession,
    input_dir: str,
    ledger_root: str,
    constraints: list[C.Constraint],
    checkpoint_dir: str,
    n_buckets: int = 64,
    trigger_once: bool = True,
):
    """Stream new parquet files from ``input_dir`` through the batch
    validator. Returns the StreamingQuery (caller stops it)."""
    stream = spark.readStream.schema(TOKENS_SCHEMA).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ledger = TableStore(batch_df.sparkSession, ledger_root)
        validate(
            batch_df,
            constraints,
            n_buckets=n_buckets,
            ledger=ledger,
            run_id=f"stream-epoch-{epoch_id}",
            extract_violation_rows=False,
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the standard
    late-data-tolerant streaming aggregate."""
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
