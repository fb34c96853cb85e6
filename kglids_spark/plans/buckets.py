"""Logical partitioning for verdict identity.

Verdicts must be identical whether the job runs on N or 4N executors
(BASELINE.json north_rule), so pass/fail is keyed on a *logical*
bucket — a deterministic hash of doc_id — never on
``spark_partition_id()``, which changes with physical parallelism
(SURVEY.md §7.2 hard-part 3). On a production Iceberg table the data
would be written ``PARTITIONED BY (bucket(N, doc_id))`` so the
resume-time anti-join on completed buckets prunes file scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "bucket_id"
DEFAULT_BUCKETS = 64
_NULL_SENTINEL = "\x00<null-doc-id>"


def bucket_expr(key: str = "doc_id", n_buckets: int = DEFAULT_BUCKETS) -> F.Column:
    return F.pmod(
        F.xxhash64(F.coalesce(F.col(key), F.lit(_NULL_SENTINEL))), F.lit(n_buckets)
    ).cast("int")


def with_bucket(
    df: DataFrame, key: str = "doc_id", n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Attach the logical bucket. If the frame already carries
    ``bucket_id`` — e.g. it was read from a table physically
    ``PARTITIONED BY (bucket_id)`` (see TableStore ``partition_by``) —
    the stored column is trusted and reused: filters on it then hit the
    partition layout, so resume-time completed-bucket exclusion prunes
    whole files instead of scanning and discarding rows."""
    if BUCKET_COL in df.columns:
        return df
    return df.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
