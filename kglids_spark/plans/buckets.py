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
# StructField metadata key carrying the bucket count the column was
# computed with; written by with_bucket, round-tripped through
# TableStore manifests (hive partition columns lose field metadata)
META_N_BUCKETS = "kglids.n_buckets"


def bucket_expr(key: str = "doc_id", n_buckets: int = DEFAULT_BUCKETS) -> F.Column:
    return F.pmod(
        F.xxhash64(F.coalesce(F.col(key), F.lit(_NULL_SENTINEL))), F.lit(n_buckets)
    ).cast("int")


def stored_n_buckets(df: DataFrame) -> int | None:
    """The bucket count recorded in ``bucket_id``'s field metadata, if
    the column exists and carries one."""
    if BUCKET_COL not in df.columns:
        return None
    meta = df.schema[BUCKET_COL].metadata or {}
    n = meta.get(META_N_BUCKETS)
    return int(n) if n is not None else None


def with_bucket(
    df: DataFrame, key: str = "doc_id", n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Attach the logical bucket. If the frame already carries
    ``bucket_id`` — e.g. it was read from a table physically
    ``PARTITIONED BY (bucket_id)`` (see TableStore ``partition_by``) —
    the stored column is reused so filters on it hit the partition
    layout and resume-time completed-bucket exclusion prunes whole
    files instead of scanning and discarding rows.

    A stored column is VALIDATED before being trusted (a table bucketed
    with a different N, or an unrelated ``bucket_id`` column, would
    otherwise silently produce verdict/ledger rows labeled with the
    wrong ``n_buckets``, breaking the verdict-identity invariant and
    resume matching):

    - if the column's field metadata records the bucket count (written
      by this function, round-tripped by TableStore through its
      manifest), it must equal the requested ``n_buckets`` — mismatch
      raises;
    - without metadata (foreign column), a one-action guard asserts
      ``0 <= bucket_id < n_buckets``. The agg projects only the bucket
      column, which on a hive/Iceberg bucket-partitioned table is
      partition-derived — the scan reads directory keys + footers, no
      data pages — so the guard is cheap even at 10^12 rows. It cannot
      catch a coarser bucketing (max < requested N), which only
      metadata can; the guard is the documented minimum check.
    """
    if BUCKET_COL in df.columns:
        stored = stored_n_buckets(df)
        if stored is not None:
            if stored != n_buckets:
                raise ValueError(
                    f"frame carries {BUCKET_COL} computed with n_buckets={stored}, "
                    f"but n_buckets={n_buckets} was requested; re-bucket (drop the "
                    f"column) or request the stored bucketing"
                )
            return df
        lo, hi = df.agg(F.min(BUCKET_COL), F.max(BUCKET_COL)).collect()[0]
        if lo is not None and (lo < 0 or hi >= n_buckets):
            raise ValueError(
                f"pre-existing {BUCKET_COL} range [{lo}, {hi}] is incompatible "
                f"with n_buckets={n_buckets}; re-bucket or fix the request"
            )
        # do NOT stamp the requested count as metadata here: the range
        # guard cannot rule out a coarser foreign bucketing (e.g. a
        # 16-bucket column passing an n_buckets=64 request), and a
        # stamp would convert that open uncertainty into persisted
        # false certainty that every later read then "validates"
        # against. Only a bucketing this function computed is stamped.
        return df
    return df.withColumn(BUCKET_COL, bucket_expr(key, n_buckets)).withMetadata(
        BUCKET_COL, {META_N_BUCKETS: n_buckets}
    )
