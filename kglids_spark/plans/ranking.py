"""Two-phase global ranking and running sums over an arbitrary order.

Several operators need "every row's 0-based position (or the exclusive
running sum of some column) in a deterministic global order" — the
CCNet tertile split ranks by LM score, balanced sharding ranks by
document size, token-budget selection needs the running token total in
quality order. The naive ``row_number() OVER (ORDER BY ...)`` (no
partition key) collapses the corpus into ONE task (Spark warns
WindowExec "No Partition Defined"), a non-starter at 10^12 rows.

The scale shape, shared here (the same partition-offset discipline as
plans/offsets.py and operators/packing.py's range-bucket prefix sum):

1. ``repartitionByRange`` on the order columns range-partitions the
   data so partition i holds ranks strictly before partition i+1
   (sampling-based split points), and each partition sorts locally —
   a parallel sort, never a single task;
2. per-partition count/sum totals (ONE row per partition — the only
   collect) cumsum into broadcast offsets driver-side;
3. one Arrow ``mapInPandas`` pass stamps
   ``rank = offset[pid] + local index`` and, when a value column is
   given, ``cum_before = sum_offset[pid] + local exclusive cumsum``.

The result is bit-identical to the single-task global window for any
partition count (tests/test_sampling.py ranked_prefix property tests),
so oracle queries stay plain SQL windows. No reference analog — the
reference
(CoDS-GCS/kglids) ranks nothing globally; this generalizes the ranking
pass first built for text.ccnet_buckets (round 5)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_prefix(
    df: DataFrame,
    order: list[Column],
    *,
    value_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` with ``_rank`` (0-based global position in
    ``order``) and, when ``value_col`` is given, ``_cum_before``
    (exclusive global running sum of that column, cast to long, in the
    same order) stamped on every row.

    ``order`` must be a TOTAL order (break ties — usually with the id
    column) or ranks within a tie are partition-dependent. The input
    is persisted for the two passes and released via an eager
    localCheckpoint of the (narrow) result.
    """
    out, _ = ranked_prefix_with_total(
        df, order, value_col=value_col, num_partitions=num_partitions
    )
    return out


def ranked_prefix_with_total(
    df: DataFrame,
    order: list[Column],
    *,
    value_col: str | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """``ranked_prefix`` plus the total row count as a second return
    value — the count falls out of the offset collect for free, and
    rank-derived expressions (ntile groups, shard rounds) need it
    before the plan is built. Returns ``(stamped_df, n_total)``."""
    from pyspark import StorageLevel

    p = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ordered = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("long")).alias("s"))
    totals = {
        r["_pid"]: (r["n"], int(r["s"] or 0) if value_col is not None else 0)
        for r in ordered.groupBy("_pid").agg(*aggs).collect()
    }
    rank_off, sum_off, racc, sacc = {}, {}, 0, 0
    for pid in sorted(totals):
        rank_off[pid], sum_off[pid] = racc, sacc
        racc += totals[pid][0]
        sacc += totals[pid][1]

    from pyspark.sql.types import LongType, StructField, StructType

    out_fields = list(df.schema.fields) + [StructField("_rank", LongType())]
    if value_col is not None:
        out_fields.append(StructField("_cum_before", LongType()))
    out_schema = StructType(out_fields)

    def stamp(batches):
        # _pid is constant per partition; `seen*` carry the running
        # totals across the multiple Arrow batches of one partition
        seen_rows, seen_sum = 0, 0
        for pdf in batches:
            if len(pdf) == 0:
                pdf = pdf.drop(columns=["_pid"])
                pdf["_rank"] = []
                if value_col is not None:
                    pdf["_cum_before"] = []
                yield pdf
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = rank_off[pid] + seen_rows
            seen_rows += len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf["_rank"] = range(start, start + len(pdf))
            if value_col is not None:
                vals = pdf[value_col].fillna(0).astype("int64")
                cum = vals.cumsum() - vals  # exclusive within the batch
                pdf["_cum_before"] = sum_off[pid] + seen_sum + cum
                seen_sum += int(vals.sum())
            yield pdf

    out = ordered.mapInPandas(stamp, schema=out_schema).localCheckpoint(eager=True)
    ordered.unpersist()
    return out, racc
