"""Temporal join operators Spark lacks natively.

The reference has no as-of/range joins (SURVEY.md §2.3 note) — these
are the standard training-pipeline temporal primitives (join each
event to the most recent state/snapshot at or before its timestamp).
Spark has no ASOF JOIN; the naive formulation (θ-join on
``l.ts >= r.ts`` + window max) explodes into a broadcast-nested-loop
or a near-cross-join shuffle.

Implemented instead as the scale-correct union + window composition:

1. tag left and right rows, union them by name,
2. ONE shuffle: partition by key, order by (ts, is_left) — right rows
   sort before left rows at equal ts, giving inclusive `right.ts <=
   left.ts` semantics,
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   running frame forwards each right payload to every later left row,
4. keep the left rows.

Cost = one hash shuffle of |L|+|R| rows and a linear window pass —
exactly what a sort-merge as-of costs in engines that have it
natively. Skewed keys fall under the same salting/AQE policy as any
other key shuffle (plans/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row gains the ``right_payload``
    columns of the latest right row with ``right.ts <= left.ts`` for
    the same ``on`` key (nulls when no such row exists). Ties on
    right.ts must be pre-resolved by the caller (dedupe right per
    (on, ts)) — same contract as DuckDB/QuestDB ASOF JOIN."""
    payload_map = {c: f"{c}{suffix}" for c in right_payload}
    r = right.select(
        F.col(on),
        F.col(ts),
        *[F.col(c).alias(a) for c, a in payload_map.items()],
    ).withColumn("_is_left", F.lit(0))
    l = left.withColumn("_is_left", F.lit(1))
    both = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for a in payload_map.values():
        both = both.withColumn(a, F.last(F.col(a), ignorenulls=True).over(w))
    return both.filter(F.col("_is_left") == 1).drop("_is_left")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_bound_s: int,
    upper_bound_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Band/range join: pairs where ``right_ts`` falls in
    ``[left_ts + lower, left_ts + upper]`` for the same key.

    A plain θ-join on the band predicate degenerates to a per-key cross
    join; bucketing time into ``bucket_s``-wide cells and equi-joining
    on (key, cell) — with the left side exploded over the cells its
    band overlaps — turns it into a hash join whose shuffle carries
    each left row ceil(band/bucket)+1 times. The band predicate is
    re-applied exactly after the join."""
    if bucket_s is None:
        bucket_s = max(upper_bound_s - lower_bound_s, 1)
    l_ep = F.unix_timestamp(F.col(left_ts))
    r_ep = F.unix_timestamp(F.col(right_ts))
    first_cell = F.floor((l_ep + F.lit(lower_bound_s)) / F.lit(bucket_s))
    last_cell = F.floor((l_ep + F.lit(upper_bound_s)) / F.lit(bucket_s))
    lb = left.withColumn("_cell", F.explode(F.sequence(first_cell, last_cell)))
    rb = right.withColumn("_cell", F.floor(r_ep / F.lit(bucket_s)))
    joined = lb.join(rb, on=[on, "_cell"]).drop("_cell")
    l_ep_j = F.unix_timestamp(F.col(left_ts))
    r_ep_j = F.unix_timestamp(F.col(right_ts))
    return joined.filter(
        (r_ep_j >= l_ep_j + F.lit(lower_bound_s)) & (r_ep_j <= l_ep_j + F.lit(upper_bound_s))
    )
