"""Snapshot-to-snapshot column-profile drift.

``profile_table`` (profiler.py) reduces a table version to one
PROFILE_SCHEMA row per column; this module diffs two such profile
frames — a current run vs a baseline snapshot (e.g. a prior ledger
append, the same time-travel source the drift histograms use) — and
flags per-column stat movement. It extends the engine's
baseline-snapshot story from the one drift histogram column to EVERY
profiled column: null-rate creep, distinct-rate collapse, mean/range
shift, median/IQR drift, plus schema evolution (added / removed /
type-changed columns), each an explicit verdict row.

The reference profiles tables but never compares profile generations
(its KG is rebuilt, not diffed — the incremental path at
kg_governor/data_profiling/profile_data.py only SKIPS already-profiled
columns); run-over-run comparison is what the north_star's persisted
lineage enables. The stats diffed here are exactly the reference's
ColumnProfile record fields
(kg_governor/data_profiling/model/column_profile.py:8-33:
total/distinct/missing counts, true_ratio, min/max, mean, median,
iqr, fine-grained data_type). Deequ's AnomalyDetection is the
published analog; anomaly.py covers the run-level lineage metrics,
this covers the per-column profile surface.

Scale shape: profile frames hold ONE row per column by construction,
so even a 100k-column lakehouse catalog diffs as a tiny full-outer
shuffle on (table_id, column_name) followed by a zero-shuffle inline
of the per-stat structs. Nothing here scans data — both inputs are
already reduced.

Output (long format — one row per (column, stat) plus one presence
row per column):
  table_id, column_name, stat, base, cur, delta, flagged, note
- numeric stats (mean/min_value/max_value/median/iqr): delta is
  RELATIVE to |base| (eps-guarded); flagged when |delta| > rel_tol
- rate stats (null_rate/true_ratio/distinct_rate): delta is ABSOLUTE
  (rates are already normalized); flagged when |delta| > the rate tol
- the 'column' presence row: flagged for added/removed/type_changed,
  note says which (dtypes included); base/cur/delta are NULL
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (stat, kind): kind 'rel' = relative tolerance vs |base|,
# 'rate' = absolute tolerance (the stat is already a ratio)
STATS: list[tuple[str, str]] = [
    ("null_rate", "rate"),
    ("distinct_rate", "rate"),
    ("true_ratio", "rate"),
    ("mean", "rel"),
    ("min_value", "rel"),
    ("max_value", "rel"),
    ("median", "rel"),
    ("iqr", "rel"),
]

_EPS = 1e-12


def _derived(side: DataFrame, tag: str) -> DataFrame:
    total = F.col("total_values_count").cast("double")
    cols = {
        "null_rate": F.col("missing_values_count") / F.greatest(total, F.lit(1.0)),
        "distinct_rate": F.col("distinct_values_count") / F.greatest(total, F.lit(1.0)),
        "true_ratio": F.col("true_ratio").cast("double"),
        "mean": F.col("mean").cast("double"),
        "min_value": F.col("min_value").cast("double"),
        "max_value": F.col("max_value").cast("double"),
        "median": F.col("median").cast("double"),
        "iqr": F.col("iqr").cast("double"),
    }
    return side.select(
        "table_id",
        "column_name",
        F.col("data_type").alias(f"{tag}_dtype"),
        *[v.alias(f"{tag}_{k}") for k, v in cols.items()],
    )


def profile_diff(
    cur: DataFrame,
    base: DataFrame,
    *,
    rel_tol: float = 0.10,
    rate_tol: float = 0.01,
    distinct_rate_tol: float = 0.10,
) -> DataFrame:
    """Diff two PROFILE_SCHEMA frames (current vs baseline). See the
    module docstring for the output contract. Tolerances: ``rel_tol``
    for magnitude stats, ``rate_tol`` for null_rate/true_ratio,
    ``distinct_rate_tol`` for distinct_rate (cardinality ratios move
    more than null rates under legitimate growth)."""
    c = _derived(cur, "c")
    b = _derived(base, "b")
    j = b.join(c, ["table_id", "column_name"], "full_outer")

    in_base = F.col("b_dtype").isNotNull()
    in_cur = F.col("c_dtype").isNotNull()
    presence = j.select(
        "table_id",
        "column_name",
        F.lit("column").alias("stat"),
        F.lit(None).cast("double").alias("base"),
        F.lit(None).cast("double").alias("cur"),
        F.lit(None).cast("double").alias("delta"),
        (
            ~in_base
            | ~in_cur
            | (F.col("b_dtype") != F.col("c_dtype"))
        ).alias("flagged"),
        F.when(~in_base, F.lit("added"))
        .when(~in_cur, F.lit("removed"))
        .when(
            F.col("b_dtype") != F.col("c_dtype"),
            F.concat(F.lit("type_changed:"), "b_dtype", F.lit("->"), "c_dtype"),
        )
        .otherwise(F.lit("ok"))
        .alias("note"),
    )

    def stat_struct(name: str, kind: str):
        bv, cv = F.col(f"b_{name}"), F.col(f"c_{name}")
        if kind == "rate":
            delta = cv - bv
            tol = distinct_rate_tol if name == "distinct_rate" else rate_tol
        else:
            delta = (cv - bv) / F.greatest(F.abs(bv), F.lit(_EPS))
            tol = rel_tol
        # a stat present on one side only (e.g. numeric column became
        # string) is a flagged move with NULL delta — never a silent ok
        one_sided = bv.isNull() != cv.isNull()
        return F.struct(
            F.lit(name).alias("stat"),
            bv.alias("base"),
            cv.alias("cur"),
            F.when(bv.isNotNull() & cv.isNotNull(), delta).alias("delta"),
            F.when(one_sided, F.lit(True))
            .otherwise(F.abs(delta) > F.lit(tol))
            .alias("flagged"),
            F.lit(kind).alias("note"),
        )

    stats = (
        j.filter(in_base & in_cur)
        .select(
            "table_id",
            "column_name",
            F.inline(F.array(*[stat_struct(n, k) for n, k in STATS])),
        )
        # a stat absent on BOTH sides (non-numeric column's mean, a
        # non-boolean's true_ratio) is not a comparison at all
        .filter(F.col("base").isNotNull() | F.col("cur").isNotNull())
        .withColumn("flagged", F.coalesce("flagged", F.lit(False)))
    )
    return presence.unionByName(stats)
