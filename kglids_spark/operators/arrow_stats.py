"""Arrow-vectorized per-bucket stats collector (applyInPandas path).

The north_star pins the mechanism the reference's per-column pandas
workers map onto: ``groupBy(<logical partition>).applyInPandas`` with
Arrow batch transfer (reference used rdd.mapPartitions over pandas
Series, kg_governor/data_profiling/profile_data.py:89-92). The default
engine path (validate.py) uses pure JVM aggregate expressions — faster
because nothing leaves Tungsten — so this module exists for the stats
built-ins cannot express: true mergeable KLL quantile sketches over
unbounded numeric columns (sketches.py), or any future numpy-only
statistic.

Grouping is by the logical bucket (never spark_partition_id, which
changes with parallelism), so sketch rows are resumable/mergeable with
the same ledger semantics as the JVM path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from kglids_spark.operators.sketches import KLL, merge_serialized
from kglids_spark.plans.buckets import BUCKET_COL, with_bucket

SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_null", T.LongType(), False),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
        T.StructField("kll", T.BinaryType(), True),
    ]
)


def make_partials(value_col: str, kll_k: int = 256):
    """Map-side partial collector for ``mapInPandas``: folds every Arrow
    batch of a physical partition into per-bucket KLL accumulators,
    emitting one sketch row per (partition × bucket). Module-level so
    tests can drive it with hand-built batch iterators (incl. the
    zero-row-batch edge case)."""

    def partials(batches):
        # accumulate the partition's (bucket, value) arrays, then ONE
        # stable argsort + one bulk KLL update per bucket — per-batch
        # pandas groupby was measured 38k tiny update calls per task
        # (64 buckets × ~600 Arrow batches), dominated by call overhead
        import numpy as np

        bs, vs = [], []
        for pdf in batches:
            bs.append(pdf[BUCKET_COL].to_numpy(dtype="int64"))
            vs.append(pd.to_numeric(pdf[value_col], errors="coerce").to_numpy(dtype="float64"))
        if not bs:
            return
        b = np.concatenate(bs)
        v = np.concatenate(vs)
        if b.size == 0:
            # all yielded Arrow batches were zero-row: bs is non-empty
            # but the concatenation is, and b[np.r_[0, bounds]] would
            # IndexError on the empty array
            return
        order = np.argsort(b, kind="stable")
        b, v = b[order], v[order]
        bounds = np.flatnonzero(np.diff(b)) + 1
        rows = []
        for bucket_id, bucket_vals in zip(b[np.r_[0, bounds]], np.split(v, bounds)):
            nn = np.isnan(bucket_vals)
            arr = bucket_vals[~nn]
            sk = KLL(k=kll_k)
            sk.update_batch(arr)
            rows.append(
                (
                    int(bucket_id),
                    len(bucket_vals),
                    int(nn.sum()),
                    float(arr.min()) if arr.size else None,
                    float(arr.max()) if arr.size else None,
                    float(arr.sum()) if arr.size else None,
                    sk.serialize(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "bucket_id", "n_rows", "n_null", "min_value", "max_value",
                "sum_value", "kll",
            ],
        )

    return partials


def collect_bucket_sketches(
    df: DataFrame,
    value_col: str,
    key: str = "doc_id",
    n_buckets: int = 64,
    kll_k: int = 256,
) -> DataFrame:
    """One sketch row per logical bucket: count/nulls/min/max/sum plus a
    serialized KLL of ``value_col``. Arrow-batched; no per-row Python."""
    df_b = with_bucket(df.select(key, value_col), key, n_buckets)
    return bucket_sketches_prebucketed(df_b, value_col, kll_k)


def bucket_sketches_prebucketed(
    df_b: DataFrame, value_col: str, kll_k: int = 256
) -> DataFrame:
    """Same collector over a frame that already carries BUCKET_COL —
    lets validate.py run the KLL pass over its cached slim projection
    instead of re-scanning the input.

    Two-phase (the SURVEY §2.9 mergeable-aggregation design):
    1. map-side partials — ``mapInPandas`` folds every Arrow batch of a
       physical partition into per-bucket KLL accumulators, emitting
       one sketch row per (partition × bucket). NO shuffle of raw
       rows; only n_partitions × n_buckets small sketch rows move.
    2. final merge — ``groupBy(bucket).applyInPandas`` over those
       sketch rows, KLL-merge + count/min/max/sum combine.
    A naive groupBy(bucket).applyInPandas over raw rows was measured
    2.3× slower end-to-end (it shuffles all rows through Arrow)."""
    partials = make_partials(value_col, kll_k)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = merge_serialized([bytes(b) for b in pdf["kll"] if b is not None])
        mins = pdf["min_value"].dropna()
        maxs = pdf["max_value"].dropna()
        sums = pdf["sum_value"].dropna()
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "n_rows": [int(pdf["n_rows"].sum())],
                "n_null": [int(pdf["n_null"].sum())],
                "min_value": [float(mins.min()) if len(mins) else None],
                "max_value": [float(maxs.max()) if len(maxs) else None],
                "sum_value": [float(sums.sum()) if len(sums) else None],
                "kll": [merged.serialize()],
            }
        )

    partial_rows = df_b.select(BUCKET_COL, value_col).mapInPandas(
        lambda it: partials(it), SKETCH_SCHEMA
    )
    return partial_rows.groupBy(BUCKET_COL).applyInPandas(merge, SKETCH_SCHEMA)


def merged_quantiles(sketch_rows: list, qs: list[float]) -> list[float | None]:
    """Driver-side associative merge of serialized KLLs → quantiles."""
    merged = merge_serialized([bytes(r.kll) for r in sketch_rows if r.kll is not None])
    return merged.quantiles(qs)
