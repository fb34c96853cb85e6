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

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pd.to_numeric(pdf[value_col], errors="coerce")
        sk = KLL(k=kll_k)
        arr = vals.dropna().to_numpy(dtype="float64")
        sk.update_batch(arr)
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf[BUCKET_COL].iloc[0])],
                "n_rows": [len(pdf)],
                "n_null": [int(vals.isna().sum())],
                "min_value": [float(arr.min()) if arr.size else None],
                "max_value": [float(arr.max()) if arr.size else None],
                "sum_value": [float(arr.sum()) if arr.size else None],
                "kll": [sk.serialize()],
            }
        )

    return df_b.groupBy(BUCKET_COL).applyInPandas(per_bucket, SKETCH_SCHEMA)


def merged_quantiles(sketch_rows: list, qs: list[float]) -> list[float | None]:
    """Driver-side associative merge of serialized KLLs → quantiles."""
    merged = merge_serialized([bytes(r.kll) for r in sketch_rows if r.kll is not None])
    return merged.quantiles(qs)
