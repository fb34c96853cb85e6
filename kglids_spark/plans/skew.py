"""Skew handling: salted repartitioning + AQE.

The `source` column is Zipf-skewed (~60% of rows share one value), so a
hash repartition on `source` alone sends 60% of a 100 TB table through
one reducer. Salting composes the skewed key with a bounded hash of
doc_id so the hot key fans out over `salt_buckets` reducers while rows
for one (source, salt) still co-locate. The reference load-balances its
triangular pair loop by shuffling task indexes (reference:
kg_governor/data_global_schema_builder/build_data_global_schema.py:156-158);
salting + AQE skew-join is the declarative equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_expr(salt_key: str = "doc_id", salt_buckets: int = 16) -> F.Column:
    return F.pmod(F.xxhash64(F.coalesce(F.col(salt_key), F.lit(""))), F.lit(salt_buckets)).cast("int")


def salted_repartition(
    df: DataFrame,
    skewed_col: str = "source",
    salt_key: str = "doc_id",
    n_partitions: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition on (skewed_col, salt) — row content is untouched, so
    the token-array byte-equality invariant holds (tested)."""
    salted = df.withColumn("_salt", salt_expr(salt_key, salt_buckets))
    if n_partitions:
        out = salted.repartition(n_partitions, F.col(skewed_col), F.col("_salt"))
    else:
        out = salted.repartition(F.col(skewed_col), F.col("_salt"))
    return out.drop("_salt")
