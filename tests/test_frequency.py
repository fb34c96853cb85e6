"""Exact heavy hitters: MG candidate superset + exact second pass must
equal the full groupBy under every partitioning."""

import pyspark.sql.functions as F
import pytest

from kglids_spark.operators.frequency import heavy_hitters


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: item "hot" ~ 20%, "warm" ~ 5%, long tail of uniques
    df = spark.range(10000).select(
        F.when(F.col("id") % 5 == 0, "hot")
        .when(F.col("id") % 20 == 1, "warm")
        .otherwise(F.concat(F.lit("tail"), F.col("id")))
        .alias("item")
    )
    return df.cache()


def _exact(df, k):
    n = df.count()
    return {
        (r.item, r.n)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > n / (k + 1))
        .collect()
    }


@pytest.mark.parametrize("k", [9, 199])
def test_heavy_hitters_exact_vs_groupby(spark, skewed, k):
    got = {(r.item, r.n) for r in heavy_hitters(skewed, "item", k=k).collect()}
    assert got == _exact(skewed, k)
    assert ("hot", 2000) in got


def test_heavy_hitters_partitioning_invariant(spark, skewed):
    a = {(r.item, r.n) for r in heavy_hitters(skewed.repartition(17), "item", k=49).collect()}
    b = {(r.item, r.n) for r in heavy_hitters(skewed.coalesce(1), "item", k=49).collect()}
    assert a == b == _exact(skewed, 49)


def test_heavy_hitters_nulls_dropped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "item string")
    got = {(r.item, r.n) for r in heavy_hitters(df, "item", k=1).collect()}
    # n=3 non-null; threshold 3/2 → only 'a' (2 > 1.5)
    assert got == {("a", 2)}


def test_heavy_hitters_accepts_column_expression(spark, skewed):
    got = {r.item for r in heavy_hitters(skewed, F.upper(F.col("item")), k=9).collect()}
    assert "HOT" in got
