"""Snapshot-to-snapshot profile drift: stat flagging semantics, schema
evolution rows, tolerance kinds, and one-sided stat handling."""

import pytest
from pyspark.sql import functions as F

from kglids_spark.operators.profile_diff import profile_diff
from kglids_spark.operators.profiler import profile_table


def _profiles(spark, base_rows, cur_rows, schema):
    b = profile_table(spark.createDataFrame(base_rows, schema), "t", exact=True)
    c = profile_table(spark.createDataFrame(cur_rows, schema), "t", exact=True)
    return c, b


def test_mean_shift_flags_rel_stats_only(spark):
    base = [(float(i),) for i in range(100)]
    cur = [(float(i) * 2,) for i in range(100)]  # doubled magnitude
    c, b = _profiles(spark, base, cur, "x double")
    rows = {r.stat: r for r in profile_diff(c, b).collect()}
    assert rows["column"].note == "ok" and not rows["column"].flagged
    for s in ("mean", "max_value", "median", "iqr"):
        assert rows[s].flagged, s
        assert abs(rows[s].delta - 1.0) < 1e-9, s  # (2x-x)/x
    # rates did not move
    assert not rows["null_rate"].flagged and rows["null_rate"].delta == 0.0
    assert not rows["distinct_rate"].flagged


def test_null_rate_absolute_tolerance(spark):
    base = [(1.0,)] * 99 + [(None,)]  # 1% null
    cur = [(1.0,)] * 97 + [(None,)] * 3  # 3% null: +0.02 > rate_tol 0.01
    c, b = _profiles(spark, base, cur, "x double")
    rows = {r.stat: r for r in profile_diff(c, b).collect()}
    assert rows["null_rate"].flagged
    assert abs(rows["null_rate"].delta - 0.02) < 1e-9
    # constant value: mean unchanged, not flagged
    assert not rows["mean"].flagged


def test_schema_evolution_rows(spark):
    b = profile_table(
        spark.createDataFrame([(2.5, "a")], "x double, gone string"), "t", exact=True
    )
    c = profile_table(
        spark.createDataFrame([(5, "n")], "x int, fresh string"), "t", exact=True
    )
    rows = {
        (r.column_name, r.stat): r for r in profile_diff(c, b).collect()
    }
    assert rows[("gone", "column")].note == "removed"
    assert rows[("fresh", "column")].note == "added"
    # data_type is the profiler's FINE-GRAINED type (P5 rules), so a
    # dtype change surfaces in those terms
    assert rows[("x", "column")].note == "type_changed:float->int"
    assert all(
        rows[(n, "column")].flagged for n in ("gone", "fresh", "x")
    )
    # added/removed columns contribute NO stat rows (nothing to compare)
    assert not [
        k for k in rows if k[0] in ("gone", "fresh") and k[1] != "column"
    ]


def test_non_numeric_stats_absent_not_flagged(spark):
    b = profile_table(spark.createDataFrame([("a",)], "s string"), "t", exact=True)
    c = profile_table(spark.createDataFrame([("b",)], "s string"), "t", exact=True)
    rows = {r.stat: r for r in profile_diff(c, b).collect()}
    # a string column has no mean/median/iqr/true_ratio on either side:
    # those are not comparisons, they must not appear at all
    assert set(rows) <= {"column", "null_rate", "distinct_rate", "min_value", "max_value"}
    assert not rows["null_rate"].flagged


def test_tolerances_are_parameters(spark):
    base = [(float(i),) for i in range(100)]
    cur = [(float(i) * 1.05,) for i in range(100)]  # +5%
    c, b = _profiles(spark, base, cur, "x double")
    loose = {r.stat: r for r in profile_diff(c, b, rel_tol=0.10).collect()}
    tight = {r.stat: r for r in profile_diff(c, b, rel_tol=0.01).collect()}
    assert not loose["mean"].flagged and tight["mean"].flagged
