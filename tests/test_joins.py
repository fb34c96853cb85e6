"""Temporal join semantics on hand-built fixtures: as-of picks the
latest right row at-or-before each left ts (inclusive, null when none),
and the bucketed range join equals the naive θ-join."""

import datetime

from pyspark.sql import functions as F

from kglids_spark.operators.joins import as_of_join, range_join_bucketed


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m, 0)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(5)), (2, "u1", _ts(10)), (3, "u1", _ts(2)), (4, "u2", _ts(7)), (5, "u3", _ts(9))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(3), 30.0), ("u1", _ts(10), 100.0), ("u2", _ts(8), 55.0)],
        "user_id string, ts timestamp, state double",
    )
    out = {
        r["event_id"]: r["state_asof"]
        for r in as_of_join(left, right, on="user_id", ts="ts", right_payload=["state"]).collect()
    }
    assert out[1] == 30.0     # latest right at-or-before :05 is :03
    assert out[2] == 100.0    # equal ts is inclusive (:10 joins :10)
    assert out[3] is None     # :02 precedes every right row
    assert out[4] is None     # u2's right row (:08) is after :07
    assert out[5] is None     # u3 has no right rows


def test_as_of_join_row_count_preserved(spark, tokens_df):
    left = spark.createDataFrame(
        [(i, "u", _ts(i % 50)) for i in range(500)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(25), 1.0)], "user_id string, ts timestamp, state double"
    )
    out = as_of_join(left, right, on="user_id", ts="ts", right_payload=["state"])
    assert out.count() == 500  # left join: every left row survives once


def test_range_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(i, f"u{i % 3}", _ts(i % 40)) for i in range(120)],
        "click_id long, user_id string, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [(1000 + i, f"u{i % 3}", _ts((i * 7) % 55)) for i in range(90)],
        "error_id long, user_id string, r_ts timestamp",
    )
    fast = range_join_bucketed(
        left, right, on="user_id", left_ts="l_ts", right_ts="r_ts",
        lower_bound_s=0, upper_bound_s=600, bucket_s=180,
    )
    naive = left.join(right, "user_id").filter(
        (F.unix_timestamp("r_ts") >= F.unix_timestamp("l_ts"))
        & (F.unix_timestamp("r_ts") <= F.unix_timestamp("l_ts") + 600)
    )
    key = lambda df: sorted((r["click_id"], r["error_id"]) for r in df.collect())
    assert key(fast) == key(naive)
    assert len(key(fast)) > 0
