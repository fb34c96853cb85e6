"""Profiler vs exact DuckDB oracle (SURVEY.md §5 test 1) + the
fine-grained type rules on the profiler_mixed fixture (FIXTURES.md F4)."""

import math

import pytest

from kglids_spark.operators.profiler import profile_table


def _profiles_by_col(pdf):
    return {r["column_name"]: r for r in pdf.collect()}


def test_tokens_profile_matches_duckdb(spark, tokens_df, duck):
    prof = _profiles_by_col(
        profile_table(tokens_df.drop("tokens"), "tokens", exact=True)
    )
    o = duck.execute(
        """
        SELECT count(*) AS total,
               count(doc_id) AS docid_nonnull,
               count(DISTINCT doc_id) AS docid_distinct,
               count(DISTINCT n_tok) AS ntok_distinct,
               min(n_tok)::double AS ntok_min,
               max(n_tok)::double AS ntok_max,
               avg(n_tok) AS ntok_mean,
               quantile_cont(n_tok, 0.5) AS ntok_median,
               quantile_cont(n_tok, 0.75) - quantile_cont(n_tok, 0.25) AS ntok_iqr
        FROM tokens
        """
    ).fetchone()
    d = prof["doc_id"]
    assert d["total_values_count"] == o[0]
    assert d["missing_values_count"] == o[0] - o[1]
    assert d["distinct_values_count"] == o[2]
    n = prof["n_tok"]
    assert n["distinct_values_count"] == o[3]
    assert n["min_value"] == o[4]
    assert n["max_value"] == o[5]
    assert n["mean"] == pytest.approx(o[6], rel=1e-9)
    assert n["median"] == pytest.approx(o[7], rel=1e-9)
    assert n["iqr"] == pytest.approx(o[8], rel=1e-9)
    assert n["data_type"] == "int"
    assert d["data_type"] == "string"


def test_approx_profile_within_epsilon(tokens_df, duck):
    prof = _profiles_by_col(profile_table(tokens_df.drop("tokens"), "tokens", exact=False))
    exact_distinct = duck.execute("SELECT count(DISTINCT doc_id) FROM tokens").fetchone()[0]
    approx = prof["doc_id"]["distinct_values_count"]
    assert abs(approx - exact_distinct) / exact_distinct < 0.05  # HLL++ rsd
    exact_median = duck.execute("SELECT quantile_cont(n_tok, 0.5) FROM tokens").fetchone()[0]
    assert abs(prof["n_tok"]["median"] - exact_median) / exact_median < 0.05


def test_fine_grained_types(spark):
    """FIXTURES.md F4 profiler_mixed: one column per reference type rule
    (fine_grained_type_detector.py:16-41; NL/NER divergence documented)."""
    rows = []
    for i in range(200):
        rows.append(
            (
                i - 100,                                   # c_int
                float(i) * 1.5 if i % 7 else None,          # c_float
                i % 2,                                      # c_bool01
                bool(i % 3) if i % 11 else None,            # c_bool
                f"2021-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}",  # c_date
                f"A-{i}-xyz",                               # c_string
                "the quick brown fox jumps over the dog",   # c_text (prose)
                [" ", "?", "-", "ok"][i % 4],               # c_na_markers
                str(i * 3),                                 # c_numstr
                ["John Smith", "Jane Doe", "Ada Lovelace"][i % 3],  # c_entity
            )
        )
    df = spark.createDataFrame(
        rows,
        "c_int long, c_float double, c_bool01 long, c_bool boolean, "
        "c_date string, c_string string, c_text string, c_na_markers string, "
        "c_numstr string, c_entity string",
    )
    prof = _profiles_by_col(profile_table(df, "mixed", exact=True))
    assert prof["c_int"]["data_type"] == "int"
    assert prof["c_float"]["data_type"] == "float"
    assert prof["c_bool01"]["data_type"] == "boolean"
    assert prof["c_bool01"]["true_ratio"] == pytest.approx(0.5)
    assert prof["c_bool"]["data_type"] == "boolean"
    assert prof["c_date"]["data_type"] == "date"
    assert prof["c_string"]["data_type"] == "string"
    # heuristic NL/NE signals (vocab-free stand-in for fastText/spaCy,
    # fine_grained_type_detector.py:44-67)
    assert prof["c_text"]["data_type"] == "natural_language_text"
    assert prof["c_entity"]["data_type"] == "named_entity"
    # NA markers coerced to null (reference profile_data.py:111-116)
    assert prof["c_na_markers"]["missing_values_count"] == 150
    assert prof["c_numstr"]["data_type"] == "int"  # numeric-castable string


def test_float_nan_handling(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (3.0,)], "x double"
    )
    prof = _profiles_by_col(profile_table(df, "t", exact=True))
    p = prof["x"]
    assert p["total_values_count"] == 4
    assert p["missing_values_count"] == 1
    assert p["mean"] is None or not math.isinf(p["mean"])


def test_read_csv_table_na_and_numeric_coercion(spark, tmp_path):
    """Reference S2/P3/P4 semantics: NA markers -> null, whole-column
    numeric coercion (profile_data.py:111-120)."""
    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,x,1.5\n2,?,2.5\n-,y,3.5\n4, ,4.5\n")
    from kglids_spark.sources.tables import read_csv_table

    df = read_csv_table(spark, str(p))
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {"a": "bigint", "b": "string", "c": "double"}
    rows = df.collect()
    assert sum(1 for r in rows if r.a is None) == 1   # '-' coerced
    assert sum(1 for r in rows if r.b is None) == 2   # '?' and ' ' coerced
    assert sum(r.c for r in rows) == 12.0


def test_reference_profile_json_roundtrip(spark, tokens_df, tmp_path):
    """S4/S5 parity: profiles serialize to the reference's exact
    on-disk layout (dtype subdir, md5(column_id) filename, same key
    order as column_profile.py:35-56) and load back identically."""
    import hashlib
    import json
    import os

    from kglids_spark.operators.profiler import (
        _REFERENCE_PROFILE_KEYS,
        load_reference_profiles,
        profile_table,
        save_reference_profiles,
    )

    prof = profile_table(tokens_df.limit(2000), table_id="tok")
    base = str(tmp_path / "profiles")
    n = save_reference_profiles(prof, base, data_source="test_source")
    assert n == len(prof.collect())

    # layout: <base>/<data_type>/<md5(column_id)>.json
    one = prof.collect()[0]
    expected = os.path.join(
        base, one.data_type, hashlib.md5(one.column_id.encode()).hexdigest() + ".json"
    )
    assert os.path.exists(expected)
    with open(expected) as f:
        d = json.load(f)
    assert list(d) == _REFERENCE_PROFILE_KEYS
    assert d["data_source"] == "test_source"
    assert d["embedding"] is None  # model weights absent — documented

    back = load_reference_profiles(spark, base)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(back) == key(prof)


# ---------------------------------------------------------------------------
# Tukey-fence outlier profile


def test_iqr_outliers_hand_computed(spark):
    import numpy as np

    from kglids_spark.operators.profiler import iqr_outliers

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0, -50.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    row = iqr_outliers(df, "value").collect()[0]
    q1, q3 = np.percentile(np.array(vals), [25, 75])  # linear interpolation
    assert row.q1 == pytest.approx(q1)
    assert row.q3 == pytest.approx(q3)
    iqr = q3 - q1
    assert row.lo_fence == pytest.approx(q1 - 1.5 * iqr)
    assert row.hi_fence == pytest.approx(q3 + 1.5 * iqr)
    assert row.n_checked == 10
    assert row.n_below == 1 and row.n_above == 1  # -50 and 100
    assert row.outlier_rate == pytest.approx(0.2)


def test_iqr_outlier_rows_and_sides(spark):
    from kglids_spark.operators.profiler import iqr_outlier_rows

    vals = [(i, float(i)) for i in range(1, 9)] + [(99, 100.0), (98, -50.0)]
    df = spark.createDataFrame(vals, "id long, value double")
    got = {(r.id, r.fence_side) for r in iqr_outlier_rows(df, "value").collect()}
    assert got == {(99, "above"), (98, "below")}


def test_iqr_outliers_null_and_empty(spark):
    from kglids_spark.operators.profiler import iqr_outliers

    nulls = spark.createDataFrame([(None,), (None,)], "value double")
    row = iqr_outliers(nulls, "value").collect()[0]
    assert row.q1 is None and row.n_checked == 0
    assert row.n_below == 0 and row.n_above == 0 and row.outlier_rate is None
    empty = spark.createDataFrame([], "value double")
    row = iqr_outliers(empty, "value").collect()[0]
    assert row.n_checked == 0 and row.n_below == 0


def test_iqr_outliers_approx_mode_close(spark):
    import pyspark.sql.functions as F

    from kglids_spark.operators.profiler import iqr_outliers

    df = spark.range(10001).select((F.col("id") / 100.0).alias("value"))
    exact = iqr_outliers(df, "value", exact=True).collect()[0]
    approx = iqr_outliers(df, "value", exact=False).collect()[0]
    assert approx.q1 == pytest.approx(exact.q1, rel=0.01)
    assert approx.q3 == pytest.approx(exact.q3, rel=0.01)


def test_iqr_outliers_grouped_matches_per_group_global(spark):
    """Each group's row equals the global operator run on that group
    alone; NULL groups keep their own fences (null-safe join)."""
    from kglids_spark.operators.profiler import iqr_outliers, iqr_outliers_grouped

    rows = (
        [("a", float(v)) for v in range(1, 9)] + [("a", 100.0)]
        + [("b", float(v)) for v in (10, 20, 30, 40, -500)]
        + [(None, 1.0), (None, 2.0), (None, 3.0), (None, 999.0)]
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r.grp: r for r in iqr_outliers_grouped(df, "value", "grp").collect()}
    assert set(got) == {"a", "b", None}
    for g in ("a", "b", None):
        sub = df.filter(
            df.grp.eqNullSafe(F.lit(g) if g is not None else F.lit(None).cast("string"))
        )
        want = iqr_outliers(sub, "value").collect()[0]
        have = got[g]
        for fld in ("q1", "q3", "lo_fence", "hi_fence"):
            assert have[fld] == pytest.approx(want[fld]), (g, fld)
        assert (have.n_checked, have.n_below, have.n_above) == (
            want.n_checked,
            want.n_below,
            want.n_above,
        ), g
    # the NULL group's planted outlier is found under its OWN fences
    assert got[None].n_above == 1


def test_iqr_outliers_grouped_single_value_group(spark):
    from kglids_spark.operators.profiler import iqr_outliers_grouped

    df = spark.createDataFrame(
        [("solo", 5.0), ("many", 1.0), ("many", 2.0), ("many", 3.0)],
        "grp string, value double",
    )
    got = {r.grp: r for r in iqr_outliers_grouped(df, "value", "grp").collect()}
    # a single-value group has zero IQR: fences collapse onto the value
    assert got["solo"].q1 == got["solo"].q3 == 5.0
    assert got["solo"].n_below == 0 and got["solo"].n_above == 0
