"""Discovery layer: similarity edges, top-k recommendation, regex
search, k-hop paths (reference J1-J6, A13, W1, P9)."""

import pytest
from pyspark.sql import functions as F

from kglids_spark.functions.scalar import generate_label
from kglids_spark.operators.profiler import profile_tables
from kglids_spark.operators.similarity import (
    column_similarity_edges,
    k_hop_paths,
    recommend_top_k_tables,
    search_columns,
)
from kglids_spark.sources.tables import load_testdata


@pytest.fixture(scope="module")
def profiles(spark):
    tabs = load_testdata(spark, "/root/testdata/sf0.001")
    p = profile_tables(spark, tabs, dataset_id="sf0.001").cache()
    p.count()
    return p


@pytest.fixture(scope="module")
def edges(profiles):
    e = column_similarity_edges(profiles, threshold=0.5).cache()
    e.count()
    return e


def test_edges_respect_join_constraints(edges):
    rows = edges.collect()
    assert rows, "expected some similarity edges on the star schema"
    for r in rows:
        assert r.table1_id != r.table2_id  # P7 same-table exclusion
        assert r.col1_id < r.col2_id  # triangular halving
        assert r.score >= 0.5  # P8 threshold


def test_edges_symmetric_under_threshold(profiles):
    strict = column_similarity_edges(profiles, threshold=0.9).count()
    loose = column_similarity_edges(profiles, threshold=0.5).count()
    assert strict <= loose


def test_recommend_top_k(edges):
    rec = recommend_top_k_tables(edges, "orders", k=5, kind="content").collect()
    assert rec
    assert rec[0].norm_score == pytest.approx(1.0)  # max-normalized (W4)
    scores = [r.total_score for r in rec]
    assert scores == sorted(scores, reverse=True)
    # lineitem shares key/value distributions with orders — must rank top
    assert rec[0].candidate == "lineitem"


def test_search_columns_and_of_ors(profiles):
    got = {
        r.column_name
        for r in search_columns(profiles, [["key", "id"], ["nation|region"]]).collect()
    }
    assert got == {
        "r_regionkey",
        "n_nationkey",
        "n_regionkey",
        "c_nationkey",
        "s_nationkey",
    }


def test_k_hop_paths_customer_to_region(edges):
    paths = k_hop_paths(edges, "customer", "region", max_hops=3, threshold=0.5).collect()
    assert paths
    best = min(paths, key=lambda r: r.hops)
    assert best.path[0] == "customer" and best.path[-1] == "region"
    assert best.hops >= 2  # no direct customer-region edge in the star schema
    for p in paths:
        assert len(set(p.path)) == len(p.path)  # acyclic


def test_generate_label(spark):
    df = spark.createDataFrame(
        [("empName.csv",), ("order_Details-2021",), ("  a.b  ",)], "s string"
    )
    got = [r[0] for r in df.select(generate_label("s")).collect()]
    assert got == ["emp name", "order details 2021", "a b"]
