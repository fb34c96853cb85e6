"""Reference-parity API facade (api/api.py method names + shapes)."""

import pandas as pd
import pytest

from kglids_spark.api import KGLiDS


@pytest.fixture(scope="module")
def kglids(spark):
    return KGLiDS(spark, "/root/testdata/sf0.001", dataset_id="sf0.001")


def test_show_graph_info(kglids):
    info = kglids.show_graph_info()
    assert list(info.columns) == ["Datasets", "Tables", "Columns", "Pipelines"]
    assert info.Tables[0] == 10
    assert info.Columns[0] > 40


def test_get_datasets_and_tables_info(kglids):
    ds = kglids.get_datasets_info()
    assert ds.Number_of_tables.sum() == 10
    tables = kglids.get_tables_info()
    assert set(tables.Table) >= {"lineitem", "orders", "customer"}
    assert tables[tables.Table == "lineitem"].Number_of_columns.iloc[0] == 11
    one = kglids.get_table_info("nation")
    assert set(one.Column) == {"n_nationkey", "n_name", "n_regionkey"}


def test_search_tables_on(kglids):
    hits = kglids.search_tables_on([["key", "id"], ["nation|region"]])
    assert set(hits.Table) == {"region", "nation", "customer", "supplier"}


def test_recommend_joinable(kglids):
    rec = kglids.recommend_k_joinable_tables("orders", k=5)
    assert rec.Table.iloc[0] == "lineitem"
    assert rec.Score.iloc[0] == pytest.approx(1.0)


def test_recommend_accepts_series_row(kglids):
    row = pd.Series({"Table": "orders", "Dataset": "sf0.001"})
    rec = kglids.recommend_k_joinable_tables(row, k=3)
    assert len(rec) > 0


def test_path_between_tables(kglids):
    paths = kglids.get_path_between_tables("customer", "region", hops=3)
    assert len(paths) > 0
    assert paths.iloc[0]["path"][0] == "customer"


def test_adhoc_query(kglids):
    out = kglids.query(
        "SELECT data_type, count(*) AS n FROM profiles GROUP BY data_type ORDER BY n DESC"
    )
    assert out.n.sum() > 40


def test_pipeline_apis_raise(kglids):
    with pytest.raises(NotImplementedError):
        kglids.get_pipelines_info()
