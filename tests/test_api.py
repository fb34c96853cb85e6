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


def test_pipeline_apis(kglids):
    """Pipeline analytics over the fixture corpus (reference
    api/api.py:125-236 signatures)."""
    info = kglids.get_pipelines_info()
    assert list(info.columns) == [
        "Pipeline", "Dataset", "Author", "Written_on", "Number_of_votes", "Score",
    ]
    assert info.iloc[0]["Pipeline"] == "xgb-quick"  # most votes first

    recent = kglids.get_most_recent_pipeline(dataset="titanic")
    assert recent.iloc[0]["Pipeline"] == "xgb-quick"

    top = kglids.get_top_k_scoring_pipelines_for_dataset("titanic", k=2)
    assert list(top["Pipeline"]) == ["xgb-quick", "rf-baseline"]

    clfs = kglids.search_classifier()
    assert set(clfs["Classifier"]) == {
        "RandomForestClassifier", "LogisticRegression", "XGBClassifier", "SVC",
    }

    row = clfs[clfs["Classifier"] == "RandomForestClassifier"].iloc[0]
    hp = kglids.get_hyperparameters(row)
    got = dict(zip(hp["RandomForestClassifier_hyperparameter"], hp["Value"]))
    assert got == {"n_estimators": "100", "max_depth": "8", "random_state": "42"}

    usage = kglids.get_top_k_library_used()
    assert usage.iloc[0]["Library"] == "pandas"  # used by all 6 pipelines
    assert usage.iloc[0]["Usage"] == 6
    assert "df" not in set(usage["Library"])  # data-flow resolved vars

    dl = kglids.get_pipelines_for_deep_learning()
    assert list(dl["Pipeline"]) == ["torch-mlp"]

    calling = kglids.get_pipelines_calling_libraries(
        ["RandomForestClassifier", "train_test_split"]
    )
    assert list(calling["Pipeline"]) == ["rf-baseline"]

    tags = kglids.get_pipelines_by_tags()
    tag_counts = dict(zip(tags["Tag"], tags["Number_of_pipelines"]))
    assert tag_counts["classification"] == 5

    tf = kglids.recommend_transformations()
    assert set(tf["Transformation"]) == {"StandardScaler", "MinMaxScaler"}

    with pytest.raises(ValueError):
        kglids.get_top_used_libraries(task="nonsense")

    assert kglids.get_top_scoring_ml_model().iloc[0]["count"] == 6

    pop = kglids.get_most_popular_parameters("sklearn")
    assert pop.iloc[0]["Usage"] >= 2  # random_state=42 appears twice

    usage_by_task = kglids.show_pipeline_usage_by_task()
    counts = dict(zip(usage_by_task["Task"], usage_by_task["Number_of_pipelines"]))
    assert counts["classification"] == 5 and counts["deep learning"] == 1

    models = kglids.show_top_k_models_by_task("classification", k=3)
    assert models.iloc[0]["Usage"] >= 1
    assert all(m.endswith("Classifier") for m in models["Module"])


def test_package_zip_imports_standalone(tmp_path):
    """`cli package` must produce a --py-files zip from which every
    module resolves without the source tree on sys.path (the
    spark-submit shipping path)."""
    import subprocess
    import sys

    out = tmp_path / "kglids_spark.zip"
    r = subprocess.run(
        [sys.executable, "-m", "kglids_spark.cli", "package", "--out", str(out)],
        capture_output=True,
        text=True,
        check=True,
    )
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import importlib; "
        "mods = ['kglids_spark', 'kglids_spark.operators.constraints', "
        "'kglids_spark.operators.validate', 'kglids_spark.plans.buckets']; "
        "[importlib.import_module(m) for m in mods]; "
        "import kglids_spark; assert sys.argv[1] in kglids_spark.__file__; "
        "print('ok')"
    )
    r2 = subprocess.run(
        [sys.executable, "-c", probe, str(out)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo root so the zip is the only source
        check=True,
    )
    assert r2.stdout.strip().endswith("ok")
