"""Pipeline abstraction unit tests — same strategy as the reference's
pipeline test suite (kg_governor/pipeline_abstraction/test/
test_pipeline_abstraction.py:43-56: parse a snippet, assert the exact
resolved calls), plus the distributed mapInPandas path and analytics.
"""

from kglids_spark.operators.pipelines import abstract_pipeline
from kglids_spark.sources.pipelines_fixture import (
    METADATA,
    SCRIPTS,
    load_pipelines,
    statement_rows,
)


def _calls(src):
    return [(r.call_path, r.library, r.call_name) for r in abstract_pipeline("t", src)]


def test_import_alias_resolution():
    src = "import pandas as pd\npd.read_csv('x.csv')\n"
    assert _calls(src) == [("pandas.read_csv", "pandas", "read_csv")]


def test_from_import_resolution():
    src = (
        "from sklearn.ensemble import RandomForestClassifier\n"
        "RandomForestClassifier(n_estimators=10)\n"
    )
    rows = abstract_pipeline("t", src)
    assert rows[0].call_path == "sklearn.ensemble.RandomForestClassifier"
    assert rows[0].module == "sklearn.ensemble"
    assert rows[0].params == {"n_estimators": "10"}


def test_from_import_asname():
    src = "from sklearn.svm import SVC as S\nS(C=2.0)\n"
    rows = abstract_pipeline("t", src)
    assert rows[0].call_path == "sklearn.svm.SVC"
    assert rows[0].params == {"C": "2.0"}


def test_dataflow_variable_library():
    src = (
        "import pandas as pd\n"
        "df = pd.read_csv('x.csv')\n"
        "clean = df.dropna()\n"
        "clean.describe()\n"
    )
    rows = abstract_pipeline("t", src)
    assert [(r.call_name, r.library) for r in rows] == [
        ("read_csv", "pandas"),
        ("dropna", "pandas"),
        ("describe", "pandas"),  # via clean -> df -> pandas
    ]


def test_tuple_target_writes():
    src = (
        "from sklearn.model_selection import train_test_split\n"
        "a, b = train_test_split([1], test_size=0.5)\n"
        "a.sort()\n"
    )
    rows = abstract_pipeline("t", src)
    assert rows[0].writes == ["a", "b"]
    assert rows[1].library == "sklearn"  # a inherits the producing call's lib


def test_non_literal_kwargs_skipped():
    src = "import torch\nk = 3\ntorch.topk([1], k=k, dim=0)\n"
    rows = abstract_pipeline("t", src)
    assert rows[0].params == {"dim": "0"}  # k=k is not a literal


def test_reads_are_statement_level():
    src = "import pandas as pd\nx = 1\ny = pd.concat([x])\n"
    rows = abstract_pipeline("t", src)
    assert "x" in rows[0].reads and rows[0].writes == ["y"]


def test_fixture_corpus_shape():
    rows = statement_rows()
    assert {r[0] for r in rows} == set(SCRIPTS)
    assert len(rows) == 27
    assert len(METADATA) == 6


def test_distributed_abstraction_matches_local(spark):
    _, stmts = load_pipelines(spark)
    got = sorted(
        (r["pipeline_id"], r["stmt_idx"], r["call_path"], r["library"], r["call_name"])
        for r in stmts.collect()
    )
    want = sorted((r[0], r[1], r[2], r[3], r[5]) for r in statement_rows())
    assert got == want
