"""Deterministic synthetic pipeline corpus.

Stands in for the reference's Kaggle notebook directory
(README.md:56-69: data/kaggle/<dataset>/notebooks/*.py plus a
kaggle_meta CSV of title/author/votes/score/date/tags). Six small
scripts in the style the reference's AST abstraction targets
(pandas + sklearn + xgboost + torch), with fixed metadata — every
byte is literal, so the abstraction output is reproducible anywhere
(the DuckDB oracles re-run the same pure-Python abstraction and inline
its rows as VALUES).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from kglids_spark.operators.pipelines import (
    PIPELINE_SCHEMA,
    STATEMENT_SCHEMA,
    abstract_pipeline,
)

SCRIPTS: dict[str, str] = {
    "p1": """
import pandas as pd
from sklearn.ensemble import RandomForestClassifier
from sklearn.model_selection import train_test_split

df = pd.read_csv('train.csv')
df = df.dropna()
X_train, X_test, y_train, y_test = train_test_split(df, df, test_size=0.2, random_state=42)
clf = RandomForestClassifier(n_estimators=100, max_depth=8, random_state=42)
clf.fit(X_train, y_train)
score = clf.score(X_test, y_test)
""",
    "p2": """
import pandas as pd
from sklearn.preprocessing import StandardScaler
from sklearn.linear_model import LogisticRegression

data = pd.read_csv('train.csv')
scaler = StandardScaler()
scaled = scaler.fit_transform(data)
model = LogisticRegression(C=0.5, max_iter=200)
model.fit(scaled, data)
""",
    "p3": """
import pandas as pd
import xgboost as xgb

train = pd.read_csv('train.csv')
booster = xgb.XGBClassifier(n_estimators=50, learning_rate=0.1)
booster.fit(train, train)
""",
    "p4": """
import pandas as pd
import matplotlib.pyplot as plt

df = pd.read_csv('sales.csv')
agg = df.groupby('region').sum()
plt.plot(agg)
plt.show()
""",
    "p5": """
import torch
import torch.nn as nn
import pandas as pd

data = pd.read_csv('train.csv')
layer = nn.Linear(128, 10)
opt = torch.optim.Adam(layer.parameters(), lr=0.001)
""",
    "p6": """
import pandas as pd
from sklearn.preprocessing import MinMaxScaler
from sklearn.svm import SVC

df = pd.read_csv('data.csv')
scaler = MinMaxScaler(feature_range=(0, 1))
X = scaler.fit_transform(df)
clf = SVC(C=1.0, kernel='rbf')
clf.fit(X, df)
""",
}

# (pipeline_id, title, dataset, author, written_on, votes, score, tags)
METADATA: list[tuple] = [
    ("p1", "rf-baseline", "titanic", "alice", datetime.date(2023, 1, 10), 120, 0.81, ["classification"]),
    ("p2", "logreg-scaled", "titanic", "bob", datetime.date(2023, 3, 5), 45, 0.78, ["classification", "cleaning"]),
    ("p3", "xgb-quick", "titanic", "alice", datetime.date(2023, 6, 1), 200, 0.84, ["classification"]),
    ("p4", "sales-viz", "retail", "carol", datetime.date(2022, 11, 20), 15, 0.0, ["visualization"]),
    ("p5", "torch-mlp", "mnist-mini", "dan", datetime.date(2023, 7, 15), 88, 0.92, ["classification", "deep learning"]),
    ("p6", "svc-scaled", "titanic", "erin", datetime.date(2023, 2, 14), 33, 0.79, ["classification"]),
]


def statement_rows() -> list[tuple]:
    """Pure-Python abstraction of the whole corpus (no Spark) —
    shared by the Spark loader and the DuckDB oracle generator."""
    rows: list[tuple] = []
    for pid, src in SCRIPTS.items():
        rows.extend(r.as_tuple() for r in abstract_pipeline(pid, src))
    return rows


def load_pipelines(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """(pipelines, statements) DataFrames for the fixture corpus.

    Statements go through the distributed mapInPandas abstraction path
    so the executor-side parse is what gets exercised."""
    from kglids_spark.operators.pipelines import abstract_pipelines_df

    pipelines = spark.createDataFrame(METADATA, PIPELINE_SCHEMA)
    scripts = spark.createDataFrame(
        list(SCRIPTS.items()), "pipeline_id string, source string"
    )
    statements = abstract_pipelines_df(spark, scripts)
    return pipelines, statements
