"""Deterministic EDA-operations fixture.

Stands in for the KG's EDAOperation nodes + pgvector column embeddings
(reference builds these from Kaggle notebooks' plotting calls;
kglids_server.py:135-284 queries them). Literal rows shared by the
Spark loader and the DuckDB oracle generator, so the recommendation
join/rank plan is value-checked end-to-end.

Embeddings are 4-dim stat vectors (the engine's content-embedding
analog); values are chosen so every nearest-neighbour match is unique
and strictly ordered.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kglids_spark.operators.eda import (
    EDA_OPS_SCHEMA,
    KG_COLUMNS_SCHEMA,
    QUERY_COLUMNS_SCHEMA,
)

# (eda_id, column_id, analysis_type, chart_type) — one row per
# column↔op edge; bivariate/multivariate ops appear once per column
EDA_OPS: list[tuple] = [
    ("e1", "kg.sales.price", "univariate", "histogram"),
    ("e2", "kg.sales.price", "univariate", "boxplot"),
    ("e3", "kg.sales.price", "bivariate", "scatter"),
    ("e3", "kg.sales.qty", "bivariate", "scatter"),
    ("e4", "kg.sales.price", "bivariate", "line"),
    ("e4", "kg.sales.day", "bivariate", "line"),
    ("e5", "kg.sales.price", "bivariate", "grouped_bar"),
    ("e5", "kg.sales.region", "bivariate", "grouped_bar"),
    ("e6", "kg.sales.price", "multivariate", "heatmap"),
    ("e6", "kg.sales.qty", "multivariate", "heatmap"),
    ("e6", "kg.sales.region", "multivariate", "heatmap"),
    ("e7", "kg.sales.price", "multivariate", "bubble"),
    ("e7", "kg.sales.qty", "multivariate", "bubble"),
    ("e7", "kg.sales.region", "multivariate", "bubble"),
    ("e8", "kg.sales.qty", "univariate", "histogram"),  # not on price: excluded
    # e9: two int other-columns whose independent nearest is the SAME
    # query column (units) — iterative matching must give the second
    # (qty2) the runner-up (count). The case where the modes differ.
    ("e9", "kg.sales.price", "multivariate", "parallel"),
    ("e9", "kg.sales.qty", "multivariate", "parallel"),
    ("e9", "kg.sales.qty2", "multivariate", "parallel"),
    # e10: first other-column (day, sorts before qty) has no same-type
    # query column — iterative mode then drops the whole op (<2
    # matched); independent mode keeps the qty row.
    ("e10", "kg.sales.price", "multivariate", "parallel2"),
    ("e10", "kg.sales.day", "multivariate", "parallel2"),
    ("e10", "kg.sales.qty", "multivariate", "parallel2"),
]

# (column_id, data_type, e1..e4)
KG_COLUMNS: list[tuple] = [
    ("kg.sales.price", "float", 3.0, 1.0, 0.0, 0.0),
    ("kg.sales.qty", "int", 1.0, 0.0, 0.0, 0.0),
    ("kg.sales.qty2", "int", 1.2, 0.0, 0.0, 0.0),  # nearest is also units
    ("kg.sales.region", "string", 0.0, 1.0, 0.0, 0.0),
    ("kg.sales.day", "date", 0.0, 0.0, 5.0, 0.0),
]

# the query table's columns: (name, data_type, e1..e4) — no date
# column, so op e4 (price×day) finds no match and is dropped
QUERY_COLUMNS: list[tuple] = [
    ("amount", "float", 3.1, 1.0, 0.0, 0.0),
    ("count", "int", 2.0, 0.0, 0.0, 0.0),
    ("units", "int", 1.0, 0.1, 0.0, 0.0),   # nearest int to kg qty
    ("category", "string", 0.0, 3.0, 0.0, 0.0),
    ("city", "string", 0.0, 1.1, 0.0, 0.0),  # nearest string to kg region
]

SIMILAR_COLUMN_ID = "kg.sales.price"
MAIN_COLUMN_NAME = "amount"


def load_eda_tables(spark: SparkSession):
    return (
        spark.createDataFrame(EDA_OPS, EDA_OPS_SCHEMA),
        spark.createDataFrame(KG_COLUMNS, KG_COLUMNS_SCHEMA),
        spark.createDataFrame(QUERY_COLUMNS, QUERY_COLUMNS_SCHEMA),
    )
