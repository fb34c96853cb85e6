"""EDA-operation recommendation (reference kglids_server.py:135-284
``fetch_eda_operations``).

The reference stores EDA operations in the knowledge graph — each
column node carries ``pipeline:hasEDAOperation`` edges to EDAOperation
nodes typed with an analysis type (univariate / bivariate /
multivariate) and a chart type — and answers: "given a KG column
similar to my query column, which chart should I draw, and against
which of MY columns?" For bivariate/multivariate ops it finds the
op's OTHER column(s), then matches each to the query table's column of
the same data type with the closest content embedding (pgvector ``<=>``
over content_label_embedding).

Spark-native analog: EDA ops, KG column metadata and query-table
column profiles are three DataFrames; the pgvector nearest-neighbour
becomes a broadcast join on data_type + a row_number() window over the
stat-vector L2 distance (the engine's content-embedding analog —
similarity.py content score; learned CoLR embeddings are a documented
divergence). Everything is one declarative plan: no per-op loop, no
driver round-trips per operation (the reference issues one pgvector
query per op in a Python loop).

Divergence noted: the reference's multivariate path matches other
columns ITERATIVELY, excluding already-matched names (order-dependent);
here each other-column matches independently — same results whenever
nearest matches are distinct, deterministic always.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EDA_OPS_SCHEMA = "eda_id string, column_id string, analysis_type string, chart_type string"
KG_COLUMNS_SCHEMA = (
    "column_id string, data_type string, e1 double, e2 double, e3 double, e4 double"
)
QUERY_COLUMNS_SCHEMA = (
    "name string, data_type string, e1 double, e2 double, e3 double, e4 double"
)

# chart types whose multivariate ops apply to the whole table, not
# matched columns (reference keeps them with empty chart_columns)
WHOLE_TABLE_CHARTS = ("heatmap", "pairwise")


def recommend_eda_operations(
    eda_ops: DataFrame,
    kg_columns: DataFrame,
    query_columns: DataFrame,
    similar_column_id: str,
    main_column_name: str,
    analysis_type: str,
) -> DataFrame:
    """(eda_id, analysis_type, chart_type, secondary_column_id,
    matched_column) for the EDA ops attached to ``similar_column_id``.

    univariate rows carry NULL secondary/matched (the chart draws the
    main column alone); bivariate/multivariate rows carry one row per
    other column of the op, matched to the same-type nearest query
    column; whole-table charts (heatmap/pairwise) keep NULLs; ops whose
    other column has no same-type query column are dropped (reference:
    ``len(chart_columns) > 1`` filter)."""
    mine = eda_ops.filter(
        (F.col("column_id") == similar_column_id)
        & (F.col("analysis_type") == analysis_type)
    ).select("eda_id", "analysis_type", "chart_type")

    base = mine.select(
        "eda_id",
        "analysis_type",
        "chart_type",
        F.lit(None).cast("string").alias("secondary_column_id"),
        F.lit(None).cast("string").alias("matched_column"),
    )
    if analysis_type == "univariate":
        return base

    whole_table = base.filter(F.col("chart_type").isin(*WHOLE_TABLE_CHARTS))

    others = (
        mine.filter(~F.col("chart_type").isin(*WHOLE_TABLE_CHARTS))
        .join(
            eda_ops.select("eda_id", F.col("column_id").alias("secondary_column_id")),
            "eda_id",
        )
        .filter(F.col("secondary_column_id") != similar_column_id)
        .join(
            F.broadcast(
                kg_columns.select(
                    F.col("column_id").alias("secondary_column_id"),
                    "data_type",
                    *[F.col(c).alias(f"k{c}") for c in ("e1", "e2", "e3", "e4")],
                )
            ),
            "secondary_column_id",
        )
    )

    dist = sum(
        (F.col(f"ke{i}") - F.col(f"e{i}")) * (F.col(f"ke{i}") - F.col(f"e{i}"))
        for i in (1, 2, 3, 4)
    )
    w = Window.partitionBy("eda_id", "secondary_column_id").orderBy(
        dist.asc(), F.col("name").asc()
    )
    matched = (
        others.join(
            F.broadcast(query_columns.filter(F.col("name") != main_column_name)),
            "data_type",
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "eda_id",
            "analysis_type",
            "chart_type",
            "secondary_column_id",
            F.col("name").alias("matched_column"),
        )
    )
    return whole_table.unionByName(matched)
