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

Matching modes (``iterative`` flag): the reference's multivariate path
matches other columns ITERATIVELY — each op accumulates
``chart_columns`` and the pgvector query excludes names already in it
(``name NOT IN (...)``, kglids_server.py:262-273), so a later
other-column can never claim an earlier one's match — and finally
keeps only heatmap/pairwise ops or ops with ≥2 matched columns
(``len(chart_columns) > 2`` with the main column included,
kglids_server.py:280-282). ``iterative=True`` reproduces exactly that,
with the reference's unspecified GROUP_CONCAT iteration order pinned
to sorted(secondary_column_id). The default (``iterative=False``)
matches each other-column independently — same results whenever
nearest matches are distinct, and one window pass instead of
max-arity rounds.
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
    iterative: bool = False,
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
    qcols = F.broadcast(query_columns.filter(F.col("name") != main_column_name))

    if iterative and analysis_type == "multivariate":
        return whole_table.unionByName(
            _match_iterative(others, qcols, dist)
        )

    w = Window.partitionBy("eda_id", "secondary_column_id").orderBy(
        dist.asc(), F.col("name").asc()
    )
    matched = (
        others.join(qcols, "data_type")
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


def _match_iterative(others: DataFrame, qcols, dist) -> DataFrame:
    """Reference-order multivariate matching: round r matches each op's
    r-th other column (sorted by secondary_column_id) to its nearest
    same-type query column NOT already matched by that op in earlier
    rounds, then ops with <2 matched columns are dropped
    (kglids_server.py:262-282). The loop is bounded by op arity (the
    max other-column count over ops — single-digit for any real chart),
    each round one broadcast join + window; the matched set stays a
    DataFrame, so nothing is collected but the tiny arity scalar."""
    ranked_others = others.withColumn(
        "_ord",
        F.row_number().over(
            Window.partitionBy("eda_id").orderBy("secondary_column_id")
        ),
    )
    max_ord_row = ranked_others.agg(F.max("_ord")).collect()[0][0]
    max_ord = int(max_ord_row or 0)

    spark = others.sparkSession
    empty = spark.createDataFrame(
        [],
        "eda_id string, analysis_type string, chart_type string, "
        "secondary_column_id string, matched_column string",
    )
    if max_ord == 0:
        return empty
    matched = spark.createDataFrame([], "eda_id string, matched_column string")
    rounds = []
    w = Window.partitionBy("eda_id", "secondary_column_id").orderBy(
        dist.asc(), F.col("name").asc()
    )
    for r in range(1, max_ord + 1):
        best = (
            ranked_others.filter(F.col("_ord") == r)
            .join(qcols, "data_type")
            .join(
                matched.withColumnRenamed("matched_column", "name"),
                ["eda_id", "name"],
                "left_anti",
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
            .localCheckpoint(eager=True)  # r rounds, not r² replans
        )
        rounds.append(best)
        matched = matched.unionByName(best.select("eda_id", "matched_column"))

    out = rounds[0]
    for b in rounds[1:]:
        out = out.unionByName(b)
    # reference keeps only ops with >2 chart columns (main + ≥2 matched)
    enough = (
        out.groupBy("eda_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("eda_id")
    )
    result = out.join(enough, "eda_id", "left_semi").localCheckpoint(eager=True)
    # release the per-round checkpoint blocks once the final frame is
    # materialized — otherwise every iterative call pins max_ord frames
    # for the session (the k_hop_paths leak class, VERDICT r2)
    from kglids_spark.operators.dedup import _release_local_checkpoints

    _release_local_checkpoints(rounds)
    return result
