"""Drop-in discovery API with the reference's method names.

Mirrors the data-discovery surface of the reference's ``KGLiDS`` class
(api/api.py:9-120, docs/KGLiDS_apis.md): same method names and result
shapes (small pandas DataFrames), backed by the Spark engine instead of
a GraphDB endpoint — profiles and similarity edges are DataFrames, the
SPARQL templates become DataFrame plans, `query()` takes Spark SQL
instead of SPARQL (documented divergence; both are "the engine's query
language").

Pipeline-analytics methods (get_pipelines_info etc., api/api.py:125-»)
run over the AST-abstracted pipelines/statements DataFrames
(operators/pipelines.py); pass ``pipeline_scripts`` as a dict of
{pipeline_id: source} plus ``pipeline_meta`` rows, or rely on the
deterministic fixture corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kglids_spark.operators.profiler import profile_tables
from kglids_spark.operators.similarity import (
    column_similarity_edges,
    k_hop_paths,
    recommend_top_k_tables,
    search_columns,
)
from kglids_spark.sources.tables import load_testdata


def _table_name(table) -> str:
    """Accept a plain name, a pandas Series/dict row with a Table field
    (the reference passes a row of get_tables_info()), or a Spark Row."""
    if isinstance(table, str):
        return table
    for key in ("Table", "table", "table_id"):
        try:
            v = table[key]
            if isinstance(v, str):
                return v
        except (KeyError, IndexError, TypeError):
            continue
    raise ValueError(f"cannot extract a table name from {table!r}")


class KGLiDS:
    """Reference-parity discovery API over a directory of tables."""

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str,
        dataset_id: str = "default",
        threshold: float = 0.5,
    ):
        self.spark = spark
        self.data_dir = data_dir
        self.dataset_id = dataset_id
        self.tables = load_testdata(spark, data_dir)
        self.profiles = profile_tables(spark, self.tables, dataset_id=dataset_id).cache()
        self.edges = column_similarity_edges(self.profiles, threshold=threshold).cache()

    # ---- graph info (reference api/api.py:13-21,59-69) -----------------

    def show_graph_info(self) -> pd.DataFrame:
        agg = self.profiles.agg(
            F.count_distinct("dataset_id").alias("Datasets"),
            F.count_distinct("table_id").alias("Tables"),
            F.count(F.lit(1)).alias("Columns"),
        ).toPandas()
        agg["Pipelines"] = 0  # pipeline abstraction out of scope (SURVEY §7.3)
        return agg

    def get_datasets_info(self) -> pd.DataFrame:
        return (
            self.profiles.groupBy(F.col("dataset_id").alias("Dataset"))
            .agg(F.count_distinct("table_id").alias("Number_of_tables"))
            .orderBy("Dataset")
            .toPandas()
        )

    def get_tables_info(self, dataset: str = "") -> pd.DataFrame:
        p = self.profiles
        if dataset:
            p = p.filter(F.col("dataset_id") == dataset)
        return (
            p.groupBy(
                F.col("table_id").alias("Table"), F.col("dataset_id").alias("Dataset")
            )
            .agg(F.count(F.lit(1)).alias("Number_of_columns"))
            .withColumn("Path_to_table", F.concat(F.lit(self.data_dir + "/"), F.col("Table"), F.lit(".parquet")))
            .orderBy("Table")
            .toPandas()
        )

    def get_table_info(self, table) -> pd.DataFrame:
        name = _table_name(table)
        return (
            self.profiles.filter(F.col("table_id") == name)
            .select(
                F.col("column_name").alias("Column"),
                F.col("data_type").alias("Data_type"),
                F.col("total_values_count").alias("Total_values"),
                F.col("distinct_values_count").alias("Distinct_values"),
                F.col("missing_values_count").alias("Missing_values"),
            )
            .toPandas()
        )

    # ---- search / recommendation (api/api.py:23-57,71-113) --------------

    def search_tables_on(self, conditions: list) -> pd.DataFrame:
        """conditions: [['emp','staff'], ['id']] = (emp OR staff) AND id,
        matched against column names (reference api/api.py:71-113)."""
        hits = search_columns(self.profiles, conditions)
        return (
            hits.groupBy(F.col("table_id").alias("Table"), F.col("dataset_id").alias("Dataset"))
            .agg(F.collect_set("column_name").alias("Matching_columns"))
            .orderBy("Table")
            .toPandas()
        )

    def recommend_k_joinable_tables(self, table, k: int = 5) -> pd.DataFrame:
        """Joinable = content-similarity edges (reference api/api.py:23-39)."""
        rec = recommend_top_k_tables(self.edges, _table_name(table), k=k, kind="content")
        return rec.select(
            F.col("candidate").alias("Table"),
            F.col("norm_score").alias("Score"),
        ).toPandas()

    def recommend_k_unionable_tables(self, table, k: int = 5) -> pd.DataFrame:
        """Unionable = label-similarity edges (reference api/api.py:41-57)."""
        rec = recommend_top_k_tables(self.edges, _table_name(table), k=k, kind="label")
        return rec.select(
            F.col("candidate").alias("Table"),
            F.col("norm_score").alias("Score"),
        ).toPandas()

    def get_path_between_tables(self, source_table, target_table, hops: int = 3) -> pd.DataFrame:
        paths = k_hop_paths(
            self.edges, _table_name(source_table), _table_name(target_table), max_hops=hops
        )
        return paths.orderBy("hops", "min_score").toPandas()

    # ---- ad-hoc queries (api/api.py:119-120; SPARQL → Spark SQL) --------

    def query(self, sql: str) -> pd.DataFrame:
        """Ad-hoc engine-language query. The reference takes SPARQL and
        ships it to GraphDB; ours takes Spark SQL over the registered
        table views plus `profiles` / `similarities` / `pipelines` /
        `statements` views."""
        self.profiles.createOrReplaceTempView("profiles")
        self.edges.createOrReplaceTempView("similarities")
        if hasattr(self, "_pipelines"):
            self._pipelines.createOrReplaceTempView("pipelines")
            self._statements.createOrReplaceTempView("statements")
        return self.spark.sql(sql).toPandas()

    # ---- pipeline analytics (reference api/api.py:125-236) ---------------
    # Backed by the AST abstraction in operators/pipelines.py; lazily
    # loads the fixture corpus unless register_pipelines() was called.

    def register_pipelines(self, pipelines_df: DataFrame, statements_df: DataFrame):
        self._pipelines = pipelines_df.cache()
        self._statements = statements_df.cache()

    def _pipes(self):
        if not hasattr(self, "_pipelines"):
            from kglids_spark.sources.pipelines_fixture import load_pipelines

            self.register_pipelines(*load_pipelines(self.spark))
        return self._pipelines, self._statements

    def get_pipelines_info(self, author: str = "") -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        return P.pipelines_info(self._pipes()[0], author).toPandas()

    def get_most_recent_pipeline(self, dataset: str = "") -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        return P.most_recent_pipeline(self._pipes()[0], dataset).toPandas()

    def get_top_k_scoring_pipelines_for_dataset(
        self, dataset: str = "", k: int | None = None
    ) -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        return P.top_k_scoring_pipelines(self._pipes()[0], dataset, k).toPandas()

    def search_classifier(self, dataset: str = "") -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        pipes, stmts = self._pipes()
        return P.search_classifier(pipes, stmts, dataset).toPandas()

    def get_hyperparameters(self, classifier) -> pd.DataFrame:
        """``classifier`` is a row of search_classifier() output with
        Pipeline and Classifier fields (reference api/api.py:140-144)."""
        from kglids_spark.operators import pipelines as P

        pipes, stmts = self._pipes()
        return P.hyperparameters(
            stmts, pipes, classifier["Pipeline"], classifier["Classifier"]
        ).toPandas()

    def get_top_k_library_used(self, dataset: str = "", k: int = 5) -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        pipes, stmts = self._pipes()
        return P.library_usage(stmts, pipes, dataset, k).toPandas()

    def get_top_used_libraries(
        self, k: int = 5, task: str = "classification"
    ) -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        supported = ["classification", "regression", "visualization", "clustering"]
        if task not in supported:
            raise ValueError(f"invalid task, try one of: {', '.join(supported)}")
        pipes, stmts = self._pipes()
        return P.top_used_libraries(stmts, pipes, task).toPandas()

    def get_pipelines_calling_libraries(self, components: list) -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        pipes, stmts = self._pipes()
        return P.pipelines_calling_libraries(stmts, pipes, components).toPandas()

    def get_pipelines_for_deep_learning(self) -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        pipes, stmts = self._pipes()
        return P.pipelines_for_deep_learning(stmts, pipes).toPandas()

    def get_pipelines_by_tags(self, tag: str = "") -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        return P.pipelines_by_tags(self._pipes()[0], tag).toPandas()

    def recommend_transformations(self) -> pd.DataFrame:
        from kglids_spark.operators import pipelines as P

        pipes, stmts = self._pipes()
        return P.recommend_transformations(stmts, pipes).toPandas()

    def get_top_scoring_ml_model(self, dataset: str = "") -> pd.DataFrame:
        """Reference parity: its implementation returns the pipeline
        COUNT regardless of dataset (api/template.py:558-567); ours
        returns the same shape."""
        p = self._pipes()[0]
        return p.agg(F.count(F.lit(1)).alias("count")).toPandas()

    def get_most_popular_parameters(self, library: str, parameters="all") -> pd.DataFrame:
        """Realizes the reference's unimplemented stub
        (api/api.py:135-136): literal-kwarg frequency per library."""
        from kglids_spark.operators import pipelines as P

        return P.popular_parameters(self._pipes()[1], library, parameters).toPandas()

    def show_pipeline_usage_by_task(self) -> pd.DataFrame:
        """Data-only version of the reference's pie chart
        (api/api.py:196-228): per-task pipeline counts."""
        from kglids_spark.operators import pipelines as P

        return P.pipeline_usage_by_task(self._pipes()[0]).toPandas()

    def show_top_k_models_by_task(self, task: str, k: int = 5) -> pd.DataFrame:
        """Data-only version of the reference's bar chart
        (api/api.py:230-240): top-k model modules for a task."""
        from kglids_spark.operators import pipelines as P

        return P.model_usage_by_task(self._pipes()[1], task).limit(k).toPandas()

    def get_most_popular_parameters_for_call(
        self, call_name: str, module: str, k: int | None = None
    ) -> pd.DataFrame:
        """Parameter-value frequency for one API incl. registry
        DEFAULTS for unset params (the reference's Calls-registry
        default semantics, Calls/__init__.py:15)."""
        from kglids_spark.operators import pipelines as P

        return P.most_popular_parameters(self._pipes()[1], call_name, module, k).toPandas()

    def fetch_eda_operations(
        self,
        eda_ops: DataFrame,
        kg_columns: DataFrame,
        query_columns: DataFrame,
        similar_column_id: str,
        main_column_name: str,
        analysis_type: str,
    ) -> pd.DataFrame:
        """EDA-operation recommendation for a similar KG column
        (reference kglids_server.py:135-284): chart ops attached to the
        column; bivariate/multivariate other-columns matched to the
        query table's same-type nearest-embedding column."""
        from kglids_spark.operators.eda import recommend_eda_operations

        return recommend_eda_operations(
            eda_ops, kg_columns, query_columns,
            similar_column_id, main_column_name, analysis_type,
        ).toPandas()
