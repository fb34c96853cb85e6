"""Pipeline abstraction + analytics (reference parity).

The reference parses Kaggle notebook scripts into per-pipeline RDF
named graphs — ast.parse → NodeVisitor building a doubly linked
statement list with control/data-flow edges
(kg_governor/pipeline_abstraction/abstract_pipelines.py:93-107,
pipeline_abstraction.py:34-61, datatypes.py:121-251), resolving calls
against a hand-built registry of pandas/sklearn APIs
(Calls/__init__.py), then answers SPARQL analytics over GraphDB
(api/template.py:558-1018).

Here the same capability is Spark-native:

- ``abstract_pipeline`` walks the AST (pure Python, driver- or
  executor-side) and emits flat statement rows: call path resolved
  through the import-alias table, root library, literal keyword
  parameters, and def/use variable sets per statement. No model
  weights, no service.
- Statements and pipeline metadata live in two DataFrames
  (``statements``: one row per call; ``pipelines``: one row per
  notebook) — the information content of the reference's named graphs,
  minus RDF. At lake scale, abstraction fans out with
  ``mapInPandas`` over a DataFrame of (pipeline_id, source) rows, one
  Arrow batch of scripts per task (the reference uses mp.Pool,
  abstract_pipelines.py:63-64).
- The SPARQL analytics templates become DataFrame queries with the
  reference's exact result shapes (Pipeline/Dataset/Author/
  Written_on/Number_of_votes/Score columns etc.).

Everything here is deterministic: the synthetic fixture corpus stands
in for Kaggle scripts, and the DuckDB oracles inline the SAME
pure-Python abstraction output, so the Spark analytics queries are
value-checked end-to-end.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# classifier registry (reference api/template.py:647-663 CLASSIFIERS —
# full dotted paths; URLs dropped)
CLASSIFIERS = {
    "RandomForestClassifier": "sklearn.ensemble",
    "SVC": "sklearn.svm",
    "KNeighborsClassifier": "sklearn.neighbors",
    "GradientBoostingClassifier": "sklearn.ensemble",
    "LogisticRegression": "sklearn.linear_model",
    "DecisionTreeClassifier": "sklearn.tree",
    "AdaBoostClassifier": "sklearn.ensemble",
    "SGDClassifier": "sklearn.linear_model",
    "MLPClassifier": "sklearn.neural_network",
    "XGBClassifier": "xgboost",
    "VotingClassifier": "sklearn.ensemble",
    "BaggingClassifier": "sklearn.ensemble",
    "RidgeClassifier": "sklearn.linear_model",
    "ExtraTreesClassifier": "sklearn.ensemble",
}

DEEP_LEARNING_LIBS = {"tensorflow", "torch", "keras", "transformers"}

# Public API defaults (first-5-params style, mirroring the reference's
# hand-built Call registry which carries "the names and default values
# for the first 5 params" per API —
# kg_governor/pipeline_abstraction/Calls/__init__.py:15,822-827).
# Values are literal reprs, the same encoding abstract_pipeline uses
# for explicit kwargs. Sources: published scikit-learn / xgboost docs.
CALL_DEFAULTS: dict[tuple[str, str], dict[str, str]] = {
    ("sklearn.ensemble", "RandomForestClassifier"): {
        "n_estimators": "100",
        "criterion": "'gini'",
        "max_depth": "None",
        "min_samples_split": "2",
        "min_samples_leaf": "1",
    },
    ("sklearn.linear_model", "LogisticRegression"): {
        "penalty": "'l2'",
        "dual": "False",
        "tol": "0.0001",
        "C": "1.0",
        "fit_intercept": "True",
    },
    ("sklearn.svm", "SVC"): {
        "C": "1.0",
        "kernel": "'rbf'",
        "degree": "3",
        "gamma": "'scale'",
        "coef0": "0.0",
    },
    ("sklearn.tree", "DecisionTreeClassifier"): {
        "criterion": "'gini'",
        "splitter": "'best'",
        "max_depth": "None",
        "min_samples_split": "2",
        "min_samples_leaf": "1",
    },
    ("sklearn.neighbors", "KNeighborsClassifier"): {
        "n_neighbors": "5",
        "weights": "'uniform'",
        "algorithm": "'auto'",
        "leaf_size": "30",
        "p": "2",
    },
    ("xgboost", "XGBClassifier"): {
        "n_estimators": "None",
        "max_depth": "None",
        "learning_rate": "None",
        "booster": "None",
        "gamma": "None",
    },
}


def defaulted_parameters(params: dict, module: str, call_name: str) -> dict:
    """Explicit literal kwargs overlaid on the registry defaults — the
    pure-Python twin of most_popular_parameters' per-call expansion
    (shared with the DuckDB oracle generator)."""
    merged = dict(CALL_DEFAULTS.get((module, call_name), {}))
    merged.update(params)
    return merged

# transformation registry (reference recommend_transformations,
# api/template.py:879-898, matches sklearn.preprocessing usage)
TRANSFORMATIONS = {
    "StandardScaler",
    "MinMaxScaler",
    "RobustScaler",
    "Normalizer",
    "LabelEncoder",
    "OneHotEncoder",
    "OrdinalEncoder",
    "PolynomialFeatures",
    "SimpleImputer",
}

STATEMENT_SCHEMA = (
    "pipeline_id string, stmt_idx int, call_path string, library string, "
    "module string, call_name string, params map<string,string>, "
    "reads array<string>, writes array<string>"
)

PIPELINE_SCHEMA = (
    "pipeline_id string, title string, dataset string, author string, "
    "written_on date, votes int, score double, tags array<string>"
)


@dataclass
class StatementRow:
    pipeline_id: str
    stmt_idx: int
    call_path: str
    library: str
    module: str
    call_name: str
    params: dict = field(default_factory=dict)
    reads: list = field(default_factory=list)
    writes: list = field(default_factory=list)

    def as_tuple(self) -> tuple:
        return (
            self.pipeline_id,
            self.stmt_idx,
            self.call_path,
            self.library,
            self.module,
            self.call_name,
            self.params,
            self.reads,
            self.writes,
        )


def _literal(node: ast.AST) -> str | None:
    """Literal keyword values only (the reference records parameter
    values from the AST the same way, pipeline_abstraction.py)."""
    try:
        return repr(ast.literal_eval(node))
    except (ValueError, SyntaxError):
        return None


def _dotted(node: ast.AST) -> str | None:
    parts: list[str] = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
        return ".".join(reversed(parts))
    return None


def abstract_pipeline(pipeline_id: str, source: str) -> list[StatementRow]:
    """AST → flat statement rows. Import aliases are resolved to full
    dotted paths; each Call expression becomes one row with its root
    library, literal kwargs, variables read (Name loads anywhere in the
    statement) and written (assignment targets) — the flat equivalent
    of the reference's statement graph nodes (datatypes.py:121-251).

    A forward data-flow pass mirrors the reference's variable
    resolution (pipeline_abstraction.py assigns each variable the
    library of the call that produced it): ``df = pd.read_csv(...)``
    makes later ``df.dropna()`` rows attribute to library ``pandas``,
    not to the variable name."""
    tree = ast.parse(source)
    aliases: dict[str, str] = {}
    var_lib: dict[str, str] = {}
    rows: list[StatementRow] = []
    idx = 0

    for stmt in ast.walk(tree):
        if isinstance(stmt, ast.Import):
            for a in stmt.names:
                aliases[a.asname or a.name.split(".")[0]] = a.name
        elif isinstance(stmt, ast.ImportFrom) and stmt.module:
            for a in stmt.names:
                aliases[a.asname or a.name] = f"{stmt.module}.{a.name}"

    def resolve(path: str) -> tuple[str, str]:
        """(full path, root library) through import aliases then the
        variable data-flow map."""
        head, _, rest = path.partition(".")
        if head in aliases:
            base = aliases[head]
            full = f"{base}.{rest}" if rest else base
            return full, full.split(".")[0]
        if head in var_lib:
            return path, var_lib[head]
        return path, head

    def flat_targets(targets) -> list[str]:
        out = []
        for t in targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
            elif isinstance(t, (ast.Tuple, ast.List)):
                out.extend(flat_targets(t.elts))
        return out

    for top in tree.body:
        writes = flat_targets(top.targets) if isinstance(top, ast.Assign) else []
        reads = sorted(
            {
                n.id
                for n in ast.walk(top)
                if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
            }
        )
        stmt_lib = None
        for call in (n for n in ast.walk(top) if isinstance(n, ast.Call)):
            raw = _dotted(call.func)
            if raw is None:  # method on a call result / subscript — skip
                continue
            path, library = resolve(raw)
            parts = path.split(".")
            params = {}
            for kw in call.keywords:
                if kw.arg is not None:
                    v = _literal(kw.value)
                    if v is not None:
                        params[kw.arg] = v
            rows.append(
                StatementRow(
                    pipeline_id=pipeline_id,
                    stmt_idx=idx,
                    call_path=path,
                    library=library,
                    module=".".join(parts[:-1]),
                    call_name=parts[-1],
                    params=params,
                    reads=reads,
                    writes=writes,
                )
            )
            idx += 1
            stmt_lib = stmt_lib or library
        if stmt_lib is not None:
            for w in writes:
                var_lib[w] = stmt_lib
    return rows


def abstract_pipelines_df(spark: SparkSession, scripts: DataFrame) -> DataFrame:
    """Distributed abstraction: ``scripts`` is (pipeline_id, source);
    each Arrow batch of scripts is parsed in one task (mapInPandas —
    the Spark-native replacement for the reference's mp.Pool fan-out,
    abstract_pipelines.py:63-64)."""

    def parse_batch(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for pid, src in zip(pdf["pipeline_id"], pdf["source"]):
                out.extend(r.as_tuple() for r in abstract_pipeline(pid, src))
            yield pd.DataFrame(
                out,
                columns=[
                    "pipeline_id",
                    "stmt_idx",
                    "call_path",
                    "library",
                    "module",
                    "call_name",
                    "params",
                    "reads",
                    "writes",
                ],
            )

    return scripts.mapInPandas(parse_batch, STATEMENT_SCHEMA)


# ---------------------------------------------------------------------------
# analytics (reference api/template.py:558-1018, same result shapes)

def _pipe_cols() -> list:
    # built lazily: Column construction needs an active SparkContext
    return [
        F.col("title").alias("Pipeline"),
        F.col("dataset").alias("Dataset"),
        F.col("author").alias("Author"),
        F.col("written_on").alias("Written_on"),
        F.col("votes").alias("Number_of_votes"),
        F.col("score").alias("Score"),
    ]


def pipelines_info(pipelines: DataFrame, author: str = "") -> DataFrame:
    p = pipelines
    if author:
        p = p.filter(F.col("author") == author)
    return p.select(*_pipe_cols()).orderBy(F.desc("Number_of_votes"), "Pipeline")


def most_recent_pipeline(pipelines: DataFrame, dataset: str = "") -> DataFrame:
    p = pipelines
    if dataset:
        p = p.filter(F.col("dataset") == dataset)
    return p.select(*_pipe_cols()).orderBy(F.desc("Written_on"), "Pipeline").limit(1)


def top_k_scoring_pipelines(
    pipelines: DataFrame, dataset: str = "", k: int | None = None
) -> DataFrame:
    p = pipelines
    if dataset:
        p = p.filter(F.col("dataset") == dataset)
    out = p.select(*_pipe_cols()).orderBy(F.desc("Score"), "Pipeline")
    return out.limit(k) if k else out


def search_classifier(
    pipelines: DataFrame, statements: DataFrame, dataset: str = ""
) -> DataFrame:
    """DISTINCT (Dataset, Pipeline, Classifier, Score) for every known
    classifier call (reference api/template.py:666-711: a UNION branch
    per classifier; here one isin filter)."""
    # pairwise (call_name, module) match — two independent isin()s would
    # admit mismatched cross-products like SVC + sklearn.ensemble, which
    # the reference's per-classifier UNION branches never produce
    pair_cond = F.lit(False)
    for cname, mod in CLASSIFIERS.items():
        pair_cond = pair_cond | ((F.col("call_name") == cname) & (F.col("module") == mod))
    hits = statements.filter(pair_cond).select(
        "pipeline_id", F.col("call_name").alias("Classifier")
    )
    p = pipelines
    if dataset:
        p = p.filter(F.col("dataset") == dataset)
    return (
        hits.join(F.broadcast(p), "pipeline_id")
        .select(
            F.col("dataset").alias("Dataset"),
            F.col("title").alias("Pipeline"),
            "Classifier",
            F.col("score").alias("Score"),
        )
        .distinct()
        .orderBy(F.desc("Score"), "Classifier")
    )


def hyperparameters(
    statements: DataFrame, pipelines: DataFrame, pipeline_title: str, classifier: str
) -> DataFrame:
    """Literal kwargs of a classifier call inside one pipeline
    (reference get_hyperparameters, api/template.py:714-738 — the
    RDF-star <<stmt hasParameter p>> withParameterValue v pattern
    becomes map explode)."""
    pid = pipelines.filter(F.col("title") == pipeline_title).select("pipeline_id")
    return (
        statements.join(F.broadcast(pid), "pipeline_id")
        .filter(F.col("call_name") == classifier)
        .select(F.explode("params").alias(f"{classifier}_hyperparameter", "Value"))
        .distinct()
        .orderBy(f"{classifier}_hyperparameter")
    )


def library_usage(
    statements: DataFrame, pipelines: DataFrame, dataset: str = "", k: int | None = None
) -> DataFrame:
    """(Library, Usage=count distinct pipelines), excluding builtins
    (reference get_library_usage, api/template.py:741-767 — the
    STRAFTER/STRBEFORE URL surgery becomes the `library` column)."""
    s = statements.filter(~F.col("library").isin("builtin", ""))
    if dataset:
        pids = pipelines.filter(F.col("dataset") == dataset).select("pipeline_id")
        s = s.join(F.broadcast(pids), "pipeline_id")
    out = (
        s.groupBy(F.col("library").alias("Library"))
        .agg(F.count_distinct("pipeline_id").alias("Usage"))
        .orderBy(F.desc("Usage"), "Library")
    )
    return out.limit(k) if k else out


def top_used_libraries(
    statements: DataFrame, pipelines: DataFrame, task: str = "classification"
) -> DataFrame:
    """DISTINCT (Library, Module, Pipeline, Dataset) for pipelines
    tagged with ``task`` (reference get_top_used_libraries,
    api/template.py:782-816)."""
    tagged = pipelines.filter(F.array_contains("tags", task)).select(
        "pipeline_id", F.col("title").alias("Pipeline"), F.col("dataset").alias("Dataset")
    )
    return (
        statements.filter(~F.col("library").isin("builtin", ""))
        .join(F.broadcast(tagged), "pipeline_id")
        .select(
            F.col("library").alias("Library"),
            F.col("module").alias("Module"),
            "Pipeline",
            "Dataset",
        )
        .distinct()
        .orderBy("Library", "Module", "Pipeline")
    )


def pipelines_calling_libraries(
    statements: DataFrame, pipelines: DataFrame, components: list[str]
) -> DataFrame:
    """Pipelines whose statements call EVERY named component — dotted
    path suffix match (reference get_pipelines_calling_libraries,
    api/template.py:817-848: one BGP per component = AND semantics)."""
    matched = None
    for comp in components:
        hit = (
            statements.filter(
                (F.col("call_path") == comp) | F.col("call_path").endswith("." + comp)
            )
            .select("pipeline_id")
            .distinct()
        )
        matched = hit if matched is None else matched.join(hit, "pipeline_id")
    return (
        pipelines.join(matched, "pipeline_id")
        .select(
            F.col("title").alias("Pipeline"),
            F.col("dataset").alias("Dataset"),
            F.col("author").alias("Author"),
            F.col("score").alias("Score"),
            F.col("votes").alias("Number_of_votes"),
        )
        .orderBy(F.desc("Score"), "Pipeline")
    )


def pipelines_for_deep_learning(statements: DataFrame, pipelines: DataFrame) -> DataFrame:
    dl = (
        statements.filter(F.col("library").isin(list(DEEP_LEARNING_LIBS)))
        .select("pipeline_id")
        .distinct()
    )
    return (
        pipelines.join(dl, "pipeline_id")
        .select(*_pipe_cols())
        .orderBy(F.desc("Score"), "Pipeline")
    )


def pipelines_by_tags(pipelines: DataFrame, tag: str = "") -> DataFrame:
    p = pipelines.select(F.explode("tags").alias("Tag"), "pipeline_id")
    if tag:
        p = p.filter(F.col("Tag") == tag)
    return (
        p.groupBy("Tag")
        .agg(F.count("pipeline_id").alias("Number_of_pipelines"))
        .orderBy(F.desc("Number_of_pipelines"), "Tag")
    )


def model_usage_by_task(statements: DataFrame, task: str = "classification") -> DataFrame:
    """(Module, Usage) of model constructors for a task family —
    classification = call names ending in Classifier, regression in
    Regressor (reference plot_top_k_classifiers/_regressors,
    api/template.py:925-994, minus the matplotlib bar chart)."""
    suffix = {"classification": "Classifier", "regression": "Regressor"}.get(task)
    if suffix is None:
        raise ValueError("task must be 'classification' or 'regression'")
    return (
        statements.filter(F.col("call_name").endswith(suffix))
        .groupBy(F.concat_ws(".", "module", "call_name").alias("Module"))
        .agg(F.count(F.lit(1)).alias("Usage"))
        .orderBy(F.desc("Usage"), "Module")
    )


def popular_parameters(
    statements: DataFrame, library: str, parameters: str | list = "all"
) -> DataFrame:
    """(Parameter, Value, Usage) frequency of literal kwargs across all
    calls into ``library`` (reference get_most_popular_parameters is an
    unimplemented stub, api/api.py:135-136 — this realizes it)."""
    s = statements.filter(F.col("library") == library).select(
        F.explode("params").alias("Parameter", "Value")
    )
    if parameters != "all":
        s = s.filter(F.col("Parameter").isin(list(parameters)))
    return (
        s.groupBy("Parameter", "Value")
        .agg(F.count(F.lit(1)).alias("Usage"))
        .orderBy(F.desc("Usage"), "Parameter", "Value")
    )


def most_popular_parameters(
    statements: DataFrame, call_name: str, module: str, k: int | None = None
) -> DataFrame:
    """(Parameter, Value, Usage) across every call of a given API,
    counting DEFAULTED parameters too: a call that leaves n_estimators
    unset contributes (n_estimators, <registry default>) — realizing
    the reference's get_most_popular_parameters (api/api.py:135-136, a
    stub there) with the Calls-registry default semantics
    (Calls/__init__.py:15: 'names and default values for the first 5
    params').

    Plan shape: explicit kwargs explode JVM-side; the defaults table is
    a broadcast cross join filtered by map_contains_key — no Python in
    the row path, scales with the statements table."""
    spark = statements.sparkSession
    calls = statements.filter(
        (F.col("call_name") == call_name) & (F.col("module") == module)
    ).select("pipeline_id", "stmt_idx", "params")
    explicit = calls.select(F.explode("params").alias("Parameter", "Value"))
    defaults = CALL_DEFAULTS.get((module, call_name), {})
    if defaults:
        ddf = spark.createDataFrame(
            list(defaults.items()), "Parameter string, Value string"
        )
        defaulted = (
            calls.join(F.broadcast(ddf))
            .filter(~F.map_contains_key("params", F.col("Parameter")))
            .select("Parameter", "Value")
        )
        explicit = explicit.unionByName(defaulted)
    out = (
        explicit.groupBy("Parameter", "Value")
        .agg(F.count(F.lit(1)).alias("Usage"))
        .orderBy(F.desc("Usage"), "Parameter", "Value")
    )
    return out.limit(k) if k else out


def pipeline_usage_by_task(pipelines: DataFrame) -> DataFrame:
    """Per-task pipeline counts, with 'deep learning' and 'neural
    networks' merged as in the reference (show_pipeline_usage_by_task,
    api/api.py:196-228 — data only, no pie chart)."""
    tags = pipelines.select(F.explode("tags").alias("Task"), "pipeline_id")
    tags = tags.withColumn(
        "Task",
        F.when(F.col("Task") == "neural networks", "deep learning").otherwise(F.col("Task")),
    )
    return (
        tags.groupBy("Task")
        .agg(F.count_distinct("pipeline_id").alias("Number_of_pipelines"))
        .orderBy(F.desc("Number_of_pipelines"), "Task")
    )


def recommend_transformations(statements: DataFrame, pipelines: DataFrame) -> DataFrame:
    """DISTINCT transformation calls ranked by pipeline score
    (reference recommend_transformations, api/template.py:879-898;
    Table column dropped — no table linkage without the data lake)."""
    hits = statements.filter(F.col("call_name").isin(list(TRANSFORMATIONS))).select(
        "pipeline_id", F.col("call_name").alias("Transformation")
    )
    return (
        hits.join(F.broadcast(pipelines), "pipeline_id")
        .select(
            "Transformation",
            F.col("title").alias("Pipeline"),
            F.col("dataset").alias("Dataset"),
            F.col("score").alias("Score"),
        )
        .distinct()
        .orderBy(F.desc("Score"), "Transformation")
    )
