"""Round-2 additions: EDA-operation recommendation, popular-parameters
with registry defaults, and twin-lockstep pins for the four md5-twin /
xxhash64-production operator pairs (VERDICT r1 #9: the no_oracle
production paths stay pinned to their value-verified twins)."""

import pytest
from pyspark.sql import functions as F

from kglids_spark.operators import ann, dedup, pipelines as P, text
from kglids_spark.operators.eda import recommend_eda_operations
from kglids_spark.sources import eda_fixture as EF


# ---------------------------------------------------------------------------
# EDA operations

def test_eda_recommendations_fixture_semantics(spark):
    ops, kcols, qcols = EF.load_eda_tables(spark)

    uni = recommend_eda_operations(
        ops, kcols, qcols, EF.SIMILAR_COLUMN_ID, EF.MAIN_COLUMN_NAME, "univariate"
    ).collect()
    # e1/e2 attached to price; e8 (qty-only) excluded
    assert {(r.eda_id, r.chart_type) for r in uni} == {("e1", "histogram"), ("e2", "boxplot")}
    assert all(r.matched_column is None for r in uni)

    bi = recommend_eda_operations(
        ops, kcols, qcols, EF.SIMILAR_COLUMN_ID, EF.MAIN_COLUMN_NAME, "bivariate"
    ).collect()
    got = {(r.eda_id, r.secondary_column_id, r.matched_column) for r in bi}
    # e3: qty → nearest int column that isn't 'amount' is 'units';
    # e5: region → nearest string is 'city'; e4 (day) has no date
    # column in the query table → dropped
    assert got == {
        ("e3", "kg.sales.qty", "units"),
        ("e5", "kg.sales.region", "city"),
    }

    multi = recommend_eda_operations(
        ops, kcols, qcols, EF.SIMILAR_COLUMN_ID, EF.MAIN_COLUMN_NAME, "multivariate"
    ).collect()
    by_id = {}
    for r in multi:
        by_id.setdefault(r.eda_id, set()).add((r.secondary_column_id, r.matched_column))
    # heatmap (e6) is whole-table: kept with NULL matches
    assert by_id["e6"] == {(None, None)}
    # bubble (e7) matches each other column independently
    assert by_id["e7"] == {("kg.sales.qty", "units"), ("kg.sales.region", "city")}


# ---------------------------------------------------------------------------
# popular parameters with defaults

def test_most_popular_parameters_includes_defaults(spark):
    from kglids_spark.sources.pipelines_fixture import load_pipelines

    _, stmts = load_pipelines(spark)
    got = {
        (r.Parameter, r.Value): r.Usage
        for r in P.most_popular_parameters(
            stmts, "RandomForestClassifier", "sklearn.ensemble"
        ).collect()
    }
    # p1 sets n_estimators=100, max_depth=8, random_state=42 explicitly
    assert got[("n_estimators", "100")] == 1
    assert got[("max_depth", "8")] == 1
    assert got[("random_state", "42")] == 1
    # unset registry params contribute their public defaults
    assert got[("criterion", "'gini'")] == 1
    assert got[("min_samples_split", "2")] == 1
    assert got[("min_samples_leaf", "1")] == 1
    # the explicit max_depth suppresses the default None
    assert ("max_depth", "None") not in got


def test_most_popular_parameters_unregistered_call(spark):
    from kglids_spark.sources.pipelines_fixture import load_pipelines

    _, stmts = load_pipelines(spark)
    got = {
        (r.Parameter, r.Value)
        for r in P.most_popular_parameters(
            stmts, "LogisticRegression", "sklearn.linear_model"
        ).collect()
    }
    assert ("C", "0.5") in got            # explicit overrides default C=1.0
    assert ("C", "1.0") not in got
    assert ("penalty", "'l2'") in got     # defaulted


# ---------------------------------------------------------------------------
# twin lockstep: md5 twins vs xxhash64 production paths

@pytest.fixture(scope="module")
def clone_docs(spark):
    """30 documents with entirely disjoint vocabularies plus 3 planted
    exact clones — the definite cases every hash family must agree on:
    clone pairs are found (signature match = 1.0, Hamming = 0), and
    disjoint-vocabulary docs can never be 0.5-similar."""
    rows = []
    for i in range(30):
        words = " ".join(f"w{i}x{j}" for j in range(40))
        rows.append((i, words))
    for src, dst in [(0, 100), (1, 101), (2, 102)]:
        rows.append((dst, rows[src][1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


CLONE_PAIRS = {(0, 100), (1, 101), (2, 102)}


def test_minhash_twin_lockstep(clone_docs):
    prod = dedup.minhash_lsh_pairs(clone_docs, num_perm=8, bands=4, threshold=0.5)
    twin = dedup.minhash_lsh_pairs_md5(clone_docs, num_perm=8, bands=4, threshold=0.5)
    prod_pairs = {(r.id1, r.id2): r.est_jaccard for r in prod.collect()}
    twin_pairs = {(r.id1, r.id2): r.est_jaccard for r in twin.collect()}
    assert set(prod_pairs) == CLONE_PAIRS
    assert set(twin_pairs) == CLONE_PAIRS
    assert all(v == 1.0 for v in prod_pairs.values())
    assert all(v == 1.0 for v in twin_pairs.values())
    # structural lockstep: same join count in both optimized plans
    def joins(df):
        return df._jdf.queryExecution().optimizedPlan().toString().count("Join")
    assert joins(prod) == joins(twin)


def test_simhash_twin_lockstep(clone_docs):
    prod_pairs = {
        (r.id1, r.id2) for r in dedup.simhash_pairs(clone_docs, max_hamming=3).collect()
    }
    twin_pairs = {
        (r.id1, r.id2) for r in dedup.simhash_pairs_md5(clone_docs, max_hamming=3).collect()
    }
    # 64-bit production: disjoint vocabularies can't land within
    # Hamming 3, so the result is EXACTLY the clones
    assert prod_pairs == CLONE_PAIRS
    # 16-bit portable twin: all clones found (Hamming 0); random
    # collisions are possible by design at 16 bits
    assert CLONE_PAIRS <= twin_pairs


def test_fingerprint_twin_lockstep(clone_docs):
    both = clone_docs.select(
        "doc_id",
        text.fingerprint_expr("text").alias("fp_prod"),
        text.fingerprint_md5_expr("text").alias("fp_twin"),
    ).collect()
    prod = {r.doc_id: r.fp_prod for r in both}
    twin = {r.doc_id: r.fp_twin for r in both}
    for a, b in CLONE_PAIRS:
        assert prod[a] == prod[b]
        assert twin[a] == twin[b]
    # grouping by fingerprint yields the same duplicate groups
    def groups(fps):
        by_fp = {}
        for k, v in fps.items():
            by_fp.setdefault(v, set()).add(k)
        return {frozenset(g) for g in by_fp.values() if len(g) > 1}
    assert groups(prod) == groups(twin)


def test_ann_lsh_twin_lockstep(spark):
    import math

    dim = 8
    rows = [
        (i, [math.sin(0.7 * (i + 1) * (j + 1)) for j in range(dim)], 0) for i in range(40)
    ]
    rows.append((999, rows[5][1], 0))  # exact duplicate of vec 5
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    queries = corpus.filter(F.col("vec_id").isin(5, 999)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    prod = ann.lsh_knn_join(queries, corpus, k=3, n_planes=4, dim=dim)
    twin = ann.lsh_knn_join_md5(queries, corpus, k=3, n_planes=4, dim=dim)
    for df in (prod, twin):
        top1 = {r.q_id: (r.c_id, r.cosine) for r in df.filter(F.col("rank") == 1).collect()}
        # the planted duplicate is each other's nearest neighbour at
        # cosine 1.0 in BOTH hash families (same bucket, same re-rank)
        assert top1[5][0] == 999 and top1[5][1] == pytest.approx(1.0)
        assert top1[999][0] == 5 and top1[999][1] == pytest.approx(1.0)
    def joins(df):
        return df._jdf.queryExecution().optimizedPlan().toString().count("Join")
    assert joins(prod) == joins(twin)


def test_ivf_assign_pandas_matches_expr(spark):
    """The Arrow/numpy IVF assignment (scale path) must agree with the
    Catalyst expression path (oracle path) everywhere off exact ties."""
    import math

    from kglids_spark.operators.ann import ivf_assign

    dim = 16
    vecs = spark.createDataFrame(
        [
            (i, [math.sin(0.31 * (i + 1) * (j + 1)) for j in range(dim)])
            for i in range(500)
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [[math.cos(0.17 * (c + 1) * (j + 1)) for j in range(dim)] for c in range(12)]
    a = {r.vec_id: r.ivf_list for r in ivf_assign(vecs, cents, method="expr").collect()}
    b = {r.vec_id: r.ivf_list for r in ivf_assign(vecs, cents, method="pandas").collect()}
    assert a == b


def test_lsh_bucket_pandas_matches_expr(spark):
    """The Arrow/numpy LSH bucket (production path) must agree with the
    literal-expression path everywhere off exact hyperplane ties; the
    two differ only in float summation order (~1e-15)."""
    import math

    from pyspark.sql import functions as F

    from kglids_spark.operators.ann import (
        gaussian_planes,
        lsh_bucket_pandas_udf,
        lsh_bucket_planes_expr,
    )

    dim = 64
    vecs = spark.createDataFrame(
        [
            (i, [math.sin(0.23 * (i + 1) * (j + 1)) for j in range(dim)])
            for i in range(400)
        ],
        "vec_id long, embedding array<double>",
    )
    planes = gaussian_planes(8, dim, 42)
    a = {
        r.vec_id: r.b
        for r in vecs.select(
            "vec_id", lsh_bucket_planes_expr(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    b = {
        r.vec_id: r.b
        for r in vecs.select(
            "vec_id", lsh_bucket_pandas_udf(planes)(F.col("embedding")).alias("b")
        ).collect()
    }
    assert a == b
