"""BM25 sparse retrieval: lockstep vs an independent pure-Python BM25,
salt/partitioning invariance of the two-phase top-k, tie-break
determinism, and argument validation."""

import math

import pytest
from pyspark.sql import functions as F

from kglids_spark.operators.retrieval import (
    bm25_reference_score,
    bm25_scores,
    bm25_topk,
    rrf_fuse,
    tokenize_query,
)

CORPUS = {
    0: "spark join window join",
    1: "the quick spark shuffle",
    2: "window merge hash table scan",
    3: "JOIN   Window\tspark",  # case/whitespace normalization
    4: "unrelated words only here",
    5: "",  # empty doc: dl 0, never matches
    6: "spark spark spark spark join",  # tf saturation matters
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in CORPUS.items()]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_tokenize_query_matches_words_expr_convention():
    assert tokenize_query("  JOIN   Window\tspark ") == ["join", "window", "spark"]
    assert tokenize_query("") == []


def test_scores_lockstep_vs_pure_python(docs):
    q = "spark join"
    got = {
        r.id: r.score
        for r in bm25_scores(docs, [("q0", q)]).collect()
    }
    want = bm25_reference_score(CORPUS, q)
    assert set(got) == set(want)
    for i in got:
        assert math.isclose(got[i], want[i], rel_tol=1e-9), (i, got[i], want[i])


def test_query_term_frequency_weights(docs):
    # "join join" must score exactly twice "join" for every doc.
    single = {r.id: r.score for r in bm25_scores(docs, [("a", "join")]).collect()}
    double = {r.id: r.score for r in bm25_scores(docs, [("b", "join join")]).collect()}
    assert set(single) == set(double)
    for i in single:
        assert math.isclose(double[i], 2 * single[i], rel_tol=1e-12)


def test_topk_salt_and_partitioning_invariant(docs):
    q = [("q0", "spark join window")]
    base = [tuple(r) for r in bm25_topk(docs, q, k=3, n_salts=1).orderBy("rank").collect()]
    salted = [
        tuple(r)
        for r in bm25_topk(docs.repartition(7), q, k=3, n_salts=32)
        .orderBy("rank")
        .collect()
    ]
    assert base == salted
    assert [r[3] for r in base] == [1, 2, 3]


def test_topk_tie_break_by_id(spark):
    # identical docs → identical scores → rank order must follow id.
    rows = [(i, "alpha beta") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, [("q", "alpha")], k=4).orderBy("rank").collect()
    assert [r.id for r in out] == [0, 1, 2, 3]


def test_no_match_docs_absent_and_empty_query_rejected(docs):
    out = bm25_scores(docs, [("q", "zzz_nonexistent_term")]).collect()
    assert out == []
    with pytest.raises(ValueError, match="no tokens"):
        bm25_scores(docs, [("q", "   ")])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, [("q", "spark")], k=0)


def test_topk_plan_shape(docs):
    # default ranking path: ONE exchange, map-side WindowGroupLimit
    # pruning, no cartesian blow-up (plan-snapshot discipline).
    out = bm25_topk(docs, [("q", "spark join")], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_precomputed_corpus_stats_match_inline(docs):
    n = docs.count()
    avgdl = sum(
        len([w for w in tokenize_query(t)]) for t in CORPUS.values()
    ) / n
    q = [("q0", "spark join window")]
    inline = {(r.query_id, r.id): r.score for r in bm25_scores(docs, q).collect()}
    pre = {
        (r.query_id, r.id): r.score
        for r in bm25_scores(docs, q, corpus_stats=(n, avgdl)).collect()
    }
    assert set(inline) == set(pre)
    for key in inline:
        assert math.isclose(inline[key], pre[key], rel_tol=1e-12)


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id string, id long, rank int")


def test_rrf_hand_computed(spark):
    # doc 1 in both legs (ranks 1, 2); doc 2 lexical-only (rank 2);
    # doc 3 dense-only (rank 1).
    lex = _ranking(spark, [("q", 1, 1), ("q", 2, 2)])
    dense = _ranking(spark, [("q", 3, 1), ("q", 1, 2)])
    out = {r.id: (r.rrf, r.rank) for r in rrf_fuse([lex, dense], k=10).collect()}
    assert out[1] == (round(1 / 61 + 1 / 62, 6), 1)
    assert out[3] == (round(1 / 61, 6), 2)
    assert out[2] == (round(1 / 62, 6), 3)


def test_rrf_weights_and_tiebreak(spark):
    # equal fused scores → id breaks the tie; weight doubles a leg.
    lex = _ranking(spark, [("q", 5, 1), ("q", 4, 1)])  # invalid dup rank is
    # fine for the fuser: it only reads the rank value
    dense = _ranking(spark, [("q", 9, 3)])
    out = rrf_fuse([lex, dense], k=10, weights=[1.0, 2.0]).collect()
    by_id = {r.id: r for r in out}
    # weighted dense leg wins: 2/63 > 1/61
    assert by_id[9].rank == 1 and by_id[9].rrf == round(2.0 / 63, 6)
    assert by_id[4].rank == 2 and by_id[5].rank == 3  # tie → lower id first


def test_rrf_validation(spark):
    one = _ranking(spark, [("q", 1, 1)])
    with pytest.raises(ValueError, match="at least 2"):
        rrf_fuse([one])
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([one, one], weights=[1.0])


def test_idf_is_nonnegative_rare_term_outranks_common(docs):
    # 'merge' appears in 1 doc, 'spark' in 4 → a doc matching only the
    # rare term with equal tf/dl profile gets the larger idf weight.
    scores = {r.id: r.score for r in bm25_scores(docs, [("q", "merge")]).collect()}
    assert all(v > 0 for v in scores.values())
