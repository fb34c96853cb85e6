"""Sparse lexical retrieval: distributed BM25 top-k search.

Complements the dense ANN family (`operators/ann.py` — the Spark
re-expression of the reference's pgvector kNN layer,
kg_governor/data_profiling/src/column_embeddings + api/template.py's
`ORDER BY embedding <=> ? LIMIT k` shape) with the standard lexical
ranking function (Robertson & Zaragoza 2009; the Lucene/Elasticsearch
default).  A training-data curation stack needs both retrieval modes:
dense for semantic near-neighbours, sparse for exact-term audits
("which documents mention this benchmark string?") and for hybrid
retrieval.

Scale design (the plan, in order):

1. The corpus is tokenized MAP-SIDE (normalize → split — the same
   whitespace/case convention every dedup/text operator here uses) and
   immediately filtered to the query vocabulary with a broadcast
   literal set, so the only per-token shuffle carries tokens that can
   actually score: postings volume is bounded by
   |docs containing a query term| × |query vocab|, never the corpus
   token count.
2. Per-(doc, term) term frequencies and per-term document frequencies
   are map-side-combined groupBys over that filtered stream.
3. Corpus-level constants (N, avgdl) come from ONE column-pruned
   aggregate over doc lengths and join in as a broadcast 1-row frame —
   nothing is collected to the driver.
4. Top-k per query: Spark 4's WindowGroupLimit optimization already
   performs map-side top-k pruning for a rank-filtered window (each
   map task forwards at most k rows per query BEFORE the exchange —
   verified in the physical plan), so the default is ONE window.  For
   pathological per-query candidate skew beyond what that handles,
   ``n_salts > 1`` inserts an explicit salted pre-phase (partition key
   = (query, xxhash64(id) % n_salts), ≤ k rows per salt survive); both
   phases order by the SAME key (rounded score DESC, id ASC), so the
   pre-phase provably preserves the true global top-k.

Scores are rounded to 6 dp BEFORE ranking, with the id as the total
tie-break: BM25 is a float sum whose addition order differs across
engines/partitionings, so ranking raw IEEE sums is not reproducible —
ranking the rounded value is (the `ann_bruteforce_topk` discipline,
one notch stricter because sums here have no bit-parity guarantee).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kglids_spark.operators.text import words_expr

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse", "tokenize_query"]

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def tokenize_query(text: str) -> list[str]:
    """Driver-side twin of ``words_expr`` (normalize → whitespace
    split) so query tokens live in the same space as document tokens."""
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    return [w for w in norm.split(" ") if w]


def _doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, dl) token stream with empty tokens dropped and the
    document length carried on every row (computed once per doc,
    map-side — no second pass for dl)."""
    words = F.filter(words_expr(text_col), lambda w: w != "")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(words).alias("dl"),
        F.explode(words).alias("term"),
    )


def bm25_scores(
    df: DataFrame,
    queries: list[tuple[object, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """BM25 score of every (query, document) pair with ≥ 1 matching
    term → (query_id, id, score).  Lucene's idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (non-negative by
    construction); repeated query terms weight their contribution by
    the query term frequency.

    ONE corpus pass builds the query-filtered (id, term, tf, dl)
    frame; it is persisted (MEMORY_AND_DISK — bounded by candidate
    docs × query vocab, narrow rows) because both the per-term
    document frequencies and the score join consume it, and without
    the persist Spark re-runs the corpus scan + tf shuffle for the
    dfreq branch.  The result is eagerly localCheckpoint-ed so the
    cache releases immediately instead of leaking for the session —
    the ngram_jaccard_pairs discipline (dedup.py).

    Corpus constants (N, avgdl) need lengths for NON-matching docs
    too, so they cost one extra column-pruned scan; pass
    ``corpus_stats=(n_docs, avgdl)`` to amortize it across queries of
    the same corpus snapshot (the production pattern).  All
    query/model joins are broadcast; the only data-sized shuffles key
    on (id, term) and (query_id, id)."""
    if not queries:
        raise ValueError("bm25_scores: queries must be non-empty")
    from pyspark import StorageLevel

    spark = df.sparkSession

    # (query_id, term, qtf) — a handful of rows; broadcast everywhere.
    qrows = []
    for qid, qtext in queries:
        toks = tokenize_query(qtext)
        if not toks:
            raise ValueError(f"bm25_scores: query {qid!r} has no tokens")
        for t in sorted(set(toks)):
            qrows.append((qid, t, toks.count(t)))
    qdf = spark.createDataFrame(qrows, "query_id string, term string, qtf int")
    vocab = sorted({t for _, t, _ in qrows})

    # 1+2: map-side vocab filter, then map-side-combined tf / df.
    terms = _doc_terms(df, id_col, text_col).where(F.col("term").isin(vocab))
    tf = terms.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # 3: corpus constants as a broadcast 1-row frame (never collected).
    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
        stats = spark.createDataFrame(
            [(int(n_docs), float(avgdl))], "n_docs long, avgdl double"
        )
    else:
        words = F.filter(words_expr(text_col), lambda w: w != "")
        stats = df.select(F.size(words).alias("dl")).agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "id", (F.col("qtf") * idf * tf_sat).alias("contrib")
        )
    )
    scores = contrib.groupBy("query_id", "id").agg(F.sum("contrib").alias("score"))
    # materialize (bounded by candidate mass) so the tf cache releases
    # NOW rather than leaking for the session
    scores = scores.localCheckpoint(eager=True)
    tf.unpersist()
    return scores


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[object, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    n_salts: int = 1,
    score_dp: int = 6,
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-k documents per query → (query_id, id, score, rank), the
    sparse twin of ``ann.ivf_topk``.  Rank order is
    (round(score, score_dp) DESC, id ASC) — deterministic and
    reproducible across engines and partitionings (see module
    docstring); ``score`` in the result is the rounded value so the
    emitted frame carries exactly the ranked quantity.

    Default is the single rank-filtered window: Catalyst's
    WindowGroupLimit prunes to ≤ k rows per query PER MAP TASK before
    the exchange, so the per-query reducer sorts at most
    k × n_map_partitions finalists.  ``n_salts > 1`` adds the explicit
    salted pre-phase on top (see module docstring §4)."""
    if k < 1:
        raise ValueError(f"bm25_topk: k must be >= 1, got {k}")
    if n_salts < 1:
        raise ValueError(f"bm25_topk: n_salts must be >= 1, got {n_salts}")
    scored = bm25_scores(
        df, queries, id_col, text_col, k1, b, corpus_stats
    ).select("query_id", "id", F.round("score", score_dp).alias("score"))
    order = [F.col("score").desc(), F.col("id").asc()]
    if n_salts > 1:
        # per-(query, salt) local top-k under the FINAL ordering — any
        # row outside its salt's top-k is outside the global top-k.
        salted = Window.partitionBy(
            "query_id", F.pmod(F.xxhash64("id"), F.lit(n_salts))
        ).orderBy(*order)
        scored = (
            scored.withColumn("_r", F.row_number().over(salted))
            .where(F.col("_r") <= k)
            .drop("_r")
        )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    weights: list[float] | None = None,
    score_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of ≥ 2
    per-query rankings — the standard hybrid-retrieval combiner for a
    lexical (``bm25_topk``) and a dense (``ann.knn_join``/``ivf_topk``)
    leg: ``rrf(d) = Σ_legs w · 1/(k0 + rank_leg(d))``, documents absent
    from a leg contribute 0 → (query_id, id, rrf, rank).

    Each input is already a top-k output (≤ |queries|·k rows), so
    fusion is tiny by construction: a union + one map-side-combined
    groupBy + the rank-filtered window (WindowGroupLimit prunes
    map-side).  Ranks are integers, so every leg contribution
    ``w/(k0 + rank)`` is reproducible; the fused sum is rounded to
    ``score_dp`` before ranking with the id tie-break (the bm25_topk
    discipline — association order of a 3+-leg float sum is not
    engine-stable)."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least 2 rankings")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(weights)} weights for {len(rankings)} rankings"
        )
    legs = [
        r.select(
            "query_id",
            "id",
            (F.lit(w) / (F.lit(k0) + F.col("rank"))).alias("contrib"),
        )
        for r, w in zip(rankings, weights)
    ]
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    fused = allc.groupBy("query_id", "id").agg(
        F.round(F.sum("contrib"), score_dp).alias("rrf")
    )
    final = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
    )


def bm25_reference_score(
    corpus: dict[object, str],
    query: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> dict[object, float]:
    """Independent pure-Python BM25 (test lockstep twin — never used by
    the Spark path)."""
    toks = {i: tokenize_query(t) for i, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    qtoks = tokenize_query(query)
    out: dict[object, float] = {}
    for i, ws in toks.items():
        s = 0.0
        for t in sorted(set(qtoks)):
            tf = ws.count(t)
            if not tf:
                continue
            dfreq = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(ws) / avgdl))
            s += qtoks.count(t) * idf * sat
        if s:
            out[i] = s
    return out
