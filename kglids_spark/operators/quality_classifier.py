"""Self-trained document quality classifier: hashed-n-gram logistic
regression, trained with distributed full-batch gradient descent.

The published shape (GPT-3 / LLaMA / fastText-style quality filters):
featurize each document as a normalized bag of hashed word
uni+bigrams (the DSIR feature space — operators/dsir.py), fit a
binary logistic regression against a weak label (here: a corpus
predicate such as lang='en'; in production: curated-vs-crawl), and
score every document with sigmoid(w·x + b) for threshold or
pareto-sampling filtering. Entirely self-contained — no external
model weights, matching the repo's char-LM precedent
(text.char_lm_*), and an operator family the reference lacks (its
learned components ship as absent .pt checkpoints —
/root/reference/.MISSING_LARGE_BLOBS).

Scale shape:
- featurization is ONE map-side explode into a (doc, bucket) count
  aggregation; the per-doc total rides in via a partition-local
  window over the same id partitioning (no totals self-join, no
  second corpus pass — Catalyst reuses the id exchange for every
  downstream per-doc aggregation);
- each GD iteration is bounded shuffles over doc-count-sized frames
  plus a dictionary-sized gradient groupBy (<= buckets+1 rows) whose
  collect is bounded by the feature dimension — the
  ivf_train_iteration discipline (iterative, driver holds only the
  model); the compact counts frame persists once across iterations;
- the model rides into every margin/score computation as a broadcast
  join.

Feature x_db = c_db / n_d (L1-normalized term frequency), carried as
the raw count c and doc total n so every consumer can fold the
division into its own aggregation: sum_b (c/n)·w = (sum_b c·w)/n.

Gradient math (standard L2-regularized logistic loss, mean over N
labeled docs): grad_w[b] = (1/N) sum_d (sigmoid(m_d) - y_d) c_db/n_d
+ lam*w[b]; grad_b0 = (1/N) sum_d (sigmoid(m_d) - y_d). At w=0 the
sigmoid is exactly 0.5, which makes the FIRST step's gradient pure
SQL — the value-exact oracle (entry_queries.quality_lr_gradient_step).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kglids_spark.operators.dsir import _bucket_expr, _grams_expr

__all__ = [
    "quality_features",
    "quality_lr_gradient",
    "quality_lr_gradient_frame",
    "train_quality_lr",
    "score_quality_lr",
]


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
    buckets: int = 8192,
    md5_width: int = 2,
) -> DataFrame:
    """(id, bucket, c, n): hashed-n-gram counts per (document, bucket)
    with the document's total gram count n on every row — the
    L1-normalized feature is x = c/n (sums to 1 within a doc).
    Documents with no grams (empty/NULL text) produce no rows; they
    score through `score_quality_lr` at the bias-only probability."""
    feats = df.select(
        F.col(id_col).alias("id"), F.explode(_grams_expr(text_col)).alias("_g")
    ).select(
        "id", _bucket_expr(F.col("_g"), hasher, buckets, md5_width).alias("bucket")
    )
    counts = feats.groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    # partition-local total: one id exchange that every downstream
    # per-doc aggregation then reuses (vs a totals self-join, which
    # recomputes the corpus-sized count aggregation twice)
    return counts.withColumn("n", F.sum("c").over(Window.partitionBy("id")))


def _margin_frame(
    features: DataFrame, weights: dict | None, bias: float
) -> DataFrame:
    """(id, m): m = w·x + bias per doc with features. The model enters
    as a broadcast join (dictionary-sized); w=None means the zero
    model."""
    if weights:
        w_df = features.sparkSession.createDataFrame(
            [(k, float(v)) for k, v in weights.items()], ["bucket", "w"]
        )
        withw = features.join(F.broadcast(w_df), "bucket", "left").withColumn(
            "w", F.coalesce("w", F.lit(0.0))
        )
    else:
        withw = features.withColumn("w", F.lit(0.0))
    return withw.groupBy("id").agg(
        (
            F.sum(F.col("c") * F.col("w")) / F.first("n") + F.lit(float(bias))
        ).alias("m")
    )


def _residual_frame(
    features: DataFrame,
    labels: DataFrame,
    weights: dict | None,
    bias: float,
) -> DataFrame:
    """(id, r): r = sigmoid(w·x + bias) - y per labeled doc with
    features."""
    margins = _margin_frame(features, weights, bias).join(
        labels.select("id", "y"), "id"
    )
    return margins.select(
        "id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y")).alias("r")
    )


def quality_lr_gradient_frame(
    features: DataFrame,
    labels: DataFrame,
    n_docs: int,
    weights: dict | None = None,
    bias: float = 0.0,
) -> DataFrame:
    """(bucket, grad): the un-regularized weight gradient as a
    DataFrame, <= |buckets| rows — the distributable core of one GD
    step (and, at the zero model, the value-exact oracle query)."""
    resid = _residual_frame(features, labels, weights, bias)
    return (
        features.join(resid, "id")
        .groupBy("bucket")
        .agg(
            (
                F.sum(F.col("r") * F.col("c") / F.col("n"))
                / F.lit(float(n_docs))
            ).alias("grad")
        )
    )


def quality_lr_gradient(
    features: DataFrame,
    labels: DataFrame,
    weights: dict | None = None,
    bias: float = 0.0,
    lam: float = 0.0,
    n_docs: int | None = None,
) -> tuple[dict, float, int]:
    """One full-batch gradient of the logistic loss. ``features`` is
    the quality_features frame; ``labels`` is (id, y) with y in
    {0.0, 1.0}. ``weights`` maps bucket -> weight (missing = 0).
    Returns (grad_weights, grad_bias, n_docs); collects <= |buckets|+1
    rows (the feature dictionary), never the corpus."""
    if n_docs is None:
        n_docs = features.join(labels.select("id", "y"), "id").select(
            "id"
        ).distinct().count()
    grad_rows = quality_lr_gradient_frame(
        features, labels, n_docs, weights, bias
    ).collect()
    grad_w = {r["bucket"]: r["grad"] for r in grad_rows}
    if lam:
        for k, v in (weights or {}).items():
            grad_w[k] = grad_w.get(k, 0.0) + lam * v
    resid = _residual_frame(features, labels, weights, bias)
    grad_b = (
        resid.agg((F.sum("r") / F.lit(float(n_docs))).alias("g")).collect()[0]["g"]
    )
    return grad_w, grad_b, n_docs


def train_quality_lr(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
    buckets: int = 8192,
    md5_width: int = 2,
    lr: float = 1.0,
    iters: int = 20,
    lam: float = 1e-4,
) -> tuple[dict, float]:
    """Fit the classifier: ``label`` is a boolean Column over ``df``
    (e.g. F.col('lang') == 'en'). Returns (weights, bias). The compact
    counts frame is persisted once and reused across the bounded
    ``iters`` gradient steps; only dictionary-sized state crosses the
    driver each step."""
    from pyspark import StorageLevel

    feats = quality_features(
        df, text_col, id_col, hasher=hasher, buckets=buckets, md5_width=md5_width
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = df.select(
        F.col(id_col).alias("id"), label.cast("double").alias("y")
    )
    w: dict = {}
    b = 0.0
    try:
        # invariant across iterations: labeled docs that have features
        n_docs = feats.join(labels, "id").select("id").distinct().count()
        for _ in range(iters):
            gw, gb, _n = quality_lr_gradient(
                feats, labels, w, b, lam, n_docs=n_docs
            )
            for k, g in gw.items():
                w[k] = w.get(k, 0.0) - lr * g
            b -= lr * gb
    finally:
        feats.unpersist()
    return w, b


def score_quality_lr(
    df: DataFrame,
    weights: dict,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
    buckets: int = 8192,
    md5_width: int = 2,
) -> DataFrame:
    """(doc_id, quality_prob): sigmoid(w·x + b) per document. The
    model joins in as a broadcast (dictionary-sized); featureless
    docs (empty/NULL text) score sigmoid(bias) — the prior.

    The model's bucket keys must live in the SAME feature space the
    scorer hashes into (train and score with the same hasher/buckets/
    md5_width) — a key-type mismatch is refused up front rather than
    silently scoring every doc at the prior (or failing inside an
    ANSI cast deep in the join)."""
    if weights:
        k = next(iter(weights))
        if hasher == "xxhash64" and isinstance(k, str):
            raise ValueError(
                "model bucket keys are strings but hasher='xxhash64' "
                "produces int64 buckets — score with the hasher the "
                "model was trained with (hasher='md5'?)"
            )
        if hasher == "md5" and not isinstance(k, str):
            raise ValueError(
                "model bucket keys are ints but hasher='md5' produces "
                "hex-string buckets — score with the hasher the model "
                "was trained with (hasher='xxhash64'?)"
            )
    feats = quality_features(
        df, text_col, id_col, hasher=hasher, buckets=buckets, md5_width=md5_width
    )
    margins = _margin_frame(feats, weights, 0.0)
    all_ids = df.select(F.col(id_col).alias("id"))
    return (
        all_ids.join(margins, "id", "left")
        .select(
            F.col("id").alias(id_col),
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(float(bias)))
                    )
                )
            ).alias("quality_prob"),
        )
    )


def pareto_sample(
    scored: DataFrame,
    alpha: float = 9.0,
    seed: int = 0,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
) -> DataFrame:
    """GPT-3-style (Brown et al. 2020, Appendix A) stochastic quality
    sampling: keep a document iff a Pareto(alpha) draw exceeds
    1 - score — high-quality docs almost always survive, low-quality
    docs survive occasionally (preserving tail diversity a hard
    threshold destroys). The draw is DETERMINISTIC via the engine's
    md5 hash-fraction convention (inverse-CDF u^(-1/alpha) - 1 with
    u = (h + 0.5)/2^32, never 0), so the sample is reproducible
    across engines, runs, and partitionings. Pure map-side filter —
    zero shuffle. Returns the surviving rows plus the draw as
    ``pareto_draw``. NULL scores are dropped (no quality evidence)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f", F.lit(f"pareto:{seed}"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    draw = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return (
        scored.filter(F.col(score_col).isNotNull())
        .withColumn("pareto_draw", draw)
        .filter(F.col("pareto_draw") > (F.lit(1.0) - F.col(score_col)))
    )


def sigmoid(x: float) -> float:
    """Driver-side reference sigmoid (tests, thresholds)."""
    return 1.0 / (1.0 + math.exp(-x))
