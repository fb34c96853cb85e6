"""Unit tests for the hashed-n-gram logistic-regression quality
classifier (kglids_spark/operators/quality_classifier.py): zero-model
gradient vs hand math, full training lockstep against an independent
pure-Python/numpy GD, and scoring conventions."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kglids_spark.operators import quality_classifier as QC

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("is_en", BooleanType()),
    ]
)

_ROWS = [
    (1, "the cat sat on the mat", True),
    (2, "the dog ran in the park", True),
    (3, "a bird flew over the house", True),
    (4, "el gato duerme en la alfombra", False),
    (5, "le chien court dans le parc", False),
    (6, "one", False),
    (7, None, False),  # NULL text: no features, scores at the prior
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_ROWS, _SCHEMA)


# ---- independent reference ------------------------------------------------


def _py_grams(text):
    if text is None:
        return []
    words = [w for w in " ".join(text.lower().split()).split(" ") if w != ""]
    return words + [f"{a} {b}" for a, b in zip(words, words[1:])]


def _py_features(rows, width=2):
    """doc -> {bucket: tf} on the md5 path."""
    out = {}
    for _id, text, _y in rows:
        grams = _py_grams(text)
        if not grams:
            continue
        cts = {}
        for g in grams:
            b = hashlib.md5(g.encode()).hexdigest()[:width]
            cts[b] = cts.get(b, 0) + 1
        n = sum(cts.values())
        out[_id] = {b: c / n for b, c in cts.items()}
    return out

def _py_train(rows, lr=1.0, iters=8, lam=1e-4, width=2):
    """Independent full-batch GD identical in math to train_quality_lr."""
    X = _py_features(rows, width)
    y = {_id: 1.0 if is_en else 0.0 for _id, _t, is_en in rows if _id in X}
    n = len(X)
    w, b = {}, 0.0
    for _ in range(iters):
        resid = {}
        for _id, feats in X.items():
            m = sum(x * w.get(bk, 0.0) for bk, x in feats.items()) + b
            resid[_id] = 1.0 / (1.0 + math.exp(-m)) - y[_id]
        gw = {}
        for _id, feats in X.items():
            for bk, x in feats.items():
                gw[bk] = gw.get(bk, 0.0) + resid[_id] * x / n
        for bk, v in list(w.items()):
            gw[bk] = gw.get(bk, 0.0) + lam * v
        for bk, g in gw.items():
            w[bk] = w.get(bk, 0.0) - lr * g
        b -= lr * sum(resid.values()) / n
    return w, b, X


def test_zero_model_gradient_hand_math(spark, docs):
    """At w=0, b=0 the residual is exactly 0.5 - y."""
    feats = QC.quality_features(docs, hasher="md5", md5_width=2)
    labels = docs.select(
        F.col("doc_id").alias("id"), F.col("is_en").cast("double").alias("y")
    )
    gw, gb, n = QC.quality_lr_gradient(feats, labels)
    assert n == 6  # doc 7 has no features
    # bias gradient: mean(0.5 - y) over the 6 featured docs (3 en)
    assert gb == pytest.approx((3 * (0.5 - 1.0) + 3 * (0.5 - 0.0)) / 6, abs=1e-12)
    X = _py_features(_ROWS)
    want = {}
    for _id, feats_d in X.items():
        y = 1.0 if _id <= 3 else 0.0
        for bk, x in feats_d.items():
            want[bk] = want.get(bk, 0.0) + (0.5 - y) * x / 6
    assert set(gw) == set(want)
    for bk in want:
        assert gw[bk] == pytest.approx(want[bk], abs=1e-12), bk


def test_training_lockstep_with_numpy_reference(spark, docs):
    w, b = QC.train_quality_lr(
        docs, F.col("is_en"), hasher="md5", md5_width=2, iters=8
    )
    pw, pb, X = _py_train(_ROWS, iters=8)
    assert b == pytest.approx(pb, abs=1e-9)
    assert set(w) == set(pw)
    for bk in pw:
        assert w[bk] == pytest.approx(pw[bk], abs=1e-9), bk
    # and the scores: every doc matches the reference sigmoid(w.x + b)
    scores = {
        r["doc_id"]: r["quality_prob"]
        for r in QC.score_quality_lr(
            docs, w, b, hasher="md5", md5_width=2
        ).collect()
    }
    assert len(scores) == len(_ROWS)
    for _id, feats_d in X.items():
        m = sum(x * pw.get(bk, 0.0) for bk, x in feats_d.items()) + pb
        assert scores[_id] == pytest.approx(QC.sigmoid(m), abs=1e-9), _id
    # featureless doc 7 scores at the prior sigmoid(bias)
    assert scores[7] == pytest.approx(QC.sigmoid(pb), abs=1e-9)


def test_classifier_actually_separates(spark, docs):
    w, b = QC.train_quality_lr(
        docs, F.col("is_en"), hasher="md5", md5_width=2, iters=8
    )
    scores = {
        r["doc_id"]: r["quality_prob"]
        for r in QC.score_quality_lr(docs, w, b, hasher="md5", md5_width=2).collect()
    }
    for en_id in (1, 2, 3):
        for other_id in (4, 5):
            assert scores[en_id] > scores[other_id]


def test_features_l1_normalized(spark, docs):
    feats = QC.quality_features(docs, hasher="md5", md5_width=2)
    sums = feats.groupBy("id").agg(
        F.sum(F.col("c") / F.col("n")).alias("s"),
        F.sum("c").alias("tot"),
        F.first("n").alias("n"),
    ).collect()
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-12)
        assert r["tot"] == r["n"]


def test_pareto_sample_deterministic_and_monotone(spark):
    import hashlib

    rows = [(i, i / 100.0) for i in range(100)] + [(100, None)]
    scored = spark.createDataFrame(rows, "doc_id long, quality_prob double")
    s1 = QC.pareto_sample(scored, alpha=9.0, seed=3).collect()
    s2 = QC.pareto_sample(scored, alpha=9.0, seed=3).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    kept = {r["doc_id"] for r in s1}
    assert 100 not in kept  # NULL score dropped
    # independent reference: same hash-fraction inverse-CDF
    want = set()
    for i in range(100):
        h = int(hashlib.md5(f"pareto:3\x1f{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2.0 ** 32
        if u ** (-1.0 / 9.0) - 1.0 > 1.0 - i / 100.0:
            want.add(i)
    assert kept == want
    # a perfect score always survives (draw > 0 almost surely), and
    # high scores survive at a much higher rate than low scores
    lo = sum(1 for i in kept if i < 50)
    hi = sum(1 for i in kept if i >= 50)
    assert hi > lo
    assert 99 in kept
    with pytest.raises(ValueError, match="positive"):
        QC.pareto_sample(scored, alpha=0.0)
