"""Deterministic word-vector + column-profile fixture for reference
score parity (VERDICT r2 "What's missing #4").

The reference scores label similarity with GloVe word vectors
(kg_governor/data_global_schema_builder/utils/word_embeddings.py:47-75)
and content similarity with learned CoLR column embeddings + scaling
factors (workers.py:111-121). The weights are absent from the checkout,
so the engine accepts a USER-SUPPLIED word→vector table and
per-column embedding table and runs the reference's exact formulae over
them (operators/ref_scores.py). This module is the deterministic test
instance: a small md5-derived vocabulary (dim 4 — the formulae are
dimension-agnostic; the reference uses 300) and column profiles chosen
to hit every branch of get_distance_between_column_labels:

- exact sanitized-label match → 1.0
- one empty label → 0.0
- common-token removal (both sides multi-token)
- removal emptying one side → revert to full token lists
- removal emptying BOTH sides → 1.0 (empty combination set)
- token missing from the vocabulary → 0.0
- plain mean-pairwise-dot over unit vectors
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import SparkSession

VEC_DIM = 4

VOCAB = [
    "active", "address", "bar", "customer", "date", "first", "flag", "foo",
    "has", "id", "is", "last", "name", "order", "price", "unit", "usd",
]
# deliberately NOT in VOCAB: "zyxqq" (missing-vector branch → score 0)


def _mu(s: str) -> float:
    """md5-derived uniform in [-1, 1), rounded so the literal SQL stays
    short and both engines consume the exact same doubles."""
    h = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
    return round(h / 2.0**31 - 1.0, 6)


def _vec(word: str, dim: int = VEC_DIM) -> list[float]:
    return [_mu(f"wv:{word}:{d}") for d in range(dim)]


# (word, raw_vector) — ingest normalizes to unit length, as the
# reference does at load (word_embeddings.py:21-33)
WORD_VECTORS: list[tuple] = [(w, _vec(w)) for w in VOCAB]


def _label(name: str) -> str:
    """Pure-python mirror of functions.scalar.generate_label (F1), used
    only to precompute the oracle's label literals."""
    s = re.sub(r"\.csv$", "", name)
    s = re.sub(r"([a-z])([A-Z])", r"\1 \2", s)
    s = re.sub(r"[^a-zA-Z0-9]", " ", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip().lower()


# (column_id, table_id, column_name, data_type, embedding, scaling, true_ratio)
# column_ids sort c* < d* so the triangular join pairs every t1 column
# with every same-dtype t2 column exactly once.
PROFILES: list[tuple] = [
    ("c1", "t1", "customer_id", "string", _vec("emb:c1"), 0.05, None),
    ("c2", "t1", "customer name", "string", _vec("emb:c2"), 0.10, None),
    ("c3", "t1", "unit price", "string", _vec("emb:c3"), 0.02, None),
    ("c4", "t1", "first last", "string", _vec("emb:c4"), 0.20, None),
    ("c5", "t1", "zyxqq foo", "string", _vec("emb:c5"), 0.15, None),
    ("c6", "t1", "###", "string", _vec("emb:c6"), 0.08, None),
    ("c7", "t1", "is_active", "boolean", None, None, 0.3),
    ("d1", "t2", "CustomerId", "string", _vec("emb:d1"), 0.07, None),
    ("d2", "t2", "customer address", "string", _vec("emb:d2"), 0.12, None),
    ("d3", "t2", "unit price usd", "string", _vec("emb:d3"), 0.03, None),
    ("d4", "t2", "last first", "string", _vec("emb:d4"), 0.18, None),
    ("d5", "t2", "bar foo", "string", _vec("emb:d5"), 0.09, None),
    ("d6", "t2", "order date", "string", _vec("emb:d6"), 0.11, None),
    ("d7", "t2", "has_flag", "boolean", None, None, 0.55),
]

PROFILE_SCHEMA = (
    "column_id string, table_id string, column_name string, data_type string, "
    f"embedding array<double>, scaling_factor double, true_ratio double"
)
WORD_VECTOR_SCHEMA = "word string, vector array<double>"


def load_fixture(spark: SparkSession):
    return (
        spark.createDataFrame(PROFILES, PROFILE_SCHEMA),
        spark.createDataFrame(WORD_VECTORS, WORD_VECTOR_SCHEMA),
    )
