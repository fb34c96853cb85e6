"""Unit tests for DSIR importance resampling
(kglids_spark/operators/dsir.py): independent pure-Python reference,
xxhash64/md5 twin lockstep, null/empty-text conventions, target_df vs
predicate equivalence, and Gumbel top-k determinism."""

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

from kglids_spark.operators import dsir

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("is_tgt", BooleanType()),
    ]
)

_ROWS = [
    (1, "the cat sat on the mat", True),
    (2, "the dog sat on the log", True),
    (3, "el gato duerme en la alfombra", False),
    (4, "one", False),  # single word: unigram only, no bigrams
    (5, "", False),  # empty text: no grams at all
    (6, None, False),  # NULL text: no grams at all
    (7, "the cat sat on the mat", False),  # dup of 1, raw side
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_ROWS, _SCHEMA)


def _py_grams(text):
    """Independent reference: normalized word uni+bigrams (bag)."""
    if text is None:
        return []
    words = [w for w in " ".join(text.lower().split()).split(" ") if w != ""]
    return words + [f"{a} {b}" for a, b in zip(words, words[1:])]


def _py_weights(rows, width=2, alpha=1.0):
    """Pure-Python DSIR weights on the md5 path (target = is_tgt)."""
    n_buckets = 16 ** width
    t_ct, r_ct = {}, {}
    for _id, text, tgt in rows:
        for g in _py_grams(text):
            b = hashlib.md5(g.encode()).hexdigest()[:width]
            r_ct[b] = r_ct.get(b, 0) + 1
            if tgt:
                t_ct[b] = t_ct.get(b, 0) + 1
    tt, tr = sum(t_ct.values()), sum(r_ct.values())
    out = {}
    for _id, text, _tgt in rows:
        grams = _py_grams(text)
        if not grams:
            out[_id] = (0, None)
            continue
        w = 0.0
        for g in grams:
            b = hashlib.md5(g.encode()).hexdigest()[:width]
            w += math.log((t_ct.get(b, 0) + alpha) / (tt + alpha * n_buckets))
            w -= math.log((r_ct.get(b, 0) + alpha) / (tr + alpha * n_buckets))
        out[_id] = (len(grams), w)
    return out


def test_doc_weights_match_pure_python_reference(docs):
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir.dsir_doc_weights(
            docs, target=F.col("is_tgt"), hasher="md5", md5_width=2
        ).collect()
    }
    want = _py_weights(_ROWS)
    assert set(got) == set(want)
    for _id in want:
        assert got[_id][0] == want[_id][0], _id
        if want[_id][1] is None:
            assert got[_id][1] is None, _id
        else:
            assert got[_id][1] == pytest.approx(want[_id][1], abs=1e-9), _id
    # sanity on the semantics: en-like target docs score higher than
    # the Spanish raw-only doc
    assert got[1][1] > got[3][1]


def test_doc_weights_null_and_empty_text_keep_rows(docs):
    out = dsir.dsir_doc_weights(docs, target=F.col("is_tgt")).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == len(_ROWS)
    for _id in (5, 6):
        assert by_id[_id]["n_feats"] == 0
        assert by_id[_id]["logw"] is None


def test_hash_twin_lockstep(docs):
    """xxhash64 and md5 paths agree on everything hash-independent:
    n_feats per doc, the null pattern, and identical-text docs getting
    identical weights."""
    xx = {
        r["doc_id"]: r
        for r in dsir.dsir_doc_weights(
            docs, target=F.col("is_tgt"), hasher="xxhash64", buckets=256
        ).collect()
    }
    md = {
        r["doc_id"]: r
        for r in dsir.dsir_doc_weights(
            docs, target=F.col("is_tgt"), hasher="md5", md5_width=2
        ).collect()
    }
    assert set(xx) == set(md)
    for _id in xx:
        assert xx[_id]["n_feats"] == md[_id]["n_feats"]
        assert (xx[_id]["logw"] is None) == (md[_id]["logw"] is None)
    for path in (xx, md):
        assert path[1]["logw"] == pytest.approx(path[7]["logw"], abs=1e-9)


def test_target_df_equals_predicate_path(docs):
    """target_df = df.filter(pred) must reproduce the predicate path
    exactly: same raw statistics (the full df), same target grams."""
    a = dsir.dsir_doc_weights(docs, target=F.col("is_tgt"), hasher="md5")
    b = dsir.dsir_doc_weights(
        docs, target_df=docs.filter("is_tgt"), hasher="md5"
    )
    ra = {r["doc_id"]: r for r in a.collect()}
    rb = {r["doc_id"]: r for r in b.collect()}
    assert set(ra) == set(rb)
    for _id in ra:
        assert ra[_id]["n_feats"] == rb[_id]["n_feats"]
        if ra[_id]["logw"] is None:
            assert rb[_id]["logw"] is None
        else:
            assert ra[_id]["logw"] == pytest.approx(rb[_id]["logw"], abs=1e-9)


def test_resample_gumbel_topk_deterministic(docs):
    w = dsir.dsir_doc_weights(docs, target=F.col("is_tgt"), hasher="md5")
    s1 = dsir.dsir_resample(w, k=3, seed=7).collect()
    s2 = dsir.dsir_resample(w, k=3, seed=7).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 3
    # keys match the formula computed independently
    weights = {r["doc_id"]: r["logw"] for r in w.collect()}
    for r in s1:
        h = int(
            hashlib.md5(f"dsir:7\x1f{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 2.0 ** 32
        want = weights[r["doc_id"]] + (-math.log(-math.log(u)))
        assert r["resample_key"] == pytest.approx(want, abs=1e-9)
    # null-weight docs (5, 6) can never be sampled
    full = dsir.dsir_resample(w, k=100, seed=7).collect()
    assert {r["doc_id"] for r in full} == {1, 2, 3, 4, 7}
    # a different seed reorders (5 candidate docs, 3 slots)
    s3 = dsir.dsir_resample(w, k=3, seed=8).collect()
    assert {r["doc_id"] for r in s1} != {r["doc_id"] for r in s3} or [
        r["doc_id"] for r in s1
    ] != [r["doc_id"] for r in s3]


def test_argument_validation(docs):
    with pytest.raises(ValueError, match="exactly one"):
        dsir.dsir_doc_weights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        dsir.dsir_doc_weights(
            docs, target=F.col("is_tgt"), target_df=docs
        )
    with pytest.raises(ValueError, match="unknown hasher"):
        dsir.dsir_doc_weights(
            docs, target=F.col("is_tgt"), hasher="sha1"
        ).collect()
    w = dsir.dsir_doc_weights(docs, target=F.col("is_tgt"), hasher="md5")
    with pytest.raises(ValueError, match="positive"):
        dsir.dsir_resample(w, k=0)


def test_gram_stream_is_map_side_only(docs):
    """The feature stream must not shuffle: no Exchange below the
    bucket projection."""
    plan = dsir.dsir_gram_buckets(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
