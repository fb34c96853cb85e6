"""Unit tests for the round-5 additions: token-level n-gram
decontamination (dedup.token_ngram_contamination) and data-mixture
planning (sampling.mixture_plan)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kglids_spark.operators import dedup, sampling

_TOK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tokens", ArrayType(IntegerType())),
    ]
)


@pytest.fixture(scope="module")
def tok_corpus(spark):
    rows = [
        (1, [1, 2, 3, 4, 5]),  # shares the gram [2,3,4] with bench doc 10
        (2, [9, 9, 9, 9]),  # grams [9,9,9] x2 -> distinct 1, no overlap
        (3, [7, 8]),  # shorter than n: zero grams
        (4, None),  # NULL tokens: zero grams
        (5, [2, 3, 4]),  # exactly one gram, contaminated
    ]
    return spark.createDataFrame(rows, _TOK_SCHEMA)


@pytest.fixture(scope="module")
def tok_bench(spark):
    return spark.createDataFrame([(10, [0, 2, 3, 4])], _TOK_SCHEMA)


def test_token_contamination_hand_computed(tok_corpus, tok_bench):
    out = {
        r["doc_id"]: r
        for r in dedup.token_ngram_contamination(
            tok_corpus, tok_bench, n=3
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # doc 1: distinct grams [1,2,3],[2,3,4],[3,4,5] -> 3; one matches
    assert (out[1]["n_grams"], out[1]["n_matched"]) == (3, 1)
    assert out[1]["contaminated"]
    # doc 2: [9,9,9] twice -> 1 distinct, no match
    assert (out[2]["n_grams"], out[2]["n_matched"]) == (1, 0)
    assert not out[2]["contaminated"]
    for short_id in (3, 4):
        assert (out[short_id]["n_grams"], out[short_id]["n_matched"]) == (0, 0)
        assert not out[short_id]["contaminated"]
    assert (out[5]["n_grams"], out[5]["n_matched"]) == (1, 1)


def test_token_contamination_hash_twin_lockstep(tok_corpus, tok_bench):
    a = dedup.token_ngram_contamination(
        tok_corpus, tok_bench, n=3, hash_grams=True
    ).collect()
    b = dedup.token_ngram_contamination(
        tok_corpus, tok_bench, n=3, hash_grams=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_token_contamination_self_benchmark(tok_corpus):
    """Every doc with >= n tokens is contaminated against itself."""
    out = dedup.token_ngram_contamination(
        tok_corpus, tok_corpus, n=3
    ).collect()
    for r in out:
        assert r["contaminated"] == (r["n_grams"] > 0)
        assert r["n_matched"] == r["n_grams"]


_SRC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("source", StringType())]
)


@pytest.fixture(scope="module")
def srcs(spark):
    rows = [(i, f"s{i % 4}") for i in range(100)]  # 25 rows per stratum
    return spark.createDataFrame(rows, _SRC_SCHEMA)


def test_mixture_plan_hand_math(srcs):
    plan = {
        r["source"]: r
        for r in sampling.mixture_plan(
            srcs, "source", {"s0": 0.5, "s1": 0.5}
        ).collect()
    }
    assert set(plan) == {"s0", "s1", "s2", "s3"}
    for s in ("s0", "s1"):
        assert plan[s]["n_rows"] == 25
        assert plan[s]["share"] == pytest.approx(0.25)
        assert plan[s]["target_share"] == 0.5
        assert plan[s]["factor"] == pytest.approx(0.5 * 100 / 25)  # 2 epochs
    for s in ("s2", "s3"):
        assert plan[s]["target_share"] == 0.0
        assert plan[s]["factor"] == 0.0


def test_mixture_plan_explicit_total_and_epoch_composition(srcs):
    plan = sampling.mixture_plan(
        srcs, "source", {"s0": 0.75, "s1": 0.25}, total_rows=50
    ).collect()
    factors = {r["source"]: r["factor"] for r in plan}
    assert factors["s0"] == pytest.approx(0.75 * 50 / 25)  # 1.5
    assert factors["s1"] == pytest.approx(0.25 * 50 / 25)  # 0.5
    # feed epoch_upsample: full copies per whole epoch + hash-fraction
    up = sampling.epoch_upsample(srcs, "source", factors, ["doc_id"])
    counts = {
        r["source"]: r["n"]
        for r in up.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # s0: 25 full + ~half extra; s1: ~half of 25 — deterministic given
    # the hash, bounded around the target
    assert 25 <= counts["s0"] <= 50
    assert 1 <= counts["s1"] <= 24
    assert set(counts) == {"s0", "s1"}


def test_mixture_plan_validation(srcs):
    with pytest.raises(ValueError, match="sum to"):
        sampling.mixture_plan(srcs, "source", {"s0": 0.5, "s1": 0.4})
    with pytest.raises(ValueError, match="non-negative"):
        sampling.mixture_plan(srcs, "source", {"s0": 1.5, "s1": -0.5})
    with pytest.raises(ValueError, match="absent from the data"):
        sampling.mixture_plan(srcs, "source", {"s0": 0.5, "nope": 0.5})


def test_normalize_unicode_forms(spark):
    from kglids_spark.operators import text as TX

    rows = [
        (1, "café"),  # precomposed e-acute: NFC no-op
        (2, "café"),  # decomposed: NFC composes to café
        (3, "ﬁle ①"),  # fi-ligature + circled 1: NFKC folds
        (4, None),
        (5, "STRASSE Ü"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = {
        r["doc_id"]: (r["text_norm"], r["changed"])
        for r in TX.normalize_unicode(docs, form="NFC").collect()
    }
    assert nfc[1] == ("café", False)
    assert nfc[2] == ("café", True)
    assert nfc[3] == ("ﬁle ①", False)  # NFC keeps compatibility chars
    assert nfc[4] == (None, False)
    nfkc = {
        r["doc_id"]: r["text_norm"]
        for r in TX.normalize_unicode(docs, form="NFKC").collect()
    }
    assert nfkc[3] == "file 1"
    low = {
        r["doc_id"]: r["text_norm"]
        for r in TX.normalize_unicode(
            docs, form="NFKC", lowercase=True, strip_accents=True
        ).collect()
    }
    assert low[1] == "cafe"
    assert low[2] == "cafe"
    assert low[5] == "strasse u"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown normalization form"):
        TX.normalize_unicode(docs, form="NFX")


def test_incremental_exact_dedup_semantics(spark):
    from kglids_spark.operators import dedup as DD

    prior_docs = spark.createDataFrame(
        [(100, "seen before"), (101, "other old text")],
        "doc_id long, text string",
    )
    ledger = DD.exact_dedup_ledger(prior_docs)
    new = spark.createDataFrame(
        [
            (1, "seen before"),  # in ledger: dropped
            (2, "brand new"),  # survives
            (3, "brand  NEW"),  # same normalized content as 2: dropped
            (4, None),  # null text: survives
            (5, None),  # null text: survives (not collapsed with 4)
            (6, "Seen  Before "),  # normalizes into the ledger: dropped
        ],
        "doc_id long, text string",
    )
    out = sorted(
        r["doc_id"]
        for r in DD.incremental_dedup_exact(new, ledger).collect()
    )
    assert out == [2, 4, 5]
    # no ledger: pure within-batch exact dedup, keep-min-id
    out2 = sorted(
        r["doc_id"] for r in DD.incremental_dedup_exact(new, None).collect()
    )
    assert out2 == [1, 2, 4, 5]


def test_grouped_verdicts_hand_computed(spark):
    from kglids_spark.operators import constraints as C

    rows = [
        (1, "a", "ok", 5),
        (2, "a", None, 5),  # not_null(text) violation in group a
        (3, "a", "ok", -1),  # range violation in group a
        (4, "b", "ok", 5),
        (5, "b", "ok", None),  # NULL n_chars: range does not fire
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    cs = [C.not_null("text"), C.in_range("n_chars", 0, 100)]
    out = {
        (r["source"], r["constraint_id"]): r
        for r in C.grouped_verdicts(d, cs, "source").collect()
    }
    assert len(out) == 4  # 2 groups x 2 constraints
    a_nn = out[("a", "not_null(text)")]
    assert (a_nn["n_checked"], a_nn["n_violations"], a_nn["passed"]) == (3, 1, False)
    a_rg = out[("a", "range(n_chars)")]
    assert (a_rg["n_violations"], a_rg["passed"]) == (1, False)
    for cid in ("not_null(text)", "range(n_chars)"):
        b = out[("b", cid)]
        assert (b["n_checked"], b["n_violations"], b["passed"]) == (2, 0, True)
    # non-row-level kinds refused
    with pytest.raises(ValueError, match="row-level"):
        C.grouped_verdicts(d, [C.unique("doc_id")], "source")
    with pytest.raises(ValueError, match="no row-level"):
        C.grouped_verdicts(d, [], "source")


def test_dedup_lines_within_doc(spark):
    from kglids_spark.operators import text as TX

    rows = [
        (1, "a\nb\na\nc\nb"),  # dups of a and b removed
        (2, "x"),
        (3, None),
        (4, "same\nsame\nsame"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.dedup_lines_within_doc(d).collect()}
    assert out[1]["text_clean"] == "a\nb\nc"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (5, 2)
    assert out[2]["text_clean"] == "x"
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (1, 0)
    assert out[3]["text_clean"] is None
    assert out[3]["n_lines"] is None and out[3]["n_removed"] is None
    assert out[4]["text_clean"] == "same"
    assert (out[4]["n_lines"], out[4]["n_removed"]) == (3, 2)
    # zero-shuffle plan
    plan = TX.dedup_lines_within_doc(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_jsonl_roundtrip_fidelity(spark, tmp_path):
    """write_jsonl -> read_jsonl_corpus preserves every value exactly:
    newlines, tabs, quotes, backslashes, unicode beyond the BMP, and
    NULLs (Spark's writer omits null fields; the reader restores
    them)."""
    from kglids_spark.sources.tables import read_jsonl_corpus, write_jsonl

    rows = [
        (1, "plain", "en"),
        (2, 'new\nline\tand "quotes" and \\ backslash', "en"),
        (3, None, "fr"),
        (4, "unicode: café 中文 \U0001f600", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "jl")
    write_jsonl(df, path, compression="gzip")
    import glob

    assert glob.glob(path + "/*.json.gz"), "gzip parts expected"
    back = read_jsonl_corpus(spark, path, "doc_id long, text string, lang string")
    got = sorted(
        [(r.doc_id, r.text, r.lang) for r in back.select("doc_id", "text", "lang").collect()],
        key=str,
    )
    assert got == sorted(rows, key=str)
    assert back.filter(F.col("_corrupt_json").isNotNull()).count() == 0


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    """Malformed lines become countable rows carrying the raw line in
    _corrupt_json (never a job failure); blank lines are skipped like
    spark.read.json; every downstream query shape works, including the
    corrupt-only filter Spark's built-in channel refuses."""
    from kglids_spark.sources.tables import read_jsonl_corpus

    p = tmp_path / "bad.json"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\nnot json at all\n\n{"doc_id": 2, "text": "also ok"}\n'
    )
    b = read_jsonl_corpus(spark, str(p), "doc_id long, text string")
    assert b.count() == 3
    corrupt = b.filter(F.col("_corrupt_json").isNotNull())
    assert corrupt.count() == 1
    assert corrupt.collect()[0]["_corrupt_json"] == "not json at all"
    assert b.filter(F.col("_corrupt_json").isNull()).count() == 2
    # schema-less inference fallback still reads the good rows
    inferred = read_jsonl_corpus(spark, str(p))
    assert inferred.count() >= 2
