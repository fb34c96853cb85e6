"""Round-4 fixes (VERDICT r3 "What's wrong" #3/#4, ADVICE r3):
distributed heavy-hitter candidates, numpy prefix sums at large bucket
counts, kmeans_assign null-safety, ivf_train small-corpus guard,
epoch_upsample non-string strata, cli --metric usage errors."""

import time

import pyspark.sql.functions as F
import pytest

from kglids_spark.operators.frequency import heavy_hitters
from kglids_spark.operators.packing import pack_sequences
from kglids_spark.operators.sampling import epoch_upsample, global_positions


# ---------------------------------------------------------------------
# VERDICT #5: heavy hitters — candidates stay distributed
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed(spark):
    df = spark.range(10000).select(
        F.when(F.col("id") % 5 == 0, "hot")
        .when(F.col("id") % 20 == 1, "warm")
        .otherwise(F.concat(F.lit("tail"), F.col("id")))
        .alias("item")
    )
    return df.cache()


def _exact(df, k):
    n = df.count()
    return {
        (r.item, r.n)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > n / (k + 1))
        .collect()
    }


def test_heavy_hitters_2k_partitions_no_candidate_collect(spark, skewed, monkeypatch):
    """At ≥2k partitions the MG candidate union is ~(k+1)×2048 rows —
    it must never round-trip through the driver. The operator may
    collect only the 1-row scalar total and the FINAL result (≤ k
    items by the n/(k+1) threshold — materialized so the eager
    summary checkpoint can release)."""
    expected = _exact(skewed, 49)  # oracle computed BEFORE patching
    wide = skewed.repartition(2048)

    collected_sizes = []
    # patch the CONCRETE class (pyspark.sql.DataFrame is an abstract
    # base in Spark 4; instances are pyspark.sql.classic DataFrames)
    cls = type(wide)
    orig_collect = cls.collect

    def spy_collect(self):
        rows = orig_collect(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy_collect)
    hh = heavy_hitters(wide, "item", k=49)
    got = {(r.item, r.n) for r in orig_collect(hh)}
    monkeypatch.undo()

    assert got == expected
    assert collected_sizes, "operator made no driver action at all?"
    assert max(collected_sizes) <= 49, (
        f"heavy_hitters collected {max(collected_sizes)} rows to the driver; "
        "only the 1-row total and the ≤k-row result are allowed — a "
        "candidate-union collect would be ~(k+1)×2048 rows here"
    )


def test_heavy_hitters_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, "item", k=9).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "item string")
    assert heavy_hitters(nulls, "item", k=9).count() == 0


# ---------------------------------------------------------------------
# VERDICT #6: numpy prefix sums hold at the 10^12-row bucket knobs
# ---------------------------------------------------------------------

def test_global_positions_large_bucket_knob(spark):
    """n_buckets=2^17 (rounds up to 16^5 range buckets): the offsets
    phase must stay O(observed buckets), not O(n_buckets) — the old
    range(n_buckets) loop took a million driver iterations here."""
    df = spark.range(20000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    t0 = time.time()
    pos = global_positions(df, ["key"], seed=7, n_buckets=1 << 17)
    got = sorted(r.position for r in pos.select("position").collect())
    elapsed = time.time() - t0
    assert got == list(range(20000))  # exact permutation
    # generous guard for host wobble; the old loop alone was ~1M python
    # iterations + a 1M-row broadcast per call
    assert elapsed < 120, f"global_positions at 2^17 buckets took {elapsed:.0f}s"


def test_global_positions_matches_small_bucket_run(spark):
    df = spark.range(3000).select(F.concat(F.lit("d"), F.col("id")).alias("key"))
    a = {r.key: r.position for r in global_positions(df, ["key"], 3, 256).collect()}
    b = {r.key: r.position for r in global_positions(df, ["key"], 3, 1 << 17).collect()}
    assert a == b


def test_pack_sequences_large_bucket_knob(spark):
    docs = spark.range(5000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        (F.pmod(F.xxhash64("id"), 900) + 100).cast("int").alias("n_tok"),
    )
    small = {
        r.doc_id: (r.pack_offset, r.bin_id, r.bin_pos)
        for r in pack_sequences(docs, 8192, n_buckets=64).collect()
    }
    big = {
        r.doc_id: (r.pack_offset, r.bin_id, r.bin_pos)
        for r in pack_sequences(docs, 8192, n_buckets=1 << 17).collect()
    }
    assert small == big


# ---------------------------------------------------------------------
# ADVICE: kmeans_assign null-safety (both paths), ivf_train guards
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def ragged_vecs(spark):
    return spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("b", [0.0, 1.0]),
            ("c", None),
            ("d", [1.0, 0.0, 0.0]),  # wrong dimension
            ("e", [0.9, 0.1]),
        ],
        "vec_id string, embedding array<double>",
    )


@pytest.mark.parametrize("method", ["expr", "pandas"])
def test_kmeans_assign_null_and_ragged(spark, ragged_vecs, method):
    from kglids_spark.operators.ann import kmeans_assign

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = {
        r.vec_id: r.km_list
        for r in kmeans_assign(ragged_vecs, cents, method=method).collect()
    }
    assert rows["a"] == 0 and rows["b"] == 1 and rows["e"] == 0
    assert rows["c"] is None, f"{method}: null vector must get NULL assignment"
    assert rows["d"] is None, f"{method}: wrong-dim vector must get NULL assignment"


def test_kmeans_paths_agree_on_valid_rows(spark, ragged_vecs):
    from kglids_spark.operators.ann import kmeans_assign

    cents = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]]
    a = {r.vec_id: r.km_list for r in kmeans_assign(ragged_vecs, cents, method="expr").collect()}
    b = {r.vec_id: r.km_list for r in kmeans_assign(ragged_vecs, cents, method="pandas").collect()}
    assert a == b


def test_ivf_train_fewer_vectors_than_k(spark):
    from kglids_spark.operators.ann import ivf_train

    tiny = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.5, 0.5])],
        "vec_id string, embedding array<double>",
    )
    cents = ivf_train(tiny, k=16, iters=2)
    assert len(cents) == 3  # clamped to the corpus size, no IndexError
    assert all(len(c) == 2 for c in cents)


def test_ivf_train_empty_corpus_clear_error(spark):
    from kglids_spark.operators.ann import ivf_train

    empty = spark.createDataFrame([], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        ivf_train(empty, k=4)


def test_ivf_train_skips_invalid_vectors(spark):
    from kglids_spark.operators.ann import ivf_train

    mixed = spark.createDataFrame(
        [
            ("a", [2.0, 0.0]),
            ("b", [0.0, 2.0]),
            ("c", None),
            ("d", [1.0]),  # ragged: must not crash the update pass
        ],
        "vec_id string, embedding array<double>",
    )
    cents = ivf_train(mixed, k=2, iters=2)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)


# ---------------------------------------------------------------------
# ADVICE: epoch_upsample with a non-string stratum column
# ---------------------------------------------------------------------

def test_epoch_upsample_int_strata(spark):
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(100)], "doc_id int, src int"
    )
    out = epoch_upsample(df, "src", {0: 2.0, 1: 1.0}, key_cols=["doc_id"])
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 100, 1: 50}


# ---------------------------------------------------------------------
# ADVICE: cli --metric malformed spec exits cleanly
# ---------------------------------------------------------------------

@pytest.mark.parametrize(
    "spec", ["n_tok mean 1", "n_tok mean one two", "n_tok mean 1 2 3"]
)
def test_cli_metric_malformed_clean_exit(spark, tokens_path, spec):
    from kglids_spark.cli import main

    with pytest.raises(SystemExit, match="--metric"):
        main(["validate", "--input", tokens_path, "--metric", spec])


# ---------------------------------------------------------------------
# VERDICT #7: fastText OOV subword backoff in sentence_embeddings
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def sent_fixture(spark):
    names = spark.createDataFrame(
        [("c1", "order total_price"), ("c2", "zzqx order"),
         ("c3", "zzqx"), ("c4", "order order zzqx")],
        "column_id string, column_name string",
    )
    vocab = spark.createDataFrame(
        [("order", [3.0, 4.0]), ("total", [1.0, 0.0]), ("price", [0.0, 2.0])],
        "word string, vector array<double>",
    )
    nb = 64
    sub = spark.createDataFrame(
        [(b, [float((b % 5) - 2), float((b % 7) - 3)]) for b in range(0, nb, 3)],
        "bucket long, vector array<double>",
    )
    return names, vocab, sub, nb


def _py_sentence_oracle(name, subtab, nb):
    """Independent reimplementation of the public fastText scheme."""
    import math

    vocab = {"order": [3.0, 4.0], "total": [1.0, 0.0], "price": [0.0, 2.0]}

    def buckets_of(word, minn=3, maxn=6):
        m = "<" + word + ">"
        ids = []
        for i in range(len(m)):
            for n in range(1, maxn + 1):
                if i + n > len(m):
                    break
                if n < minn or (n == 1 and (i == 0 or i + n == len(m))):
                    continue
                h = 2166136261
                for byt in m[i : i + n].encode():
                    h = (h ^ (byt if byt < 128 else byt | 0xFFFFFF00)) & 0xFFFFFFFF
                    h = (h * 16777619) & 0xFFFFFFFF
                ids.append(h % nb)
        return ids

    def word_vec(w):
        if w in vocab:
            v = vocab[w]
        else:
            ids = buckets_of(w)
            s = [0.0, 0.0]
            for b in ids:
                bv = subtab.get(b, [0.0, 0.0])
                s = [a + x for a, x in zip(s, bv)]
            v = [x / len(ids) for x in s]
        n = math.sqrt(sum(x * x for x in v))
        return None if n == 0 else [x / n for x in v]

    vs = [v for v in (word_vec(w) for w in name.replace("_", " ").split()) if v]
    if not vs:
        return None
    return [round(sum(v[i] for v in vs) / len(vs), 5) for i in range(2)]


def test_sentence_subword_matches_python_oracle(spark, sent_fixture):
    from kglids_spark.operators.ref_scores import sentence_embeddings

    names, vocab, sub, nb = sent_fixture
    got = {
        r.column_id: list(r.label_embedding)
        for r in sentence_embeddings(
            names, vocab, subword_vectors=sub, n_buckets=nb
        ).collect()
    }
    subtab = {b: [float((b % 5) - 2), float((b % 7) - 3)] for b in range(0, nb, 3)}
    for cid, nm in [
        ("c1", "order total_price"),
        ("c2", "zzqx order"),
        ("c3", "zzqx"),
        ("c4", "order order zzqx"),
    ]:
        assert got[cid] == _py_sentence_oracle(nm, subtab, nb), cid


def test_sentence_subword_changes_oov_vector(spark, sent_fixture):
    from kglids_spark.operators.ref_scores import sentence_embeddings

    names, vocab, sub, nb = sent_fixture
    base = {
        r.column_id: list(r.label_embedding)
        for r in sentence_embeddings(names, vocab).collect()
    }
    backed = {
        r.column_id: list(r.label_embedding)
        for r in sentence_embeddings(
            names, vocab, subword_vectors=sub, n_buckets=nb
        ).collect()
    }
    assert backed["c1"] == base["c1"]  # all-in-vocab name unchanged
    assert backed["c2"] != base["c2"]  # OOV token now contributes
    assert "c3" not in base and "c3" in backed  # fully-OOV name gains a row


def test_sentence_subword_empty_table_equals_no_fallback(spark, sent_fixture):
    from kglids_spark.operators.ref_scores import sentence_embeddings

    names, vocab, _, nb = sent_fixture
    empty = spark.createDataFrame([], "bucket long, vector array<double>")
    a = {
        r.column_id: list(r.label_embedding)
        for r in sentence_embeddings(
            names, vocab, subword_vectors=empty, n_buckets=nb
        ).collect()
    }
    b = {
        r.column_id: list(r.label_embedding)
        for r in sentence_embeddings(names, vocab).collect()
    }
    assert a == b  # zero-norm OOV vectors are skipped, like flag-off


# ---------------------------------------------------------------------
# VERDICT r3 #1: bench scaling estimator keeps only steady-state pairs
# (per-pair, symmetric — warm-up prefix AND mid-series spikes excluded)
# ---------------------------------------------------------------------

def test_steady_pairs_discard_warmup_prefix():
    import bench

    # the driver's r3 shape: both sides monotonically descending into a
    # floor — every pair before BOTH sides are within 15% of their
    # minimum is warm-up
    low = [169.0, 150.0, 130.0, 110.0, 106.0, 104.0]
    high = [102.0, 80.0, 60.0, 45.0, 38.0, 37.0]
    # low converges at index 3 (110 <= 1.15*104) but high only at 4
    assert bench._steady_pair_indices(low, high) == ([4, 5], 0.15)


def test_steady_pairs_flat_series_keep_everything():
    import bench

    low = [100.0, 101.0, 99.0, 100.5]
    high = [25.0, 26.0, 25.5, 25.2]
    assert bench._steady_pair_indices(low, high) == ([0, 1, 2, 3], 0.15)


def test_steady_pairs_never_empty():
    import bench

    # pathological: strictly descending with >15% steps everywhere —
    # the last pair is still returned so the window is never empty
    low = [100.0, 80.0, 60.0, 40.0]
    high = [100.0, 80.0, 60.0, 40.0]
    assert bench._steady_pair_indices(low, high) == ([3], 0.15)


def test_steady_pairs_drop_mid_series_spike_high_side():
    import bench

    # the observed failure of the prefix-only gate: warmed by pair 1,
    # then one high-side weather spike (55 s vs 30 s steady) mid-series.
    # The spiked pair would read a ~1.8 ratio and drag a 3-pair median;
    # per-pair filtering excludes exactly it.
    low = [140.0, 100.0, 102.0, 101.0, 100.5]
    high = [60.0, 30.0, 31.0, 55.0, 30.5]
    assert bench._steady_pair_indices(low, high) == ([1, 2, 4], 0.15)


def test_steady_pairs_drop_mid_series_spike_low_side_symmetric():
    import bench

    # symmetry: a spiked LOW side (which would INFLATE the ratio) is
    # dropped by the same predicate — the filter cannot bias upward
    low = [100.0, 100.0, 140.0, 100.0]
    high = [30.0, 30.0, 30.0, 30.0]
    assert bench._steady_pair_indices(low, high) == ([0, 1, 3], 0.15)


def test_steady_pairs_disjoint_minima_widen_tolerance():
    import bench

    # each side's minimum on a different pass with nothing near both:
    # the filter widens tol (and reports it) instead of returning one
    # arbitrary pair mislabeled as converged
    low = [10.0, 20.0]
    high = [20.0, 10.0]
    idx, tol = bench._steady_pair_indices(low, high)
    assert idx  # never empty
    assert tol > 0.15 or idx == [0, 1]
    # fully pathological: widening saturates to every pair + inf marker
    low2 = [10.0, 100.0]
    high2 = [100.0, 10.0]
    idx2, tol2 = bench._steady_pair_indices(low2, high2)
    assert idx2 == [0, 1] and tol2 == float("inf")
