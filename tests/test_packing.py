"""Sequence packing (distributed prefix sum) + duplicate clustering
(pointer-jumping connected components) — round-3 training-pipeline
operators."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kglids_spark.operators.dedup import dup_clusters
from kglids_spark.operators.packing import bin_fill_stats, pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic doc sizes, skewed: some giant docs span many bins
    return spark.range(5000).select(
        F.concat(F.lit("doc"), "id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.lit("sz"), "id"), F.lit(900)) + 10).cast("int").alias("n_tok"),
    ).cache()


def _brute_force(df, seq_len):
    """Single-task global window — the semantics oracle."""
    w = (
        Window.orderBy(F.shiftrightunsigned(F.xxhash64(F.col("doc_id")), 1), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "pack_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    ).withColumn("bin_id", (F.col("pack_offset") / seq_len).cast("long"))


def test_pack_matches_single_window(spark, docs):
    got = {
        r.doc_id: (r.pack_offset, r.bin_id)
        for r in pack_sequences(docs, 2048, n_buckets=16).collect()
    }
    want = {
        r.doc_id: (r.pack_offset, r.bin_id) for r in _brute_force(docs, 2048).collect()
    }
    assert got == want


def test_pack_invariant_under_bucket_count_and_partitioning(spark, docs):
    """The two-phase prefix sum must produce IDENTICAL assignments for
    any bucket count and any physical partitioning — the same
    verdict-identity discipline as validate's logical buckets."""
    base = {
        r.doc_id: (r.pack_offset, r.bin_id, r.bin_pos)
        for r in pack_sequences(docs, 1024, n_buckets=1).collect()
    }
    for n_buckets, parts in [(4, 3), (64, 16), (256, 5)]:
        again = {
            r.doc_id: (r.pack_offset, r.bin_id, r.bin_pos)
            for r in pack_sequences(
                docs.repartition(parts), 1024, n_buckets=n_buckets
            ).collect()
        }
        assert again == base, f"n_buckets={n_buckets} diverged"


def test_pack_offsets_are_exact_prefix_sums(spark, docs):
    packed = pack_sequences(docs, 4096, n_buckets=8)
    rows = sorted(packed.collect(), key=lambda r: r.pack_offset)
    run = 0
    for r in rows:
        assert r.pack_offset == run
        assert r.bin_id == run // 4096 and r.bin_pos == run % 4096
        run += r.n_tok
    total = docs.agg(F.sum("n_tok")).collect()[0][0]
    assert run == total


def test_pack_no_single_task_window(spark, docs):
    """The plan must not contain a partition-less window (the
    single-task collapse this operator exists to avoid)."""
    plan = (
        pack_sequences(docs, 2048, n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    import re

    for m in re.finditer(r"Window \[.*?\], \[(.*?)\], \[", plan):
        assert m.group(1).strip(), "partition-less global window in plan"


def test_bin_fill_stats(spark, docs):
    packed = pack_sequences(docs, 4096, n_buckets=8)
    stats = bin_fill_stats(packed, 4096)
    total_docs = stats.agg(F.sum("docs_started")).collect()[0][0]
    assert total_docs == docs.count()


# ---------------------------------------------------------------------------
# dup_clusters


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # long chain (path-doubling stress: diameter 40)
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)],
        # several components + a star + an isolated pair
        [("a1", "a2"), ("a2", "a3"), ("b1", "b9"), ("b9", "b2"),
         ("c5", "c1"), ("c5", "c2"), ("c5", "c9"), ("z1", "z2")],
    ],
)
def test_dup_clusters_match_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    want = _union_find(edges)
    assert got == want


def test_dup_clusters_chain_converges_fast(spark):
    """Pointer jumping: a 200-node chain must converge well inside the
    default max_iters (O(log d), not O(d))."""
    edges = [(f"p{i:04d}", f"p{i + 1:04d}") for i in range(200)]
    pairs = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {r.cluster_id for r in dup_clusters(pairs, max_iters=12).collect()}
    assert got == {"p0000"}


def test_dup_clusters_no_pinned_rdds(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = spark.createDataFrame(
        [("x1", "x2"), ("x2", "x3"), ("y1", "y2")], "id1 string, id2 string"
    )
    out = dup_clusters(pairs)
    out.count()
    after = jsc.getPersistentRDDs().size()
    # only the returned frame's own checkpoint blocks may remain
    assert after <= before + 1


def test_chunk_sequences_hand_computed(spark):
    from kglids_spark.operators.packing import chunk_sequences

    rows = [
        (1, list(range(10))),  # max 4 stride 4: [0..3],[4..7],[8,9]
        (2, [1, 2]),  # one short chunk
        (3, []),  # empty: no chunks
        (4, None),  # null: no chunks
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["tokens"], r["n_tok"])
        for r in chunk_sequences(d, max_len=4).collect()
    )
    assert out == [
        (1, 0, [0, 1, 2, 3], 4),
        (1, 1, [4, 5, 6, 7], 4),
        (1, 2, [8, 9], 2),
        (2, 0, [1, 2], 2),
    ]
    # min_len drops the short tail; chunk_id stays dense among kept
    out2 = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tok"])
        for r in chunk_sequences(d, max_len=4, min_len=3).collect()
    )
    assert out2 == [(1, 0, 4), (1, 1, 4)]
    # overlapping stride: starts 0,3,6,9
    out3 = [
        r["tokens"]
        for r in chunk_sequences(d.filter("doc_id = 1"), max_len=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    ]
    assert out3 == [[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9], [9]]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_len"):
        chunk_sequences(d, max_len=0)
    with _pytest.raises(ValueError, match="stride"):
        chunk_sequences(d, max_len=4, stride=-1)
    with _pytest.raises(ValueError, match="min_len"):
        chunk_sequences(d, max_len=4, min_len=5)
    # zero-shuffle plan
    plan = (
        chunk_sequences(d, max_len=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------
# round-5: materialize_bins (training-window construction)
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def token_docs(spark):
    # deterministic variable-length token arrays, incl. empty docs
    n = F.pmod(F.xxhash64(F.lit("len"), "id"), F.lit(40))  # 0..39 tokens
    toks = F.when(
        n > 0, F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64("id", i))
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        spark.range(800)
        .select(F.col("id").alias("doc_id"), toks.alias("tokens"))
        .withColumn("n_tok", F.size("tokens"))
        .cache()
    )


def test_materialize_bins_hand_case(spark):
    from kglids_spark.operators.packing import materialize_bins

    rows = [(1, [1, 2, 3]), (2, [4, 5, 6, 7, 8]), (3, [9])]
    df = (
        spark.createDataFrame(rows, "doc_id long, tokens array<bigint>")
        .withColumn("n_tok", F.size("tokens"))
    )
    out = {
        r.bin_id: (r.tokens, r.span_docs, r.span_starts, r.span_lens)
        for r in materialize_bins(
            df, 4, order_col=F.col("doc_id").cast("string"), bucket_col=F.lit(0)
        ).collect()
    }
    assert out == {
        0: ([1, 2, 3, 4], [1, 2], [0, 3], [3, 1]),
        1: ([5, 6, 7, 8], [2], [0], [4]),
        2: ([9], [3], [0], [1]),
    }


def test_materialize_bins_reconstructs_stream(spark, token_docs):
    """Concatenating bins in bin order must reproduce the exact global
    token stream of pack_sequences' order, with every bin except the
    last holding exactly seq_len tokens and spans tiling each bin."""
    from kglids_spark.operators.packing import materialize_bins, pack_sequences

    S = 64
    bins = materialize_bins(token_docs, S).orderBy("bin_id").collect()
    assert [r.bin_id for r in bins] == list(range(len(bins)))
    for r in bins[:-1]:
        assert r.n_tok == S
    assert 1 <= bins[-1].n_tok <= S
    for r in bins:
        # spans tile the bin contiguously in order
        pos = 0
        for st, ln in zip(r.span_starts, r.span_lens):
            assert st == pos and ln >= 1
            pos += ln
        assert pos == r.n_tok == len(r.tokens)
        assert r.n_docs == len(r.span_docs)
    stream = [t for r in bins for t in r.tokens]
    packed = pack_sequences(token_docs, S).filter(F.col("n_tok") >= 1).collect()
    want = [
        t
        for r in sorted(packed, key=lambda r: r.pack_offset)
        for t in r.tokens
    ]
    assert stream == want


def test_materialize_bins_invariant_under_partitioning(spark, token_docs):
    from kglids_spark.operators.packing import materialize_bins

    a = {
        r.bin_id: (r.tokens, r.span_docs)
        for r in materialize_bins(token_docs, 48, n_buckets=8).collect()
    }
    b = {
        r.bin_id: (r.tokens, r.span_docs)
        for r in materialize_bins(
            token_docs.repartition(17), 48, n_buckets=64
        ).collect()
    }
    assert a == b


def test_materialize_bins_empty_docs_occupy_no_positions(spark, token_docs):
    from kglids_spark.operators.packing import materialize_bins

    n_empty = token_docs.filter(F.col("n_tok") == 0).count()
    assert n_empty > 0  # fixture really exercises the edge
    bins = materialize_bins(token_docs, 32).collect()
    seen_docs = {d for r in bins for d in r.span_docs}
    empty_ids = {
        r.doc_id for r in token_docs.filter(F.col("n_tok") == 0).collect()
    }
    assert seen_docs.isdisjoint(empty_ids)
    total = token_docs.agg(F.sum("n_tok")).collect()[0][0]
    assert sum(r.n_tok for r in bins) == total


def test_lm_examples_hand_case(spark):
    from kglids_spark.operators.packing import lm_examples, materialize_bins

    rows = [(1, [1, 2, 3]), (2, [4, 5, 6, 7, 8]), (3, [9])]
    df = (
        spark.createDataFrame(rows, "doc_id long, tokens array<bigint>")
        .withColumn("n_tok", F.size("tokens"))
    )
    bins = materialize_bins(
        df, 4, order_col=F.col("doc_id").cast("string"), bucket_col=F.lit(0)
    )
    out = {
        r.bin_id: (r.input_ids, r.labels, r.segment_ids)
        for r in lm_examples(bins).collect()
    }
    assert out == {
        0: ([1, 2, 3, 4], [2, 3, -100, -100], [0, 0, 0, 1]),
        1: ([5, 6, 7, 8], [6, 7, 8, -100], [0, 0, 0, 0]),
        2: ([9], [-100], [0]),
    }


def test_lm_examples_masking_properties(spark, token_docs):
    """labels[i] == input_ids[i+1] exactly when i+1 stays in the same
    segment; every segment's last position (and the window end) is
    masked — no label ever crosses a document boundary."""
    from kglids_spark.operators.packing import lm_examples, materialize_bins

    ex = lm_examples(materialize_bins(token_docs, 48)).collect()
    assert ex
    for r in ex:
        n = len(r.input_ids)
        assert len(r.labels) == len(r.segment_ids) == n == r.n_tok
        for i in range(n):
            if i + 1 < n and r.segment_ids[i + 1] == r.segment_ids[i]:
                assert r.labels[i] == r.input_ids[i + 1]
            else:
                assert r.labels[i] == -100
        # segment ids are 0-based, contiguous, non-decreasing
        assert r.segment_ids[0] == 0
        assert all(
            b - a in (0, 1) for a, b in zip(r.segment_ids, r.segment_ids[1:])
        )


def test_span_corruption_hand_verified(spark):
    """Independent pure-Python replay of the deterministic corruption:
    same md5 block selector, same sentinel discipline."""
    import hashlib

    from kglids_spark.operators.packing import span_corruption_examples

    rows = [(1, list(range(10, 24))), (2, list(range(50, 52))), (3, [])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<bigint>")
    got = {
        r.doc_id: (r.input_ids, r.labels, r.n_tok, r.n_masked_spans)
        for r in span_corruption_examples(df).collect()
    }

    def replay(doc_id, toks, span=3, pct=15, base=100000):
        inp, lab, k = [], [], 0
        for b in range(0, (len(toks) + span - 1) // span):
            piece = toks[b * span : (b + 1) * span]
            h = int(hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()[:8], 16)
            if h % 100 < pct:
                inp.append(base - k)
                lab.extend([base - k] + piece)
                k += 1
            else:
                inp.extend(piece)
        return inp, lab + [base - k], len(toks), k

    for doc_id, toks in rows:
        assert got[doc_id] == replay(doc_id, toks), f"doc {doc_id}"


def test_span_corruption_properties(spark, token_docs):
    """Reconstruction: splicing each label span back over its sentinel
    reproduces the original tokens exactly; sentinel count and density
    bookkeeping hold for every doc."""
    from kglids_spark.operators.packing import span_corruption_examples

    base = 100000
    out = span_corruption_examples(
        token_docs.select("doc_id", F.coalesce(
            "tokens", F.array().cast("array<bigint>")).alias("tokens"))
    ).collect()
    orig = {r.doc_id: list(r.tokens or []) for r in token_docs.collect()}
    masked_any = 0
    for r in out:
        # the sentinel alphabet is exactly {base - k : k <= n_masked};
        # xxhash64 token values collide with it with probability ~2^-60
        sent_set = {base - k for k in range(r.n_masked_spans + 1)}
        spans = {}
        cur = None
        for x in r.labels:
            if x in sent_set:
                cur = base - x
                spans[cur] = []
            else:
                spans[cur].append(x)
        eos = max(spans)
        assert spans.pop(eos) == []  # the EOS sentinel closes labels
        assert eos == r.n_masked_spans
        rebuilt = []
        for x in r.input_ids:
            if x in sent_set and x != base - eos:
                rebuilt.extend(spans[base - x])
            else:
                rebuilt.append(x)
        assert rebuilt == orig[r.doc_id], f"doc {r.doc_id}"
        masked_any += r.n_masked_spans
    assert masked_any > 0  # the fixture really exercises masking


def test_truncation_stats_hand_computed(spark):
    from kglids_spark.operators.packing import truncation_stats

    # lengths 3, 5, 8, 0, NULL at L in {4, 8}
    df = spark.createDataFrame(
        [(3,), (5,), (8,), (0,), (None,)], "n_tok long"
    )
    rows = {r.seq_len: r for r in truncation_stats(df, [8, 4]).collect()}
    assert set(rows) == {4, 8}
    r4 = rows[4]
    # NULL excluded: 4 docs, 16 tokens; at L=4: 5->4, 8->4 truncate
    assert r4.n_docs == 4 and r4.total_tokens == 16
    assert r4.docs_truncated == 2
    assert r4.tokens_kept_truncate == 3 + 4 + 4 + 0
    assert r4.kept_frac == pytest.approx(11 / 16)
    # chunks: ceil(3/4)+ceil(5/4)+ceil(8/4)+0 = 1+2+2+0
    assert r4.n_chunks == 5
    r8 = rows[8]
    assert r8.docs_truncated == 0 and r8.tokens_kept_truncate == 16
    assert r8.kept_frac == pytest.approx(1.0)
    assert r8.n_chunks == 1 + 1 + 1 + 0


def test_truncation_stats_validates_inputs(spark):
    from kglids_spark.operators.packing import truncation_stats

    df = spark.createDataFrame([(3,)], "n_tok long")
    with pytest.raises(ValueError, match="at least one"):
        truncation_stats(df, [])
    with pytest.raises(ValueError, match="positive"):
        truncation_stats(df, [8, 0])
    # duplicate lengths collapse to one row
    assert truncation_stats(df, [8, 8]).count() == 1


def test_truncation_stats_empty_frame(spark):
    from kglids_spark.operators.packing import truncation_stats

    df = spark.createDataFrame([], "n_tok long")
    r = truncation_stats(df, [4]).collect()[0]
    assert r.n_docs == 0 and r.total_tokens == 0 and r.n_chunks == 0
    assert r.kept_frac is None
