"""Exact-quota stratified sampling (two-phase order-statistic
selection) and benchmark decontamination — round-3 training-pipeline
operators."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kglids_spark.operators import dedup
from kglids_spark.operators.sampling import mixture_counts, stratified_sample_exact


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 strata with sizes 700 / 250 / 50
    return spark.range(1000).select(
        F.concat(F.lit("d"), "id").alias("doc_id"),
        F.when(F.col("id") < 700, "web")
        .when(F.col("id") < 950, "books")
        .otherwise("wiki")
        .alias("source"),
    ).cache()


def _single_window(df, quotas, strata_col="source"):
    """The definitional selection: first `quota` rows per stratum in
    (md5(key), key) order via one window — the semantics oracle."""
    w = Window.partitionBy(strata_col).orderBy(F.md5("doc_id"), "doc_id")
    ranked = df.withColumn("_rn", F.row_number().over(w))
    cond = None
    for s, q in quotas.items():
        c = (F.col(strata_col) == s) & (F.col("_rn") <= q)
        cond = c if cond is None else (cond | c)
    return ranked.filter(cond).drop("_rn")


QUOTAS = {"web": 100, "books": 250, "wiki": 80}  # under / exact / over size


def test_stratified_matches_single_window(spark, corpus):
    got = {r.doc_id for r in stratified_sample_exact(corpus, "source", QUOTAS, ["doc_id"]).collect()}
    want = {r.doc_id for r in _single_window(corpus, QUOTAS).collect()}
    assert got == want


def test_stratified_exact_quota_counts(spark, corpus):
    out = stratified_sample_exact(corpus, "source", QUOTAS, ["doc_id"])
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 100, "books": 250, "wiki": 50}


def test_stratified_invariant_under_partitioning(spark, corpus):
    base = {r.doc_id for r in stratified_sample_exact(corpus, "source", QUOTAS, ["doc_id"]).collect()}
    again = {
        r.doc_id
        for r in stratified_sample_exact(
            corpus.repartition(13), "source", QUOTAS, ["doc_id"]
        ).collect()
    }
    assert again == base


def test_stratified_drops_unlisted_strata(spark, corpus):
    out = stratified_sample_exact(corpus, "source", {"wiki": 10}, ["doc_id"])
    rows = out.collect()
    assert len(rows) == 10 and all(r.source == "wiki" for r in rows)


def test_stratified_no_whole_stratum_window(spark, corpus):
    """The cutoff-bucket window must partition by (stratum, bucket),
    never by stratum alone — the whole point of the two-phase design."""
    plan = (
        stratified_sample_exact(corpus, "source", QUOTAS, ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, "expected a window for the cutoff bucket"
    assert all("_b#" in s for s in specs), f"window not bucket-partitioned: {specs}"


def test_mixture_counts(spark, corpus):
    rows = {r.source: (r.n_rows, r.share) for r in mixture_counts(corpus, "source").collect()}
    assert rows["web"][0] == 700 and abs(rows["web"][1] - 0.7) < 1e-9
    assert abs(sum(v[1] for v in rows.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# benchmark_contamination


def test_contamination_flags_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "unrelated words entirely disjoint from anything benchmarked here now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(101, "beta gamma delta epsilon zeta eta theta iota")],  # 8 words of doc 1
        "bench_id long, text string",
    )
    out = dedup.benchmark_contamination(corpus, bench, n=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.bench_id, r.n_common, r.bench_ngrams) == (1, 101, 1, 1)
    assert r.frac_bench == 1.0


def test_contamination_hashed_twin_lockstep(spark):
    """Production int64-gram path must match the string-gram path the
    DuckDB oracle mirrors, on the real corpus with sliced-prefix
    benchmarks (the benchmark_contamination query's construction)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = d.filter(F.col("doc_id") % 100 == 7).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(F.split(dedup.normalize_text("text"), " "), 1, 12), " "
        ).alias("text"),
    )
    def key(df):
        return {
            (r.doc_id, r.bench_id): (r.n_common, r.bench_ngrams)
            for r in df.collect()
        }
    want = key(dedup.benchmark_contamination(d, bench, n=8, hash_shingles=False))
    got = key(dedup.benchmark_contamination(d, bench, n=8, hash_shingles=True))
    assert got == want and len(got) > 0


def test_contamination_benchmark_side_is_broadcast(spark):
    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.concat(F.lit("w"), F.pmod(F.xxhash64(F.lit(j), "id"), F.lit(50))) for j in range(12)]).alias("text"),
    )
    bench = d.filter(F.col("doc_id") % 40 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    plan = (
        dedup.benchmark_contamination(d, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_temperature_quotas_flattening():
    """T=0.5 integer-sqrt spec: small sources are up-weighted relative
    to proportional sampling, caps bind, and the floor allocation never
    exceeds the budget."""
    from kglids_spark.operators.sampling import temperature_quotas

    counts = {"a": 100, "b": 400, "c": 2500}
    q = temperature_quotas(counts, budget=70, temperature=0.5)
    # weights 10/20/50, tot 80 -> 8/17/43
    assert q == {"a": 8, "b": 17, "c": 43}
    assert sum(q.values()) <= 70
    # vs proportional (70*n/3000 -> 2/9/58): T=0.5 shifts mass to 'a'
    assert q["a"] > 70 * 100 // 3000 and q["c"] < 70 * 2500 // 3000

    # the min(n, ...) cap binds for tiny sources
    q2 = temperature_quotas({"a": 4, "b": 10000}, budget=1000, temperature=0.5)
    assert q2["a"] == 4 and q2["b"] == min(10000, 1000 * 100 // 102)

    # T=1 float path is proportional; empty input degenerates to zeros
    q3 = temperature_quotas({"a": 300, "b": 100}, budget=100, temperature=1.0)
    assert q3 == {"a": 75, "b": 25}
    assert temperature_quotas({"a": 0}, budget=10) == {"a": 0}


# --- split_assignment ------------------------------------------------


def test_split_assignment_fractions_and_determinism(spark, corpus):
    from kglids_spark.operators.sampling import split_assignment

    a = split_assignment(corpus, ["doc_id"])
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    # loose CLT bounds around 900/50/50
    assert 850 <= counts["train"] <= 950
    # two invocations agree row-for-row
    b = split_assignment(corpus, ["doc_id"])
    assert a.join(b, "doc_id").filter(a["split"] != b["split"]).count() == 0


def test_split_assignment_stable_under_incremental_ingest(spark, corpus):
    """A row's split must not depend on what other rows are present."""
    from kglids_spark.operators.sampling import split_assignment

    full = {r.doc_id: r.split for r in split_assignment(corpus, ["doc_id"]).collect()}
    subset = corpus.filter(F.col("source") == "wiki")
    sub = {r.doc_id: r.split for r in split_assignment(subset, ["doc_id"]).collect()}
    assert sub == {k: v for k, v in full.items() if k in sub}


def test_split_assignment_seed_changes_assignment(spark, corpus):
    from kglids_spark.operators.sampling import split_assignment

    a = split_assignment(corpus, ["doc_id"], seed=0)
    b = split_assignment(corpus, ["doc_id"], seed=1)
    differing = a.join(b.withColumnRenamed("split", "split2"), "doc_id").filter(
        F.col("split") != F.col("split2")
    )
    assert differing.count() > 0


# --- global_positions ------------------------------------------------


def _positions_single_window(df, seed):
    from pyspark.sql.window import Window as W

    h = F.md5(F.concat_ws("\x1f", F.lit(f"shuffle:{seed}"), F.col("doc_id").cast("string")))
    w = W.orderBy(h, "doc_id")
    return df.withColumn("position", F.row_number().over(w) - 1)


def test_global_positions_match_single_window(spark, corpus):
    from kglids_spark.operators.sampling import global_positions

    got = {r.doc_id: r.position for r in global_positions(corpus, ["doc_id"], seed=3).collect()}
    want = {r.doc_id: r.position for r in _positions_single_window(corpus, 3).collect()}
    assert got == want


def test_global_positions_invariant_to_bucket_count(spark, corpus):
    from kglids_spark.operators.sampling import global_positions

    a = {r.doc_id: r.position for r in global_positions(corpus, ["doc_id"], n_buckets=16).collect()}
    b = {r.doc_id: r.position for r in global_positions(corpus, ["doc_id"], n_buckets=4096).collect()}
    assert a == b


def test_global_positions_is_permutation(spark, corpus):
    from kglids_spark.operators.sampling import global_positions

    pos = [r.position for r in global_positions(corpus.repartition(13), ["doc_id"]).collect()]
    assert sorted(pos) == list(range(1000))


# --- epoch_upsample --------------------------------------------------


def test_epoch_upsample_copy_counts(spark, corpus):
    from kglids_spark.operators.sampling import epoch_upsample

    up = epoch_upsample(
        corpus, "source", {"web": 2.0, "books": 1.5, "wiki": 0.0}, ["doc_id"]
    )
    by = {
        (r.source, r.epoch): r.n
        for r in up.groupBy("source", "epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # web x2.0: two full epochs, each the whole stratum
    assert by[("web", 1)] == 700 and by[("web", 2)] == 700 and ("web", 3) not in by
    # books x1.5: full epoch + roughly half in epoch 2
    assert by[("books", 1)] == 250
    assert 90 <= by[("books", 2)] <= 160
    # wiki x0.0 dropped entirely
    assert not any(s == "wiki" for s, _ in by)


def test_epoch_upsample_partial_epoch_is_prefix_stable(spark, corpus):
    """The rows in the x1.5 partial epoch must be exactly the rows in
    the x1.25 partial epoch's superset — same hash order prefix."""
    from kglids_spark.operators.sampling import epoch_upsample

    def partial_ids(f):
        up = epoch_upsample(corpus, "source", {"books": f}, ["doc_id"])
        return {r.doc_id for r in up.filter(F.col("epoch") == 2).collect()}

    small, big = partial_ids(1.25), partial_ids(1.5)
    assert small < big  # strict prefix containment


def test_epoch_upsample_no_shuffle_plan(spark, corpus):
    from kglids_spark.operators.sampling import epoch_upsample

    up = epoch_upsample(corpus, "source", {"web": 2.5}, ["doc_id"])
    plan = up._jdf.queryExecution().executedPlan().toString()
    # broadcast join + explode only: no Exchange other than the broadcast
    import re
    exchanges = [l for l in plan.splitlines() if "Exchange" in l and "Broadcast" not in l]
    assert exchanges == [], exchanges


def test_split_and_epoch_hashes_are_domain_separated(spark, corpus):
    """Composing split_assignment and epoch_upsample with the same seed
    must not nest their selections: the ×1.5 partial epoch draws from
    every split, not just from inside 'train'."""
    from kglids_spark.operators.sampling import epoch_upsample, split_assignment

    a = split_assignment(corpus, ["doc_id"], seed=0)
    up = epoch_upsample(a, "source", {"web": 1.5}, ["doc_id"], seed=0)
    extra_splits = {
        r.split for r in up.filter(F.col("epoch") == 2).select("split").distinct().collect()
    }
    assert "val" in extra_splits or "test" in extra_splits


# ---------------------------------------------------------------------
# round-5: ranked_prefix / assign_shards / select_until_budget
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def sized(spark):
    # deterministic skewed sizes + a score column with heavy ties and
    # a few NULLs (the desc_nulls_last edge)
    return spark.range(3000).select(
        F.concat(F.lit("s"), "id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.lit("n"), "id"), F.lit(500)) + 1)
        .cast("int")
        .alias("n_tok"),
        F.when(
            F.pmod("id", F.lit(17)) != 0, F.pmod("id", F.lit(7)).cast("double")
        ).alias("score"),
    ).cache()


def test_ranked_prefix_matches_single_window(spark, sized):
    from kglids_spark.plans.ranking import ranked_prefix

    order = [F.desc_nulls_last("score"), F.asc("doc_id")]
    got = {
        r.doc_id: (r._rank, r._cum_before)
        for r in ranked_prefix(sized, order, value_col="n_tok").collect()
    }
    w = Window.orderBy(F.desc_nulls_last("score"), F.asc("doc_id"))
    want = {
        r.doc_id: (r.rk, r.cb)
        for r in sized.withColumn("rk", F.row_number().over(w) - 1)
        .withColumn(
            "cb",
            F.coalesce(
                F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .collect()
    }
    assert got == want


def test_ranked_prefix_invariant_under_partitioning(spark, sized):
    from kglids_spark.plans.ranking import ranked_prefix

    order = [F.asc("n_tok"), F.asc("doc_id")]
    a = {r.doc_id: r._rank for r in ranked_prefix(sized, order).collect()}
    b = {
        r.doc_id: r._rank
        for r in ranked_prefix(
            sized.repartition(13), order, num_partitions=5
        ).collect()
    }
    assert a == b


def test_assign_shards_row_balance_hash_mode(spark, sized):
    from kglids_spark.operators.sampling import assign_shards

    out = assign_shards(sized, 7)
    counts = {r.shard: r.n for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(7))
    assert max(counts.values()) - min(counts.values()) <= 1
    # deterministic under input partitioning
    again = assign_shards(sized.repartition(11), 7)
    assert {(r.doc_id, r.shard) for r in out.collect()} == {
        (r.doc_id, r.shard) for r in again.collect()
    }


def test_assign_shards_size_balance(spark, sized):
    from kglids_spark.operators.sampling import assign_shards

    out = assign_shards(sized, 5, size_col="n_tok")
    agg = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("tok")
    ).collect()
    counts = {r.shard: r.n for r in agg}
    toks = {r.shard: r.tok for r in agg}
    assert set(counts) == set(range(5))
    assert max(counts.values()) - min(counts.values()) <= 1
    # LPT-lite guarantee: round-robin over the size-descending order
    # keeps shard totals within one round's spread — use a generous
    # bound of the max document size times the number of rounds' drift
    # (empirically far tighter; this guards gross misassignment)
    max_size = out.agg(F.max("n_tok")).collect()[0][0]
    assert max(toks.values()) - min(toks.values()) <= 5 * max_size


def test_assign_shards_rejects_bad_n(spark, sized):
    from kglids_spark.operators.sampling import assign_shards

    with pytest.raises(ValueError):
        assign_shards(sized, 0)


def test_select_until_budget_hand_case(spark):
    from kglids_spark.operators.sampling import select_until_budget

    rows = [
        ("a", 10, 3.0),
        ("b", 20, 2.0),
        ("c", 30, 2.0),
        ("d", 40, 1.0),
        ("e", 50, None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int, score double")
    out = {
        r.doc_id: (r.cum_tokens_before, r.selected)
        for r in select_until_budget(
            df, 35, score_col="score", size_col="n_tok"
        ).collect()
    }
    # order: a(3.0), b(2.0), c(2.0 — id tiebreak), d, e(null last)
    assert out == {
        "a": (0, True),
        "b": (10, True),
        "c": (30, True),  # crossing doc included (30 < 35)
        "d": (60, False),
        "e": (100, False),
    }


def test_select_until_budget_edges(spark, sized):
    from kglids_spark.operators.sampling import select_until_budget

    none = select_until_budget(sized, 0, score_col="score", size_col="n_tok")
    assert none.filter("selected").count() == 0
    total = sized.agg(F.sum("n_tok")).collect()[0][0]
    allsel = select_until_budget(
        sized, int(total) + 1, score_col="score", size_col="n_tok"
    )
    assert allsel.filter("selected").count() == sized.count()
    with pytest.raises(ValueError):
        select_until_budget(sized, -1, score_col="score", size_col="n_tok")


def test_select_until_budget_null_scores_taken_last(spark, sized):
    from kglids_spark.operators.sampling import select_until_budget

    scored_total = (
        sized.filter(F.col("score").isNotNull()).agg(F.sum("n_tok")).collect()[0][0]
    )
    out = select_until_budget(
        sized, int(scored_total), score_col="score", size_col="n_tok"
    )
    # budget == total of scored docs: every scored doc selected, and of
    # the null-score docs only the first (by id) can be the crossing doc
    assert out.filter("selected AND score IS NOT NULL").count() == sized.filter(
        F.col("score").isNotNull()
    ).count()
    assert out.filter("selected AND score IS NULL").count() <= 1


def test_sample_exact_k_global_and_grouped(spark):
    from kglids_spark.operators import sampling

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("source"),
    )
    # global: exactly k rows, deterministic under repartitioning
    a = {r.doc_id for r in sampling.sample_exact_k(df, ["doc_id"], 7).collect()}
    b = {
        r.doc_id
        for r in sampling.sample_exact_k(df.repartition(13), ["doc_id"], 7).collect()
    }
    assert a == b and len(a) == 7
    # grouped: exactly k per group, disjoint and deterministic
    g = sampling.sample_exact_k(df, ["doc_id"], 4, group_col="source").collect()
    per = {}
    for r in g:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert set(per) == {f"s{i}" for i in range(5)}
    assert all(len(v) == 4 for v in per.values())
    # a different seed draws a different sample
    c = {
        r.doc_id
        for r in sampling.sample_exact_k(df, ["doc_id"], 7, seed=43).collect()
    }
    assert c != a


def test_sample_exact_k_small_group_and_validation(spark):
    from kglids_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    got = sampling.sample_exact_k(df, ["doc_id"], 10, group_col="source").collect()
    assert len(got) == 3  # min(k, group size) per group
    with pytest.raises(ValueError, match="positive"):
        sampling.sample_exact_k(df, ["doc_id"], 0)
