"""Generator determinism + the token-array byte-equality invariant
(FIXTURES.md F5.4): row content must be identical across partitioning
and salting choices."""

from pyspark.sql import functions as F

from kglids_spark.plans.skew import salted_repartition
from kglids_spark.sources.tokens import generate_tokens, SOURCES


def _content_hash(df):
    """Order-insensitive multiset hash over full row content, tokens included."""
    return (
        df.select(
            F.xxhash64("doc_id", "tokens", "n_tok", "source").alias("h")
        )
        .agg(
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.count("h").alias("n"),
            F.sum(F.abs("h") % 1000003).alias("m"),
        )
        .collect()[0]
    )


def test_deterministic_across_partition_counts(spark):
    a = _content_hash(generate_tokens(spark, 5000, partitions=2))
    b = _content_hash(generate_tokens(spark, 5000, partitions=13))
    assert tuple(a) == tuple(b)


def test_invariant_under_salted_repartition(spark, tokens_df):
    before = _content_hash(tokens_df)
    after = _content_hash(salted_repartition(tokens_df, "source", n_partitions=24))
    assert tuple(before) == tuple(after)


def test_planted_violations_present(tokens_df):
    n = tokens_df.count()
    nulls = tokens_df.filter(F.col("doc_id").isNull()).count()
    assert nulls == sum(1 for i in range(1, n) if i % 11003 == 0)
    rng = tokens_df.filter((F.col("n_tok") < 1) | (F.col("n_tok") > 8192)).count()
    assert rng >= sum(1 for i in range(1, n) if i % 9973 == 0 and (i // 9973) % 2 == 1)
    ri = tokens_df.filter(F.col("source") == "__unknown__").count()
    assert ri == sum(1 for i in range(1, n) if i % 7919 == 0)


def test_source_skew(tokens_df):
    dist = {r.source: r.c for r in tokens_df.groupBy("source").agg(F.count("*").alias("c")).collect()}
    total = sum(dist.values())
    assert dist["web"] / total > 0.55  # Zipf head exercises salting
    assert set(dist) <= set(SOURCES) | {"__unknown__"}
