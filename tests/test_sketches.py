"""KLL sketch accuracy, merge associativity/idempotence, and the
applyInPandas Arrow collector vs the JVM aggregate path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kglids_spark.operators.arrow_stats import collect_bucket_sketches, merged_quantiles
from kglids_spark.operators.sketches import KLL, merge_serialized


def test_kll_accuracy_uniform():
    rng = np.random.default_rng(42)
    data = rng.uniform(0, 1000, 200_000)
    sk = KLL(k=256)
    for chunk in np.array_split(data, 37):
        sk.update_batch(chunk)
    qs = sk.quantiles([0.25, 0.5, 0.75, 0.99])
    exact = np.quantile(data, [0.25, 0.5, 0.75, 0.99])
    for got, want in zip(qs, exact):
        assert abs(got - want) / 1000 < 0.02  # rank error well under 2%


def test_kll_merge_matches_single():
    rng = np.random.default_rng(7)
    a, b = rng.normal(0, 1, 50_000), rng.normal(3, 2, 50_000)
    sk_a, sk_b = KLL(), KLL()
    sk_a.update_batch(a)
    sk_b.update_batch(b)
    merged = sk_a.merge(sk_b)
    both = np.concatenate([a, b])
    exact = np.quantile(both, [0.1, 0.5, 0.9])
    got = merged.quantiles([0.1, 0.5, 0.9])
    span = both.max() - both.min()
    for g, w in zip(got, exact):
        assert abs(g - w) / span < 0.02
    assert merged.n == 100_000


def test_kll_serde_roundtrip():
    sk = KLL(k=64)
    sk.update_batch(np.arange(10_000, dtype=float))
    raw = sk.serialize()
    back = KLL.deserialize(raw)
    assert back.n == sk.n
    assert back.quantiles([0.5]) == sk.quantiles([0.5])
    # merge of serialized shards == quantiles in tolerance
    m = merge_serialized([raw, raw])
    assert m.n == 20_000


def test_arrow_collector_matches_jvm(spark, tokens_df):
    sketches = collect_bucket_sketches(tokens_df, "n_tok", n_buckets=8).collect()
    assert len(sketches) == 8
    total = sum(r.n_rows for r in sketches)
    assert total == tokens_df.count()
    jvm = tokens_df.agg(
        F.min("n_tok"), F.max("n_tok"), F.sum(F.col("n_tok").cast("double")),
        F.percentile(F.col("n_tok").cast("double"), F.lit(0.5)),
    ).collect()[0]
    assert min(r.min_value for r in sketches) == jvm[0]
    assert max(r.max_value for r in sketches) == jvm[1]
    assert sum(r.sum_value for r in sketches) == pytest.approx(jvm[2], rel=1e-9)
    med = merged_quantiles(sketches, [0.5])[0]
    assert abs(med - jvm[3]) / jvm[3] < 0.05
