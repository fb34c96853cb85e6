"""Deterministic generator for the primary input table (FIXTURES.md F1).

Shape fixed by BASELINE.json ``input_hint``:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Everything is generated *inside* Spark with built-in expressions —
``spark.range`` + hash-derived uniforms — so the generator is fully
distributed, seed-stable, and produces byte-identical rows for a given
(seed, n_rows) regardless of parallelism or partition count. That last
property is what makes the token-array byte-equality invariant
(FIXTURES.md F5.4) testable across repartitionings.

Planted violations (FIXTURES.md F1), all guarded with ``id > 0`` so row 0
(0 % k == 0 for every k) is not a violation of everything at once:
  - every 10,007th doc_id repeats its predecessor  -> uniqueness
  - every 11,003rd doc_id is NULL                  -> not-null
  - every  9,973rd n_tok is 0 or 200,000           -> range
  - every  8,191st n_tok != size(tokens)           -> consistency
  - every  7,919th source = '__unknown__'          -> referential integrity

The reference profiles per-column pandas Series loaded from CSV
(reference: kg_governor/data_profiling/profile_data.py:111-116); our
table is columnar from birth.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 50257  # GPT-2-style BPE vocab size (public constant)
MAX_NTOK = 8192
NTOK_MU = math.log(400.0)
NTOK_SIGMA = 1.0

# Zipf-ish closed source vocabulary; ~60% mass on `web` exercises the
# salted-repartition path (FIXTURES.md F1).
SOURCE_VOCAB: list[tuple[str, float]] = [
    ("web", 0.60),
    ("books", 0.15),
    ("code", 0.10),
    ("wiki", 0.08),
    ("forums", 0.04),
    ("news", 0.02),
    ("papers", 0.01),
]
SOURCES = [s for s, _ in SOURCE_VOCAB]

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), True), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

_BIG = 2**31


def _uniform(*cols) -> F.Column:
    """Deterministic uniform in (0, 1) from a 64-bit hash of the inputs."""
    return (F.pmod(F.xxhash64(*cols), F.lit(_BIG)) + F.lit(0.5)) / F.lit(float(_BIG))


def generate_tokens(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    plant_violations: bool = True,
    ntok_shift: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Build the tokens table; ``ntok_shift`` shifts the lognormal
    location for drifted variants (FIXTURES.md F2)."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    sid = F.lit(f"s{seed}:")

    # --- n_tok: lognormal via Box-Muller on two hash uniforms ---------
    u1 = _uniform(sid, F.lit("u1"), "id")
    u2 = _uniform(sid, F.lit("u2"), "id")
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    true_len = F.least(
        F.greatest(
            F.round(F.exp(F.lit(NTOK_MU + ntok_shift) + F.lit(NTOK_SIGMA) * z)).cast("int"),
            F.lit(1),
        ),
        F.lit(MAX_NTOK),
    )
    df = df.withColumn("_len", true_len)

    # --- tokens: per-position hash ints in [0, VOCAB_SIZE) -----------
    tok = F.transform(
        F.sequence(F.lit(0), F.col("_len") - 1),
        lambda p: F.pmod(F.xxhash64(sid, F.col("id"), p), F.lit(VOCAB_SIZE)).cast("int"),
    )
    df = df.withColumn("tokens", tok)

    # --- source: inverse-CDF on a hash uniform ------------------------
    us = _uniform(sid, F.lit("src"), "id")
    cdf = 0.0
    src = F.lit(SOURCE_VOCAB[-1][0])
    # build CASE WHEN u < cum_p THEN name ... from the front
    expr = None
    for name, p in SOURCE_VOCAB:
        cdf += p
        cond = us < F.lit(cdf)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    src = expr.otherwise(F.lit(SOURCE_VOCAB[-1][0]))
    df = df.withColumn("source", src)

    doc_id = F.format_string("doc-%012d", F.col("id"))
    n_tok = F.col("_len")

    if plant_violations:
        planted = F.col("id") > 0
        # uniqueness: repeat the predecessor's id
        doc_id = F.when(
            planted & (F.col("id") % 10007 == 0),
            F.format_string("doc-%012d", F.col("id") - 1),
        ).otherwise(doc_id)
        # not-null
        doc_id = F.when(planted & (F.col("id") % 11003 == 0), F.lit(None)).otherwise(doc_id)
        # range: alternate 0 / 200000
        n_tok = F.when(
            planted & (F.col("id") % 9973 == 0),
            F.when((F.col("id") / 9973).cast("long") % 2 == 0, F.lit(0)).otherwise(
                F.lit(200000)
            ),
        ).otherwise(n_tok)
        # consistency: n_tok off by one vs the actual array
        n_tok = F.when(
            planted & (F.col("id") % 8191 == 0), F.col("_len") + 1
        ).otherwise(n_tok)
        df = df.withColumn(
            "source",
            F.when(planted & (F.col("id") % 7919 == 0), F.lit("__unknown__")).otherwise(
                F.col("source")
            ),
        )

    return df.select(
        doc_id.alias("doc_id"),
        F.col("tokens"),
        n_tok.cast("int").alias("n_tok"),
        F.col("source"),
    )


def valid_sources(spark: SparkSession) -> DataFrame:
    """Referential-integrity dimension (FIXTURES.md F3): the closed
    vocabulary, excluding '__unknown__'."""
    return spark.createDataFrame([(s,) for s in SOURCES], "source string")
