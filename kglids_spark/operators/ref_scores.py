"""Reference-formula similarity scoring over user-supplied embeddings.

The engine's default similarity layer (operators/similarity.py) uses
public stand-ins for the reference's learned scores because the GloVe /
CoLR weights are absent from the checkout. This module closes the
score-parity gap for users who HAVE embeddings: ingest a word→vector
table (any dimension) and column profiles carrying per-column content
embeddings + scaling factors, and the engine computes the reference's
exact formulae:

- label similarity = mean pairwise dot product of unit-normalized word
  vectors of the two sanitized column labels, with exact-match
  short-circuit to 1.0, empty-vs-nonempty → 0.0, common-token removal
  when both labels are multi-token, revert-to-full-lists when removal
  empties exactly one side, 1.0 when it empties both, and 0.0 when any
  surviving token has no vector
  (kg_governor/data_global_schema_builder/utils/word_embeddings.py:46-75);
- content similarity (non-boolean) = 1 - tanh(‖e1-e2‖₂ + s1 + s2),
  the CoLR distance (workers.py:111-121);
- content similarity (boolean) = 1 - |true_ratio1 - true_ratio2|
  (workers.py:105-110).

Shape: one triangular same-dtype cross-table pair join over profile
rows (profiles ≪ data — the same θ-join as similarity.py J1), then the
label-token work explodes only the pair×token combinations (labels are
a handful of tokens, so this is |pairs| × O(1) rows). The word-vector
join broadcasts. Mean pairwise dot is computed as sum/count over the
exploded combinations — no O(dim) per-pair expression trees; dot
products stay in zip_with/aggregate over the vector arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglids_spark.functions.scalar import dot_product, generate_label, l2_norm

ROUND_DP = 5  # cross-engine-stable score rounding (matches ANN oracles)


def ingest_word_vectors(
    word_vectors: DataFrame, word_col: str = "word", vec_col: str = "vector"
) -> DataFrame:
    """Normalize each vector to unit length — the reference does this
    once at model load (word_embeddings.py:21-33) so that
    semantic_distance is a plain dot product."""
    norm = l2_norm(F.col(vec_col))
    return word_vectors.select(
        F.col(word_col).alias("word"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm).alias("vec"),
    )


def _pairs(profiles: DataFrame) -> DataFrame:
    a, b = profiles.alias("a"), profiles.alias("b")
    return (
        a.join(
            b,
            (F.col("a.data_type") == F.col("b.data_type"))
            & (F.col("a.table_id") != F.col("b.table_id"))
            & (F.col("a.column_id") < F.col("b.column_id")),
            "inner",
        )
        .select(
            F.col("a.column_id").alias("col1_id"),
            F.col("b.column_id").alias("col2_id"),
            F.col("a.data_type").alias("data_type"),
            generate_label(F.col("a.column_name")).alias("l1"),
            generate_label(F.col("b.column_name")).alias("l2"),
            F.col("a.embedding").alias("e1"),
            F.col("b.embedding").alias("e2"),
            F.col("a.scaling_factor").alias("s1"),
            F.col("b.scaling_factor").alias("s2"),
            F.col("a.true_ratio").alias("tr1"),
            F.col("b.true_ratio").alias("tr2"),
        )
    )


def label_similarity_reference(
    profiles: DataFrame, word_vectors: DataFrame
) -> DataFrame:
    """(col1_id, col2_id, score) for every same-dtype cross-table pair,
    scored by the reference's get_distance_between_column_labels."""
    wv = F.broadcast(ingest_word_vectors(word_vectors))

    empty = F.array().cast("array<string>")
    p = _pairs(profiles).select(
        "col1_id",
        "col2_id",
        "l1",
        "l2",
        F.when(F.col("l1") == "", empty).otherwise(F.split("l1", " ")).alias("la"),
        F.when(F.col("l2") == "", empty).otherwise(F.split("l2", " ")).alias("lb"),
    )
    inter = F.array_intersect("la", "lb")
    both_multi = (F.size("la") > 1) & (F.size("lb") > 1)
    # list-comprehension removal, not array_except: preserves duplicate
    # non-common tokens, as the reference's filter does
    ra = F.when(
        both_multi, F.filter("la", lambda t: ~F.array_contains(inter, t))
    ).otherwise(F.col("la"))
    rb = F.when(
        both_multi, F.filter("lb", lambda t: ~F.array_contains(inter, t))
    ).otherwise(F.col("lb"))
    p = p.withColumn("ra", ra).withColumn("rb", rb)
    revert = ((F.size("ra") >= 1) & (F.size("rb") == 0)) | (
        (F.size("rb") >= 1) & (F.size("ra") == 0)
    )
    p = p.withColumn("fa", F.when(revert, F.col("la")).otherwise(F.col("ra")))
    p = p.withColumn("fb", F.when(revert, F.col("lb")).otherwise(F.col("rb")))

    # branch order mirrors the reference: exact match first, then the
    # empty-label check, then the empty-combination check
    branch = (
        F.when(F.col("l1") == F.col("l2"), F.lit(1.0))
        .when(
            ((F.col("l1") == "") & (F.col("l2") != ""))
            | ((F.col("l1") != "") & (F.col("l2") == "")),
            F.lit(0.0),
        )
        .when((F.size("fa") == 0) & (F.size("fb") == 0), F.lit(1.0))
        .otherwise(F.lit(None).cast("double"))
    )
    p = p.withColumn("branch", branch).persist()

    need_tokens = p.filter(F.col("branch").isNull())
    ta = need_tokens.select("col1_id", "col2_id", F.explode("fa").alias("tok"))
    tb = need_tokens.select("col1_id", "col2_id", F.explode("fb").alias("tok"))
    ta = ta.join(wv, ta.tok == wv.word, "left").select(
        "col1_id", "col2_id", F.col("vec").alias("va")
    )
    tb = tb.join(wv, tb.tok == wv.word, "left").select(
        "col1_id", "col2_id", F.col("vec").alias("vb")
    )
    combos = ta.join(tb, ["col1_id", "col2_id"])
    token_scores = combos.groupBy("col1_id", "col2_id").agg(
        F.max(
            (F.col("va").isNull() | F.col("vb").isNull()).cast("int")
        ).alias("any_missing"),
        F.sum(dot_product("va", "vb")).alias("dot_sum"),
        F.count(F.lit(1)).alias("n_combos"),
    )
    token_score = F.when(F.col("any_missing") == 1, F.lit(0.0)).otherwise(
        F.col("dot_sum") / F.col("n_combos")
    )

    out = (
        p.join(
            token_scores.select(
                "col1_id", "col2_id", token_score.alias("token_score")
            ),
            ["col1_id", "col2_id"],
            "left",
        )
        .select(
            "col1_id",
            "col2_id",
            F.round(F.coalesce("branch", "token_score"), ROUND_DP).alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    p.unpersist()
    return out


def content_similarity_reference(profiles: DataFrame) -> DataFrame:
    """(col1_id, col2_id, score): CoLR 1 - tanh(L2 + s1 + s2) for
    non-boolean pairs with embeddings, 1 - |tr1 - tr2| for booleans."""
    p = _pairs(profiles)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("e1", "e2", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    colr = 1.0 - F.tanh(dist + F.col("s1") + F.col("s2"))
    boolean = 1.0 - F.abs(F.col("tr1") - F.col("tr2"))
    score = F.when(F.col("data_type") == "boolean", boolean).otherwise(
        F.when(F.col("e1").isNotNull() & F.col("e2").isNotNull(), colr)
    )
    return p.select(
        "col1_id", "col2_id", F.round(score, ROUND_DP).alias("score")
    ).filter(F.col("score").isNotNull())


def fasttext_subword_buckets(minn: int = 3, maxn: int = 6, n_buckets: int = 2_000_000):
    """Arrow-batched UDF: word → the fastText subword-bucket ids of
    ``<word>`` — the PUBLIC scheme from fastText's dictionary
    (facebookresearch/fastText src/dictionary.cc): char n-grams of the
    boundary-marked word for n in [minn, maxn] (1-grams that are only
    a boundary marker excluded), each hashed with sign-extended FNV-1a
    over its UTF-8 bytes, modulo the bucket count. Deterministic and
    engine-portable; the DuckDB oracle recomputes it in SQL."""

    def _buckets_of(word: str) -> list[int]:
        marked = "<" + word + ">"
        ids = []
        L = len(marked)
        for i in range(L):
            for n in range(1, maxn + 1):
                if i + n > L:
                    break
                if n < minn or (n == 1 and (i == 0 or i + n == L)):
                    continue
                h = 2166136261
                for b in marked[i : i + n].encode("utf-8"):
                    h = (h ^ (b if b < 128 else b | 0xFFFFFF00)) & 0xFFFFFFFF
                    h = (h * 16777619) & 0xFFFFFFFF
                ids.append(h % n_buckets)
        return ids

    @F.pandas_udf("array<long>")
    def _buckets(words: pd.Series) -> pd.Series:
        return words.map(_buckets_of)

    return _buckets


def sentence_embeddings(
    names: DataFrame,
    word_vectors: DataFrame,
    id_col: str = "column_id",
    name_col: str = "column_name",
    *,
    subword_vectors: DataFrame | None = None,
    minn: int = 3,
    maxn: int = 6,
    n_buckets: int = 2_000_000,
    bucket_col: str = "bucket",
    subword_vec_col: str = "vector",
) -> DataFrame:
    """F12: fastText ``get_sentence_vector`` parity over a
    user-supplied word→vector table — the label embedding the reference
    stores per column (kglids_server.py:53-54,
    storage_utils/embedding_store_utils.py:82-84). fastText's sentence
    vector is the mean of the UNIT-NORMALIZED word vectors of the
    whitespace tokens; the reference sanitizes the name first
    (``replace('\\n',' ').replace('_',' ').strip()``).

    OOV backoff (closes the round-3 documented divergence): with
    ``subword_vectors`` supplied — a (bucket:long, vector) table in the
    same user-supplied-table format, standing in for fastText's dense
    input matrix rows — an out-of-vocabulary token gets fastText's OOV
    word vector: the sum of its subword-bucket vectors divided by the
    TOTAL n-gram count (buckets absent from the table contribute zero,
    exactly a zero matrix row), unit-normalized like every other word
    vector; zero-norm words are skipped from both numerator and
    denominator (fastText getSentenceVector's norm>0 guard). Without
    ``subword_vectors`` (default) OOV tokens are skipped as before.

    Shape: names are metadata (≪ data), the vocab and bucket joins
    broadcast, and every per-token/per-name fold is a grouped
    collect_list + higher-order aggregate over a handful of rows — no
    posexplode of the vector dimension, no per-row Python (the bucket
    UDF is Arrow-batched)."""
    sanitized = F.trim(
        F.regexp_replace(
            F.replace(F.replace(F.col(name_col), F.lit("\n"), F.lit(" ")), F.lit("_"), F.lit(" ")),
            r"\s+",
            " ",
        )
    )
    toks = names.select(
        F.col(id_col),
        F.posexplode(F.split(sanitized, " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    vocab = F.broadcast(ingest_word_vectors(word_vectors))
    token_vecs = toks.join(vocab, "word").select(id_col, "pos", "vec")

    if subword_vectors is not None:
        oov = toks.join(vocab.select("word"), "word", "left_anti")
        grams = oov.withColumn(
            "_grams", fasttext_subword_buckets(minn, maxn, n_buckets)(F.col("word"))
        ).select(
            id_col,
            "pos",
            F.size("_grams").alias("_n_grams"),
            F.explode("_grams").alias("_bkt"),
        )
        sub = F.broadcast(
            subword_vectors.select(
                F.col(bucket_col).cast("long").alias("_bkt"),
                F.col(subword_vec_col).alias("_bvec"),
            )
        )
        bv = F.col("_bvs")
        bzero = F.transform(F.element_at(bv, 1), lambda _: F.lit(0.0))
        bsum = F.aggregate(
            bv, bzero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)
        )
        raw = (
            grams.join(sub, "_bkt")  # inner: missing buckets are zero rows
            .groupBy(id_col, "pos")
            .agg(
                F.first("_n_grams").alias("_n"),
                F.collect_list("_bvec").alias("_bvs"),
            )
            .select(
                id_col,
                "pos",
                F.transform(
                    bsum, lambda s: s.cast("double") / F.col("_n")
                ).alias("_raw"),
            )
        )
        norm = l2_norm(F.col("_raw"))
        oov_vecs = raw.where(norm > 0).select(
            id_col,
            "pos",
            F.transform(F.col("_raw"), lambda x: x / norm).alias("vec"),
        )
        token_vecs = token_vecs.unionByName(oov_vecs)

    vs = F.col("vs")
    zero = F.transform(F.element_at(vs, 1), lambda _: F.lit(0.0))
    summed = F.aggregate(vs, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b))
    return (
        token_vecs.groupBy(id_col)
        .agg(F.collect_list("vec").alias("vs"))
        .select(
            id_col,
            F.transform(
                summed, lambda s: F.round(s / F.size(vs), ROUND_DP)
            ).alias("label_embedding"),
        )
    )


def reference_similarity_scores(
    profiles: DataFrame, word_vectors: DataFrame
) -> DataFrame:
    """Union of both kinds: (col1_id, col2_id, kind, score) — the
    drop-in replacement for similarity.column_similarity_edges' scoring
    when real embedding tables are supplied (thresholding/downstream
    re-ranking is unchanged and lives in similarity.py)."""
    label = label_similarity_reference(profiles, word_vectors).select(
        "col1_id", "col2_id", F.lit("label").alias("kind"), "score"
    )
    content = content_similarity_reference(profiles).select(
        "col1_id", "col2_id", F.lit("content").alias("kind"), "score"
    )
    return label.unionByName(content)
