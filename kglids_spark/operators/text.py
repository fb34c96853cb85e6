"""Text-analysis operators for training-data pipelines: language id,
quality scoring, token counting, document fingerprinting.

The reference's text handling is ML-model-based (fastText vocabulary +
TweetTokenizer in fine_grained_type_detector.py:44-55, spaCy NER) —
weights absent from the checkout. These operators are the
public-knowledge, expression-only equivalents used by data pipelines:
n-gram/stopword heuristics and hash fingerprints, all pure Column
expressions (whole-stage codegen, zero Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglids_spark.operators.dedup import normalize_text, word_shingles

# tiny high-frequency stopword lists per language (public knowledge)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "que", "con", "para"],
}

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def words_expr(col) -> F.Column:
    return F.split(normalize_text(col), " ")


def lang_id_expr(col) -> F.Column:
    """Argmax over per-language stopword hit counts; 'und' (undetermined)
    when no stopwords match."""
    words = words_expr(col)
    best = F.struct(F.lit(0).alias("hits"), F.lit("und").alias("lang"))
    for lang, sws in LANG_STOPWORDS.items():
        hits = F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sws])))
        cand = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        best = F.when(cand["hits"] > best["hits"], cand).otherwise(best)
    return best["lang"]


def token_count_ws(col) -> F.Column:
    """Whitespace token count."""
    return F.size(words_expr(col))


def token_count_bpe(col) -> F.Column:
    """BPE-ish token count via regexp_extract_all (JVM regex, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features: char length, word count, mean
    word length, punctuation ratio, stopword ratio (en), uppercase
    ratio, digit ratio, and a composite [0,1] quality score with
    published-heuristic flavor (Gopher/C4-style length+symbol rules)."""
    c = F.col(text_col)
    words = words_expr(text_col)
    n_chars = F.length(c)
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), F.lit(0)))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), F.lit(0)))
    en_sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), en_sw))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    out = (
        df.withColumn("q_n_chars", n_chars)
        .withColumn("q_n_words", n_words)
        .withColumn("q_mean_word_len", safe(n_chars, n_words))
        .withColumn("q_punct_ratio", safe(n_punct, n_chars))
        .withColumn("q_digit_ratio", safe(n_digit, n_chars))
        .withColumn("q_upper_ratio", safe(n_upper, n_chars))
        .withColumn("q_stopword_hits", n_stop)
    )
    score = (
        F.when((F.col("q_n_words") >= 5) & (F.col("q_n_words") <= 100000), 0.4).otherwise(0.0)
        + F.when(F.col("q_punct_ratio") <= 0.3, 0.2).otherwise(0.0)
        + F.when(F.col("q_digit_ratio") <= 0.3, 0.1).otherwise(0.0)
        + F.when(F.col("q_mean_word_len").between(2.0, 12.0), 0.1).otherwise(0.0)
        + F.when(F.col("q_stopword_hits") >= 2, 0.2).otherwise(0.0)
    )
    return out.withColumn("q_score", score.cast("double"))


def fingerprint_expr(col, shingle_n: int = 3) -> F.Column:
    """64-bit document fingerprint: min xxhash64 over word shingles
    (one-permutation MinHash) — robust to reordering of rare edits,
    deterministic, mergeable (min)."""
    return F.array_min(
        F.transform(word_shingles(col, shingle_n), lambda s: F.xxhash64(s))
    )


def fingerprint_md5_expr(col, shingle_n: int = 3) -> F.Column:
    """Portable fingerprint: lexicographic-min md5 over word shingles
    (one-permutation MinHash with a cross-engine hash) — identical in
    any SQL engine, used for the exact DuckDB oracle. The xxhash64
    variant is the production path (8-byte longs vs 32-char hex)."""
    return F.array_min(
        F.transform(word_shingles(col, shingle_n), lambda s: F.md5(s))
    )


def content_digest_expr(col) -> F.Column:
    """Exact content digest (md5 of normalized text)."""
    return F.md5(normalize_text(col))


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection: language, token counts,
    quality features, fingerprints."""
    out = quality_features(df, text_col)
    return (
        out.withColumn("lang_pred", lang_id_expr(text_col))
        .withColumn("n_tok_ws", token_count_ws(text_col))
        .withColumn("n_tok_bpe", token_count_bpe(text_col))
        .withColumn("fingerprint", fingerprint_expr(text_col))
        .withColumn("digest", content_digest_expr(text_col))
    )
