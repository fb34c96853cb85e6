"""Cross-table token-array equality — the per-row parity invariant.

The engine's contract with the system it replaces is per-row
token-array byte-equality (reference: kglids' profiler emits per-column
content hashes the KG join keys on — kg_governor/data_profiling; here
the invariant is the stronger array-equality form the validation north
star names). These operators make that invariant CHECKABLE at corpus
scale: given two tokenized tables (a reference export and this
engine's, two tokenizer versions, or a pre/post-migration pair), emit a
per-row verdict and the first differing position, plus a one-row-per-
verdict summary for the CI gate.

Scale shape: ONE shuffle — the full-outer SortMergeJoin on the id
(both sides are corpus-sized, so no broadcast exists; on Iceberg
tables bucketed by ``bucket(N, doc_id)`` on both sides the join is
co-partitioned and shuffle-free). Everything after the join is
zero-shuffle array expressions: the element comparison is one
``zip_with`` + ``array_position`` pass, never an explode, so a
mismatch row costs O(len) in-place work and emits one row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["token_equality_diff", "token_equality_summary"]


def token_equality_diff(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-row diff of two tokenized tables on ``id_col``.

    Returns one row per id present on either side:
      - ``verdict``: 'match' | 'mismatch' | 'left_only' | 'right_only'
        (NULL-array vs NULL-array is a match — eqNullSafe semantics;
        NULL-array vs array is a mismatch)
      - ``n_tok_left`` / ``n_tok_right``: array sizes (NULL when the
        row is absent on that side or its array is NULL)
      - ``first_diff_pos``: 1-based position of the first differing
        element for mismatches with both arrays non-NULL; a pure
        length difference counts as a diff at min(len)+1 (zip_with
        pads the shorter side with NULL, which never nullsafe-equals
        a real token). NULL for every other verdict.
    """
    lp, rp = "__lpresent", "__rpresent"
    l = left.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col).alias("__l"),
        F.lit(True).alias(lp),
    )
    r = right.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col).alias("__r"),
        F.lit(True).alias(rp),
    )
    j = l.join(r, "__id", "full_outer")

    both = F.col(lp).isNotNull() & F.col(rp).isNotNull()
    arrays_eq = F.col("__l").eqNullSafe(F.col("__r"))
    verdict = (
        F.when(F.col(lp).isNull(), F.lit("right_only"))
        .when(F.col(rp).isNull(), F.lit("left_only"))
        .when(arrays_eq, F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    # positionwise nullsafe equality; for a mismatch with both arrays
    # non-NULL some position is always false (a shared-prefix length
    # difference hits the NULL padding), so array_position >= 1 there
    zip_eq = F.zip_with("__l", "__r", lambda a, b: a.eqNullSafe(b))
    first_diff = F.when(
        both
        & ~arrays_eq
        & F.col("__l").isNotNull()
        & F.col("__r").isNotNull(),
        F.array_position(zip_eq, F.lit(False)),
    )
    return j.select(
        F.col("__id").alias(id_col),
        verdict.alias("verdict"),
        F.when(F.col(lp).isNotNull(), F.size("__l")).alias("n_tok_left"),
        F.when(F.col(rp).isNotNull(), F.size("__r")).alias("n_tok_right"),
        first_diff.alias("first_diff_pos"),
    )


def token_equality_summary(diff: DataFrame) -> DataFrame:
    """(verdict, n_rows) — the CI-gate reduction of a parity diff: a
    clean migration is one row ('match', N). Map-side-combined groupBy
    over the diff; four output rows max."""
    return diff.groupBy("verdict").agg(F.count(F.lit(1)).alias("n_rows"))
