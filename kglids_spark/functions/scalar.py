"""Scalar functions (SURVEY.md §2.7), all as JVM-side Column
expressions — no Python UDFs in any of these.

F1  generate_label — the reference's column/table-name sanitizer
    (kg_governor/data_global_schema_builder/utils/utils.py:92-99,
    duplicated at api/template.py:280-286): strip .csv, non-alnum →
    space, camel-case split, collapse whitespace, lowercase.
F8  vector math (dot / norm / cosine) over array<float|double>
    columns via zip_with + aggregate — stays in Tungsten, used by the
    kNN join (J7) and embedding near-dup dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def generate_label(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\.csv$", "")
    c = F.regexp_replace(c, r"([a-z])([A-Z])", r"$1 $2")  # camel split
    c = F.regexp_replace(c, r"[^a-zA-Z0-9]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.lower(F.trim(c))


def column_pair_id(a: Column, b: Column) -> Column:
    """Order-insensitive pair key for similarity edges."""
    return F.concat_ws("|", F.least(a, b), F.greatest(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def dot_literal(vec_col: Column | str, const_vec: list[float]) -> Column:
    """Dot product against a DRIVER-SIDE literal vector, unrolled into
    a flat chain of element_at multiplies. Unlike the zip_with/
    aggregate fold in :func:`dot_product`, this is a plain scalar
    expression tree that whole-stage codegen compiles — measured ~10×
    faster per row at dim 64 (higher-order-function lambdas evaluate
    interpreted, per element, per row). Summation order is d=0..n-1
    left-to-right, identical to the fold, so results are bit-equal."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = F.lit(0.0)
    for d, x in enumerate(const_vec):
        out = out + F.element_at(v, d + 1).cast("double") * F.lit(float(x))
    return out


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
