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


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
