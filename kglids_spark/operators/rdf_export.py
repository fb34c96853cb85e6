"""RDF sinks: RDF-star N-Triples shards + prefixed Turtle documents.

The reference serializes its knowledge graph two ways:

1. The DATA graph (large: one similarity/profile triple set per task)
   is written as concatenated N-Triples shards with full IRIs —
   per-task temp files named ``<random>.nt``
   (kg_governor/data_global_schema_builder/workers.py:49-52,80-83,
   utils/utils.py:27-90 ``RDFResource``/``Triplet``).  N-Triples is a
   subset of Turtle, so these shards need no prefix header and
   concatenate freely — which is exactly why the reference (and we)
   pick it for the distributed sink: ``df.write.text`` emits one valid
   shard per partition with no cross-partition coordination.
2. The PIPELINE graphs (small: driver-side metadata) are written as
   prefixed Turtle pages with an ``@prefix`` header
   (kg_governor/pipeline_abstraction/json_to_rdf/__init__.py:6-12,
   abstract_pipelines.py:71-75,129).  Turtle permits re-declaring
   prefixes, so a per-partition header also keeps every part file a
   valid Turtle document — concatenation stays parseable.

Serialization rules mirror ``RDFResource.__repr__`` (utils.py:33-50):
IRIs as ``<namespace + id>``, strings quoted with ``"`` → ``\\"``,
newline → ``\\n``, ``\\r`` stripped; floats rounded to 3 decimals and
printed bare (shortest repr — similarity scores live in
[threshold, 1], so no scientific notation can appear).  RDF-star
annotation and its "reversed" twin follow ``Triplet.__repr_helper`` /
``get_reversed_triple`` (utils.py:64-90): the reverse of an RDF-star
triple swaps only the nested subject/object.

Everything here is pure Column expressions — string concat stays in
whole-stage codegen; the sink is a straight text write, so the only
cost at 100 TB is the I/O itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference namespace table:
# kg_governor/data_global_schema_builder/build_data_global_schema.py:43-48
ONTOLOGY: dict[str, str] = {
    "kglids": "http://kglids.org/ontology/",
    "kglidsData": "http://kglids.org/ontology/data/",
    "kglidsResource": "http://kglids.org/resource/",
    "schema": "http://schema.org/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
}


def iri(local: Column | str, namespace: str = ONTOLOGY["kglidsResource"]) -> Column:
    """``<namespace+local>`` (RDFResource with a namespace, utils.py:34-36)."""
    local = F.col(local) if isinstance(local, str) else local
    return F.concat(F.lit("<" + namespace), local, F.lit(">"))


def string_literal(col: Column | str) -> Column:
    """Quoted literal with the reference's escaping (utils.py:40-41):
    ``"`` → ``\\"``, newline → ``\\n``, carriage returns dropped."""
    col = F.col(col) if isinstance(col, str) else col
    esc = F.replace(col, F.lit('"'), F.lit('\\"'))
    esc = F.replace(esc, F.lit("\n"), F.lit("\\n"))
    esc = F.replace(esc, F.lit("\r"), F.lit(""))
    return F.concat(F.lit('"'), esc, F.lit('"'))


def float_literal(col: Column | str, scale: int = 3) -> Column:
    """Bare rounded float (utils.py:45-46 rounds to 3)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col, scale).cast("string")


def triple_line(subject: Column, predicate: Column, obj: Column) -> Column:
    """``S P O.`` — Triplet.__repr_helper(isRoot=True), utils.py:74-77.

    Built with null-PROPAGATING concat (not concat_ws, which silently
    skips nulls and would emit a malformed 2-token line): a triple with
    any null part serializes to null, and the callers' isNotNull
    filters drop it instead of corrupting the .nt shard."""
    return F.concat(subject, F.lit(" "), predicate, F.lit(" "), obj, F.lit("."))


def rdf_star_lines(
    nested_subject: Column,
    nested_predicate: Column,
    nested_object: Column,
    annotation_predicate: Column,
    annotation_object: Column,
) -> Column:
    """Array of [forward, reversed] RDF-star annotation lines.

    ``<<S P O>> AP AO.`` plus ``<<O P S>> AP AO.`` — the pair the
    reference emits per similarity edge
    (workers.py:126-136 ``_create_column_similarity_triples``,
    utils.py:83-90 ``get_reversed_triple``)."""

    def star(s: Column, o: Column) -> Column:
        quoted = F.concat(
            F.lit("<<"), s, F.lit(" "), nested_predicate, F.lit(" "), o, F.lit(">>")
        )
        return triple_line(quoted, annotation_predicate, annotation_object)

    return F.array(
        star(nested_subject, nested_object),
        star(nested_object, nested_subject),
    )


# kind → reference predicate local name (workers.py:96-121)
_SIMILARITY_PREDICATES = {
    "label": "hasLabelSimilarity",
    "content": "hasContentSimilarity",
    "semantic": "hasSemanticSimilarity",
    "deep": "hasDeepEmbeddingContentSimilarity",
}


def similarity_ntriples(
    edges: DataFrame,
    col1: str = "col1_id",
    col2: str = "col2_id",
    kind: str = "kind",
    score: str = "score",
) -> DataFrame:
    """Serialize a similarity-edges DataFrame (the S6 similarities
    table) to RDF-star N-Triples lines — the S7 sink's row format.

    One input edge → two output rows (forward + reversed annotation),
    exactly the pair list the reference writes per column pair.  The
    explode stays map-side: no shuffle is introduced, so the plan is
    scan → project → explode → write, partition-parallel at any scale.
    """
    pred = F.concat(
        F.lit("<" + ONTOLOGY["kglidsData"]),
        F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in _SIMILARITY_PREDICATES.items() for x in kv]
                ),
                F.col(kind),
            ),
            F.col(kind),  # already a predicate local name
        ),
        F.lit(">"),
    )
    lines = rdf_star_lines(
        iri(F.col(col1)),
        pred,
        iri(F.col(col2)),
        F.lit("<" + ONTOLOGY["kglidsData"] + "withCertainty>"),
        float_literal(F.col(score)),
    )
    # a null id/score nulls the whole line (triple_line propagates);
    # drop it rather than shipping a malformed shard line
    return edges.select(
        F.explode(F.filter(lines, lambda x: x.isNotNull())).alias("line")
    )


def profile_ntriples(profiles: DataFrame) -> DataFrame:
    """Serialize column profiles to the reference's per-column triple
    set (workers.py:10-47 ``column_metadata_worker``): membership
    (isPartOf / rdf:type Column), metadata (hasDataType, schema:name,
    value counts, rdfs:label "..."@en), numeric stats
    (hasMedianValue / hasMaxValue / hasMinValue, floats rounded to 3)
    and hasTrueRatio for booleans.

    Input: the profiler's PROFILE_SCHEMA rows (operators/profiler.py).
    One map-side array build + explode per profile row; profiles are
    metadata (≪ data), so this stage is never the bottleneck — it
    exists for bit-parity of the emitted .nt shards."""
    from kglids_spark.functions.scalar import generate_label

    col_node = iri(F.col("column_id"))
    table_node = iri(F.col("table_id"))

    def data_pred(name: str) -> Column:
        return F.lit("<" + ONTOLOGY["kglidsData"] + name + ">")

    label_lit = F.concat(
        F.lit('"'), generate_label(F.col("column_name")), F.lit('"@en')
    )
    is_numeric = F.col("data_type").isin("int", "float")
    lines = F.array(
        triple_line(col_node, F.lit("<" + ONTOLOGY["kglids"] + "isPartOf>"), table_node),
        triple_line(
            col_node,
            F.lit("<" + ONTOLOGY["rdf"] + "type>"),
            F.lit("<" + ONTOLOGY["kglids"] + "Column>"),
        ),
        triple_line(col_node, data_pred("hasDataType"), string_literal(F.col("data_type"))),
        triple_line(
            col_node,
            F.lit("<" + ONTOLOGY["schema"] + "name>"),
            string_literal(F.col("column_name")),
        ),
        triple_line(
            col_node,
            data_pred("hasTotalValueCount"),
            F.col("total_values_count").cast("string"),
        ),
        triple_line(
            col_node,
            data_pred("hasDistinctValueCount"),
            F.col("distinct_values_count").cast("string"),
        ),
        triple_line(
            col_node,
            data_pred("hasMissingValueCount"),
            F.col("missing_values_count").cast("string"),
        ),
        triple_line(col_node, F.lit("<" + ONTOLOGY["rdfs"] + "label>"), label_lit),
        F.when(
            is_numeric,
            triple_line(col_node, data_pred("hasMedianValue"), float_literal(F.col("median"))),
        ),
        F.when(
            is_numeric,
            triple_line(col_node, data_pred("hasMaxValue"), float_literal(F.col("max_value"))),
        ),
        F.when(
            is_numeric,
            triple_line(col_node, data_pred("hasMinValue"), float_literal(F.col("min_value"))),
        ),
        F.when(
            F.col("data_type") == "boolean",
            triple_line(col_node, data_pred("hasTrueRatio"), float_literal(F.col("true_ratio"))),
        ),
    )
    return profiles.select(
        F.explode(F.filter(lines, lambda x: x.isNotNull())).alias("line")
    )


def write_ntriples(lines: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed .nt sink: one shard per partition, all concatenable
    (the reference's per-task ``<random>.nt`` files, workers.py:49-52,
    made deterministic by Spark's part-file naming)."""
    lines.write.mode(mode).text(path)


def turtle_prefix_header(prefixes: dict[str, str] | None = None) -> str:
    """``@prefix`` header block (json_to_rdf/__init__.py:6-12)."""
    prefixes = prefixes or ONTOLOGY
    return "\n".join(
        f"@prefix {name}: <{ns}> ." for name, ns in prefixes.items()
    )


def turtle_lines(
    triples: DataFrame,
    subject: str = "subject",
    predicate: str = "predicate",
    obj: str = "object",
    prefixes: dict[str, str] | None = None,
) -> DataFrame:
    """Prefixed Turtle statements from a generic (subject, predicate,
    object) triple DataFrame.  Full IRIs written as ``<...>`` are
    compressed to qnames; longest namespace substituted first so
    nested namespaces (kglidsData under kglids) compress correctly.
    Literals (anything not shaped ``<...>``) pass through untouched.
    """
    prefixes = prefixes or ONTOLOGY
    by_len = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def qname(col: Column) -> Column:
        out = col
        for name, ns in by_len:
            # only a full <ns+local> IRI compresses; strip the wrapper
            out = F.when(
                out.startswith("<" + ns) & out.endswith(">"),
                F.concat(
                    F.lit(name + ":"),
                    F.substring(out, len(ns) + 2, 2**30),
                ),
            ).otherwise(out)
        # the substring above keeps the trailing '>' — drop it
        out = F.when(
            out.rlike("^[A-Za-z][A-Za-z0-9]*:.*>$"),
            F.substring(out, 1, F.length(out) - F.lit(1)),
        ).otherwise(out)
        return out

    return triples.select(
        triple_line(
            qname(F.col(subject)), qname(F.col(predicate)), qname(F.col(obj))
        ).alias("line")
    )


def write_turtle(
    lines: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Turtle sink with a per-partition ``@prefix`` header.

    Turtle allows re-declaring prefixes, so prepending the header to
    EVERY partition keeps each part file a standalone valid Turtle
    document AND their concatenation parseable — no single-partition
    collapse, no driver round-trip, unlike a file-level header would
    require.  The header ride-along is a per-partition constant, so
    cost is O(partitions), not O(rows)."""
    header = turtle_prefix_header(prefixes)
    schema = lines.schema

    def prepend(it):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        first = True
        for batch in it:
            if first:
                yield pd.DataFrame({schema[0].name: [header]})
                first = False
            yield batch

    lines.mapInPandas(prepend, schema).write.mode(mode).text(path)
