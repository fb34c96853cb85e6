"""S7 Turtle / N-Triples sink: format parity with the reference's
RDFResource/Triplet serialization (utils/utils.py:27-90) and the
prefixed Turtle pages (json_to_rdf/__init__.py:6-12)."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from kglids_spark.operators.rdf_export import (
    ONTOLOGY,
    iri,
    similarity_ntriples,
    string_literal,
    turtle_lines,
    turtle_prefix_header,
    write_ntriples,
    write_turtle,
)


def _reference_star_lines(col1, col2, pred_local, score):
    """Driver-side re-implementation of the reference's
    _create_column_similarity_triples + Triplet repr for the oracle."""
    s = f"<{ONTOLOGY['kglidsResource']}{col1}>"
    o = f"<{ONTOLOGY['kglidsResource']}{col2}>"
    p = f"<{ONTOLOGY['kglidsData']}{pred_local}>"
    ap = f"<{ONTOLOGY['kglidsData']}withCertainty>"
    ao = repr(round(score, 3))
    return [
        f"<<{s} {p} {o}>> {ap} {ao}.",
        f"<<{o} {p} {s}>> {ap} {ao}.",
    ]


def test_similarity_ntriples_matches_reference_format(spark):
    edges = spark.createDataFrame(
        [
            ("ds1/t1/a", "ds2/t2/b", "content", 0.95),
            ("ds1/t1/a", "ds3/t3/c", "label", 1.0),
        ],
        "col1_id string, col2_id string, kind string, score double",
    )
    got = sorted(r.line for r in similarity_ntriples(edges).collect())
    want = sorted(
        _reference_star_lines("ds1/t1/a", "ds2/t2/b", "hasContentSimilarity", 0.95)
        + _reference_star_lines("ds1/t1/a", "ds3/t3/c", "hasLabelSimilarity", 1.0)
    )
    assert got == want


def test_similarity_ntriples_passthrough_predicate(spark):
    edges = spark.createDataFrame(
        [("a", "b", "hasCustomSimilarity", 0.8)],
        "col1_id string, col2_id string, kind string, score double",
    )
    lines = [r.line for r in similarity_ntriples(edges).collect()]
    assert all("data/hasCustomSimilarity>" in ln for ln in lines)


def test_string_literal_escaping(spark):
    df = spark.range(1).select(
        string_literal(F.lit('say "hi"\nbye\rnow')).alias("s")
    )
    # reference RDFResource.__repr__ (utils.py:40-41): " -> \", \n -> \n
    # escape sequence, \r dropped
    assert df.collect()[0].s == '"say \\"hi\\"\\nbyenow"'


def test_turtle_qname_compression_nested_namespaces(spark):
    # kglidsData's IRI extends kglids' — longest must win
    triples = spark.createDataFrame(
        [
            (
                f"<{ONTOLOGY['kglidsResource']}tbl>",
                f"<{ONTOLOGY['kglidsData']}hasTotalVCount>",
                "42",
            ),
            (
                f"<{ONTOLOGY['kglidsResource']}tbl>",
                f"<{ONTOLOGY['rdf']}type>",
                f"<{ONTOLOGY['kglids']}Table>",
            ),
            ("<http://other.example/x>", f"<{ONTOLOGY['rdfs']}label>", '"t"'),
        ],
        "subject string, predicate string, object string",
    )
    got = sorted(r.line for r in turtle_lines(triples).collect())
    assert got == sorted(
        [
            "kglidsResource:tbl kglidsData:hasTotalVCount 42.",
            "kglidsResource:tbl rdf:type kglids:Table.",
            '<http://other.example/x> rdfs:label "t".',
        ]
    )


def test_write_ntriples_shards_concatenate(spark, tmp_path):
    edges = spark.createDataFrame(
        [(f"c{i}", f"d{i}", "content", 0.9) for i in range(8)],
        "col1_id string, col2_id string, kind string, score double",
    ).repartition(4)
    out = os.path.join(tmp_path, "nt")
    write_ntriples(similarity_ntriples(edges), out)
    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(parts) >= 2  # genuinely sharded
    lines = []
    for p in parts:
        with open(p) as f:
            lines.extend(ln.rstrip("\n") for ln in f if ln.strip())
    assert len(lines) == 16  # forward + reversed per edge
    assert all(ln.endswith(".") and ln.startswith("<<<") for ln in lines)


def test_write_turtle_every_part_is_standalone(spark, tmp_path):
    triples = spark.createDataFrame(
        [
            (
                f"<{ONTOLOGY['kglidsResource']}s{i}>",
                f"<{ONTOLOGY['rdf']}type>",
                f"<{ONTOLOGY['kglids']}Source>",
            )
            for i in range(8)
        ],
        "subject string, predicate string, object string",
    ).repartition(3)
    out = os.path.join(tmp_path, "ttl")
    write_turtle(turtle_lines(triples), out)
    header = turtle_prefix_header()
    parts = [p for p in sorted(glob.glob(os.path.join(out, "part-*"))) if os.path.getsize(p)]
    assert parts
    stmt_total = 0
    for p in parts:
        text = open(p).read()
        # Turtle validity: prefixes declared before first qname use
        assert text.startswith(header.splitlines()[0])
        body = text[len(header):]
        stmts = [ln for ln in body.splitlines() if ln and not ln.startswith("@prefix")]
        assert all(ln == "kglidsResource:s%s rdf:type kglids:Source." % ln[len("kglidsResource:s")] for ln in stmts)
        stmt_total += len(stmts)
    assert stmt_total == 8


def test_iri_helper(spark):
    row = spark.range(1).select(iri(F.lit("x y"), ONTOLOGY["kglids"]).alias("i")).collect()[0]
    assert row.i == "<http://kglids.org/ontology/x y>"


def test_null_parts_drop_the_triple_not_the_token(spark):
    """A null score/stat must drop the whole line — concat_ws would
    emit a malformed 2-token statement instead."""
    from kglids_spark.operators.rdf_export import profile_ntriples, similarity_ntriples

    edges = spark.createDataFrame(
        [("a", "b", "content", None), ("a", "c", "content", 0.9)],
        "col1_id string, col2_id string, kind string, score double",
    )
    lines = [r.line for r in similarity_ntriples(edges).collect()]
    assert len(lines) == 2  # only the non-null edge's fwd+rev pair
    assert all(ln.endswith(".") and ln.count(" ") >= 2 for ln in lines)

    from kglids_spark.operators.profiler import PROFILE_SCHEMA

    prof = spark.createDataFrame(
        [("t/c", "", "t", "c", "int", 3, 3, 0, None, None, None, None, None, None)],
        PROFILE_SCHEMA,
    )
    plines = [r.line for r in profile_ntriples(prof).collect()]
    # the 3 numeric-stat lines vanish (null median/min/max); the 8
    # metadata lines survive intact
    assert len(plines) == 8
    assert not any("hasMedianValue" in ln for ln in plines)
