"""WARC container ingestion (sources/warc.py): Content-Length-framed
record parsing over binaryFile — incl. the payload-decoy case that
breaks any delimiter-split reader — plus the HTTP-envelope split and
the full crawl -> documents composition with extract_html_text."""

import gzip

import pytest
from pyspark.sql import functions as F

from kglids_spark.sources.warc import http_payload_text, read_warc


def _record(rec_id, wtype, uri, payload: bytes, extra_headers=()):
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rec_id.encode() + b">",
        b"WARC-Date: 2026-01-01T00:00:00Z",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        head.insert(2, b"WARC-Target-URI: " + uri.encode())
    head.extend(extra_headers)
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


HTML = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html><head><title>t</title></head><body><p>hello crawl</p></body></html>"
)
# payload embedding a full WARC banner + headers: Content-Length framing
# must carry the parser straight across it
DECOY = (
    b"HTTP/1.1 200 OK\r\n\r\n"
    b"prefix \r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
    b"Content-Length: 9999\r\n\r\n decoy suffix"
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    plain = (
        _record("info0", "warcinfo", "", b"software: test-crawler")
        + _record("r1", "response", "http://a.example/x", HTML)
        + _record("r2", "response", "http://b.example/y", DECOY)
        + _record("r3", "request", "http://a.example/x", b"GET /x HTTP/1.1")
    )
    (d / "part-0.warc").write_bytes(plain)
    wet = _record("w1", "conversion", "http://c.example/z", b"plain wet text")
    (d / "part-1.warc.gz").write_bytes(
        gzip.compress(_record("w0", "warcinfo", "", b"wet"))
        + gzip.compress(wet)  # per-record members, Common Crawl style
    )
    return str(d)


def test_read_warc_all_records(spark, warc_dir):
    rows = {r.record_id: r for r in read_warc(spark, warc_dir).collect()}
    assert len(rows) == 6
    r1 = rows["<urn:uuid:r1>"]
    assert r1.warc_type == "response"
    assert r1.target_uri == "http://a.example/x"
    assert bytes(r1.payload) == HTML and r1.n_bytes == len(HTML)
    # the decoy payload survives byte-exact — framing ignored the banner
    assert bytes(rows["<urn:uuid:r2>"].payload) == DECOY
    # gzip multi-member file parsed
    assert bytes(rows["<urn:uuid:w1>"].payload) == b"plain wet text"


def test_read_warc_type_filter(spark, warc_dir):
    got = read_warc(spark, warc_dir, types=["response"])
    assert {r.warc_type for r in got.collect()} == {"response"}
    assert got.count() == 2
    assert read_warc(spark, warc_dir, types=["conversion"]).count() == 1


def test_http_payload_text_and_html_composition(spark, warc_dir):
    from kglids_spark.operators.text import extract_html_text

    resp = read_warc(spark, warc_dir, types=["response"])
    txt = http_payload_text(resp)
    by_id = {r.record_id: r for r in txt.collect()}
    assert by_id["<urn:uuid:r1>"].http_status == 200
    assert by_id["<urn:uuid:r1>"].text.startswith("<html>")
    # full crawl path: WARC -> HTTP body -> markup stripped -> documents
    docs = extract_html_text(
        txt.select(F.col("record_id").alias("doc_id"), "text")
    )
    got = {r.doc_id: r.text for r in docs.collect()}
    assert got["<urn:uuid:r1>"] == "t\nhello crawl"


def test_http_payload_text_no_envelope_passthrough(spark, warc_dir):
    wet = http_payload_text(read_warc(spark, warc_dir, types=["conversion"]))
    r = wet.collect()[0]
    assert r.text == "plain wet text" and r.http_status is None


def test_prepare_ingests_warc(spark, tmp_path, capsys):
    """One-call crawl -> training data: WARC responses ingest as
    documents (record id, HTTP body, container file as source), markup
    stripped by --strip-html, then the normal pipeline."""
    import json

    from kglids_spark.cli import main

    d = tmp_path / "crawl"
    d.mkdir()
    recs = b""
    for i in range(12):
        body = (
            "HTTP/1.1 200 OK\r\n\r\n<html><body>"
            + " ".join(
                f"<p>the crawl page {i} line {j} holds words w{i}x{j} "
                "about data and meaning</p>"
                for j in range(4)
            )
            + "</body></html>"
        ).encode()
        recs += _record(f"p{i}", "response", f"http://ex.com/{i}", body)
    (d / "crawl-0.warc").write_bytes(recs)
    out = str(tmp_path / "prepared")
    rc = main(
        [
            "prepare",
            "--input", str(d),
            "--input-format", "warc",
            "--strip-html",
            "--source-col", "source",
            "--out", out,
            "--merges", "8",
            "--seq-len", "32",
            "--gopher-threshold", "min_words=5",
            "--gopher-threshold", "max_mean_word_len=30",
            "--gopher-threshold", "max_dup_word_frac=1.0",
            "--gopher-threshold", "max_top_word_frac=1.0",
            "--gopher-threshold", "max_top_2gram_frac=1.0",
            "--gopher-threshold", "min_alpha_word_frac=0.0",
            "--gopher-threshold", "min_stop_words=0",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["stage_counts"]["input"] == 12
    back = spark.read.parquet(out)
    assert back.count() == 12
    assert {r.source.rsplit("/", 1)[-1] for r in back.collect()} == {
        "crawl-0.warc"
    }
    # the markup really was stripped before tokenization: no '<' token
    sample = back.limit(3).collect()
    assert all(r.n_tok > 0 for r in sample)


def test_read_warc_negative_content_length_skipped(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\nContent-Length: -200\r\n\r\n"
        b"junk junk junk\r\n\r\n"
    )
    data = bad + _record("ok", "response", "http://x/", b"fine body")
    (d / "a.warc").write_bytes(data)
    rows = read_warc(spark, str(d)).collect()  # must terminate
    assert [r.record_id for r in rows] == ["<urn:uuid:ok>"]


def test_read_warc_corrupt_gz_marker(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    (d / "good.warc").write_bytes(_record("g", "response", "http://x/", b"ok"))
    (d / "broken.warc.gz").write_bytes(b"this is not gzip at all")
    rows = {r.warc_type: r for r in read_warc(spark, str(d)).collect()}
    assert set(rows) == {"response", "_corrupt_file"}
    assert rows["_corrupt_file"].file.endswith("broken.warc.gz")


def test_http_payload_conversion_with_blank_lines_passes_whole(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    wet = b"para one\r\n\r\npara two"
    (d / "a.warc").write_bytes(_record("w", "conversion", "http://x/", wet))
    r = http_payload_text(read_warc(spark, str(d))).collect()[0]
    assert r.text == "para one\r\n\r\npara two"  # nothing stripped
    assert r.http_status is None and r.http_encoded is False


def test_http_payload_flags_encoded_bodies(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\nwiki\r\n0\r\n"
    )
    plain = b"HTTP/1.1 200 OK\r\n\r\nreal text"
    data = _record("c", "response", "http://x/1", chunked) + _record(
        "p", "response", "http://x/2", plain
    )
    (d / "a.warc").write_bytes(data)
    rows = {
        r.record_id: r
        for r in http_payload_text(read_warc(spark, str(d))).collect()
    }
    assert rows["<urn:uuid:c>"].http_encoded is True
    assert rows["<urn:uuid:p>"].http_encoded is False
    assert rows["<urn:uuid:p>"].text == "real text"


def test_prepare_warc_filters_errors_and_counts_corrupt(spark, tmp_path, capsys):
    import json

    from kglids_spark.cli import main

    d = tmp_path / "crawl"
    d.mkdir()
    ok_body = (
        "HTTP/1.1 200 OK\r\n\r\n"
        + " ".join(f"the good page holds words w{j} about data" for j in range(4))
    ).encode()
    notfound = b"HTTP/1.1 404 Not Found\r\n\r\nthe classic not found boilerplate page text here"
    recs = (
        _record("ok1", "response", "http://x/1", ok_body)
        + _record("nf", "response", "http://x/404", notfound)
        + _record("ok2", "response", "http://x/2", ok_body)
    )
    (d / "c.warc").write_bytes(recs)
    (d / "broken.warc.gz").write_bytes(b"garbage")
    out = str(tmp_path / "prep")
    rc = main(
        [
            "prepare", "--input", str(d), "--input-format", "warc",
            "--source-col", "source", "--out", out,
            "--merges", "6", "--seq-len", "32",
            "--skip", "gopher,linededup,fuzzy",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["stage_counts"]["corrupt_warc_files"] == 1
    # the 404 body never enters the pipeline
    assert summary["stage_counts"]["input"] == 2
    ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert ids == {"<urn:uuid:ok1>", "<urn:uuid:ok2>"}
