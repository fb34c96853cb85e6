"""WARC container ingestion — the crawl-shaped upstream of the text
pipeline (Common Crawl and every ISO-28500 crawler ship WARC files;
WET "conversion" files are the same container with plain-text
payloads). Pairs with text.extract_html_text (round 5) so the full
crawl path is: read_warc → http_payload → strip markup → documents.

Scale shape: WARC corpora arrive as many ~1 GB files, and the FILE is
the natural parallelism unit (each is independently parseable; Common
Crawl ships ~64k files per snapshot). The reader loads files with
Spark's binaryFile source (one row per file, files assigned to tasks
independently) and parses each file's bytes in an Arrow-batched
``mapInPandas`` with a pure-stdlib parser that honors the
``Content-Length`` header for record framing — NEVER delimiter
splitting, so payloads that themselves contain ``WARC/1.0`` banners
(crawled copies of WARC files, security scrapes) cannot mis-split
records (tests plant exactly that decoy). Per-record-gzipped .warc.gz
members are handled by ``gzip.decompress``'s multi-member loop.

No reference analog (CoDS-GCS/kglids ingests CSV lakes); this extends
the beyond-reference ingestion family (JSONL corpus source, HTML
extraction) per the driver brief."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, payload binary, n_bytes int"
)

_BANNERS = (b"WARC/1.0", b"WARC/1.1")


def _parse_warc_bytes(name: str, data: bytes):
    """Yield (record dicts) from one WARC file's bytes. Content-Length
    framing per ISO 28500: header block ends at CRLFCRLF, the payload
    is exactly Content-Length bytes, then CRLFCRLF precedes the next
    record's version banner."""
    if name.endswith(".gz"):
        import gzip

        try:
            data = gzip.decompress(data)  # loops over concatenated members
        except OSError:
            # truncated/mislabeled container: one marker row instead of
            # failing the job (the jsonl corrupt-line discipline at file
            # granularity) — filterable/countable via warc_type
            yield {
                "file": name,
                "record_id": "",
                "warc_type": "_corrupt_file",
                "target_uri": "",
                "warc_date": "",
                "content_type": "",
                "payload": b"",
                "n_bytes": 0,
            }
            return
    pos, n = 0, len(data)
    while pos < n:
        # seek the next version banner (tolerates leading/trailing junk
        # and the inter-record CRLFCRLF)
        nxt = None
        for b in _BANNERS:
            i = data.find(b, pos)
            if i != -1 and (nxt is None or i < nxt):
                nxt = i
        if nxt is None:
            break
        head_end = data.find(b"\r\n\r\n", nxt)
        if head_end == -1:
            break
        headers = {}
        for line in data[nxt:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"").decode("ascii"))
        except (ValueError, UnicodeDecodeError):
            length = -1
        if length < 0:
            # unframed or corrupt-length record: skip past the header
            # block to the next banner (a negative length must NOT feed
            # the position arithmetic — pos could move backwards and
            # re-parse the same record forever)
            pos = head_end + 4
            continue
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        yield {
            "file": name,
            "record_id": headers.get(b"warc-record-id", b"").decode(
                "utf-8", "replace"
            ),
            "warc_type": headers.get(b"warc-type", b"").decode("utf-8", "replace"),
            "target_uri": headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace"
            ),
            "warc_date": headers.get(b"warc-date", b"").decode("utf-8", "replace"),
            "content_type": headers.get(b"content-type", b"").decode(
                "utf-8", "replace"
            ),
            "payload": payload,
            "n_bytes": len(payload),
        }
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    types: list[str] | None = None,
) -> DataFrame:
    """Read WARC/WET files under ``path`` into one row per record:
    (file, record_id, warc_type, target_uri, warc_date, content_type,
    payload binary, n_bytes). ``types`` filters on WARC-Type map-side
    BEFORE any payload leaves the parser (e.g. ``["response"]`` for
    crawls, ``["conversion"]`` for WET)."""
    import pandas as pd

    want = {t.lower() for t in types} if types else None

    cols = [
        "file",
        "record_id",
        "warc_type",
        "target_uri",
        "warc_date",
        "content_type",
        "payload",
        "n_bytes",
    ]

    def parse(batches):
        for pdf in batches:
            # one yield per FILE: binaryFile may coalesce several files
            # into one Arrow batch, and holding every file's decompressed
            # records at once would multiply peak executor memory at the
            # ~1 GB-per-container scale this reader targets
            for name, data in zip(pdf["path"], pdf["content"]):
                out = [
                    rec
                    for rec in _parse_warc_bytes(str(name), bytes(data))
                    if want is None or rec["warc_type"].lower() in want
                ]
                yield pd.DataFrame(out, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, WARC_SCHEMA)


def http_payload_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode payloads to ``text``, splitting the HTTP envelope ONLY
    off payloads that actually are HTTP messages (start with "HTTP/"):
    everything after the first CRLFCRLF becomes ``text`` and
    ``http_status`` carries the status-line code. Non-HTTP payloads
    (WET ``conversion`` records — which may legitimately contain blank
    CRLF lines) pass through whole with a NULL status. ``http_encoded``
    flags chunked/compressed HTTP bodies (Transfer-Encoding /
    Content-Encoding in the envelope) whose bytes would decode as
    framing noise or mojibake — callers filter them out rather than
    feeding junk downstream (prepare's warc ingestion does). Pure
    codegen expressions: the payload column is decoded once in its own
    projection (the split_words discipline), no Python."""
    s = F.col(payload_col).cast("string")
    base = df.withColumn("_s", s)
    raw = F.col("_s")
    is_http = raw.startswith("HTTP/")
    sep = F.expr("instr(_s, '\r\n\r\n')")
    head = F.when(sep > 0, F.expr("substring(_s, 1, instr(_s, '\r\n\r\n'))")).otherwise(
        raw
    )
    body = F.when(
        is_http & (sep > 0), F.expr("substring(_s, instr(_s, '\r\n\r\n') + 4)")
    ).otherwise(raw)
    status = F.regexp_extract(raw, r"^HTTP/[0-9.]+\s+(\d{3})", 1)
    encoded = is_http & head.rlike(r"(?i)\r\n(transfer-encoding|content-encoding):")
    return base.select(
        *[c for c in df.columns if c != payload_col],
        F.when(is_http & (status != ""), status.cast("int")).alias("http_status"),
        F.when(is_http, encoded).otherwise(F.lit(False)).alias("http_encoded"),
        body.alias("text"),
    )
