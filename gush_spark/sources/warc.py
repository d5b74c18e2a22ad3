"""WARC ingestion — the Common-Crawl container format, read
DISTRIBUTED: Spark's text source with a custom record delimiter
(``lineSep = "WARC/1.0\\r\\n"``) hands the Hadoop line reader one row
per WARC record, and Hadoop's split-spanning delimiter handling makes
the read splittable across file blocks — a 1 GB .warc file fans out
over executors with no driver-side scanning. Header and payload
parsing is then a per-row chain of regexps in whole-stage codegen (no
Python, same discipline as operators/links).

Parsed per record (response records are the content carriers):
- ``warc_type`` / ``url`` / ``warc_ts`` / declared ``content_length``
  from the WARC header block;
- ``http_status`` from the HTTP response line;
- ``payload`` — everything after the HTTP header block, record
  terminator stripped.

Malformed records (missing mandatory headers, no HTTP block) come out
with NULL fields and ``parse_error`` set — errors are data (P10), the
crawl accountant counts them per microbatch like extraction errors.

Caveats, honestly: delimiter-based splitting mis-splits a record whose
CONTENT contains the literal bytes ``WARC/1.0\\r\\n`` (e.g. a crawl of
WARC files themselves) — byte-exact framing needs Content-Length-driven
binary parsing; the trailing record-terminator strip also eats a
payload's own trailing CRLF run. Uncompressed WARC only — ``.warc.gz`` members are
per-record gzip streams that need a codec-aware reader (same
environment limit as the compressed media codecs,
functions/multimodal.py); and payloads are decoded as UTF-8 text by
the text source (lossy for non-UTF-8 bytes — binary-exact ingestion
would read ``binaryFiles`` + a byte parser, which is not splittable).
The fixture renderer below writes spec-correct records (CRLF headers,
byte-accurate Content-Length) so tests pin the parse against ground
truth.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_DELIM = "WARC/1.0\r\n"


def _hdr(headers: Column, name: str) -> Column:
    v = F.regexp_extract(headers, rf"(?im)^{name}:[ \t]*([^\r\n]+)", 1)
    return F.when(v != "", F.trim(v))


def parse_warc_records(raw: DataFrame) -> DataFrame:
    """Parse a ``value``-column frame of raw WARC record text (one row
    per record, as produced by the custom-delimiter text read) into
    typed columns. Shared by the batch and streaming readers so
    stream == batch is testable on identical inputs.

    Columns: warc_type, url, warc_ts (timestamp), content_length
    (declared, long), http_status (long), payload (string),
    parse_error (string, NULL when clean). Non-response records
    (request / metadata / warcinfo) keep their headers but NULL
    http_status/payload — filter ``warc_type = 'response'`` for
    content.
    """
    raw = raw.where(F.col("value") != "")
    headers = F.substring_index(F.col("value"), "\r\n\r\n", 1)
    # body = record content after the WARC header block, trailing
    # record terminator stripped (spec: content is followed by \r\n\r\n)
    body = F.regexp_replace(
        F.expr("substring(value, length(substring_index(value, '\r\n\r\n', 1)) + 5)"),
        r"(\r\n)+$",
        "",
    )
    warc_type = _hdr(headers, "WARC-Type")
    url = _hdr(headers, "WARC-Target-URI")
    warc_ts = F.to_timestamp(
        _hdr(headers, "WARC-Date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    content_length = _hdr(headers, "Content-Length").cast("long")
    is_response = warc_type == "response"
    status_s = F.regexp_extract(body, r"^HTTP/1\.[01][ \t]+(\d{3})", 1)
    http_status = F.when(is_response & (status_s != ""), status_s).cast("long")
    payload = F.when(
        is_response & (status_s != ""),
        F.expr(
            "substring(_body, length(substring_index(_body, '\r\n\r\n', 1)) + 5)"
        ),
    )
    parse_error = (
        F.when(warc_type.isNull(), "missing_warc_type")
        .when(url.isNull() & is_response, "missing_target_uri")
        .when(is_response & (status_s == ""), "missing_http_status_line")
    )
    return (
        raw.withColumn("_headers", headers)
        .withColumn("_body", body)
        .select(
            warc_type.alias("warc_type"),
            url.alias("url"),
            warc_ts.alias("warc_ts"),
            content_length.alias("content_length"),
            http_status.alias("http_status"),
            payload.alias("payload"),
            parse_error.alias("parse_error"),
        )
    )


def read_warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """Batch WARC read: splittable custom-delimiter text scan + parse."""
    return parse_warc_records(
        spark.read.format("text").option("lineSep", RECORD_DELIM).load(path)
    )


def read_warc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Rate-controlled streaming WARC read — the same file-source
    offset/backpressure model as read_pages_stream (maxFilesPerTrigger
    bounds each microbatch; checkpoint offsets make it replayable), so
    the 'tail the crawl' path ingests the archive format directly."""
    return parse_warc_records(
        spark.readStream.format("text")
        .option("lineSep", RECORD_DELIM)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def warc_pages(records: DataFrame) -> DataFrame:
    """Adapt parsed response records to the pages contract
    (url, warc_ts, html binary, text, lang, case) so EVERY existing
    pipeline — extraction, curation, link graph, featurize — consumes
    WARC by swapping the source and nothing else (job.py
    --input-format warc). text/lang are NULL: they are downstream
    products, not archive fields."""
    return records.where(
        (F.col("warc_type") == "response") & F.col("parse_error").isNull()
    ).select(
        "url",
        "warc_ts",
        F.encode(F.col("payload"), "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("warc").alias("case"),
    )


def render_warc(records: list[dict]) -> bytes:
    """Spec-correct uncompressed WARC bytes for fixtures/tests.

    Each record dict: ``url``, ``date`` (datetime), ``payload`` (str),
    optional ``status`` (int, default 200), ``warc_type`` (default
    'response'), ``reason`` (default by status). Content-Length is the
    exact byte length of the record content block (HTTP headers +
    payload for responses), per ISO 28500.
    """
    reasons = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}
    out = bytearray()
    for r in records:
        wtype = r.get("warc_type", "response")
        date: dt.datetime = r["date"]
        payload: str = r.get("payload", "")
        if wtype == "response":
            status = int(r.get("status", 200))
            reason = r.get("reason", reasons.get(status, "OK"))
            http = (
                f"HTTP/1.1 {status} {reason}\r\n"
                "Content-Type: text/html\r\n\r\n" + payload
            ).encode()
        else:
            http = payload.encode()
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode()
        out += head + http + b"\r\n\r\n"
    return bytes(out)


def write_warc_shards(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "payload",
    warc_type: str = "conversion",
    n_shards: int | None = None,
) -> None:
    """Distributed WARC/WET export — publish a curated corpus back in
    archive form (``conversion`` records are WET's extracted-text
    type). Each row is formatted as one spec-correct record ENTIRELY in
    JVM expressions (concat + date_format + octet_length gives the
    byte-exact Content-Length) and written by the text sink with an
    empty row separator — records already carry their own framing, so
    the files re-parse with read_warc_responses (round-trip pinned by
    test). One shuffle only when ``n_shards`` repartitions; otherwise
    map-only, one file per input partition, same publishing discipline
    as sources/export.write_jsonl_shards.

    Payloads are text by contract (WET); response-type export of raw
    bytes would need a binary sink — documented environment/format
    limit, same family as the gzip note above.
    """
    body = F.col(payload_col)
    date_s = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    record = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit(f"WARC-Type: {warc_type}\r\n"),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\r\n"),
        F.lit("WARC-Date: "), date_s, F.lit("\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n"),  # + the sink's \r\n lineSep completes the \r\n\r\n
    )
    out = df.select(record.alias("value"))
    if n_shards:
        out = out.repartition(n_shards)
    (
        out.write.mode("overwrite")
        .option("lineSep", "\r\n")
        .text(path)
    )
