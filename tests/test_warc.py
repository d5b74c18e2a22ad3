"""WARC source goldens: spec-correct records parse back byte-exactly
(headers, status, payload), non-response records carry no payload,
malformed records surface as parse_error rows, and multi-file input
reads in one distributed scan.
"""

from __future__ import annotations

import datetime as dt

from gush_spark.sources.warc import read_warc_responses, render_warc

D0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def test_roundtrip_and_record_kinds(spark, tmp_path):
    recs = [
        {"url": "http://a.example/1", "date": D0, "payload": "<html><p>one</p></html>"},
        {"url": "http://a.example/2", "date": D0 + dt.timedelta(seconds=9),
         "payload": "<html><p>two &amp; more</p></html>", "status": 301},
        {"url": "http://a.example/meta", "date": D0, "payload": "k: v",
         "warc_type": "metadata"},
        {"url": "http://a.example/req", "date": D0, "payload": "GET / HTTP/1.1",
         "warc_type": "request"},
    ]
    (tmp_path / "f.warc").write_bytes(render_warc(recs))
    rows = {r.url: r for r in read_warc_responses(spark, str(tmp_path)).collect()}
    assert rows["http://a.example/1"].http_status == 200
    assert rows["http://a.example/1"].payload == "<html><p>one</p></html>"
    assert rows["http://a.example/1"].warc_ts == D0
    assert rows["http://a.example/2"].http_status == 301
    assert rows["http://a.example/2"].payload == "<html><p>two &amp; more</p></html>"
    # declared Content-Length covers the HTTP block exactly
    http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><p>one</p></html>"
    assert rows["http://a.example/1"].content_length == len(http.encode())
    # non-response records: headers parsed, no payload/status, no error
    for u in ("http://a.example/meta", "http://a.example/req"):
        assert rows[u].http_status is None and rows[u].payload is None
        assert rows[u].parse_error is None


def test_malformed_records_are_error_rows(spark, tmp_path):
    good = render_warc(
        [{"url": "http://ok.example/", "date": D0, "payload": "<p>x</p>"}]
    )
    # response record whose body has no HTTP status line
    broken = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad.example/\r\n"
        b"WARC-Date: 2024-03-01T00:00:00Z\r\nContent-Length: 7\r\n\r\n"
        b"no http\r\n\r\n"
    )
    # record with no WARC-Type at all
    untyped = (
        b"WARC/1.0\r\nWARC-Date: 2024-03-01T00:00:00Z\r\n\r\nx\r\n\r\n"
    )
    (tmp_path / "f.warc").write_bytes(good + broken + untyped)
    rows = read_warc_responses(spark, str(tmp_path)).collect()
    errs = {r.parse_error for r in rows}
    assert errs == {None, "missing_http_status_line", "missing_warc_type"}
    ok = [r for r in rows if r.parse_error is None][0]
    assert ok.payload == "<p>x</p>"


def test_multi_file_distributed_read(spark, tmp_path):
    for f in range(3):
        recs = [
            {"url": f"http://h{f}.example/{i}",
             "date": D0 + dt.timedelta(seconds=f * 100 + i),
             "payload": f"<p>{f}-{i}</p>"}
            for i in range(50)
        ]
        (tmp_path / f"part-{f}.warc").write_bytes(render_warc(recs))
    df = read_warc_responses(spark, str(tmp_path))
    assert df.count() == 150
    assert df.where("parse_error IS NOT NULL").count() == 0
    # plan is JVM-only: text scan + regexps, no Python nodes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
