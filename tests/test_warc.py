"""WARC source: records pinned against an independent in-test writer
(spec-following framing: version line, named fields, Content-Length, the
double-CRLF sandwiches), plain and per-record-gzip-member files, HTTP
payload splitting, the skip-tail dirty-archive contract, and the full
crawl→pipeline adapter composition."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_documents,
)


def _record(
    wtype="response",
    url="https://example.com/a",
    date="2026-08-15T12:00:00Z",
    payload=b"",
    ctype="application/http; msgtype=response",
):
    """Independent spec-following writer (ISO 28500 §4: version line,
    named fields, Content-Length of the payload, CRLF framing)."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status=200, ctype="text/html"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_parser_roundtrip_plain():
    blob = (
        _record(wtype="warcinfo", url="", payload=b"software: test\r\n")
        + _record(payload=_http(b"<p>hello</p>"))
        + _record(wtype="request", payload=b"GET /a HTTP/1.1\r\n\r\n")
    )
    recs = list(parse_warc_records(blob))
    assert [r[0] for r in recs] == ["warcinfo", "response", "request"]
    assert recs[1][5] == 200  # http status split out
    assert recs[1][4] == "text/html"  # HTTP Content-Type captured
    assert recs[1][6] == b"<p>hello</p>"  # body after HTTP headers
    assert recs[2][5] is None  # request payload is not an HTTP response
    assert recs[2][4] is None
    with pytest.raises(ValueError, match="Content-Length runs past"):
        list(parse_warc_records(blob[:-10]))
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_records(b"NOPE/1.0\r\n\r\n\r\n"))


def test_read_warc_plain_and_gzip(spark, tmp_path):
    """One plain file + one per-record-gzip-member file (the Common
    Crawl layout): identical records back from both."""
    records = [
        _record(url="https://a.example/1", payload=_http(b"<b>one</b>")),
        _record(url="https://a.example/2", payload=_http(b"two", status=404)),
    ]
    (tmp_path / "plain.warc").write_bytes(b"".join(records))
    (tmp_path / "cc.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in records)  # member per record
    )
    df = read_warc(spark, str(tmp_path)).orderBy("path", "record_no")
    rows = df.collect()
    assert len(rows) == 4
    by_file = {}
    for r in rows:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    for fname in ("plain.warc", "cc.warc.gz"):
        recs = by_file[fname]
        assert [r["record_no"] for r in recs] == [0, 1]
        assert recs[0]["url"] == "https://a.example/1"
        assert recs[0]["http_status"] == 200
        assert bytes(recs[0]["body"]) == b"<b>one</b>"
        assert recs[1]["http_status"] == 404


def test_skip_tail_on_corrupt_framing(spark, tmp_path):
    """A lying Content-Length poisons everything after it: the parsed
    prefix survives, the untrusted tail drops (skip), strict raises."""
    good = _record(url="https://a.example/ok", payload=_http(b"fine"))
    lying = good.replace(b"Content-Length: ", b"Content-Length: 9")
    (tmp_path / "bad.warc").write_bytes(good + lying + good)
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0]["url"] == "https://a.example/ok"
    with pytest.raises(Exception, match="Content-Length|WARC"):
        read_warc(spark, str(tmp_path), on_error="strict").collect()


def test_warc_documents_adapter(spark, tmp_path):
    """The crawl→pipeline bridge: 2xx responses become (doc_id, url,
    text, source) with markup stripped and the URL canonicalized; the
    404 and the request record are gone."""
    records = [
        _record(
            url="HTTPS://WWW.News.Example/story?utm_source=x&id=1",
            payload=_http(b"<html><body><p>Real text.</p>"
                          b"<script>no()</script></body></html>"),
        ),
        _record(url="https://news.example/miss", payload=_http(b"x", 404)),
        _record(wtype="request", payload=b"GET / HTTP/1.1\r\n\r\n"),
    ]
    (tmp_path / "site.warc").write_bytes(b"".join(records))
    docs = warc_documents(read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["url"] == "https://news.example/story?id=1"
    assert d["text"] == "Real text."
    assert d["source"] == "www.news.example"
    assert d["doc_id"] is not None


def test_wet_documents_adapter(spark, tmp_path):
    """WET conversion records (pre-extracted text, no HTTP envelope)
    adapt without the response filter or markup stripping."""
    from drill_logfile_plugin_spark.sources.warc import wet_documents

    records = [
        _record(
            wtype="conversion",
            url="https://a.example/x?gclid=1",
            payload=b"already extracted plain text",
            ctype="text/plain",
        ),
        _record(url="https://a.example/y", payload=_http(b"<p>ignored</p>")),
    ]
    (tmp_path / "seg.wet").write_bytes(b"".join(records))
    docs = wet_documents(read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    assert docs[0]["text"] == "already extracted plain text"
    assert docs[0]["url"] == "https://a.example/x"


def test_wat_records_adapter(spark, tmp_path):
    """WAT metadata records (the third Common Crawl artifact): JSON
    envelopes parse to (url, outlinks, headers, title) rows via
    from_json — spec-following in-test envelopes per the crawler's
    layout; a non-HTML subject yields NULL html fields; a malformed
    envelope yields NULL fields, never a failed task."""
    import json

    from drill_logfile_plugin_spark.sources.warc import wat_records

    def envelope(uri, wtype="response", headers=None, links=None, title=None):
        http_meta = {}
        if headers is not None:
            http_meta["Headers"] = headers
        if links is not None or title is not None:
            http_meta["HTML-Metadata"] = {
                **({"Head": {"Title": title}} if title else {}),
                **({"Links": links} if links is not None else {}),
            }
        return json.dumps(
            {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": uri,
                        "WARC-Type": wtype,
                        "WARC-Date": "2026-08-15T12:00:00Z",
                    },
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": http_meta
                    },
                },
                "Container": {"Offset": "0"},
            }
        ).encode()

    records = [
        _record(
            wtype="metadata",
            url="https://a.example/page",
            payload=envelope(
                "https://a.example/page",
                headers={"Content-Type": "text/html", "Server": "nginx"},
                links=[
                    {"path": "A@/href", "url": "https://b.example/x"},
                    {"path": "IMG@/src", "url": "https://a.example/i.png"},
                    {"path": "A@/href"},  # crawler emits linkless paths
                ],
                title="A Page",
            ),
            ctype="application/json",
        ),
        _record(
            wtype="metadata",
            url="https://a.example/robots.txt",
            payload=envelope(
                "https://a.example/robots.txt",
                headers={"Content-Type": "text/plain"},
            ),
            ctype="application/json",
        ),
        _record(
            wtype="metadata",
            url="https://bad.example/",
            payload=b"{not json",
            ctype="application/json",
        ),
        # a response record in the same container is NOT a WAT row
        _record(url="https://a.example/page", payload=_http(b"<p>x</p>")),
    ]
    (tmp_path / "seg.wat").write_bytes(b"".join(records))
    rows = {
        r["url"]: r
        for r in wat_records(read_warc(spark, str(tmp_path))).collect()
    }
    assert len(rows) == 3
    page = rows["https://a.example/page"]
    assert page["subject_type"] == "response"
    assert page["title"] == "A Page"
    assert page["headers"]["Server"] == "nginx"
    assert page["outlinks"] == [
        "https://b.example/x",
        "https://a.example/i.png",
    ]  # the linkless path dropped, order preserved
    assert page["n_links"] == 2
    robots = rows["https://a.example/robots.txt"]
    assert robots["title"] is None and robots["outlinks"] is None
    assert robots["n_links"] == 0
    assert robots["headers"]["Content-Type"] == "text/plain"
    bad = rows["https://bad.example/"]  # URL falls back to the WARC header
    assert bad["headers"] is None and bad["n_links"] == 0


def test_warc_extracted_documents_routes_nonhtml(spark, tmp_path):
    """r9: a crawl's PDFs / LaTeX / gzipped HTML extract beside its
    HTML through the document router, url/source riding the Arrow
    batch as passthrough — the composed plan stays exchange-free."""
    import gzip as _gzip

    from tests.test_pdf import build_pdf, text_stream

    from drill_logfile_plugin_spark.sources.warc import (
        warc_extracted_documents,
    )

    html = (
        b"<html><body><p>"
        + b"Crawled article prose with the of and a to for stopwords. " * 6
        + b"</p></body></html>"
    )
    pdf = build_pdf([text_stream("(crawled pdf body) Tj")])
    tex = b"\\documentclass{a}\\begin{document}crawled tex body\\end{document}"
    blob = (
        _record(url="https://a.example.com/page",
                payload=_http(html))
        + _record(url="https://b.example.com/paper.pdf",
                  payload=_http(pdf, ctype="application/pdf"))
        + _record(url="https://c.example.com/src.tex",
                  payload=_http(tex, ctype="text/x-tex"))
        + _record(url="https://d.example.com/page.html.gz",
                  payload=_http(_gzip.compress(html), ctype="text/html"))
        + _record(url="https://e.example.com/broken",
                  # non-UTF-8 control junk: no BOM, no NUL parity, fails
                  # the fallback's texty gate -> quarantined
                  payload=_http((bytes(range(1, 32)) + b"\xff\xfe\xfd") * 8))
    )
    path = tmp_path / "crawl.warc"
    path.write_bytes(blob)
    warc = read_warc(spark, str(path))
    out = warc_extracted_documents(warc)
    rows = {r["source"]: r for r in out.collect()}
    assert rows["a.example.com"]["doc_format"] == "html"
    assert "Crawled article prose" in rows["a.example.com"]["text"]
    assert rows["b.example.com"]["doc_format"] == "pdf"
    assert rows["b.example.com"]["text"] == "crawled pdf body"
    assert rows["c.example.com"]["doc_format"] == "tex"
    assert rows["c.example.com"]["text"] == "crawled tex body"
    assert rows["d.example.com"]["doc_format"] == "gz:html"
    assert rows["e.example.com"]["text"] is None  # quarantined row
    # the composed plan is a narrow map: no Exchange anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_warc_gzip_bomb_costs_the_cap(spark, tmp_path, monkeypatch):
    """A crafted .warc.gz bomb inflates only to the file bound (r10 —
    the bounded-streaming rule now covers the WARC segment lane too):
    skip drops the file, strict names it."""
    import gzip as _gzip

    import drill_logfile_plugin_spark.sources.warc as W

    monkeypatch.setattr(W, "_MAX_WARC_FILE", 1 << 16)
    bomb = _gzip.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, ~4 KiB gz
    (tmp_path / "bomb.warc.gz").write_bytes(bomb)
    assert W.read_warc(spark, str(tmp_path)).count() == 0
    with pytest.raises(Exception, match="gzip"):
        W.read_warc(spark, str(tmp_path), on_error="strict").collect()
