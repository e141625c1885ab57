"""DOCX text extraction: pinned against an independent in-test writer
assembling spec-shaped OOXML packages (zipfile + hand-written
WordprocessingML), covering paragraphs/runs/tabs/breaks/preserved
spaces/tables, the rejection matrix (OLE2, non-zip, missing document
part, zip bomb), and the Spark lane with text-tier composition."""

from __future__ import annotations

import io
import zipfile
import zlib

import pytest

from drill_logfile_plugin_spark.operators import docx as D

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def build_docx(body_xml: str, member: str = "word/document.xml") -> bytes:
    """Independent writer: a minimal OOXML package around a body."""
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W}><w:body>{body_xml}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr(member, doc)
    return buf.getvalue()


def par(*runs: str) -> str:
    return "<w:p>" + "".join(runs) + "</w:p>"


def run(text: str, preserve: bool = False) -> str:
    sp = ' xml:space="preserve"' if preserve else ""
    return f"<w:r><w:t{sp}>{text}</w:t></w:r>"


def test_paragraphs_runs_and_breaks():
    body = (
        par(run("Hello, "), run("world."))
        + par(run("Second"), "<w:r><w:tab/></w:r>", run("column"))
        + par(run("line one"), "<w:r><w:br/></w:r>", run("line two"))
    )
    text, n = D._docx_extract_text(build_docx(body))
    assert n == 3
    assert text == "Hello, world.\nSecond\tcolumn\nline one\nline two"


def test_preserved_spaces():
    body = par(run("lead", preserve=True), run("  trail  ", preserve=True))
    text, _ = D._docx_extract_text(build_docx(body))
    assert text == "lead  trail  ".rstrip("\n")


def test_table_flattening():
    body = (
        par(run("before"))
        + "<w:tbl><w:tr>"
        + "<w:tc>" + par(run("a1")) + "</w:tc>"
        + "<w:tc>" + par(run("b1")) + par(run("b2")) + "</w:tc>"
        + "</w:tr><w:tr>"
        + "<w:tc>" + par(run("a2")) + "</w:tc>"
        + "<w:tc>" + par(run("c2")) + "</w:tc>"
        + "</w:tr></w:tbl>"
        + par(run("after"))
    )
    text, n = D._docx_extract_text(build_docx(body))
    assert text == "before\na1\tb1\nb2\na2\tc2\nafter"
    assert n == 7  # 2 body paragraphs + 5 cell paragraphs


def test_rejection_matrix():
    with pytest.raises(ValueError, match="zip signature"):
        D._docx_extract_text(b"%PDF-1.4 not a docx")
    with pytest.raises(NotImplementedError, match="OLE2"):
        D._docx_extract_text(
            b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100
        )
    with pytest.raises(ValueError, match="malformed"):
        D._docx_extract_text(b"PK\x03\x04 garbage local header")
    # a zip that is not WordprocessingML
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "hi")
    with pytest.raises(ValueError, match="document.xml"):
        D._docx_extract_text(buf.getvalue())
    # malformed XML inside the right member
    bad = build_docx("<w:p><unclosed></w:p>")
    with pytest.raises(ValueError, match="malformed"):
        D._docx_extract_text(bad)
    # zip bomb: declared uncompressed size past the bound fails BEFORE
    # any member is read
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w", zipfile.ZIP_DEFLATED) as zf:
        info = zipfile.ZipInfo("word/document.xml")
        zf.writestr(info, b"x")
    raw = bytearray(buf2.getvalue())
    # forge the central-directory uncompressed size field (offset 24
    # within the central header)
    cd = raw.rindex(b"PK\x01\x02")
    raw[cd + 24 : cd + 28] = (D._DOCX_MAX_UNCOMPRESSED + 2).to_bytes(
        4, "little"
    )
    with pytest.raises(ValueError, match="decoder bound|malformed"):
        D._docx_extract_text(bytes(raw))


def test_spark_lane_and_composition(spark):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.text import clean_corpus

    rows = []
    for i in range(4):
        body = par(run(f"The report {i} covers the review of the draft "
                       f"and the schedule for the next meeting."))
        rows.append((i, bytearray(build_docx(body))))
    rows.append((99, bytearray(b"PK\x03\x04 not really")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in D.extract_docx_text(df).collect()}
    assert out[99]["text"] is None
    for i in range(4):
        assert out[i]["n_paragraphs"] == 1
        assert out[i]["n_chars"] == len(out[i]["text"]) > 0
    cleaned = clean_corpus(
        D.extract_docx_text(df, on_error="skip"),
        quality_keep=("good", "too_short", "repetitive", "stopword_heavy"),
        drop_repetitive=False,
    )
    assert cleaned.count() == 4
