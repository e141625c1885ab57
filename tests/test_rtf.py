"""RTF extraction: the control-word state machine pinned on hand-built
documents covering every emit path, destination skipping, unicode with
uc fallback counts, hex escapes under a declared code page, binary
runs, and the Spark lane + router."""

from __future__ import annotations

import pytest

from drill_logfile_plugin_spark.operators import documents as DOC
from drill_logfile_plugin_spark.operators import rtf as R


def test_basic_paragraphs_and_emitters():
    doc = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}"
        rb"First line.\par Second\tab col.\line Third \emdash{} done.\par}"
    )
    text, n_par = R._rtf_extract_text(doc)
    assert text == "First line.\nSecond\tcol.\nThird — done."
    assert n_par == 3
    assert "Times" not in text  # fonttbl skipped with its group


def test_destinations_and_starred_groups_skipped():
    doc = (
        rb"{\rtf1{\info{\author Secret Name}}{\*\generator Acme 9.1;}"
        rb"{\stylesheet{\s1 Heading;}}Visible body text.}"
    )
    text, _ = R._rtf_extract_text(doc)
    assert text == "Visible body text."
    assert "Secret" not in text and "Acme" not in text and "Heading" not in text


def test_hex_escapes_respect_ansicpg():
    doc = b"{\\rtf1\\ansi\\ansicpg1252 caf\\'e9 ok}"
    text, _ = R._rtf_extract_text(doc)
    assert text == "café ok"
    # cp1251 (cyrillic): the same byte decodes differently
    doc2 = b"{\\rtf1\\ansi\\ansicpg1251 \\'e9x}"
    assert R._rtf_extract_text(doc2)[0] == "йx"


def test_unicode_with_uc_fallback_skip():
    # \uc1: one fallback byte after each \uN must be skipped
    doc = rb"{\rtf1\uc1 x\u955 ?y \u-10179 ?\u-8704 ? end}".replace(b"?", b"?")
    text, _ = R._rtf_extract_text(doc)
    assert text.startswith("xλy")
    # negative code units wrap per the signed-16-bit rule
    assert chr(-10179 + 0x10000) in text
    # \uc0: no fallback byte consumed
    doc0 = rb"{\rtf1\uc0 a\u233 b}"
    assert R._rtf_extract_text(doc0)[0] == "aéb"


def test_uc_count_is_group_scoped():
    doc = rb"{\rtf1\uc1 {\uc2 \u955 ??}\u955 ?after}"
    text, _ = R._rtf_extract_text(doc)
    assert text == "λλafter"


def test_bin_runs_never_leak():
    doc = b"{\\rtf1 before{\\pict\\bin5 \x00\x01{}\\x}after}"
    text, _ = R._rtf_extract_text(doc)
    assert text == "beforeafter"
    with pytest.raises(ValueError, match="bin run escapes"):
        R._rtf_extract_text(b"{\\rtf1 a\\bin99999 xx}")


def test_escaped_braces_and_backslash():
    doc = rb"{\rtf1 a\{b\}c\\d}"
    assert R._rtf_extract_text(doc)[0] == "a{b}c\\d"


def test_rejections():
    with pytest.raises(ValueError, match="rtf magic"):
        R._rtf_extract_text(b"plain text")
    with pytest.raises(ValueError, match="no extractable text"):
        R._rtf_extract_text(rb"{\rtf1{\fonttbl{\f0 Arial;}}}")
    with pytest.raises(ValueError, match="nesting exceeds"):
        R._rtf_extract_text(b"{\\rtf1 " + b"{" * 200)


def test_spark_lane_and_router(spark):
    doc = rb"{\rtf1\ansi The quarterly figures improved.\par As expected.}"
    df = spark.createDataFrame(
        [(0, bytearray(doc)), (1, bytearray(b"{\\rtf1"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in R.extract_rtf_text(df).collect()}
    assert out[0]["text"] == "The quarterly figures improved.\nAs expected."
    assert out[0]["n_paragraphs"] == 2
    assert out[1]["text"] is None  # empty body quarantined
    assert DOC.sniff_document(bytes(doc)) == "rtf"
    routed = DOC.extract_document_text(df).where("doc_id = 0").collect()[0]
    assert routed["doc_format"] == "rtf"
    assert routed["text"] == out[0]["text"]
