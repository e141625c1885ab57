"""ODT extraction: pinned against an independent in-test writer
(zipfile + hand-written OpenDocument XML): paragraphs/headings/spans,
tab / line-break / counted-space elements, table flattening, rejection
matrix (encrypted manifest, non-ODT zip, malformed XML), the Spark
lane, and router integration."""

from __future__ import annotations

import io
import zipfile

import pytest

from drill_logfile_plugin_spark.operators import odt as O

_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
)


def build_odt(body_xml: str, encrypted: bool = False) -> bytes:
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content {_NS}><office:body><office:text>"
        f"{body_xml}</office:text></office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0"?><manifest:manifest '
        'xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
        + (
            '<manifest:file-entry manifest:full-path="content.xml">'
            "<manifest:encryption-data/></manifest:file-entry>"
            if encrypted
            else ""
        )
        + "</manifest:manifest>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("META-INF/manifest.xml", manifest)
        zf.writestr("content.xml", content)
    return buf.getvalue()


def test_paragraphs_headings_spans_and_whitespace_elements():
    body = (
        "<text:h>Title</text:h>"
        "<text:p>Hello <text:span>spanned</text:span> world</text:p>"
        "<text:p>a<text:tab/>b<text:line-break/>c<text:s text:c='3'/>d</text:p>"
    )
    text, n = O._odt_extract_text(build_odt(body))
    assert n == 3
    assert text == "Title\nHello spanned world\na\tb\nc   d"


def test_table_flattening():
    body = (
        "<text:p>before</text:p>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>a1</text:p></table:table-cell>"
        "<table:table-cell><text:p>b1</text:p><text:p>b2</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "<text:p>after</text:p>"
    )
    text, n = O._odt_extract_text(build_odt(body))
    assert text == "before\na1\tb1\nb2\nafter"
    assert n == 5


def test_rejection_matrix():
    with pytest.raises(ValueError, match="zip signature"):
        O._odt_extract_text(b"%PDF- nope")
    with pytest.raises(NotImplementedError, match="encrypted ODT"):
        O._odt_extract_text(build_odt("<text:p>x</text:p>", encrypted=True))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    with pytest.raises(ValueError, match="content.xml"):
        O._odt_extract_text(buf.getvalue())
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("content.xml", "<broken")
    with pytest.raises(ValueError, match="malformed"):
        O._odt_extract_text(buf2.getvalue())


def test_spark_lane_and_router(spark):
    from drill_logfile_plugin_spark.operators import documents as DOC

    payload = build_odt(
        "<text:p>The agenda for the meeting was circulated early.</text:p>"
    )
    assert DOC.sniff_document(payload) == "odt"
    df = spark.createDataFrame(
        [(0, bytearray(payload)), (1, bytearray(b"PK\x03\x04 junk"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in O.extract_odt_text(df).collect()}
    assert out[0]["text"] == "The agenda for the meeting was circulated early."
    assert out[0]["n_paragraphs"] == 1
    assert out[1]["text"] is None
    routed = {
        r["doc_id"]: r
        for r in DOC.extract_document_text(df).collect()
    }
    assert routed[0]["doc_format"] == "odt"
    assert routed[0]["text"] == out[0]["text"]
