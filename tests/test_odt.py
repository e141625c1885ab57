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


# --- ODS / ODP (r9) ----------------------------------------------------------------


def _odf_package(content_xml: str, mimetype: str) -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", mimetype)
        zf.writestr("content.xml", content_xml)
        zf.writestr(
            "META-INF/manifest.xml",
            '<?xml version="1.0"?><manifest/>',
        )
    return buf.getvalue()


_OFFICE = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
    'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:'
    'presentation:1.0"'
)


def build_ods(tables: dict) -> bytes:
    """tables: name -> list of rows, each a list of (text, repeat)."""
    body = ""
    for name, rows in tables.items():
        body += f'<table:table table:name="{name}">'
        for row in rows:
            body += "<table:table-row>"
            for text, repeat in row:
                rep = (
                    f' table:number-columns-repeated="{repeat}"'
                    if repeat > 1
                    else ""
                )
                inner = f"<text:p>{text}</text:p>" if text else ""
                body += f"<table:table-cell{rep}>{inner}</table:table-cell>"
            body += "</table:table-row>"
        body += "</table:table>"
    xml = (
        f'<?xml version="1.0"?><office:document-content {_OFFICE}>'
        f"<office:body><office:spreadsheet>{body}</office:spreadsheet>"
        "</office:body></office:document-content>"
    )
    return _odf_package(
        xml, "application/vnd.oasis.opendocument.spreadsheet"
    )


def build_odp(pages: list, notes: str | None = None) -> bytes:
    body = ""
    for paragraphs in pages:
        body += '<draw:page draw:name="p">'
        body += '<draw:frame><draw:text-box>'
        for para in paragraphs:
            body += f"<text:p>{para}</text:p>"
        body += "</draw:text-box></draw:frame>"
        if notes:
            body += (
                "<presentation:notes><draw:frame><draw:text-box>"
                f"<text:p>{notes}</text:p>"
                "</draw:text-box></draw:frame></presentation:notes>"
            )
        body += "</draw:page>"
    xml = (
        f'<?xml version="1.0"?><office:document-content {_OFFICE}>'
        f"<office:body><office:presentation>{body}</office:presentation>"
        "</office:body></office:document-content>"
    )
    return _odf_package(
        xml, "application/vnd.oasis.opendocument.presentation"
    )


def test_ods_cells_repeats_and_alignment():
    ods = build_ods(
        {
            "Résultats": [
                [("alpha", 1), ("", 2), ("delta", 1)],  # gap keeps columns
                [("x", 3)],  # repeated non-empty cell expands
            ],
            "Empty": [[("", 5)]],  # all-empty sheet: omitted
        }
    )
    text, n = O._ods_extract_text(ods)
    assert text.split("\n") == [
        "## Résultats",
        "alpha\t\t\tdelta",
        "x\tx\tx",
    ]
    assert n == 5


def test_odp_pages_exclude_notes():
    odp = build_odp(
        [["Title slide", "subtitle here"], ["Second slide"]],
        notes="SPEAKER NOTES MUST NOT LEAK",
    )
    text, n = O._odp_extract_text(odp)
    assert text.split("\n") == ["Title slide", "subtitle here", "Second slide"]
    assert n == 2
    assert "NOTES" not in text


def test_ods_odp_rejections():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spreadsheet"):
        O._ods_extract_text(
            build_odp([["not a sheet"]])
        )
    with _pytest.raises(ValueError, match="no extractable cells"):
        O._ods_extract_text(build_ods({"S": [[("", 3)]]}))
    with _pytest.raises(ValueError, match="repeated non-empty"):
        O._ods_extract_text(build_ods({"S": [[("boom", 100000)]]}))


def test_ods_odp_through_router(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    ods = build_ods({"Q": [[("sheet prose", 1)]]})
    odp = build_odp([["deck prose"]])
    assert sniff_document(ods) == "ods"
    assert sniff_document(odp) == "odp"
    df = spark.createDataFrame(
        [(0, bytearray(ods)), (1, bytearray(odp))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "ods" and "sheet prose" in got[0]["text"]
    assert got[1]["doc_format"] == "odp" and got[1]["text"] == "deck prose"
