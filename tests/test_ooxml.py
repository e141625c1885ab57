"""XLSX / PPTX extraction: independent in-test writers assemble
SpreadsheetML and PresentationML packages (workbook + rels indirection,
shared strings with rich runs and phonetic exclusion, every cell type,
DrawingML text runs) and pin exact extraction, the rejection matrices,
and the router integration."""

from __future__ import annotations

import io
import zipfile

import pytest

from drill_logfile_plugin_spark.operators import ooxml as X


# --- independent writers -----------------------------------------------------------


def _zip(members: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


_S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_RNS = (
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"'
)
_PKG = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
_A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def build_xlsx(sheets, shared=(), rels_order=None) -> bytes:
    """sheets: list of (name, sheet_xml_body). The rels part maps rIdN to
    worksheet files — ``rels_order`` permutes targets to prove the
    indirection is honored (sheet order comes from workbook.xml, not
    file names)."""
    n = len(sheets)
    order = rels_order or list(range(n))
    members = {}
    sheet_tags = "".join(
        f'<sheet name="{name}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _b) in enumerate(sheets)
    )
    members["xl/workbook.xml"] = (
        f'<?xml version="1.0"?><workbook {_S} {_RNS}>'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    rel_tags = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxml'
        f'formats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/part{order[i]}.xml"/>'
        for i in range(n)
    )
    members["xl/_rels/workbook.xml.rels"] = (
        f'<?xml version="1.0"?><Relationships {_PKG}>{rel_tags}'
        "</Relationships>"
    )
    for i, (_name, body) in enumerate(sheets):
        members[f"xl/worksheets/part{order[i]}.xml"] = (
            f'<?xml version="1.0"?><worksheet {_S}><sheetData>{body}'
            "</sheetData></worksheet>"
        )
    if shared:
        sis = "".join(shared)
        members["xl/sharedStrings.xml"] = (
            f'<?xml version="1.0"?><sst {_S} count="{len(shared)}" '
            f'uniqueCount="{len(shared)}">{sis}</sst>'
        )
    members["[Content_Types].xml"] = '<?xml version="1.0"?><Types/>'
    return _zip(members)


def build_pptx(slides, extra_members=None) -> bytes:
    members = {
        "ppt/presentation.xml": '<?xml version="1.0"?><presentation/>',
        "[Content_Types].xml": '<?xml version="1.0"?><Types/>',
    }
    for i, paragraphs in enumerate(slides, start=1):
        ps = "".join(
            f"<a:p>{''.join(f'<a:r><a:t>{t}</a:t></a:r>' for t in runs)}</a:p>"
            for runs in paragraphs
        )
        members[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?><sld {_A}><cSld><spTree>{ps}'
            "</spTree></cSld></sld>"
        )
    members.update(extra_members or {})
    return _zip(members)


# --- XLSX ---------------------------------------------------------------------------


def test_xlsx_cells_types_and_rels_indirection():
    shared = [
        "<si><t>plain shared</t></si>",
        "<si><r><t>rich </t></r><r><t>runs</t></r>"
        "<rPh><t>PHONETIC-EXCLUDED</t></rPh></si>",
    ]
    s1 = (
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c>'
        "</row>"
        '<row r="2">'
        '<c r="A2"><v>3.5</v></c>'
        '<c r="B2"><v>42</v></c>'
        '<c r="C2" t="b"><v>1</v></c>'
        "</row>"
        '<row r="3">'
        '<c r="A3" t="inlineStr"><is><t>inline text</t></is></c>'
        '<c r="B3" t="str"><v>formula result</v></c>'
        "</row>"
    )
    s2 = '<row r="1"><c r="C1" t="s"><v>0</v></c></row>'
    # rels deliberately permuted: workbook order must win
    xlsx = build_xlsx(
        [("Résults", s1), ("Later", s2)], shared=shared, rels_order=[7, 2]
    )
    text, n = X._xlsx_extract_text(xlsx)
    assert text.split("\n") == [
        "## Résults",
        "plain shared\trich runs",
        "3.5\t42\tTRUE",
        "inline text\tformula result",
        "## Later",
        "plain shared",
    ]
    assert n == 8
    assert "PHONETIC" not in text


def test_xlsx_column_order_and_missing_refs():
    # cells out of order by ref; one cell without r= lands sequentially
    s = (
        "<row>"
        '<c r="C1"><v>3</v></c>'
        '<c r="A1"><v>1</v></c>'
        "<c><v>2</v></c>"  # no ref: follows A1 -> column B
        "</row>"
    )
    xlsx = build_xlsx([("S", s)])
    text, _ = X._xlsx_extract_text(xlsx)
    assert text.split("\n")[1] == "1\t2\t3"


def test_xlsx_rejections():
    with pytest.raises(ValueError, match="zip signature"):
        X._xlsx_extract_text(b"not a zip")
    with pytest.raises(ValueError, match="workbook.xml"):
        X._xlsx_extract_text(_zip({"other.txt": "x"}))
    with pytest.raises(ValueError, match="no extractable cells"):
        X._xlsx_extract_text(build_xlsx([("Empty", "")]))
    with pytest.raises(ValueError, match="malformed"):
        bad = build_xlsx([("S", '<row><c r="A1"><v>1</v></c></row>')])
        # corrupt the workbook xml
        members = {
            "xl/workbook.xml": "<not closed",
            "xl/worksheets/part0.xml": "<worksheet/>",
        }
        X._xlsx_extract_text(_zip(members))


# --- PPTX ---------------------------------------------------------------------------


def test_pptx_slides_in_numeric_order():
    # slide10 must come AFTER slide2 (numeric, not lexicographic)
    pptx = build_pptx(
        [
            [["Slide one title"], ["bullet ", "joined"]],
            [["Slide two"]],
        ]
    )
    # rename slide2 -> slide10 to force the ordering question
    buf = io.BytesIO(pptx)
    zin = zipfile.ZipFile(buf)
    members = {
        (n if n != "ppt/slides/slide2.xml" else "ppt/slides/slide10.xml"):
            zin.read(n)
        for n in zin.namelist()
    }
    text, n = X._pptx_extract_text(_zip(members))
    assert text.split("\n") == [
        "Slide one title",
        "bullet joined",
        "Slide two",
    ]
    assert n == 2


def test_pptx_rejections():
    with pytest.raises(ValueError, match="presentation.xml"):
        X._pptx_extract_text(_zip({"other.txt": "x"}))
    with pytest.raises(ValueError, match="no text runs"):
        X._pptx_extract_text(build_pptx([]))


# --- router -------------------------------------------------------------------------


def test_ooxml_family_through_router(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    xlsx = build_xlsx(
        [("S", '<row><c r="A1" t="inlineStr"><is><t>sheet text</t></is></c></row>')]
    )
    pptx = build_pptx([[["deck text"]]])
    assert sniff_document(xlsx) == "xlsx"
    assert sniff_document(pptx) == "pptx"
    df = spark.createDataFrame(
        [(0, bytearray(xlsx)), (1, bytearray(pptx))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "xlsx" and "sheet text" in got[0]["text"]
    assert got[1]["doc_format"] == "pptx" and got[1]["text"] == "deck text"
