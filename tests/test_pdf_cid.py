"""Type0-without-ToUnicode lane (round 10, VERDICT next-round #5):
Identity-H/V direct CID reading, the counted absent-value contract for
other predefined CMaps, and the per-page unmapped-glyph count surface."""

import pytest

from drill_logfile_plugin_spark.operators.pdf import (
    _Document,
    _pdf_extract_text,
    pdf_unmapped_glyph_counts,
)
from tests.test_pdf import build_pdf


def _type0_font(encoding: str) -> bytes:
    return (
        f"<< /Type /Font /Subtype /Type0 /BaseFont /Subset+CJK "
        f"/Encoding /{encoding} /DescendantFonts [9 0 R] >>"
    ).encode()


def _hex_show(text: str) -> bytes:
    """A content stream showing ``text`` as 2-byte CID codes (the
    Identity layout where CID == Unicode scalar value)."""
    codes = "".join(f"{ord(ch):04X}" for ch in text)
    return f"BT /F1 12 Tf <{codes}> Tj ET".encode()


def test_identity_h_without_tounicode_extracts():
    doc = build_pdf(
        [_hex_show("你好世界 Hello")], font_obj=_type0_font("Identity-H")
    )
    text, n_pages = _pdf_extract_text(doc)
    assert text == "你好世界 Hello"
    assert pdf_unmapped_glyph_counts(doc) == [0]


def test_identity_v_same_lane():
    doc = build_pdf([_hex_show("縦書き")], font_obj=_type0_font("Identity-V"))
    assert _pdf_extract_text(doc)[0] == "縦書き"


def test_identity_surrogate_gap_counts_as_unmapped():
    # D800-DFFF have no scalar value: counted, not crashed
    stream = b"BT /F1 12 Tf <0041D8000042> Tj ET"
    doc = build_pdf([stream], font_obj=_type0_font("Identity-H"))
    text, _ = _pdf_extract_text(doc)
    assert text == "A�B"
    assert pdf_unmapped_glyph_counts(doc) == [1]


@pytest.mark.parametrize(
    "cmap", ["UniGB-UCS2-H", "UniJIS-UCS2-H", "90ms-RKSJ-H", "KSCms-UHC-H"]
)
def test_predefined_cmaps_are_counted_absence(cmap):
    """A predefined (non-Identity) CMap without ToUnicode must NOT
    decode as Latin-1 mojibake: every 2-byte code counts as unmapped
    and the per-page surface makes the page gateable."""
    doc = build_pdf([_hex_show("四字熟語")], font_obj=_type0_font(cmap))
    text, _ = _pdf_extract_text(doc)
    assert text == "�" * 4
    assert pdf_unmapped_glyph_counts(doc) == [4]


def test_tounicode_still_wins_over_identity():
    """ToUnicode stays the authoritative source when present (the
    priority pin from r9 extends over the r10 lane)."""
    import zlib

    cmap_body = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        b"endcodespacerange\n1 beginbfchar\n<0001> <0058>\n"
        b"endbfchar\nendcmap\nend\n"
    )
    comp = zlib.compress(cmap_body)
    font = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 7 0 R >>"
    )
    stream = b"BT /F1 12 Tf <0001> Tj ET"
    doc = bytearray(build_pdf([stream], compress=False, font_obj=font))
    # splice object 7 (the ToUnicode stream) before the xref table
    insert_at = doc.find(b"xref\n")
    obj7 = (
        b"7 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n"
    )
    doc[insert_at:insert_at] = obj7
    # classic xref is now stale for object 7 — the parser's scan-rebuilt
    # offset index covers it (the repo's standing recovery path)
    text, _ = _pdf_extract_text(bytes(doc))
    # ToUnicode maps 0x0001 -> 'X'; Identity would have read U+0001
    assert text == "X"


def test_multipage_counts_are_per_page():
    doc = build_pdf(
        [_hex_show("好"), b"BT /F1 12 Tf <D800D801> Tj ET"],
        font_obj=_type0_font("Identity-H"),
    )
    assert pdf_unmapped_glyph_counts(doc) == [0, 2]


def test_no_encoding_type0_keeps_latin1_legacy():
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /X >>"
    doc = build_pdf([b"BT /F1 12 Tf (plain) Tj ET"], font_obj=font)
    assert _pdf_extract_text(doc)[0] == "plain"


def test_spark_lane_with_unmapped_counts(spark):
    """extract_pdf_text(with_unmapped=True) surfaces the per-page trust
    signal at the corpus surface; the default schema is unchanged."""
    from drill_logfile_plugin_spark.operators.pdf import extract_pdf_text

    good = build_pdf([_hex_show("好")], font_obj=_type0_font("Identity-H"))
    bad = build_pdf([_hex_show("曖昧")], font_obj=_type0_font("UniGB-UCS2-H"))
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(bad))],
        "doc_id long, payload binary",
    )
    base = extract_pdf_text(df)
    assert base.columns == ["doc_id", "text", "n_pages", "n_chars"]
    out = {
        r["doc_id"]: r
        for r in extract_pdf_text(df, with_unmapped=True).collect()
    }
    assert out[0]["unmapped_glyphs"] == [0]
    assert out[1]["unmapped_glyphs"] == [2]
    assert out[0]["text"] == "好"
