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
    "cmap",
    ["90pv-RKSJ-H", "83pv-RKSJ-H", "KSCpc-EUC-H", "CNS-EUC-H",
     "GBKp-EUC-H", "B5pc-H"],
)
def test_predefined_cmaps_are_counted_absence(cmap):
    """A predefined CMap whose encoding has NO exact stdlib codec
    (the Mac variants, EUC-TW, GBKp's replaced codes) must NOT decode
    as Latin-1 mojibake: every 2-byte code counts as unmapped and the
    per-page surface makes the page gateable. (The UCS2/UTF16 families
    and the stdlib-codec legacy-byte families moved to the decoding
    lanes in r11 — below.)"""
    doc = build_pdf([_hex_show("四字熟語")], font_obj=_type0_font(cmap))
    text, _ = _pdf_extract_text(doc)
    assert text == "�" * 4
    assert pdf_unmapped_glyph_counts(doc) == [4]


@pytest.mark.parametrize(
    "cmap,sample",
    [
        ("UniGB-UCS2-H", "中文简体文本测试"),
        ("UniGB-UCS2-V", "中文竖排"),
        ("UniCNS-UCS2-H", "繁體中文測試"),
        ("UniJIS-UCS2-H", "日本語のテキスト"),
        ("UniJIS-UCS2-HW-H", "半角ワイド"),
        ("UniKS-UCS2-H", "한국어 텍스트"),
        ("UniKS-UCS2-V", "세로쓰기"),
    ],
)
def test_ucs2_cmap_families_decode_table_free(cmap, sample):
    """r11 (verdict item 3): the Uni*-UCS2 predefined CMaps ARE the
    UCS-2 encoding of their collections per Adobe's definition, so the
    2-byte codes read as Unicode directly — the CJK-book slice emits
    correct text and its unmapped count drops to zero."""
    doc = build_pdf([_hex_show(sample)], font_obj=_type0_font(cmap))
    text, _ = _pdf_extract_text(doc)
    assert text == sample
    assert pdf_unmapped_glyph_counts(doc) == [0]


def test_ucs2_cmap_surrogate_gap_still_counts():
    """UCS-2 has no surrogates: gap codes stay counted, not crashed."""
    stream = b"BT /F1 12 Tf <4E2DD800> Tj ET"
    doc = build_pdf([stream], font_obj=_type0_font("UniGB-UCS2-H"))
    text, _ = _pdf_extract_text(doc)
    assert text == "中�"
    assert pdf_unmapped_glyph_counts(doc) == [1]


@pytest.mark.parametrize(
    "cmap,sample",
    [
        ("UniJIS-UTF16-H", "日本語テキスト"),
        ("UniGB-UTF16-H", "中文文本"),
        ("UniKS-UTF16-V", "한국어"),
        ("UniJIS2004-UTF16-H", "新字形"),
    ],
)
def test_utf16_cmap_families_decode_table_free(cmap, sample):
    """r11: the Uni*-UTF16 predefined CMaps are the UTF-16BE encoding
    of their collections — whole-string decode, surrogate-aware."""
    doc = build_pdf([_hex_show(sample)], font_obj=_type0_font(cmap))
    text, _ = _pdf_extract_text(doc)
    assert text == sample
    assert pdf_unmapped_glyph_counts(doc) == [0]


def test_utf16_cmap_surrogate_pairs_decode():
    """Supplementary-plane text (CJK Ext B etc.) arrives as surrogate
    PAIRS in a UTF16 CMap — exactly what the UCS2 lane cannot carry."""
    sample = "\U00020BB7野家"  # U+20BB7 (yoshinoya 'yoshi') + BMP chars
    codes = "".join(
        f"{u:04X}" for u in
        [int.from_bytes(b, "big") for b in
         [sample.encode("utf-16-be")[i:i+2]
          for i in range(0, len(sample.encode("utf-16-be")), 2)]]
    )
    stream = f"BT /F1 12 Tf <{codes}> Tj ET".encode()
    doc = build_pdf([stream], font_obj=_type0_font("UniJIS-UTF16-H"))
    text, _ = _pdf_extract_text(doc)
    assert text == sample
    assert pdf_unmapped_glyph_counts(doc) == [0]


def test_utf16_cmap_lone_surrogate_counts():
    stream = b"BT /F1 12 Tf <4E2DD800> Tj ET"  # BMP char + lone high
    doc = build_pdf([stream], font_obj=_type0_font("UniJIS-UTF16-H"))
    text, _ = _pdf_extract_text(doc)
    assert text == "中\ufffd"
    assert pdf_unmapped_glyph_counts(doc) == [1]


def _bytes_show(raw: bytes) -> bytes:
    """A content stream showing ``raw`` bytes verbatim as a hex
    string — the shape of a legacy-byte (RKSJ/UHC/EUC/B5) CMap
    stream, where the string bytes ARE the national charset."""
    return f"BT /F1 12 Tf <{raw.hex().upper()}> Tj ET".encode()


@pytest.mark.parametrize(
    "cmap,codec,sample",
    [
        ("90ms-RKSJ-H", "cp932", "日本語 ﾃｷｽﾄ abc"),   # 2-byte + 1-byte kana + ASCII
        ("90msp-RKSJ-V", "cp932", "縦書き"),
        ("Add-RKSJ-H", "shift_jis", "漢字かな"),
        ("Ext-RKSJ-H", "shift_jis", "拡張前の版"),
        ("EUC-H", "euc_jp", "日本語テキスト"),
        ("KSCms-UHC-H", "cp949", "한국어 텍스트"),
        ("KSCms-UHC-HW-V", "cp949", "세로"),
        ("KSC-EUC-H", "euc_kr", "한글"),
        ("GB-EUC-H", "gb2312", "简体中文"),
        ("GBK-EUC-H", "gbk", "汉字文本"),
        ("GBK2K-H", "gb18030", "中文 \U00020BB7"),      # GB18030 4-byte form
        ("ETen-B5-H", "cp950", "繁體中文"),
        ("HKscs-B5-H", "big5hkscs", "香港字"),
        ("UniJIS-UTF8-H", "utf-8", "日本語 \U00020BB7"),
        ("UniKS-UTF32-H", "utf-32-be", "한국어"),
    ],
)
def test_legacy_byte_cmaps_decode_via_codec(cmap, codec, sample):
    """r11: legacy-byte predefined CMaps whose codespace IS a stdlib
    charset (per Adobe's cmap-resources: 90ms-RKSJ = Microsoft
    KanjiCode, KSCms-UHC = UHC, GBK-EUC = GBK, ETen-B5 = Big5+ETen,
    ...) decode table-free — the content-stream bytes are text in
    that charset; CID indirection selects glyphs, not values."""
    doc = build_pdf(
        [_bytes_show(sample.encode(codec))], font_obj=_type0_font(cmap)
    )
    text, _ = _pdf_extract_text(doc)
    assert text == sample
    assert pdf_unmapped_glyph_counts(doc) == [0]


def test_legacy_byte_cmap_bad_trail_byte_counts():
    """A lead byte with an invalid trail decodes to U+FFFD and stays
    countable — extension-zone honesty, same convention as every
    unmapped glyph."""
    raw = "中".encode("gbk") + b"\x81\x20" + "文".encode("gbk")
    doc = build_pdf([_bytes_show(raw)], font_obj=_type0_font("GBK-EUC-H"))
    text, _ = _pdf_extract_text(doc)
    assert text.startswith("中") and text.endswith("文")
    assert "�" in text
    assert pdf_unmapped_glyph_counts(doc)[0] >= 1


def test_legacy_byte_cmap_tounicode_still_wins():
    """ToUnicode stays authoritative over the codec lane: a font
    declaring 90ms-RKSJ-H but carrying a ToUnicode CMap reads through
    the table."""
    import zlib

    cmap_body = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        b"endcodespacerange\n1 beginbfchar\n<8A79> <0059>\n"
        b"endbfchar\nendcmap\nend\n"
    )
    comp = zlib.compress(cmap_body)
    font = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /90ms-RKSJ-H "
        b"/ToUnicode 7 0 R >>"
    )
    stream = b"BT /F1 12 Tf <8A79> Tj ET"
    doc = bytearray(build_pdf([stream], compress=False, font_obj=font))
    insert_at = doc.find(b"xref\n")
    obj7 = (
        b"7 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n"
    )
    doc[insert_at:insert_at] = obj7
    assert _pdf_extract_text(bytes(doc))[0] == "Y"


def test_legacy_cmap_lookalike_names_stay_counted():
    """Near-miss names (wrong suffix, unknown family, the deliberately
    excluded Mac variants) keep the quarantine."""
    for bad in ("90ms-RKSJ", "90ms-RKSJ-X", "X90ms-RKSJ-H",
                "90pv-RKSJ-H", "CNS-EUC-H", "GBKp-EUC-H"):
        doc = build_pdf([_hex_show("中")], font_obj=_type0_font(bad))
        assert pdf_unmapped_glyph_counts(doc) == [1], bad


def test_ucs2_lookalike_names_stay_counted():
    """Near-miss names must not match the family regex."""
    for bad in ("UniGB-UCS2", "UniGB-UCS2-X", "XUniGB-UCS2-H",
                "UniTH-UCS2-H"):
        doc = build_pdf([_hex_show("中")], font_obj=_type0_font(bad))
        assert pdf_unmapped_glyph_counts(doc) == [1]


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
    # r11: UCS2 + stdlib-codec legacy families now decode, so the
    # counted-absence exemplar is a Mac-variant predefined CMap
    bad = build_pdf([_hex_show("曖昧")], font_obj=_type0_font("B5pc-H"))
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


# --- per-page image accounting (r11, verdict item 6) ---------------------------


def test_page_image_counts_on_scanned_pdf():
    """A fax-bearing page reports its raster count: 'image-only page'
    becomes countable, distinct from 'blank page'."""
    from drill_logfile_plugin_spark.operators.pdf import (
        pdf_page_image_counts,
    )
    from tests.test_ccitt import _images, _pdf_with_fax

    img = dict(_images())["blobby"]
    doc = _pdf_with_fax(img, -1)
    assert pdf_page_image_counts(doc) == [1]


def test_page_image_counts_zero_on_text_pdf():
    from drill_logfile_plugin_spark.operators.pdf import (
        pdf_page_image_counts,
    )
    from tests.test_pdf import build_pdf, text_stream

    doc = build_pdf([text_stream("(a) Tj"), text_stream("(b) Tj")])
    assert pdf_page_image_counts(doc) == [0, 0]


def test_spark_lane_with_page_images(spark):
    from drill_logfile_plugin_spark.operators.pdf import extract_pdf_text
    from tests.test_ccitt import _images, _pdf_with_fax
    from tests.test_pdf import build_pdf, text_stream

    img = dict(_images())["text_like"]
    scanned = _pdf_with_fax(img, -1)
    texty = build_pdf([text_stream("(hello) Tj")])
    df = spark.createDataFrame(
        [(0, bytearray(scanned)), (1, bytearray(texty))],
        "doc_id long, payload binary",
    )
    base = extract_pdf_text(df)
    assert base.columns == ["doc_id", "text", "n_pages", "n_chars"]
    out = {
        r["doc_id"]: r
        for r in extract_pdf_text(
            df, with_unmapped=True, with_page_images=True
        ).collect()
    }
    assert out[0]["page_images"] == [1]
    assert out[1]["page_images"] == [0]
    assert out[1]["text"] == "hello"
