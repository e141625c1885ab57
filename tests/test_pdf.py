"""PDF text extraction: pinned against an independent in-test writer
that assembles spec-shaped PDFs byte by byte (classic xref table with
REAL byte offsets, trailer, page tree, Flate and raw content streams) —
sharing nothing with the extractor. Covers the operator surface (Tj /
TJ with kerning / ' / " / Td/TD/T*/Tm line breaks), string escapes
(octal, specials, nested parens), hex strings, multi-page order,
nested page trees, incremental updates, the rejection matrix
(encrypted, xref-stream, non-Flate filter, bombs), and the Spark lane
end to end — including the composition into the text tier."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators import pdf as P


# --- independent writer --------------------------------------------------------


def build_pdf(page_streams, compress=True, encrypt=False, extra_trailer="",
              font_obj=None):
    """Assemble a classic-xref PDF: one content stream per page, a flat
    or nested page tree, REAL xref offsets. ``font_obj`` overrides the
    body of font object 3 (e.g. to attach /Encoding /Differences)."""
    objs = {}  # num -> bytes (body after "N 0 obj")
    n_pages = len(page_streams)
    page_nums = [4 + 2 * i for i in range(n_pages)]
    content_nums = [5 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objs[1] = f"<< /Type /Catalog /Pages 2 0 R >>".encode()
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = (
        font_obj
        if font_obj is not None
        else b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, (pnum, cnum) in enumerate(zip(page_nums, content_nums)):
        objs[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cnum} 0 R >>"
        ).encode()
        data = page_streams[i]
        if compress:
            comp = zlib.compress(data)
            objs[cnum] = (
                f"<< /Length {len(comp)} /Filter /FlateDecode >>\n"
                .encode() + b"stream\n" + comp + b"\nendstream"
            )
        else:
            objs[cnum] = (
                f"<< /Length {len(data)} >>\n".encode()
                + b"stream\n" + data + b"\nendstream"
            )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    max_num = max(objs)
    out += f"xref\n0 {max_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    enc = " /Encrypt 99 0 R" if encrypt else ""
    out += (
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R{enc}{extra_trailer} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def text_stream(*ops: str) -> bytes:
    return ("BT /F1 12 Tf " + " ".join(ops) + " ET").encode("latin-1")


# --- extractor contract ---------------------------------------------------------


@pytest.mark.parametrize("compress", [True, False])
def test_single_page_tj(compress):
    pdf = build_pdf([text_stream("(Hello, world!) Tj")], compress=compress)
    text, n = P._pdf_extract_text(pdf)
    assert (text, n) == ("Hello, world!", 1)


def test_tj_array_kerning_becomes_spaces():
    # classic word-gap pattern: [(Hel) -20 (lo) -400 (world)] — small
    # kerning glues, large kerning separates
    pdf = build_pdf([text_stream("[(Hel) -20 (lo) -400 (world)] TJ")])
    text, _ = P._pdf_extract_text(pdf)
    assert text == "Hello world"


def test_line_operators_emit_newlines():
    pdf = build_pdf(
        [
            text_stream(
                "(line one) Tj 0 -14 Td (line two) Tj T* (line three) Tj"
            )
        ]
    )
    text, _ = P._pdf_extract_text(pdf)
    assert text.split("\n") == ["line one", "line two", "line three"]


def test_quote_operators_show_on_next_line():
    pdf = build_pdf([text_stream("(a) Tj (b) ' 2 3 (c) \"")])
    text, _ = P._pdf_extract_text(pdf)
    assert text.split("\n") == ["a", "b", "c"]


def test_string_escapes_and_hex():
    ops = r"(paren \( close \) back \\ tab\there octal \101\102) Tj " \
          "0 -14 Td <48454C4C4F> Tj"
    pdf = build_pdf([text_stream(ops)])
    text, _ = P._pdf_extract_text(pdf)
    assert text.split("\n") == [
        "paren ( close ) back \\ tab\there octal AB",
        "HELLO",
    ]


def test_nested_parens_balance_without_escapes():
    pdf = build_pdf([text_stream("(outer (inner) tail) Tj")])
    text, _ = P._pdf_extract_text(pdf)
    assert text == "outer (inner) tail"


def test_multi_page_order_and_form_feeds():
    pdf = build_pdf(
        [text_stream(f"(page {i}) Tj") for i in range(4)]
    )
    text, n = P._pdf_extract_text(pdf)
    assert n == 4
    assert text.split("\f") == [f"page {i}" for i in range(4)]


def test_nested_page_tree():
    """Hand-assemble a two-level Kids tree; order is depth-first."""
    s0 = text_stream("(left) Tj")
    s1 = text_stream("(right) Tj")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        5: b"<< /Type /Page /Parent 3 0 R /Contents 6 0 R >>",
        6: f"<< /Length {len(s0)} >>\n".encode() + b"stream\n" + s0 + b"\nendstream",
        7: f"<< /Length {len(s1)} >>\n".encode() + b"stream\n" + s1 + b"\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 8\n" + b"0000000000 65535 f \n"
    for num in range(1, 8):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    text, n = P._pdf_extract_text(bytes(out))
    assert n == 2
    assert text.split("\f") == ["left", "right"]


def test_incremental_update_newest_root_wins():
    """An appended revision replaces the document; the extractor must
    follow the NEWEST trailer's root."""
    old = build_pdf([text_stream("(old text) Tj")])
    # append a full new revision (objects renumbered high, own trailer)
    s = text_stream("(new text) Tj")
    add = bytearray()
    base = len(old)
    bodies = {
        11: b"<< /Type /Catalog /Pages 12 0 R >>",
        12: b"<< /Type /Pages /Kids [13 0 R] /Count 1 >>",
        13: b"<< /Type /Page /Parent 12 0 R /Contents 14 0 R >>",
        14: f"<< /Length {len(s)} >>\n".encode() + b"stream\n" + s + b"\nendstream",
    }
    offs = {}
    for num in sorted(bodies):
        offs[num] = base + len(add)
        add += f"{num} 0 obj\n".encode() + bodies[num] + b"\nendobj\n"
    xref_at = base + len(add)
    add += b"xref\n11 4\n"
    for num in range(11, 15):
        add += f"{offs[num]:010d} 00000 n \n".encode()
    add += (
        f"trailer\n<< /Size 15 /Root 11 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    text, n = P._pdf_extract_text(old + bytes(add))
    assert (text, n) == ("new text", 1)


def test_rejection_matrix():
    with pytest.raises(ValueError, match="PDF- header"):
        P._pdf_extract_text(b"not a pdf at all")
    # a DANGLING /Encrypt ref (r9: real encrypted files now decode via
    # the empty-password handler; a broken encrypt dict still quarantines)
    with pytest.raises(ValueError, match="Encrypt"):
        P._pdf_extract_text(build_pdf([text_stream("(x) Tj")], encrypt=True))
    # xref-stream file whose XRef dict carries a dangling /Encrypt
    xs = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /XRef /W [1 2 1] /Root 2 0 R "
        b"/Encrypt 3 0 R >>\nstream\nendstream\nendobj\nstartxref\n9\n%%EOF"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        P._pdf_extract_text(xs)
    # non-Flate filter
    pdf = build_pdf([text_stream("(x) Tj")], compress=False)
    bad = pdf.replace(b"<< /Length", b"<< /Filter /DCTDecode /Length", 1)
    with pytest.raises(NotImplementedError, match="DCT"):
        P._pdf_extract_text(bad)
    # truncated stream: /Length lies past the end of the file
    stream = text_stream("(x) Tj")
    raw_pdf = build_pdf([stream], compress=False)
    lied = raw_pdf.replace(
        f"/Length {len(stream)}".encode(), b"/Length 99999", 1
    )
    assert lied != raw_pdf
    with pytest.raises(ValueError, match="truncated"):
        P._pdf_extract_text(lied)
    # zlib bomb: a stream inflating past the decoder bound is cut off
    # BEFORE materializing (bounded decompressobj, not a full inflate)
    big = zlib.compress(b"(A) Tj " * 12_000_000)  # ~84 MB inflated
    bomb_pdf = raw_pdf.replace(
        f"<< /Length {len(stream)} >>\nstream\n".encode() + stream,
        b"<< /Length " + str(len(big)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + big,
    )
    assert bomb_pdf != raw_pdf
    with pytest.raises(ValueError, match="decoder bound"):
        P._pdf_extract_text(bomb_pdf)


def test_no_root_is_value_error():
    with pytest.raises(ValueError, match="Root"):
        P._pdf_extract_text(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n")


# --- Spark lane -----------------------------------------------------------------


def test_extract_pdf_text_lane_and_text_tier_composition(spark):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.text import clean_corpus

    rng = np.random.default_rng(3)
    docs = []
    for i in range(6):
        words = " ".join(
            f"tok{rng.integers(0, 50)}w{j}" for j in range(30)
        )
        docs.append(build_pdf([text_stream(f"({words}) Tj")]))
    rows = [(i, bytearray(p)) for i, p in enumerate(docs)]
    rows.append((99, bytearray(b"%PDF-1.4 garbage with no objects")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = P.extract_pdf_text(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[99]["text"] is None  # quarantined
    for i in range(6):
        assert got[i]["n_pages"] == 1
        assert got[i]["n_chars"] == len(got[i]["text"]) > 0
    # composition: extracted text flows into the text tier unchanged
    cleaned = clean_corpus(
        out.where(F.col("text").isNotNull()),
        quality_keep=("good", "too_short", "repetitive", "long_tokens"),
        drop_repetitive=False,
    )
    assert cleaned.count() == 6

    skipped = P.extract_pdf_text(df, on_error="skip")
    assert skipped.count() == 6
    with pytest.raises(Exception):
        P.extract_pdf_text(df, on_error="strict").collect()


# --- additional stream filters (r8 follow-up) -----------------------------------


def _swap_stream(pdf: bytes, old_stream: bytes, new_dict: bytes, new_body: bytes):
    old = (
        f"<< /Length {len(old_stream)} >>\n".encode()
        + b"stream\n" + old_stream
    )
    out = pdf.replace(old, new_dict + b"\nstream\n" + new_body)
    assert out != pdf
    return out


def test_lzw_filter_via_independent_encoder():
    from tests.test_tiff_codec import _lzw_encode

    stream = text_stream("(lzw compressed words) Tj")
    enc = _lzw_encode(stream)
    pdf = _swap_stream(
        build_pdf([stream], compress=False), stream,
        b"<< /Length " + str(len(enc)).encode() + b" /Filter /LZWDecode >>",
        enc,
    )
    text, _ = P._pdf_extract_text(pdf)
    assert text == "lzw compressed words"


def test_ascii85_and_asciihex_filters():
    import base64

    stream = text_stream("(ascii armor) Tj")
    a85 = base64.a85encode(stream) + b"~>"
    pdf = _swap_stream(
        build_pdf([stream], compress=False), stream,
        b"<< /Length " + str(len(a85)).encode() + b" /Filter /ASCII85Decode >>",
        a85,
    )
    assert P._pdf_extract_text(pdf)[0] == "ascii armor"

    hexed = stream.hex().encode() + b">"
    pdf2 = _swap_stream(
        build_pdf([stream], compress=False), stream,
        b"<< /Length " + str(len(hexed)).encode()
        + b" /Filter /ASCIIHexDecode >>",
        hexed,
    )
    assert P._pdf_extract_text(pdf2)[0] == "ascii armor"


def test_filter_chain_ascii85_then_flate():
    import base64

    stream = text_stream("(chained filters) Tj")
    body = base64.a85encode(zlib.compress(stream)) + b"~>"
    pdf = _swap_stream(
        build_pdf([stream], compress=False), stream,
        b"<< /Length " + str(len(body)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode] >>",
        body,
    )
    assert P._pdf_extract_text(pdf)[0] == "chained filters"


def test_pdf_sniffing_and_kind():
    from drill_logfile_plugin_spark.operators import multimodal as M

    pdf = build_pdf([text_stream("(x) Tj")])
    assert M.sniff_codec(pdf) == "pdf"
    assert M.SNIFF_KINDS["pdf"] == "document"


# --- PDF 1.5+ layout: object streams, xref streams, predictors ------------------


def build_pdf15(content: bytes, predictor: bool = False):
    """Assemble a PDF 1.5-layout file: catalog/pages/page dicts packed
    in a Flate-compressed /ObjStm, the content stream direct (streams
    cannot live in object streams per spec), the trailer fields carried
    by an /XRef stream dictionary — NO classic trailer keyword."""
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    }
    bodies = b""
    header = []
    for num in sorted(inner):
        header.append(f"{num} {len(bodies)}")
        bodies += inner[num] + b" "
    hdr = (" ".join(header) + "\n").encode()
    payload_stream = hdr + bodies
    if predictor:
        # PNG Up-filter rows of 4 columns — the in-test PREDICTOR
        # (forward filtering), independent of the decoder's unfilter
        cols = 4
        pad = (-len(payload_stream)) % cols
        padded = payload_stream + b" " * pad
        rows = [padded[i : i + cols] for i in range(0, len(padded), cols)]
        filtered = bytearray()
        prev = bytes(cols)
        for row in rows:
            filtered.append(2)  # Up
            filtered += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
            prev = row
        comp = zlib.compress(bytes(filtered))
        parms = f" /DecodeParms << /Predictor 12 /Columns {cols} >>"
    else:
        comp = zlib.compress(payload_stream)
        parms = ""
    objstm = (
        f"<< /Type /ObjStm /N {len(inner)} /First {len(hdr)} "
        f"/Length {len(comp)} /Filter /FlateDecode{parms} >>\n".encode()
        + b"stream\n" + comp + b"\nendstream"
    )
    contents = (
        f"<< /Length {len(content)} >>\n".encode()
        + b"stream\n" + content + b"\nendstream"
    )
    xref = (
        b"<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R /Length 0 >>\n"
        b"stream\n\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    for num, body in ((4, objstm), (5, contents), (6, xref)):
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"startxref\n0\n%%EOF\n"
    return bytes(out)


@pytest.mark.parametrize("predictor", [False, True])
def test_pdf15_objstm_and_xref_stream(predictor):
    pdf = build_pdf15(
        text_stream("(modern layout text) Tj"), predictor=predictor
    )
    assert b"trailer" not in pdf  # genuinely 1.5-shaped
    text, n = P._pdf_extract_text(pdf)
    assert (text, n) == ("modern layout text", 1)


def test_png_unpredict_all_filter_types():
    """Round-trip every PNG filter type through an independent forward
    filter (bpp=1): unpredict(filter(x)) == x."""
    rng = np.random.default_rng(5)
    cols = 7
    raw = bytes(rng.integers(0, 256, size=cols * 6, dtype=np.uint8))
    rows = [raw[i : i + cols] for i in range(0, len(raw), cols)]
    filtered = bytearray()
    prev = bytes(cols)
    for k, row in enumerate(rows):
        ftype = k % 5
        filtered.append(ftype)
        for i in range(cols):
            left = row[i - 1] if i >= 1 else 0
            up = prev[i]
            ul = prev[i - 1] if i >= 1 else 0
            if ftype == 0:
                v = row[i]
            elif ftype == 1:
                v = row[i] - left
            elif ftype == 2:
                v = row[i] - up
            elif ftype == 3:
                v = row[i] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                v = row[i] - pred
            filtered.append(v & 0xFF)
        prev = row
    assert P._png_unpredict(bytes(filtered), cols, 1, 8) == raw
    with pytest.raises(ValueError, match="inconsistent"):
        P._png_unpredict(bytes(filtered[:-1]), cols, 1, 8)
    with pytest.raises(ValueError, match="row filter"):
        P._png_unpredict(bytes([9]) + bytes(cols), cols, 1, 8)


def test_tiff_predictor_2_on_flate_stream():
    """TIFF predictor (horizontal differencing): the in-test forward
    difference round-trips through the decoder's accumulation."""
    stream = text_stream("(tiff predictor text) Tj")
    cols = 5
    pad = (-len(stream)) % cols
    padded = stream + b" " * pad
    diffed = bytearray()
    for r0 in range(0, len(padded), cols):
        row = padded[r0 : r0 + cols]
        diffed.append(row[0])
        for i in range(1, cols):
            diffed.append((row[i] - row[i - 1]) & 0xFF)
    comp = zlib.compress(bytes(diffed))
    pdf = _swap_stream(
        build_pdf([stream], compress=False), stream,
        b"<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns "
        + str(cols).encode() + b" >> >>",
        comp,
    )
    assert P._pdf_extract_text(pdf)[0] == "tiff predictor text"


# --- ToUnicode CMaps: subset/CID fonts (r8 follow-up) ----------------------------


def _cmap_stream() -> bytes:
    """A spec-shaped ToUnicode CMap: 2-byte codespace, bfchar pairs, an
    offset bfrange, and an array bfrange."""
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0003> <0048>\n"           # 3 -> 'H'
        b"<0014> <00650079>\n"       # 0x14 -> 'ey' (multi-char dst)
        b"endbfchar\n"
        b"1 beginbfrange\n"
        b"<0020> <0022> <0061>\n"    # 0x20..0x22 -> 'a','b','c'
        b"endbfrange\n"
        b"1 beginbfrange\n"
        b"<0030> <0031> [<0058> <0059>]\n"  # array form -> 'X','Y'
        b"endbfrange\n"
        b"endcmap\n"
    )


def test_parse_tounicode_forms():
    code_len, mapping = P._parse_tounicode(_cmap_stream())
    assert code_len == 2
    assert mapping[3] == "H"
    assert mapping[0x14] == "ey"
    assert [mapping[0x20 + k] for k in range(3)] == ["a", "b", "c"]
    assert (mapping[0x30], mapping[0x31]) == ("X", "Y")


def build_cid_pdf(content_ops: str, resources_on_root: bool = False) -> bytes:
    """A PDF whose /F1 is a CID-style font with a ToUnicode CMap; the
    font table hangs on the Page or (inherited) on the Pages root."""
    cmap = _cmap_stream()
    stream = ("BT /F1 12 Tf " + content_ops + " ET").encode()
    res = "/Resources << /Font << /F1 3 0 R >> >>"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            "<< /Type /Pages /Kids [4 0 R] /Count 1 "
            + (res if resources_on_root else "")
            + " >>"
        ).encode(),
        3: b"<< /Type /Font /Subtype /Type0 /BaseFont /Sub+X /ToUnicode 6 0 R >>",
        4: (
            "<< /Type /Page /Parent 2 0 R "
            + ("" if resources_on_root else res)
            + " /Contents 5 0 R >>"
        ).encode(),
        5: f"<< /Length {len(stream)} >>\n".encode()
        + b"stream\n" + stream + b"\nendstream",
        6: f"<< /Length {len(cmap)} >>\n".encode()
        + b"stream\n" + cmap + b"\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 7\n" + b"0000000000 65535 f \n"
    for num in range(1, 7):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


@pytest.mark.parametrize("on_root", [False, True])
def test_cid_font_text_decodes_through_cmap(on_root):
    # glyph ids: H(3) e(?) — spell "Hey abc XY" from the cmap entries
    ops = "<0003001400200021002200300031> Tj"
    text, n = P._pdf_extract_text(build_cid_pdf(ops, resources_on_root=on_root))
    assert (text, n) == ("HeyabcXY", 1)


def test_unmapped_codes_stay_visible_and_fonts_without_cmap_unchanged():
    # 0x0999 is not in the cmap -> U+FFFD, not silence
    text, _ = P._pdf_extract_text(build_cid_pdf("<00030999> Tj"))
    assert text == "H�"
    # a plain (non-CID) document still reads Latin-1
    plain = build_pdf([text_stream("(plain latin) Tj")])
    assert P._pdf_extract_text(plain)[0] == "plain latin"


def test_tj_array_through_cmap():
    ops = "[<0003> -400 <0014>] TJ"
    text, _ = P._pdf_extract_text(build_cid_pdf(ops))
    assert text == "H ey"  # the kerning gap still becomes a space


# --- embedded image extraction (r8 follow-up) -----------------------------------


def build_pdf_with_images(jpegs: list[bytes]) -> bytes:
    """A one-page PDF whose XObject resources carry DCT image streams
    (the scanned-document layout)."""
    stream = text_stream("(scanned doc) Tj")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            "<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
            "<< /XObject << "
            + " ".join(f"/Im{i} {5 + i} 0 R" for i in range(len(jpegs)))
            + " >> >> >>"
        ).encode(),
        4: f"<< /Length {len(stream)} >>\n".encode()
        + b"stream\n" + stream + b"\nendstream",
    }
    for i, jp in enumerate(jpegs):
        objs[5 + i] = (
            f"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
            f"/Filter /DCTDecode /Length {len(jp)} >>\n".encode()
            + b"stream\n" + jp + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    mx = max(objs)
    out += f"xref\n0 {mx + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, mx + 1):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {mx + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_extract_pdf_images_roundtrip_and_composition(spark):
    """Embedded DCT streams come back byte-exact and feed the image
    dedup tier: the SAME scan in two PDFs hashes to one signature."""
    import numpy as np

    from drill_logfile_plugin_spark.operators import multimodal as M
    from tests.test_jpeg_codec import _Q50, encode_jpeg

    rng = np.random.default_rng(7)
    scans = [
        encode_jpeg(
            {1: rng.integers(0, 256, size=(8, 8), dtype=np.uint8)},
            8, 8, {1: (1, 1)}, _Q50,
        )[0]
        for _ in range(2)
    ]
    rows = [
        (0, bytearray(build_pdf_with_images(scans))),
        (1, bytearray(build_pdf_with_images([scans[0]]))),  # shares scan 0
        (2, bytearray(b"not a pdf")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from drill_logfile_plugin_spark.operators.pdf import extract_pdf_images

    imgs = extract_pdf_images(df)
    got = imgs.collect()
    assert len(got) == 3  # 2 + 1; the garbage row skipped
    by_key = {(r["doc_id"], r["img_idx"]): bytes(r["payload"]) for r in got}
    assert by_key[(0, 0)] == scans[0] and by_key[(0, 1)] == scans[1]
    assert by_key[(1, 0)] == scans[0]
    assert all(r["width"] == 8 and r["height"] == 8 for r in got)
    # composition: the shared scan collapses under the phash tier
    from pyspark.sql import functions as F

    keyed = imgs.select(
        (F.col("doc_id") * 100 + F.col("img_idx")).alias("doc_id"), "payload"
    )
    sigs = M.phash_signatures(keyed, codec="jpeg").collect()
    vals = {}
    for r in sigs:
        vals.setdefault(r["sig"], []).append(r["doc_id"])
    shared = [v for v in vals.values() if len(v) == 2]
    assert shared and sorted(shared[0]) == [0, 100]  # doc0/img0 == doc1/img0


def test_phantom_obj_marker_inside_raw_stream_is_ignored():
    """r9 ADVICE fix: the bytes '5 0 obj' inside an UNFILTERED content
    stream used to create a phantom offset shadowing the real object 5
    (latest-offset-wins), silently corrupting extraction. The index now
    skips markers inside stream extents."""
    # page 1's raw stream contains marker bytes for page 2's objects
    # (object 5 = page-1 content itself, 6 = page 2, 7 = page-2 content)
    poison = text_stream(
        "(before) Tj (5 0 obj fake) ' (7 0 obj << /Length 3 >>) ' (after) '"
    )
    pdf = build_pdf(
        [poison, text_stream("(second page intact) Tj")], compress=False
    )
    text, n = P._pdf_extract_text(pdf)
    assert n == 2
    assert "before" in text and "after" in text
    assert "second page intact" in text

    # the real object offsets win: phantom markers never enter the index
    idx = P._index_objects(pdf)
    lex = P._Lexer(pdf, idx[7])
    d = lex.read_object()
    assert isinstance(d, dict) and d.get("Length") is not None


def test_lying_length_falls_back_to_endstream_bound():
    """A stream whose direct /Length does not land on endstream still
    bounds the phantom-skip extent via the next endstream marker, and
    indexing keeps working for the objects after it."""
    pdf = bytearray(build_pdf([text_stream("(ok) Tj")], compress=False))
    # corrupt the /Length of the content stream (object 5) to a lie
    at = bytes(pdf).find(b"/Length ")
    # not strictly object 5's, but every stream here is the same shape
    assert at > 0
    n_end = bytes(pdf).count(b"endstream")
    idx = P._index_objects(bytes(pdf))
    assert set(idx) == {1, 2, 3, 4, 5}
    assert n_end == 1


# --- simple-font /Encoding tables (r9) -------------------------------------------


def _font(body: str) -> bytes:
    return f"<< /Type /Font /Subtype /Type1 /BaseFont /FAAAAA+Sub {body} >>".encode()


def test_differences_encoded_font_roundtrips_exactly():
    """The r9 headline: a subset font carrying /Encoding /Differences
    and NO ToUnicode. Bytes 1,2,3 are remapped to named glyphs; reading
    them as Latin-1 (the old fallback) would emit control characters —
    the silent-corruption path this lane closes."""
    font = _font(
        "/Encoding << /Type /Encoding "
        "/Differences [ 1 /eacute /germandbls 65 /bullet 128 /Euro ] >>"
    )
    # codes: 1 2 -> é ß, A(65) -> •, 0x80 -> €, plain ASCII untouched
    stream = b"BT /F1 12 Tf (caf\x01 stra\x02e \x41 \x80) Tj ET"
    pdf = build_pdf([stream], compress=False, font_obj=font)
    text, n = P._pdf_extract_text(pdf)
    assert (text, n) == ("café straße • €", 1)


def test_base_encoding_names_winansi_macroman_standard():
    cases = [
        # WinAnsi: 0x93/0x94 smart quotes, 0xE9 eacute (cp1252)
        ("/Encoding /WinAnsiEncoding", b"(\x93hi\x94 caf\xe9)", "“hi” café"),
        # MacRoman: 0x8E eacute, 0xD2/0xD3 smart quotes
        ("/Encoding /MacRomanEncoding", b"(\xd2hi\xd3 caf\x8e)", "“hi” café"),
        # Standard: 0x27 quoteright, 0xAE fi ligature, 0xD0 emdash
        ("/Encoding /StandardEncoding", b"(it's \xaene \xd0 ok)", "it’s ﬁne — ok"),
    ]
    for enc, raw, want in cases:
        pdf = build_pdf(
            [b"BT /F1 12 Tf " + raw + b" Tj ET"],
            compress=False,
            font_obj=_font(enc),
        )
        text, _ = P._pdf_extract_text(pdf)
        assert text == want, (enc, text)


def test_differences_over_base_encoding_and_unknown_glyphs():
    """Differences override their base table only at the named codes;
    an unknown glyph name drops its code to U+FFFD (garbage stays
    visible), and uniXXXX names resolve through the AGL convention."""
    font = _font(
        "/Encoding << /BaseEncoding /WinAnsiEncoding "
        "/Differences [ 65 /uni0416 66 /glyph99x 200 /oe ] >>"
    )
    pdf = build_pdf(
        [b"BT /F1 12 Tf (\x41\x42 caf\xe9 \xc8) Tj ET"],
        compress=False,
        font_obj=font,
    )
    text, _ = P._pdf_extract_text(pdf)
    assert text == "Ж� café œ"


def test_tounicode_wins_over_encoding_and_no_encoding_keeps_latin1():
    """Priority pin: when BOTH /ToUnicode and /Encoding exist the CMap
    decides; with NEITHER the raw Latin-1 reading is unchanged."""
    # ToUnicode mapping byte 0x41 -> U+0057 'W'; Differences would say bullet
    cmap = (
        b"begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <0057>\nendbfchar\nendcmap"
    )
    # hand-assemble: font 3 references object 90 as ToUnicode stream
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /FB+S "
        b"/Encoding << /Differences [ 65 /bullet ] >> /ToUnicode 90 0 R >>"
    )
    pdf = bytearray(build_pdf([b"BT /F1 12 Tf (\x41) Tj ET"],
                              compress=False, font_obj=font))
    tu_obj = (
        f"90 0 obj\n<< /Length {len(cmap)} >>\nstream\n".encode()
        + cmap + b"\nendstream\nendobj\n"
    )
    at = bytes(pdf).find(b"xref")
    pdf[at:at] = tu_obj  # offsets rebuilt by scanning, xref not trusted
    text, _ = P._pdf_extract_text(bytes(pdf))
    assert text == "W"

    plain = build_pdf([text_stream("(caf\xe9 plain) Tj")], compress=False)
    text2, _ = P._pdf_extract_text(plain)
    assert text2 == "café plain"  # latin-1 fallback byte-identical


def test_glyph_name_conventions():
    from drill_logfile_plugin_spark.operators.pdf_encodings import (
        base_encoding_table,
        glyph_to_unicode,
    )

    assert glyph_to_unicode("eacute") == "é"
    assert glyph_to_unicode("uni0041") == "A"
    assert glyph_to_unicode("uni00480069") == "Hi"  # multi-unit uniXXXX
    assert glyph_to_unicode("u1F600") == "😀"
    assert glyph_to_unicode("a.smallcap") == "a"  # suffix stripping
    assert glyph_to_unicode("g123") is None  # glyph ids fabricate nothing
    assert glyph_to_unicode("cid42") is None
    assert glyph_to_unicode("notarealglyphname") is None
    # WinAnsi: every cp1252-defined code agrees with the codec; the five
    # undefined slots render bullet per Annex D note 5
    tbl = base_encoding_table("WinAnsiEncoding")
    for code in range(0x20, 0x100):
        try:
            assert tbl[code] == bytes([code]).decode("cp1252")
        except UnicodeDecodeError:
            assert tbl[code] == "•"
    assert base_encoding_table("MacExpertEncoding") is None


def test_runlength_filter_roundtrips():
    """RunLengthDecode (spec 7.4.5): in-test encoder emits literal and
    repeat runs; text recovers exactly, truncations reject."""

    def rle_encode(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            run = 1
            while (
                i + run < len(data)
                and data[i + run] == data[i]
                and run < 128
            ):
                run += 1
            if run >= 2:
                out += bytes([257 - run, data[i]])
                i += run
            else:
                j = i + 1
                while (
                    j < len(data)
                    and (j + 1 >= len(data) or data[j + 1] != data[j])
                    and j - i < 128
                ):
                    j += 1
                out += bytes([j - i - 1]) + data[i:j]
                i = j
        out.append(128)  # EOD
        return bytes(out)

    stream = text_stream("(run---length   encoded prose) Tj")
    enc = rle_encode(stream)
    assert enc != stream
    pdf = build_pdf([stream], compress=False)
    # splice: swap the stored stream for the RLE form and declare the filter
    pdf = pdf.replace(
        f"<< /Length {len(stream)} >>".encode(),
        f"<< /Length {len(enc)} /Filter /RunLengthDecode >>".encode(),
    ).replace(b"stream\n" + stream, b"stream\n" + enc)
    text, _ = P._pdf_extract_text(pdf)
    assert text == "run---length   encoded prose"

    # truncated literal run quarantines
    bad = pdf.replace(b"stream\n" + enc, b"stream\n" + enc[: len(enc) // 2])
    bad = bad.replace(
        f"/Length {len(enc)}".encode(),
        f"/Length {len(enc) // 2}".encode(),
    )
    with pytest.raises(ValueError):
        P._pdf_extract_text(bad)


def test_inline_image_binary_never_masquerades_as_text():
    """BI...ID <binary> EI: image bytes containing string-like '(...)'
    sequences must be skipped to the whitespace-delimited EI, including
    EI-lookalike bytes inside the binary; an unterminated image drops
    the tail instead of leaking it."""
    content = (
        b"BT /F1 12 Tf (before) Tj ET\n"
        b"BI /W 4 /H 4 /BPC 8 /CS /G ID \x00\x28garbage\x29\x20Tj\xff EI\n"
        b"BT /F1 12 Tf (after) Tj ET"
    )
    pdf = build_pdf([content], compress=False)
    text, _ = P._pdf_extract_text(pdf)
    assert text == "before\nafter"
    assert "garbage" not in text

    tricky = (
        b"(a) Tj BI /W 2 ID \xffEI\xee binary with EI\x00glued EI\n(b) Tj"
    )
    assert P._content_text(tricky) == "ab"
    # unterminated: the tail is dropped, never leaked
    assert P._content_text(b"(x) Tj BI ID \x28leak me") == "x"
