"""Binary .xls (BIFF8) and .ppt extraction: independent in-test writers
assemble Workbook streams (records, SST with Continue splits that
SWITCH character width mid-string, RK/MulRk packings, cached formula
results) and PowerPoint Document record trees from the published
[MS-XLS]/[MS-PPT] layouts, then pin exact extraction, the rejection
matrices, and the router integration."""

from __future__ import annotations

import struct

import pytest

from drill_logfile_plugin_spark.operators import ppt as PPT
from drill_logfile_plugin_spark.operators import xls as XLS

from tests.test_ole2 import write_cfb


# --- independent BIFF writer -------------------------------------------------------


def rec(rtype: int, data: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(data)) + data


def xlstr(s: str, rich_ext: bool = False, high: bool | None = None) -> bytes:
    if high is None:
        high = any(ord(c) > 255 for c in s)
    grbit = 0x01 if high else 0x00
    head = struct.pack("<HB", len(s), grbit)
    return head + s.encode("utf-16-le" if high else "latin-1")


def bof(dt: int) -> bytes:
    return rec(0x0809, struct.pack("<HH", 0x0600, dt) + b"\x00" * 12)


def boundsheet(name: str) -> bytes:
    return rec(
        0x0085,
        struct.pack("<IHBB", 0, 0, len(name), 0)
        + name.encode("latin-1"),
    )


def sst_records(strings, split_at=None, split_high=None):
    """The SST record (+ one Continue) for ``strings``; when
    ``split_at=(str_idx, char_idx)``, that string's character array
    splits at the boundary and the continuation restates fHighByte
    (``split_high`` forces the continuation's width)."""
    head = struct.pack("<II", len(strings), len(strings))
    if split_at is None:
        body = b"".join(
            xlstr(s) for s in strings
        )
        return [rec(0x00FC, head + body)]
    si, ci = split_at
    first = b"".join(xlstr(s) for s in strings[:si])
    s = strings[si]
    pre, post = s[:ci], s[ci:]
    pre_high = any(ord(c) > 255 for c in pre)
    cont_high = (
        any(ord(c) > 255 for c in post) if split_high is None else split_high
    )
    first += struct.pack("<HB", len(s), 0x01 if pre_high else 0x00)
    first += pre.encode("utf-16-le" if pre_high else "latin-1")
    cont = bytes([0x01 if cont_high else 0x00])
    cont += post.encode("utf-16-le" if cont_high else "latin-1")
    cont += b"".join(xlstr(x) for x in strings[si + 1 :])
    return [rec(0x00FC, head + first), rec(0x003C, cont)]


def cell_labelsst(row, col, isst):
    return rec(0x00FD, struct.pack("<HHHI", row, col, 0, isst))


def cell_number(row, col, v):
    return rec(0x0203, struct.pack("<HHHd", row, col, 0, v))


def rk_pack(v, as_int: bool, mul100: bool) -> int:
    if as_int:
        iv = int(v * 100) if mul100 else int(v)
        rk = (iv & ((1 << 30) - 1)) << 2 | 0x02
    else:
        x = v * 100 if mul100 else v
        rk = struct.unpack("<Q", struct.pack("<d", x))[0] >> 32 & 0xFFFFFFFC
    return rk | (0x01 if mul100 else 0x00)


def cell_rk(row, col, rk):
    return rec(0x027E, struct.pack("<HHHI", row, col, 0, rk))


def cell_mulrk(row, col_first, rks):
    body = struct.pack("<HH", row, col_first)
    for rk in rks:
        body += struct.pack("<HI", 0, rk)
    body += struct.pack("<H", col_first + len(rks) - 1)
    return rec(0x00BD, body)


def cell_boolerr(row, col, val: bool):
    return rec(0x0205, struct.pack("<HHHBB", row, col, 0, int(val), 0))


def cell_formula_num(row, col, v):
    return rec(
        0x0006,
        struct.pack("<HHHd", row, col, 0, v) + struct.pack("<HI", 0, 0),
    )


def cell_formula_str(row, col, s):
    cached = b"\x00" + b"\x00" * 5 + b"\xff\xff"
    f = rec(
        0x0006,
        struct.pack("<HHH", row, col, 0) + cached + struct.pack("<HI", 0, 0),
    )
    return f + rec(0x0207, xlstr(s))


def build_xls(sheets, sst_strings=(), sst_split=None, split_high=None,
              encrypted=False) -> bytes:
    """sheets: list of (name, [cell record bytes...])."""
    wb = bof(0x0005)
    if encrypted:
        wb += rec(0x002F, struct.pack("<HHH", 1, 1, 1) + b"\x00" * 48)
    for name, _cells in sheets:
        wb += boundsheet(name)
    if sst_strings:
        for r in sst_records(list(sst_strings), sst_split, split_high):
            wb += r
    wb += rec(0x000A, b"")
    for _name, cells in sheets:
        wb += bof(0x0010)
        for c in cells:
            wb += c
        wb += rec(0x000A, b"")
    return write_cfb({"Workbook": wb})


# --- independent PPT writer --------------------------------------------------------


def prec(rtype: int, data: bytes, container: bool = False) -> bytes:
    ver = 0x000F if container else 0x0000
    return struct.pack("<HHI", ver, rtype, len(data)) + data


def build_ppt(slides, cstring=None, crypt=False) -> bytes:
    """slides: list of (text, utf16: bool)."""
    body = b""
    for text, utf16 in slides:
        atom = (
            prec(0x0FA0, text.encode("utf-16-le"))
            if utf16
            else prec(0x0FA8, text.encode("cp1252"))
        )
        body += prec(0x03EE, atom, container=True)  # Slide container
    if cstring is not None:
        body += prec(0x0FBA, cstring.encode("utf-16-le"))
    if crypt:
        body += prec(0x2F14, b"\x00" * 16, container=True)
    doc = prec(0x03E8, body, container=True)  # Document container
    return write_cfb({"PowerPoint Document": doc})


# --- .xls ---------------------------------------------------------------------------


def test_xls_sst_cells_numbers_formulas_exact():
    sst = ["alpha", "naïve row", "second sheet cell"]
    s1 = [
        cell_labelsst(0, 0, 0),
        cell_labelsst(0, 1, 1),
        cell_number(1, 0, 3.5),
        cell_number(1, 1, 42.0),
        cell_rk(2, 0, rk_pack(7, as_int=True, mul100=False)),
        cell_rk(2, 1, rk_pack(-12, as_int=True, mul100=False)),
        cell_rk(2, 2, rk_pack(1.25, as_int=False, mul100=False)),
        cell_rk(2, 3, rk_pack(0.07, as_int=True, mul100=True)),
        cell_mulrk(3, 1, [rk_pack(v, as_int=True, mul100=False)
                          for v in (10, 20, 30)]),
        cell_boolerr(4, 0, True),
        cell_formula_num(5, 0, 99.0),
        cell_formula_str(5, 1, "computed text"),
    ]
    s2 = [cell_labelsst(0, 0, 2)]
    xls = build_xls([("Data", s1), ("Größe", s2)], sst_strings=sst)
    text, n = XLS._xls_extract_text(xls)
    assert text.split("\n") == [
        "## Data",
        "alpha\tnaïve row",
        "3.5\t42",
        "7\t-12\t1.25\t0.07",
        "10\t20\t30",
        "TRUE",
        "99\tcomputed text",
        "## Größe",
        "second sheet cell",
    ]
    assert n == 15


def test_xls_continued_sst_switches_width_mid_string():
    """The BIFF8 detail naive readers get wrong: a string's character
    array split across a Continue record, with the continuation
    restating fHighByte — here switching from compressed latin-1 to
    UTF-16 (the em-dash forces it)."""
    sst = ["plain", "naïve—dash ünïcode", "tail"]
    xls = build_xls(
        [("S", [cell_labelsst(0, c, c) for c in range(3)])],
        sst_strings=sst,
        sst_split=(1, 4),  # split "naïve—dash ünïcode" after "naïv"
    )
    text, _ = XLS._xls_extract_text(xls)
    assert text.split("\n")[1] == "plain\tnaïve—dash ünïcode\ttail"
    # and the same split with the continuation staying compressed
    sst2 = ["plain", "continued latin only", "tail"]
    xls2 = build_xls(
        [("S", [cell_labelsst(0, c, c) for c in range(3)])],
        sst_strings=sst2,
        sst_split=(1, 9),
        split_high=False,
    )
    text2, _ = XLS._xls_extract_text(xls2)
    assert text2.split("\n")[1] == "plain\tcontinued latin only\ttail"


def test_xls_rk_packing_against_reference_values():
    for v, as_int, mul100 in [
        (0, True, False), (123456, True, False), (-1, True, False),
        ((1 << 29) - 1, True, False), (-(1 << 29), True, False),
        (2.5, False, False), (-0.015625, False, False),
        (3.14, True, True), (0.25, False, True),
    ]:
        rk = rk_pack(v, as_int=as_int, mul100=mul100)
        got = XLS._rk_value(rk)
        assert got == pytest.approx(float(v), abs=1e-9), (v, as_int, mul100)


def test_xls_rejections():
    with pytest.raises(NotImplementedError, match="FilePass"):
        XLS._xls_extract_text(
            build_xls([("S", [cell_number(0, 0, 1.0)])], encrypted=True)
        )
    with pytest.raises(ValueError, match="Workbook"):
        XLS._xls_extract_text(write_cfb({"NotAWorkbook": b"\x00" * 64}))
    with pytest.raises(ValueError, match="no extractable cells"):
        XLS._xls_extract_text(build_xls([("Empty", [])]))
    # record length escaping the stream
    wb = bof(0x0005) + struct.pack("<HH", 0x00FC, 9999)
    with pytest.raises(ValueError, match="escapes"):
        XLS._xls_extract_text(write_cfb({"Workbook": wb}))


# --- .ppt ---------------------------------------------------------------------------


def test_ppt_text_atoms_in_document_order():
    ppt = build_ppt(
        [
            ("Title slide\rwith two lines", True),
            ("Legacy bytes atom — cp1252 é", False),
        ],
        cstring="Speaker notes here",
    )
    text, n = PPT._ppt_extract_text(ppt)
    assert text.split("\n") == [
        "Title slide",
        "with two lines",
        "Legacy bytes atom — cp1252 é",
        "Speaker notes here",
    ]
    assert n == 3


def test_ppt_rejections():
    with pytest.raises(NotImplementedError, match="CryptSession"):
        PPT._ppt_extract_text(build_ppt([("x", True)], crypt=True))
    with pytest.raises(NotImplementedError, match="EncryptedSummary"):
        PPT._ppt_extract_text(
            write_cfb(
                {
                    "PowerPoint Document": prec(0x03E8, b"", container=True),
                    "EncryptedSummary": b"\x00" * 64,
                }
            )
        )
    with pytest.raises(ValueError, match="PowerPoint Document"):
        PPT._ppt_extract_text(write_cfb({"Other": b"\x00" * 64}))
    with pytest.raises(ValueError, match="no text atoms"):
        PPT._ppt_extract_text(build_ppt([]))
    with pytest.raises(ValueError, match="escapes"):
        PPT._ppt_extract_text(
            write_cfb(
                {"PowerPoint Document": struct.pack("<HHI", 0, 0x0FA0, 999)}
            )
        )


# --- router + Spark lane ------------------------------------------------------------


def test_ole2_family_through_router(spark):
    from tests.test_ole2 import build_doc

    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    xls = build_xls(
        [("S", [cell_labelsst(0, 0, 0)])], sst_strings=["spreadsheet text"]
    )
    ppt = build_ppt([("deck text", True)])
    doc = build_doc([("word text\r", True)])
    assert sniff_document(xls) == "xls"
    assert sniff_document(ppt) == "ppt"
    assert sniff_document(doc) == "doc"
    rows = [
        (0, bytearray(doc)),
        (1, bytearray(xls)),
        (2, bytearray(ppt)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "doc" and got[0]["text"] == "word text"
    assert got[1]["doc_format"] == "xls"
    assert "spreadsheet text" in got[1]["text"]
    assert got[2]["doc_format"] == "ppt" and got[2]["text"] == "deck text"
