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


def build_workbook_stream(sheets, sst_strings=(), sst_split=None,
                          split_high=None, encrypted=False) -> bytes:
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
    return wb


def build_xls(sheets, sst_strings=(), sst_split=None, split_high=None,
              encrypted=False) -> bytes:
    return write_cfb(
        {
            "Workbook": build_workbook_stream(
                sheets, sst_strings, sst_split, split_high, encrypted
            )
        }
    )


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
    # a FilePass whose garbage verifier matches no no-secret password
    with pytest.raises(NotImplementedError, match="password-protected"):
        XLS._xls_extract_text(
            build_xls([("S", [cell_number(0, 0, 1.0)])], encrypted=True)
        )
    # XOR obfuscation: named plug-in point
    xor_fp = rec(0x002F, struct.pack("<HHH", 0, 1, 1))
    wb_xor = bof(0x0005) + xor_fp + rec(0x000A, b"")
    with pytest.raises(NotImplementedError, match="XOR"):
        XLS._xls_extract_text(write_cfb({"Workbook": wb_xor}))
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


# --- FilePass RC4 decryption (r9) --------------------------------------------------


def _test_rc4(key: bytes, data: bytes) -> bytes:
    """Independent in-test RC4."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(c ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


def _encrypt_stream_positional(wb: bytes, keyfn) -> bytes:
    """XOR every byte with the 1024-block keystream, then restore the
    never-encrypted ranges — the [MS-XLS] 2.2.10 convention."""
    out = bytearray(wb)
    for b0 in range(0, len(wb), 1024):
        span = min(1024, len(wb) - b0)
        ks = _test_rc4(keyfn(b0 // 1024), bytes(span))
        for i in range(span):
            out[b0 + i] ^= ks[i]
    plaintext_types = {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}
    pos = 0
    while pos + 4 <= len(wb):
        rtype, rlen = struct.unpack_from("<HH", wb, pos)
        out[pos : pos + 4] = wb[pos : pos + 4]
        body = pos + 4
        if rtype in plaintext_types:
            out[body : body + rlen] = wb[body : body + rlen]
        elif rtype == 0x0085 and rlen >= 4:
            out[body : body + 4] = wb[body : body + 4]
        pos = body + rlen
    return bytes(out)


def encrypt_xls_rc4(sheets, sst_strings, password: str,
                    scheme: str = "std", key_bits: int = 128) -> bytes:
    """Assemble a plaintext workbook, splice a spec-shaped FilePass in
    after the globals BOF, and encrypt positionally."""
    import hashlib

    plain = build_workbook_stream(sheets, sst_strings=sst_strings)
    salt = bytes(range(50, 66))
    verifier = bytes(range(150, 166))
    if scheme == "std":
        h = hashlib.md5(password.encode("utf-16-le")).digest()[:5]
        h = hashlib.md5((h + salt) * 16).digest()[:5]

        def keyfn(block):
            return hashlib.md5(h + struct.pack("<I", block)).digest()

        vhash = hashlib.md5(verifier).digest()
        enc = _test_rc4(keyfn(0), verifier + vhash)
        fp = rec(
            0x002F,
            struct.pack("<HHH", 1, 1, 1) + salt + enc[:16] + enc[16:32],
        )
    else:  # CryptoAPI
        hbase = hashlib.sha1(salt + password.encode("utf-16-le")).digest()

        def keyfn(block):
            k = hashlib.sha1(
                hbase + struct.pack("<I", block)
            ).digest()[: key_bits // 8]
            return k + b"\x00" * 11 if key_bits == 40 else k

        vhash = hashlib.sha1(verifier).digest()  # 20 bytes
        enc = _test_rc4(keyfn(0), verifier + vhash)
        header = struct.pack(
            "<IIIIIIII", 0x04, 0, 0x6801, 0x8004, key_bits, 0x18, 0, 0
        ) + "Microsoft Base Cryptographic Provider v1.0\x00".encode(
            "utf-16-le"
        )
        ver = (
            struct.pack("<I", 16) + salt + enc[:16]
            + struct.pack("<I", 20) + enc[16:36]
        )
        fp = rec(
            0x002F,
            struct.pack("<HHH", 1, 4, 2)
            + struct.pack("<II", 0x24, len(header))
            + header
            + ver,
        )
    # splice FilePass right after the globals BOF record
    _t, blen = struct.unpack_from("<HH", plain, 0)
    at = 4 + blen
    full = plain[:at] + fp + plain[at:]
    return write_cfb({"Workbook": _encrypt_stream_positional(full, keyfn)})


SHEETS = lambda: [  # noqa: E731
    ("Enc", [
        cell_labelsst(0, 0, 0),
        cell_number(1, 0, 1234.5),
        cell_rk(2, 0, rk_pack(77, as_int=True, mul100=False)),
    ])
]
WANT = "## Enc\nthe secret cell text\n1234.5\n77"


@pytest.mark.parametrize("password", ["", "VelvetSweatshop"])
@pytest.mark.parametrize(
    "scheme,key_bits", [("std", 128), ("capi", 40), ("capi", 128)]
)
def test_rc4_encrypted_xls_decodes(password, scheme, key_bits):
    enc = encrypt_xls_rc4(
        SHEETS(), ["the secret cell text"], password,
        scheme=scheme, key_bits=key_bits,
    )
    text, n = XLS._xls_extract_text(enc)
    assert text == WANT and n == 3


def test_rc4_encrypted_xls_real_password_quarantines():
    for scheme in ("std", "capi"):
        enc = encrypt_xls_rc4(
            SHEETS(), ["x"], "realsecret", scheme=scheme
        )
        with pytest.raises(NotImplementedError, match="password-protected"):
            XLS._xls_extract_text(enc)


def test_rc4_encrypted_multiblock_stream_crosses_1024_boundary():
    """A workbook whose SST spans several 1024-byte keystream blocks:
    per-block rekeying must line up positionally."""
    big_strings = [f"row {i} " + "x" * 120 for i in range(40)]
    sheets = [("Big", [cell_labelsst(i, 0, i) for i in range(40)])]
    enc = encrypt_xls_rc4(sheets, big_strings, "VelvetSweatshop")
    text, n = XLS._xls_extract_text(enc)
    assert n == 40
    assert text.split("\n")[1] == big_strings[0]
    assert text.split("\n")[-1] == big_strings[-1]


def test_rc4_encrypted_xls_through_router(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )

    rows = [
        (0, bytearray(encrypt_xls_rc4(SHEETS(), ["the secret cell text"],
                                      "VelvetSweatshop", scheme="capi"))),
        (1, bytearray(encrypt_xls_rc4(SHEETS(), ["x"], "nope"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "xls" and got[0]["text"] == WANT
    assert got[1]["text"] is None


def test_biff5_version_guard():
    """Pre-BIFF8 workbooks (Excel 5/95) use a different string grammar;
    decoding them as BIFF8 would emit wrong text silently — they
    quarantine by the BOF version instead."""
    wb = rec(0x0809, struct.pack("<HH", 0x0500, 0x0005) + b"\x00" * 12)
    wb += rec(0x000A, b"")
    with pytest.raises(NotImplementedError, match="BIFF"):
        XLS._xls_extract_text(write_cfb({"Book": wb}))
