"""Round-11 regressions for the four r10 ADVICE findings.

1. redact.py — Luhn-verified card replacement is SPAN-anchored: a
   verified card that also occurs as a substring of a longer digit run
   (an order id) must not be mangled inside that run.
2. redact.py — the IPv6 ::-compressed branch must not match a bare
   standalone ``::`` (Haskell type signatures, spaced C++ scope
   operators in code-heavy corpora).
3. sevenzip.py — folders with a declared multi-in/multi-out coder
   (BCJ2 shape) or >1 packed stream quarantine via the NAMED
   'not linear' guard, not incidentally via bounds checks.
4. ccitt.py / pdf.py — K > 0 streams written WITHOUT EOL framing
   (/EndOfLine false, the PDF default) decode: the per-row tag bit is
   read after the now-optional EOL check (the Xpdf/pdf.js reading);
   /EndOfLine true keeps the strict missing-EOL quarantine.
"""

import lzma
import struct

import numpy as np
import pytest

import drill_logfile_plugin_spark.operators.sevenzip as SZ
from drill_logfile_plugin_spark.operators.ccitt import (
    ccitt_decode,
    ccitt_decode_packed,
)
from tests.test_ccitt import _images, _pdf_with_fax, enc_g3
from tests.test_sevenzip import _names_block, wnum

# --- 1. span-anchored card redaction -----------------------------------------

CARD = "4111111111111111"  # Luhn-valid test number


def test_cc_substring_of_longer_digit_run_survives(spark):
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    order_id = "84111111111111111199"  # 20 digits CONTAINING the card
    assert CARD in order_id
    df = spark.createDataFrame(
        [(0, f"card {CARD} order {order_id} end")], "doc_id long, text string"
    )
    got = redact_corpus(df).collect()[0]["text"]
    assert got == f"card <CC> order {order_id} end"


def test_cc_multiple_spans_of_same_card_all_redact(spark):
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    df = spark.createDataFrame(
        [(0, f"{CARD} then again {CARD}.")], "doc_id long, text string"
    )
    got = redact_corpus(df).collect()[0]["text"]
    assert got == "<CC> then again <CC>."


def test_cc_separated_form_still_redacts(spark):
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    spaced = "4111 1111 1111 1111"
    df = spark.createDataFrame(
        [(0, f"pay {spaced} now")], "doc_id long, text string"
    )
    got = redact_corpus(df).collect()[0]["text"]
    assert got == "pay <CC> now"


# --- 2. bare :: must not match as IPv6 ----------------------------------------


def test_bare_double_colon_not_ipv6(spark):
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    rows = [
        (0, "f :: Int -> Int"),
        (1, "map :: (a -> b) -> [a] -> [b]"),
        (2, "ns :: member"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_corpus(df).collect()}
    assert got[0] == "f :: Int -> Int"
    assert got[1] == "map :: (a -> b) -> [a] -> [b]"
    assert got[2] == "ns :: member"


def test_compressed_ipv6_forms_still_redact(spark):
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    rows = [
        (0, "loopback ::1 ok"),
        (1, "link fe80:: up"),
        (2, "addr 2001:db8::8a2e:370:7334 seen"),
        (3, "full 2001:0db8:85a3:0000:0000:8a2e:0370:7334 seen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_corpus(df).collect()}
    assert got[0] == "loopback <IP6> ok"
    assert got[1] == "link <IP6> up"
    assert got[2] == "addr <IP6> seen"
    assert got[3] == "full <IP6> seen"


# --- 3. explicit non-linear 7z folder quarantine -------------------------------

_LZMA2 = b"\x21"
_LZMA2_PROPS = bytes([22])


def _complex_coder(cid: bytes, n_in: int, n_out: int, props: bytes = b"") -> bytes:
    """A coder record with the complex flag (0x10): declared stream counts."""
    flags = len(cid) | 0x10 | (0x20 if props else 0)
    out = bytes([flags]) + cid + wnum(n_in) + wnum(n_out)
    if props:
        out += wnum(len(props)) + props
    return out


def _simple_coder(cid: bytes, props: bytes = b"") -> bytes:
    flags = len(cid) | (0x20 if props else 0)
    out = bytes([flags]) + cid
    if props:
        out += wnum(len(props)) + props
    return out


def _archive(info_body: bytes, packed: bytes, name: str = "a") -> bytes:
    header = wnum(SZ._K_HEADER)
    header += wnum(SZ._K_MAIN_STREAMS) + info_body
    header += wnum(SZ._K_FILES_INFO) + wnum(1) + _names_block([name])
    header += wnum(SZ._K_END) + wnum(SZ._K_END)
    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4
    sig += struct.pack("<QQ", len(packed), len(header))
    sig += b"\x00" * 4
    return bytes(sig) + packed + header


def test_declared_multistream_coder_is_named_not_linear():
    """BCJ2-shaped folder: coder 1 declares 4-in/1-out via the complex
    flag. The quarantine must be the NAMED 'not linear' guard."""
    data = b"z" * 64
    packed = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    bcj2 = b"\x03\x03\x01\x1b"
    # streams: coder0 LZMA2 (in 0 / out 0), coder1 BCJ2 (ins 1-4 / out 1)
    info = wnum(SZ._K_PACK_INFO) + wnum(0) + wnum(1)
    info += wnum(SZ._K_SIZE) + wnum(len(packed)) + wnum(SZ._K_END)
    info += wnum(SZ._K_UNPACK_INFO)
    info += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
    info += wnum(2)
    info += _simple_coder(_LZMA2, _LZMA2_PROPS)
    info += _complex_coder(bcj2, 4, 1)
    info += wnum(1) + wnum(0)  # ONE bind pair: bcj2 in 1 <- lzma2 out 0
    # n_packed = total_in(5) - n_bind(1) = 4 > 1: packed-stream indices
    for idx in range(4):
        info += wnum(idx)
    info += wnum(SZ._K_UNPACK_SIZES) + wnum(64) + wnum(64)
    info += wnum(SZ._K_END) + wnum(SZ._K_END)
    with pytest.raises(ValueError, match="not linear"):
        dict(SZ.sevenzip_members(_archive(info, packed)))


def test_declared_two_output_coder_is_named_not_linear():
    """A 1-in/2-out coder breaks the coder-index == stream-index
    identity even with n_packed == 1 arithmetic intact elsewhere."""
    data = b"q" * 32
    packed = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    info = wnum(SZ._K_PACK_INFO) + wnum(0) + wnum(1)
    info += wnum(SZ._K_SIZE) + wnum(len(packed)) + wnum(SZ._K_END)
    info += wnum(SZ._K_UNPACK_INFO)
    info += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
    info += wnum(2)
    info += _simple_coder(_LZMA2, _LZMA2_PROPS)
    info += _complex_coder(b"\x03", 1, 2, bytes([0]))  # delta, declared 1-in/2-out
    # total_out = 3 -> 2 bind pairs; total_in = 2 -> n_packed = 0
    info += wnum(1) + wnum(0)
    info += wnum(0) + wnum(1)
    info += wnum(SZ._K_UNPACK_SIZES) + wnum(32) + wnum(32) + wnum(32)
    info += wnum(SZ._K_END) + wnum(SZ._K_END)
    with pytest.raises(ValueError, match="not linear"):
        dict(SZ.sevenzip_members(_archive(info, packed)))


def test_linear_chain_still_decodes():
    """The guard must not catch healthy 1-in/1-out chains."""
    from tests.test_sevenzip_chains import X86ISH, build_chain_7z

    packed = lzma.compress(
        X86ISH, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_X86},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    blob = build_chain_7z(
        "prog.bin", packed,
        [(_LZMA2, _LZMA2_PROPS), (b"\x03\x03\x01\x03", b"")],
        [(1, 0)], [len(X86ISH), len(X86ISH)],
    )
    assert dict(SZ.sevenzip_members(blob)) == {"prog.bin": X86ISH}


# --- 4. K > 0 without EOL framing ----------------------------------------------


def _mixed_img():
    return dict(_images())["blobby"]


def test_g3_2d_no_eol_decodes_with_tolerant_flag():
    img = _mixed_img()
    two_d = [i % 2 == 1 for i in range(img.shape[0])]
    data = enc_g3(img, two_d_rows=two_d, eol=False, rtc=False)
    got = ccitt_decode(
        data, img.shape[1], img.shape[0], "g3-2d", require_eol=False
    )
    assert np.array_equal(got, img)


def test_g3_2d_no_eol_strict_still_quarantines():
    img = _mixed_img()
    two_d = [i % 2 == 1 for i in range(img.shape[0])]
    data = enc_g3(img, two_d_rows=two_d, eol=False, rtc=False)
    with pytest.raises(ValueError, match="missing EOL"):
        ccitt_decode(data, img.shape[1], img.shape[0], "g3-2d",
                     require_eol=True)


def test_g3_2d_tolerant_still_consumes_eols_when_present():
    """/EndOfLine false means EOLs are tolerated, not forbidden."""
    img = _mixed_img()
    two_d = [i % 2 == 1 for i in range(img.shape[0])]
    data = enc_g3(img, two_d_rows=two_d, eol=True, rtc=True)
    got = ccitt_decode(
        data, img.shape[1], img.shape[0], "g3-2d", require_eol=False
    )
    assert np.array_equal(got, img)


def test_g3_1d_mode_keeps_mandatory_eol_framing():
    """require_eol applies to g3-2d only; plain g3 stays strict."""
    img = _mixed_img()
    data = enc_g3(img, eol=False, rtc=False)
    with pytest.raises(ValueError, match="missing EOL"):
        ccitt_decode(data, img.shape[1], img.shape[0], "g3",
                     require_eol=False)


def test_pdf_k_positive_no_eol_decodes():
    """PDF default (/EndOfLine absent -> false): a no-EOL K>0 stream
    must decode rather than quarantine."""
    from drill_logfile_plugin_spark.operators.pdf import _Document

    img = _mixed_img()
    doc = _Document(_pdf_with_fax(img, 4, eol=False))
    images = doc.bilevel_images()
    assert len(images) == 1
    assert np.array_equal(images[0][3], img)


def test_pdf_k_positive_declared_eol_true_stays_strict():
    """/EndOfLine true demands T.4 framing: a no-EOL stream quarantines
    (bilevel_images skips undecodable images; zero survivors is the
    quarantine signal per its contract)."""
    from drill_logfile_plugin_spark.operators.pdf import _Document

    img = _mixed_img()
    doc = _Document(_pdf_with_fax(img, 4, eol=False, declare_eol=True))
    assert doc.bilevel_images() == []


def test_pdf_k_positive_eol_framed_still_decodes():
    """The r10 EOL-framed K>0 lane is unchanged by the new default."""
    from drill_logfile_plugin_spark.operators.pdf import _Document

    img = _mixed_img()
    doc = _Document(_pdf_with_fax(img, 4, eol=True))
    images = doc.bilevel_images()
    assert len(images) == 1
    assert np.array_equal(images[0][3], img)


def test_packed_form_threads_require_eol():
    img = _mixed_img()
    two_d = [False] * img.shape[0]
    data = enc_g3(img, two_d_rows=two_d, eol=False, rtc=False)
    packed = ccitt_decode_packed(
        data, img.shape[1], img.shape[0], "g3-2d",
        black_bit=1, require_eol=False,
    )
    expect = np.packbits(img, axis=1).tobytes()
    assert packed == expect
