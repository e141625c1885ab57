"""Round-10 regression pins for the round-9 ADVICE findings: every
crafted-input escape from the per-row quarantine contract
(ValueError / NotImplementedError / UnicodeDecodeError) now maps to a
quarantinable error, and the two correctness bugs (7z SubStreamsInfo
digest counting, tex-sniff over-matching) are fixed.

Reference: cgivre/drill-logfile-plugin has no document tier; this is
extension-tier hardening under the same error-contract discipline as
`LogRecordReader.java:283-291`'s mismatch routing.
"""

import struct
import xml.etree.ElementTree as ET

import pytest

import drill_logfile_plugin_spark.operators.documents as DOC
import drill_logfile_plugin_spark.operators.odt as O
import drill_logfile_plugin_spark.operators.offcrypto as OC
import drill_logfile_plugin_spark.operators.ooxml as X
import drill_logfile_plugin_spark.operators.sevenzip as SZ
from drill_logfile_plugin_spark.operators.ole2 import cfb_streams
from drill_logfile_plugin_spark.operators.xls import _decrypt_filepass

from tests.test_offcrypto import INNER, encrypt_agile
from tests.test_sevenzip import (
    _CODERS,
    _folder_record,
    _names_block,
    wnum,
)


# --- advice 1: .xls FilePass CryptoAPI short-record guard --------------------


def test_filepass_cryptoapi_short_record_is_valueerror():
    """A 6-13 byte CryptoAPI FilePass record used to raise struct.error
    (escaping the quarantine catch); it must be ValueError."""
    for n_extra in range(0, 8):  # record lengths 6..13
        data = struct.pack("<HHH", 1, 3, 2) + b"\x00" * n_extra
        with pytest.raises(ValueError, match="truncated"):
            _decrypt_filepass(b"", data)


def test_filepass_cryptoapi_header_size_overrun_is_valueerror():
    # hsize pointing past the record end must not slice silently short
    data = struct.pack("<HHHII", 1, 3, 2, 0, 0xFFFF) + b"\x00" * 8
    with pytest.raises(ValueError, match="truncated"):
        _decrypt_filepass(b"", data)


# --- advice 2: agile blockSize=0 must not ZeroDivisionError ------------------


def _mutated_agile_info(replacements: dict) -> tuple[bytes, bytes]:
    streams = cfb_streams(encrypt_agile(INNER, ""))
    info = streams["EncryptionInfo"]
    xml = info[8:]
    for old, new in replacements.items():
        assert old in xml, f"fixture drift: {old!r} not in agile XML"
        xml = xml.replace(old, new)
    return info[:8] + xml, streams["EncryptedPackage"]


@pytest.mark.parametrize("bad", [b'"0"', b'"4096"', b'"1"'])
def test_agile_bad_keydata_blocksize_is_valueerror(bad):
    info, pkg = _mutated_agile_info(
        {b'<keyData saltSize="16" blockSize="16"':
         b'<keyData saltSize="16" blockSize=' + bad}
    )
    with pytest.raises(ValueError, match="blockSize"):
        OC._decrypt_agile(info, pkg, OC.DEFAULT_PASSWORDS)


def test_agile_bad_keydata_keybits_is_valueerror():
    info, pkg = _mutated_agile_info(
        {b'blockSize="16" keyBits="256" hashSize="64" cipherAlgorithm':
         b'blockSize="16" keyBits="0" hashSize="64" cipherAlgorithm'}
    )
    with pytest.raises(ValueError, match="keyBits"):
        OC._decrypt_agile(info, pkg, OC.DEFAULT_PASSWORDS)


def test_agile_bad_encryptedkey_blocksize_is_valueerror():
    info, pkg = _mutated_agile_info(
        {b'saltSize="16" blockSize="16" keyBits="256" hashSize="64" '
         b"cipherAlgorithm":
         b'saltSize="16" blockSize="0" keyBits="256" hashSize="64" '
         b"cipherAlgorithm"}
    )
    with pytest.raises(ValueError, match="blockSize"):
        OC._decrypt_agile(info, pkg, OC.DEFAULT_PASSWORDS)


# --- advice 3: 7z folder-level CRCs + SubStreamsInfo digests -----------------


def build_7z_with_folder_crcs(members: dict, crc_defined: list) -> bytes:
    """A non-solid archive whose UnPackInfo defines folder CRCs per
    ``crc_defined`` and whose SubStreamsInfo stores digests ONLY for the
    streams without a folder-level CRC — the layout 7zFormat.txt
    specifies and real 7z writes."""
    import zlib

    cid, compress = _CODERS["lzma2"]
    names = list(members)
    bodies = list(members.values())
    packed_list = [compress(b) for b in bodies]
    pack_area = b"".join(p for p, _pr in packed_list)

    out = wnum(SZ._K_PACK_INFO) + wnum(0) + wnum(len(packed_list))
    out += wnum(SZ._K_SIZE)
    for p, _pr in packed_list:
        out += wnum(len(p))
    out += wnum(SZ._K_END)

    out += wnum(SZ._K_UNPACK_INFO)
    out += wnum(SZ._K_FOLDER) + wnum(len(packed_list)) + b"\x00"
    for _p, pr in packed_list:
        out += _folder_record(cid, pr)
    out += wnum(SZ._K_UNPACK_SIZES)
    for b in bodies:
        out += wnum(len(b))
    # folder-level kCRC with a bit vector of defined folders
    out += wnum(SZ._K_CRC)
    if all(crc_defined):
        out += b"\x01"
    else:
        out += b"\x00"
        bits = bytearray((len(crc_defined) + 7) // 8)
        for i, d in enumerate(crc_defined):
            if d:
                bits[i // 8] |= 0x80 >> (i % 8)
        out += bytes(bits)
    for body, d in zip(bodies, crc_defined):
        if d:
            out += struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    out += wnum(SZ._K_END)

    # SubStreamsInfo carrying ONLY kCRC: digests for undefined streams
    out += wnum(SZ._K_SUBSTREAMS)
    out += wnum(SZ._K_CRC) + b"\x01"
    for body, d in zip(bodies, crc_defined):
        if not d:
            out += struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    out += wnum(SZ._K_END)
    out += wnum(SZ._K_END)

    header = wnum(SZ._K_HEADER)
    header += wnum(SZ._K_MAIN_STREAMS) + out
    header += wnum(SZ._K_FILES_INFO) + wnum(len(names))
    header += _names_block(names)
    header += wnum(SZ._K_END) + wnum(SZ._K_END)

    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4
    sig += struct.pack("<QQ", len(pack_area), len(header))
    sig += b"\x00" * 4
    return bytes(sig) + pack_area + header


@pytest.mark.parametrize(
    "crc_defined",
    [[True, False], [False, True], [True, True], [False, False]],
)
def test_7z_folder_crcs_with_substream_digests(crc_defined):
    """An archive with folder CRCs AND SubStreamsInfo digests used to
    over-read (digest count assumed sum(counts)) and fail spuriously;
    it must decode."""
    members = {
        "a.txt": b"alpha contents " * 30,
        "b.txt": b"beta contents " * 25,
    }
    data = build_7z_with_folder_crcs(members, crc_defined)
    got = dict(SZ.sevenzip_members(data))
    assert got == members


# --- advice 4: XML walk depth bounds -----------------------------------------


def test_sharedstrings_deep_nesting_is_valueerror():
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    deep = "<r>" * 300 + f"<t>x</t>" + "</r>" * 300
    si = ET.fromstring(f'<si xmlns="{ns}">{deep}</si>')
    with pytest.raises(ValueError, match="nested too deeply"):
        X._si_text(si)


def test_sharedstrings_reasonable_nesting_still_decodes():
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    si = ET.fromstring(f'<si xmlns="{ns}"><r><t>ok</t></r></si>')
    assert X._si_text(si) == "ok"


def test_odp_deep_nesting_is_valueerror():
    from tests.test_odt import _OFFICE, _odf_package

    body = (
        '<draw:page draw:name="p">'
        + "<draw:g>" * 300
        + "<text:p>deep</text:p>"
        + "</draw:g>" * 300
        + "</draw:page>"
    )
    xml = (
        f'<?xml version="1.0"?><office:document-content {_OFFICE}>'
        f"<office:body><office:presentation>{body}</office:presentation>"
        "</office:body></office:document-content>"
    )
    odp = _odf_package(
        xml, "application/vnd.oasis.opendocument.presentation"
    )
    with pytest.raises(ValueError, match="nested too deeply"):
        O._odp_extract_text(odp)


def test_odt_deep_body_nesting_is_valueerror():
    from tests.test_odt import _OFFICE, _odf_package

    body = (
        "<text:section>" * 300
        + "<text:p>deep</text:p>"
        + "</text:section>" * 300
    )
    xml = (
        f'<?xml version="1.0"?><office:document-content {_OFFICE}>'
        f"<office:body><office:text>{body}</office:text>"
        "</office:body></office:document-content>"
    )
    odt = _odf_package(xml, "application/vnd.oasis.opendocument.text")
    with pytest.raises(ValueError, match="nested too deeply"):
        O._odt_extract_text(odt)


def test_odt_paragraph_deep_span_nesting_is_valueerror():
    from tests.test_odt import _OFFICE, _odf_package

    para = (
        "<text:p>"
        + "<text:span>" * 300
        + "x"
        + "</text:span>" * 300
        + "</text:p>"
    )
    xml = (
        f'<?xml version="1.0"?><office:document-content {_OFFICE}>'
        f"<office:body><office:text>{para}</office:text>"
        "</office:body></office:document-content>"
    )
    odt = _odf_package(xml, "application/vnd.oasis.opendocument.text")
    with pytest.raises(ValueError, match="nested too deeply"):
        O._odt_extract_text(odt)


# --- advice 5: tex sniff anchoring + email precedence ------------------------


def test_email_quoting_latex_stays_email():
    eml = (
        b"From: alice@example.org\r\n"
        b"To: bob@example.org\r\n"
        b"Subject: your preamble\r\n"
        b"\r\n"
        b"Just add \\documentclass{article} at the top and "
        b"\\begin{document} after the preamble.\r\n"
    )
    assert DOC.sniff_document(eml) == "eml"


def test_plain_text_mentioning_latex_midline_stays_txt():
    txt = (
        b"The file must start with \\documentclass{book} or the "
        b"compiler rejects it; \\begin{document} follows.\n"
    )
    assert DOC.sniff_document(txt) == "txt"


def test_real_tex_still_routes_to_tex():
    tex = (
        b"% arXiv source\n"
        b"  \\documentclass[11pt]{article}\n"
        b"\\begin{document}\nBody prose.\n\\end{document}\n"
    )
    assert DOC.sniff_document(tex) == "tex"
    # begin{document} alone, indented, also anchors
    tex2 = b"\t\\begin{document}\nhi\n\\end{document}\n"
    assert DOC.sniff_document(tex2) == "tex"
