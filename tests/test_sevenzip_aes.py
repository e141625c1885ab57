"""7zAES password decryption (r11, verdict item 4).

The in-test ENCRYPTOR below derives the key with its own hashlib loop
and lays out the coder properties straight from the published format
(7zFormat.txt; 7-Zip 7zAes.cpp is the behavioral spec for the
salt/IV-length bit packing) — the independent-writer discipline: the
decoder never certifies itself against its own derivation code. The
AES block primitive itself is the repo's FIPS-197 implementation,
already pinned against the published FIPS test vectors
(tests/test_pdf_crypt.py), the same convention the four Office
encryption schemes use.
"""

import hashlib
import lzma
import struct

import pytest

import drill_logfile_plugin_spark.operators.sevenzip as SZ
from drill_logfile_plugin_spark.operators.pdf_crypt import aes_cbc_encrypt
from tests.test_sevenzip import _names_block, wnum

_LZMA2 = b"\x21"
_LZMA2_PROPS = bytes([22])
_AES = b"\x06\xf1\x07\x01"

SALT = bytes(range(1, 17))
IV = bytes(range(101, 117))
PASSWORD = "corpus-secret"


def _derive_key(password: str, cycles: int, salt: bytes) -> bytes:
    """Independent key derivation, typed from the published algorithm:
    SHA-256 over 2^cycles repetitions of salt || utf16le(password) ||
    counter_le64; cycles 0x3F = the no-hash layout."""
    pwd = password.encode("utf-16-le")
    if cycles == 0x3F:
        return (salt + pwd)[:32].ljust(32, b"\x00")
    h = hashlib.sha256()
    for i in range(1 << cycles):
        h.update(salt)
        h.update(pwd)
        h.update(struct.pack("<Q", i))
    return h.digest()


def _aes_props(cycles: int, salt: bytes, iv: bytes) -> bytes:
    b0 = cycles
    if salt:
        b0 |= 0x80
    if iv:
        b0 |= 0x40
    out = bytes([b0])
    if salt or iv:
        out += bytes([
            ((len(salt) - 1) << 4 if salt else 0)
            | ((len(iv) - 1) if iv else 0)
        ])
    return out + salt + iv


def _encrypt(data: bytes, password: str, cycles: int,
             salt: bytes = SALT, iv: bytes = IV) -> bytes:
    key = _derive_key(password, cycles, salt)
    padded = data + b"\x00" * (-len(data) % 16)
    return aes_cbc_encrypt(key, iv.ljust(16, b"\x00"), padded)


def build_aes7z(
    name: str,
    plain: bytes,
    password: str,
    cycles: int = 6,
    aes_only: bool = False,
    salt: bytes = SALT,
    iv: bytes = IV,
) -> bytes:
    """One-member archive: AES over LZMA2 (the layout 7z -p writes),
    or an AES-only folder when ``aes_only``."""
    if aes_only:
        inner = plain
    else:
        inner = lzma.compress(
            plain, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
        )
    packed = _encrypt(inner, password, cycles, salt, iv)
    props = _aes_props(cycles, salt, iv)

    info = wnum(SZ._K_PACK_INFO) + wnum(0) + wnum(1)
    info += wnum(SZ._K_SIZE) + wnum(len(packed)) + wnum(SZ._K_END)
    info += wnum(SZ._K_UNPACK_INFO)
    info += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
    if aes_only:
        info += wnum(1)
        info += bytes([len(_AES) | 0x20]) + _AES + wnum(len(props)) + props
        info += wnum(SZ._K_UNPACK_SIZES) + wnum(len(plain))
    else:
        # coder0 = LZMA2, coder1 = AES; bind pair: LZMA2 in0 <- AES out1
        info += wnum(2)
        info += bytes([len(_LZMA2) | 0x20]) + _LZMA2
        info += wnum(len(_LZMA2_PROPS)) + _LZMA2_PROPS
        info += bytes([len(_AES) | 0x20]) + _AES + wnum(len(props)) + props
        info += wnum(0) + wnum(1)
        # kCodersUnpackSize in out-index order: LZMA2 out, AES out
        info += wnum(SZ._K_UNPACK_SIZES) + wnum(len(plain)) + wnum(len(inner))
    info += wnum(SZ._K_END) + wnum(SZ._K_END)

    header = wnum(SZ._K_HEADER)
    header += wnum(SZ._K_MAIN_STREAMS) + info
    header += wnum(SZ._K_FILES_INFO) + wnum(1) + _names_block([name])
    header += wnum(SZ._K_END) + wnum(SZ._K_END)

    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4
    sig += struct.pack("<QQ", len(packed), len(header))
    sig += b"\x00" * 4
    return bytes(sig) + packed + header


PLAIN = (b"encrypted corpus text, " * 40) + bytes(range(256))


def test_aes_over_lzma2_roundtrip():
    blob = build_aes7z("doc.txt", PLAIN, PASSWORD)
    got = dict(SZ.sevenzip_members(blob, password=PASSWORD))
    assert got == {"doc.txt": PLAIN}


def test_aes_only_folder_roundtrip():
    blob = build_aes7z("raw.bin", PLAIN, PASSWORD, aes_only=True)
    got = dict(SZ.sevenzip_members(blob, password=PASSWORD))
    assert got == {"raw.bin": PLAIN}


def test_no_password_keeps_named_quarantine():
    blob = build_aes7z("doc.txt", PLAIN, PASSWORD)
    with pytest.raises(NotImplementedError, match="password"):
        dict(SZ.sevenzip_members(blob))


def test_wrong_password_is_named_decrypt_failure():
    blob = build_aes7z("doc.txt", PLAIN, PASSWORD)
    with pytest.raises(ValueError, match="wrong password|decrypt failed"):
        dict(SZ.sevenzip_members(blob, password="nope"))


def test_no_hash_cycles_layout():
    """cycles 0x3F: key = (salt+password) zero-padded, no hashing."""
    blob = build_aes7z("x", b"tiny payload", PASSWORD, cycles=0x3F)
    got = dict(SZ.sevenzip_members(blob, password=PASSWORD))
    assert got == {"x": b"tiny payload"}


def test_derivation_cost_bound():
    """A crafted archive demanding 2^40 rounds is a CPU bomb: the
    decoder rejects the DECLARED cost before deriving anything (the
    blob is built at a sane cost, then its props byte is forged)."""
    blob = bytearray(build_aes7z("x", b"p" * 16, PASSWORD, cycles=6))
    # the AES props start with the cycles byte 6|0xC0 = 0xC6; forge 40
    at = blob.find(bytes([0xC6]) + bytes([((len(SALT) - 1) << 4)
                                          | (len(IV) - 1)]))
    assert at != -1
    blob[at] = 40 | 0xC0
    with pytest.raises(ValueError, match="cycles power"):
        dict(SZ.sevenzip_members(bytes(blob), password=PASSWORD))


def test_saltless_props_layout():
    blob = build_aes7z("x", PLAIN[:64], PASSWORD, salt=b"")
    got = dict(SZ.sevenzip_members(blob, password=PASSWORD))
    assert got == {"x": PLAIN[:64]}


def test_encrypted_header_mode():
    """7-Zip's 'encrypt file names': the header itself sits in an
    AES(+LZMA2) folder behind kEncodedHeader."""
    body = build_aes7z("doc.txt", PLAIN, PASSWORD)
    # split the simple archive: packed area + plain header
    nh_offset, nh_size = struct.unpack_from("<QQ", body, 12)
    pack_area = body[32 : 32 + nh_offset]
    plain_header = body[32 + nh_offset : 32 + nh_offset + nh_size]

    inner = lzma.compress(
        plain_header, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    hpacked = _encrypt(inner, PASSWORD, 6)
    props = _aes_props(6, SALT, IV)
    enc = wnum(SZ._K_ENCODED_HEADER)
    enc += wnum(SZ._K_PACK_INFO) + wnum(len(pack_area)) + wnum(1)
    enc += wnum(SZ._K_SIZE) + wnum(len(hpacked)) + wnum(SZ._K_END)
    enc += wnum(SZ._K_UNPACK_INFO)
    enc += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
    enc += wnum(2)
    enc += bytes([len(_LZMA2) | 0x20]) + _LZMA2
    enc += wnum(len(_LZMA2_PROPS)) + _LZMA2_PROPS
    enc += bytes([len(_AES) | 0x20]) + _AES + wnum(len(props)) + props
    enc += wnum(0) + wnum(1)
    enc += wnum(SZ._K_UNPACK_SIZES) + wnum(len(plain_header)) + wnum(len(inner))
    enc += wnum(SZ._K_END) + wnum(SZ._K_END)

    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4
    sig += struct.pack("<QQ", len(pack_area) + len(hpacked), len(enc))
    sig += b"\x00" * 4
    blob = bytes(sig) + pack_area + hpacked + bytes(enc)

    got = dict(SZ.sevenzip_members(blob, password=PASSWORD))
    assert got == {"doc.txt": PLAIN}
    with pytest.raises(NotImplementedError, match="password"):
        dict(SZ.sevenzip_members(blob))


def test_plain_archives_unaffected_by_password_arg():
    from tests.test_sevenzip import build_7z

    blob = build_7z({"a.txt": b"plain body"})
    assert dict(SZ.sevenzip_members(blob, password="irrelevant")) == {
        "a.txt": b"plain body"
    }


def test_spark_lane_explode_with_password(spark):
    from drill_logfile_plugin_spark.operators.archives import explode_archive

    blob = build_aes7z("inner/doc.txt", PLAIN, PASSWORD)
    df = spark.createDataFrame(
        [(0, bytearray(blob))], "doc_id long, payload binary"
    )
    rows = explode_archive(df, password=PASSWORD).collect()
    assert len(rows) == 1
    assert rows[0]["member_name"] == "inner/doc.txt"
    assert bytes(rows[0]["payload"]) == PLAIN


def test_aes_under_filter_chain():
    """AES over a BCJ+LZMA2 folder: the stripped chain is still a
    multi-coder filter chain and must decode through the fused path."""
    import lzma as _lzma

    x86ish = (
        b"\x55\x48\x89\xe5" + b"\xe8\x12\x34\x00\x00\x90" * 60
        + bytes(range(256)) * 2
    )
    inner = _lzma.compress(
        x86ish, format=_lzma.FORMAT_RAW,
        filters=[{"id": _lzma.FILTER_X86},
                 {"id": _lzma.FILTER_LZMA2, "preset": 6}],
    )
    packed = _encrypt(inner, PASSWORD, 6)
    props = _aes_props(6, SALT, IV)
    x86 = b"\x03\x03\x01\x03"

    # coder0 LZMA2, coder1 BCJ, coder2 AES
    # streams: in/out k for coder k; binds: BCJ.in1 <- LZMA2.out0,
    # LZMA2.in0 <- AES.out2; unbound in = AES.in2 (packed),
    # unbound out = 1 (BCJ) = folder output
    info = wnum(SZ._K_PACK_INFO) + wnum(0) + wnum(1)
    info += wnum(SZ._K_SIZE) + wnum(len(packed)) + wnum(SZ._K_END)
    info += wnum(SZ._K_UNPACK_INFO)
    info += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
    info += wnum(3)
    info += bytes([len(_LZMA2) | 0x20]) + _LZMA2
    info += wnum(len(_LZMA2_PROPS)) + _LZMA2_PROPS
    info += bytes([len(x86)]) + x86
    info += bytes([len(_AES) | 0x20]) + _AES + wnum(len(props)) + props
    info += wnum(1) + wnum(0)  # BCJ.in1 <- LZMA2.out0
    info += wnum(0) + wnum(2)  # LZMA2.in0 <- AES.out2
    # kCodersUnpackSize in out-index order: LZMA2, BCJ, AES
    info += wnum(SZ._K_UNPACK_SIZES)
    info += wnum(len(x86ish)) + wnum(len(x86ish)) + wnum(len(inner))
    info += wnum(SZ._K_END) + wnum(SZ._K_END)

    header = wnum(SZ._K_HEADER)
    header += wnum(SZ._K_MAIN_STREAMS) + info
    header += wnum(SZ._K_FILES_INFO) + wnum(1) + _names_block(["p.bin"])
    header += wnum(SZ._K_END) + wnum(SZ._K_END)
    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4
    sig += struct.pack("<QQ", len(packed), len(header))
    sig += b"\x00" * 4
    blob = bytes(sig) + packed + header

    got = dict(SZ.sevenzip_members(blob, password=PASSWORD))
    assert got == {"p.bin": x86ish}
