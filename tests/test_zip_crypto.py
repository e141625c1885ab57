"""Encrypted zip members (r11): traditional PKWARE ZipCrypto via the
stdlib's native decryption, and WinZip AES (AE-1/AE-2, method 99) from
the published spec — PBKDF2-HMAC-SHA1 key material, AES-CTR with the
little-endian counter-from-1, encrypt-then-MAC HMAC-SHA1 tag.

The in-test AE-2 WRITER lays out the container and derives its key
material with stdlib hashlib/hmac directly from the spec (independent
of the reader's code path); the ZipCrypto writer implements the
PKWARE cipher from its published keystream recurrence — stdlib
zipfile has no encryption support, so the writer cannot lean on it.
"""

import hashlib
import hmac
import io
import struct
import zipfile
import zlib

import pytest

from drill_logfile_plugin_spark.operators.archives import (
    _zip_members,
    archive_members,
)
from drill_logfile_plugin_spark.operators.pdf_crypt import aes_ecb_encrypt

PASSWORD = "zip-secret"
PLAIN = b"the encrypted member body, " * 30


# --- in-test ZipCrypto writer (PKWARE appnote cipher) ---------------------------


def _crc32_update(key: int, ch: int) -> int:
    return (zlib.crc32(bytes([ch]), key ^ 0xFFFFFFFF) ^ 0xFFFFFFFF) & 0xFFFFFFFF


class _ZipCrypto:
    def __init__(self, password: bytes):
        self.k0, self.k1, self.k2 = 0x12345678, 0x23456789, 0x34567890
        for ch in password:
            self._update(ch)

    def _update(self, ch: int) -> None:
        self.k0 = _crc32_update(self.k0, ch)
        self.k1 = (self.k1 + (self.k0 & 0xFF)) & 0xFFFFFFFF
        self.k1 = (self.k1 * 134775813 + 1) & 0xFFFFFFFF
        self.k2 = _crc32_update(self.k2, self.k1 >> 24)

    def _stream_byte(self) -> int:
        t = (self.k2 | 2) & 0xFFFF
        return ((t * (t ^ 1)) >> 8) & 0xFF

    def encrypt(self, data: bytes) -> bytes:
        out = bytearray()
        for ch in data:
            out.append(ch ^ self._stream_byte())
            self._update(ch)
        return bytes(out)


def _local_header(name: bytes, method: int, flags: int, crc: int,
                  csize: int, usize: int, extra: bytes = b"") -> bytes:
    return (
        b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 20, flags, method, 0, 0x21, crc, csize, usize,
            len(name), len(extra),
        ) + name + extra
    )


def _central_and_eocd(entries, cd_offset: int) -> bytes:
    """entries: [(name, method, flags, crc, csize, usize, extra, offset)];
    ``cd_offset`` = where the central directory starts (zipfile uses the
    EOCD's cd-offset to compute the sfx-concat adjustment, so a wrong
    value silently shifts every header_offset)."""
    cd = bytearray()
    for name, method, flags, crc, csize, usize, extra, off in entries:
        cd += b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, flags, method, 0, 0x21, crc,
            csize, usize, len(name), len(extra), 0, 0, 0, 0, off,
        ) + name + extra
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(entries), len(entries), len(cd), cd_offset, 0
    )
    return bytes(cd) + eocd


def build_zipcrypto_zip(name: str, plain: bytes, password: str) -> bytes:
    crc = zlib.crc32(plain) & 0xFFFFFFFF
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflated = comp.compress(plain) + comp.flush()
    zc = _ZipCrypto(password.encode())
    # 12-byte encryption header; last byte = CRC high byte (the check
    # zipfile validates against)
    header = bytes(11) + bytes([crc >> 24])
    enc = zc.encrypt(header) + zc.encrypt(deflated)
    nm = name.encode()
    lh = _local_header(nm, 8, 0x1, crc, len(enc), len(plain))
    body = lh + enc
    cd = _central_and_eocd(
        [(nm, 8, 0x1, crc, len(enc), len(plain), b"", 0)], len(body)
    )
    return body + cd


# --- in-test WinZip AE-2 writer -------------------------------------------------


def build_ae2_zip(name: str, plain: bytes, password: str,
                  strength: int = 3, store: bool = False) -> bytes:
    keylen = {1: 16, 2: 24, 3: 32}[strength]
    salt = bytes(range(7, 7 + keylen // 2))
    material = hashlib.pbkdf2_hmac(
        "sha1", password.encode(), salt, 1000, dklen=2 * keylen + 2
    )
    aes_key, mac_key, verifier = (
        material[:keylen], material[keylen:2 * keylen], material[2 * keylen:]
    )
    if store:
        inner, method = plain, 0
    else:
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        inner, method = comp.compress(plain) + comp.flush(), 8
    n_blocks = (len(inner) + 15) // 16
    stream = aes_ecb_encrypt(
        aes_key,
        b"".join((i + 1).to_bytes(16, "little") for i in range(n_blocks)),
    )[: len(inner)]
    ct = bytes(a ^ b for a, b in zip(inner, stream))
    tag = hmac.new(mac_key, ct, hashlib.sha1).digest()[:10]
    payload = salt + verifier + ct + tag
    extra = b"\x01\x99" + struct.pack("<H", 7) + struct.pack(
        "<H", 2  # AE-2
    ) + b"AE" + bytes([strength]) + struct.pack("<H", method)
    nm = name.encode()
    # AE-2 writes CRC = 0 (integrity lives in the HMAC)
    lh = _local_header(nm, 99, 0x1, 0, len(payload), len(plain), extra)
    body = lh + payload
    cd = _central_and_eocd(
        [(nm, 99, 0x1, 0, len(payload), len(plain), extra, 0)], len(body)
    )
    return body + cd


# --- tests ---------------------------------------------------------------------


def test_zipcrypto_member_decrypts():
    blob = build_zipcrypto_zip("doc.txt", PLAIN, PASSWORD)
    got = dict(_zip_members(blob, password=PASSWORD))
    assert got == {"doc.txt": PLAIN}


def test_zipcrypto_wrong_password_named_failure():
    blob = build_zipcrypto_zip("doc.txt", PLAIN, PASSWORD)
    with pytest.raises(ValueError, match="decrypt failed"):
        dict(_zip_members(blob, password="nope"))


def test_zipcrypto_no_password_quarantines():
    blob = build_zipcrypto_zip("doc.txt", PLAIN, PASSWORD)
    with pytest.raises(NotImplementedError, match="password"):
        dict(_zip_members(blob))


@pytest.mark.parametrize("strength", [1, 2, 3])
def test_winzip_aes_strengths_decrypt(strength):
    blob = build_ae2_zip("a/b.txt", PLAIN, PASSWORD, strength=strength)
    got = dict(_zip_members(blob, password=PASSWORD))
    assert got == {"a/b.txt": PLAIN}


def test_winzip_aes_stored_method():
    blob = build_ae2_zip("raw.bin", PLAIN, PASSWORD, store=True)
    got = dict(_zip_members(blob, password=PASSWORD))
    assert got == {"raw.bin": PLAIN}


def test_winzip_aes_wrong_password_via_verifier():
    blob = build_ae2_zip("doc.txt", PLAIN, PASSWORD)
    with pytest.raises(ValueError, match="wrong password"):
        dict(_zip_members(blob, password="nope"))


def test_winzip_aes_tamper_fails_hmac():
    blob = bytearray(build_ae2_zip("doc.txt", PLAIN, PASSWORD))
    # flip one ciphertext byte: local header (30) + name (7) + the
    # 11-byte 0x9901 extra field + salt (16) + verifier (2) + 4 into ct
    at = blob.index(b"doc.txt") + len(b"doc.txt") + 11 + 16 + 2 + 4
    blob[at] ^= 0x55
    with pytest.raises(ValueError, match="authentication failed"):
        dict(_zip_members(bytes(blob), password=PASSWORD))


def test_winzip_aes_no_password_quarantines():
    blob = build_ae2_zip("doc.txt", PLAIN, PASSWORD)
    with pytest.raises(NotImplementedError, match="password"):
        dict(_zip_members(blob))


def test_plain_zip_unaffected_by_password_arg():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("p.txt", PLAIN)
    got = dict(_zip_members(buf.getvalue(), password="irrelevant"))
    assert got == {"p.txt": PLAIN}


def test_archive_members_threads_zip_password():
    blob = build_ae2_zip("doc.txt", PLAIN, PASSWORD)
    got = dict(archive_members(blob, password=PASSWORD))
    assert got == {"doc.txt": PLAIN}


def test_spark_lane_encrypted_zip(spark):
    from drill_logfile_plugin_spark.operators.archives import explode_archive

    rows = [
        (0, bytearray(build_ae2_zip("a.txt", PLAIN, PASSWORD))),
        (1, bytearray(build_zipcrypto_zip("b.txt", PLAIN, PASSWORD))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in explode_archive(df, password=PASSWORD).collect()
    }
    assert bytes(out[0]["payload"]) == PLAIN
    assert bytes(out[1]["payload"]) == PLAIN
