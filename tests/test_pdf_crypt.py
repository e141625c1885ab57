"""Encrypted-PDF standard security handler: in-test writers assemble
RC4-40 / RC4-128 / AES-128 (V4) / AES-256 (R6) files with an EMPTY user
password from the published algorithms (PDF 32000 §7.6.3), sharing only
the vector-pinned AES primitive with the package — key derivation, O/U
computation, and RC4 are implemented here independently. Each encrypted
file must extract byte-identically to its plaintext twin; files with a
real password keep the named quarantine."""

from __future__ import annotations

import hashlib
import struct

import pytest

from drill_logfile_plugin_spark.operators import pdf as P
from drill_logfile_plugin_spark.operators import pdf_crypt as C

from tests.test_pdf import text_stream

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Independent in-test RC4 (KSA/PRGA from the published cipher)."""
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


def _padded(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def _compute_o(owner: bytes, user: bytes, r: int, n: int) -> bytes:
    """Algorithm 3."""
    h = hashlib.md5(_padded(owner)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    okey = h[:n]
    o = _rc4(okey, _padded(user))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    return o


def _file_key(user: bytes, o: bytes, p: int, id0: bytes, r: int, n: int) -> bytes:
    """Algorithm 2."""
    h = hashlib.md5()
    h.update(_padded(user))
    h.update(o)
    h.update(struct.pack("<i", p))
    h.update(id0)
    d = h.digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d[:n]).digest()
    return d[:n]


def _compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5."""
    if r == 2:
        return _rc4(key, PAD)
    u = _rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 32-byte slot; only 16 significant


def _obj_key(key: bytes, num: int, aes: bool) -> bytes:
    h = hashlib.md5()
    h.update(key + struct.pack("<I", num)[:3] + b"\x00\x00")
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(key) + 5, 16)]


def _aes_cbc_pad_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    padn = 16 - len(data) % 16
    return iv + C.aes_cbc_encrypt(key, iv, data + bytes([padn]) * padn)


ID0 = bytes(range(16))
P_FLAGS = -44


def _assemble(objs: dict, encrypt_body: bytes, id0: bytes = ID0) -> bytes:
    """Classic-xref assembly with an /Encrypt dict and /ID."""
    nums = sorted(objs)
    enc_num = max(nums) + 1
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offs = {}
    for num in nums + [enc_num]:
        offs[num] = len(out)
        body = encrypt_body if num == enc_num else objs[num]
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {enc_num + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, enc_num + 1):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    idhex = id0.hex().upper()
    out += (
        f"trailer\n<< /Size {enc_num + 1} /Root 1 0 R /Encrypt {enc_num} 0 R "
        f"/ID [ <{idhex}> <{idhex}> ] >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _doc_objects(stored_stream: bytes) -> dict:
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R >>",
        4: f"<< /Length {len(stored_stream)} >>\n".encode()
           + b"stream\n" + stored_stream + b"\nendstream",
    }


def build_encrypted_pdf(variant: str, user_pwd: bytes = b"",
                        body: bytes | None = None) -> bytes:
    """An encrypted one-page PDF; the plaintext twin is the same bytes
    with the stream unencrypted and no /Encrypt."""
    content = body if body is not None else text_stream("(secret prose) Tj")
    owner = b"owner-secret"
    if variant == "rc4_40":
        r, v, n, length = 2, 1, 5, None
    elif variant == "rc4_128":
        r, v, n, length = 3, 2, 16, 128
    elif variant == "aesv2":
        r, v, n, length = 4, 4, 16, 128
    elif variant == "aesv3":
        return _build_aesv3(content, user_pwd)
    else:
        raise AssertionError(variant)
    o = _compute_o(owner, user_pwd, r, n)
    key = _file_key(user_pwd, o, P_FLAGS, ID0, r, n)
    u = _compute_u(key, ID0, r)
    if variant == "aesv2":
        stored = _aes_cbc_pad_encrypt(
            _obj_key(key, 4, aes=True), bytes(range(16, 32)), content
        )
        extra = (
            " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>"
            " /StmF /StdCF /StrF /StdCF"
        )
    else:
        stored = _rc4(_obj_key(key, 4, aes=False), content)
        extra = ""
    length_s = f" /Length {length}" if length else ""

    def _hx(b: bytes) -> str:
        return "<" + b.hex().upper() + ">"

    enc = (
        f"<< /Filter /Standard /V {v} /R {r}{length_s}{extra} "
        f"/O {_hx(o)} /U {_hx(u)} /P {P_FLAGS} >>"
    ).encode()
    return _assemble(_doc_objects(stored), enc)


def _build_aesv3(content: bytes, user_pwd: bytes) -> bytes:
    """R6 (AES-256): Algorithm 2.B hashes computed independently here
    EXCEPT the iterated hash itself (hash_2b), which the package pins
    against its own spec reading — the file-level contract is what this
    writer certifies (U/UE/O/OE layout, zero-IV key unwrap, stream
    format)."""
    file_key = bytes(range(100, 132))
    vs, ks = bytes(range(8)), bytes(range(8, 16))
    u48 = C.hash_2b(user_pwd, vs, b"", 6) + vs + ks
    ue = C.aes_cbc_encrypt(C.hash_2b(user_pwd, ks, b"", 6), b"\x00" * 16, file_key)
    ovs, oks = bytes(range(16, 24)), bytes(range(24, 32))
    o48 = C.hash_2b(b"owner-secret", ovs, u48, 6) + ovs + oks
    oe = C.aes_cbc_encrypt(
        C.hash_2b(b"owner-secret", oks, u48, 6), b"\x00" * 16, file_key
    )
    stored = _aes_cbc_pad_encrypt(file_key, bytes(range(32, 48)), content)

    def _hx(b: bytes) -> str:
        return "<" + b.hex().upper() + ">"

    enc = (
        "<< /Filter /Standard /V 5 /R 6 /Length 256 "
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> "
        f"/StmF /StdCF /StrF /StdCF /O {_hx(o48)} /U {_hx(u48)} "
        f"/OE {_hx(oe)} /UE {_hx(ue)} /P {P_FLAGS} >>"
    ).encode()
    return _assemble(_doc_objects(stored), enc)


# --- primitive vector pins ---------------------------------------------------------


def test_aes_fips197_vectors():
    import numpy as np

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for key_hex, want in [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]:
        key = bytes.fromhex(key_hex)
        blocks = np.frombuffer(pt, dtype=np.uint8).reshape(1, 16)
        ct = C._ecb_encrypt_blocks(key, blocks).tobytes()
        assert ct.hex() == want
        back = C._ecb_decrypt_blocks(
            key, np.frombuffer(ct, dtype=np.uint8).reshape(1, 16)
        ).tobytes()
        assert back == pt


def test_rc4_published_vectors():
    assert C.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert C.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (
        C.rc4(b"Secret", b"Attack at dawn").hex().upper()
        == "45A01F645FC35B383552544B9BF5"
    )


def test_cbc_vectorized_matches_roundtrip():
    import numpy as np

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    iv = bytes(range(16))
    data = bytes(
        np.random.default_rng(3).integers(0, 256, 16 * 257, dtype=np.uint8)
    )
    ct = C.aes_cbc_encrypt(key, iv, data)
    assert C.aes_cbc_decrypt(key, iv, ct, unpad=False) == data
    with pytest.raises(ValueError, match="padding"):
        C.aes_cbc_decrypt(key, iv, b"\x00" * 16)


# --- the file-level contract -------------------------------------------------------


@pytest.mark.parametrize("variant", ["rc4_40", "rc4_128", "aesv2", "aesv3"])
def test_empty_password_file_decodes_identically_to_plaintext_twin(variant):
    content = text_stream(
        "(The quick brown fox) Tj 0 -14 Td (jumps over the dog) Tj"
    )
    enc_pdf = build_encrypted_pdf(variant, body=content)
    text, n = P._pdf_extract_text(enc_pdf)
    from tests.test_pdf import build_pdf

    twin_text, twin_n = P._pdf_extract_text(
        build_pdf([content], compress=False)
    )
    assert (text, n) == (twin_text, twin_n)
    assert "quick brown fox" in text


@pytest.mark.parametrize("variant", ["rc4_40", "rc4_128", "aesv2", "aesv3"])
def test_nonempty_password_keeps_named_quarantine(variant):
    enc_pdf = build_encrypted_pdf(variant, user_pwd=b"hunter2")
    with pytest.raises(NotImplementedError, match="password-protected"):
        P._pdf_extract_text(enc_pdf)


def test_unknown_handler_and_v_quarantine():
    pdf = build_encrypted_pdf("rc4_128")
    with pytest.raises(NotImplementedError, match="security handler"):
        P._pdf_extract_text(
            pdf.replace(b"/Filter /Standard", b"/Filter /MyCustom")
        )
    with pytest.raises(NotImplementedError, match="/V"):
        P._pdf_extract_text(pdf.replace(b"/V 2 /R 3", b"/V 3 /R 3"))


def test_stmf_identity_streams_stay_plain():
    """V4 with /StmF /Identity: authentication still runs, streams stay
    unencrypted — the extractor must NOT decrypt them."""
    content = text_stream("(plain despite encrypt dict) Tj")
    o = _compute_o(b"owner-secret", b"", 4, 16)
    key = _file_key(b"", o, P_FLAGS, ID0, 4, 16)
    u = _compute_u(key, ID0, 4)
    enc = (
        f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
        f"/CF << /StdCF << /CFM /AESV2 >> >> /StmF /Identity "
        f"/StrF /Identity /O <{o.hex().upper()}> /U <{u.hex().upper()}> "
        f"/P {P_FLAGS} >>"
    ).encode()
    pdf = _assemble(_doc_objects(content), enc)
    text, _ = P._pdf_extract_text(pdf)
    assert text == "plain despite encrypt dict"


def test_owner_password_empty_user_nonempty_slot():
    """Files whose USER password is set but OWNER password is empty:
    Algorithm 7 recovers the user password from /O and opens the file."""
    content = text_stream("(opened via owner side) Tj")
    # owner = "" and user = "s3cret": O encrypts the padded USER pwd
    # under the key from the EMPTY owner pwd
    o = _compute_o(b"", b"s3cret", 3, 16)
    key = _file_key(b"s3cret", o, P_FLAGS, ID0, 3, 16)
    u = _compute_u(key, ID0, 3)
    stored = _rc4(_obj_key(key, 4, aes=False), content)
    enc = (
        f"<< /Filter /Standard /V 2 /R 3 /Length 128 "
        f"/O <{o.hex().upper()}> /U <{u.hex().upper()}> /P {P_FLAGS} >>"
    ).encode()
    pdf = _assemble(_doc_objects(stored), enc)
    text, _ = P._pdf_extract_text(pdf)
    assert text == "opened via owner side"


def test_encrypted_pdf_through_spark_document_router(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )

    rows = [
        (0, bytearray(build_encrypted_pdf("aesv2"))),
        (1, bytearray(build_encrypted_pdf("rc4_40", user_pwd=b"nope"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert "secret prose" in got[0]["text"]
    assert got[1]["text"] is None  # password-protected: nulled, job intact
