"""Encrypted OOXML: in-test writers implement BOTH published schemes'
encryption side (standard's 50000-round SHA-1 spin + 0x36/0x5C
expansion + AES-ECB; agile's XML descriptor + per-purpose block keys +
segmented AES-CBC) from [MS-OFFCRYPTO], sharing only the vector-pinned
AES primitive with the package. Pins: the decrypted bytes equal the
original zip byte-for-byte, the VelvetSweatshop default verifies, real
passwords keep the named quarantine, and the router extracts an
encrypted workbook end to end."""

from __future__ import annotations

import base64
import hashlib
import struct

import pytest

from drill_logfile_plugin_spark.operators import offcrypto as OC
from drill_logfile_plugin_spark.operators.pdf_crypt import (
    aes_cbc_encrypt,
    aes_ecb_encrypt,
)

from tests.test_ole2 import write_cfb
from tests.test_ooxml import build_pptx, build_xlsx


def _pad16(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 16)


# --- standard-scheme writer --------------------------------------------------------


def _std_key(password: str, salt: bytes, key_bytes: int) -> bytes:
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    x1 = hashlib.sha1(
        bytes(b ^ 0x36 for b in h) + b"\x36" * (64 - len(h))
    ).digest()
    x2 = hashlib.sha1(
        bytes(b ^ 0x5C for b in h) + b"\x5C" * (64 - len(h))
    ).digest()
    return (x1 + x2)[:key_bytes]


def encrypt_standard(zip_bytes: bytes, password: str,
                     key_bits: int = 128) -> bytes:
    salt = bytes(range(16))
    key = _std_key(password, salt, key_bits // 8)
    verifier = bytes(range(100, 116))
    enc_verifier = aes_ecb_encrypt(key, verifier)
    vhash = hashlib.sha1(verifier).digest()  # 20 bytes, padded to 32
    enc_vhash = aes_ecb_encrypt(key, _pad16(vhash))
    csp = "Microsoft Enhanced RSA and AES Cryptographic Provider\x00"
    alg = {128: 0x660E, 192: 0x660F, 256: 0x6610}[key_bits]
    header = (
        struct.pack("<IIIIIIII", 0x24, 0, alg, 0x8004, key_bits, 0x18, 0, 0)
        + csp.encode("utf-16-le")
    )
    info = (
        struct.pack("<HHII", 4, 2, 0x24, len(header))
        + header
        + struct.pack("<I", 16) + salt
        + enc_verifier
        + struct.pack("<I", 20) + enc_vhash
    )
    pkg = struct.pack("<Q", len(zip_bytes)) + aes_ecb_encrypt(
        _std_key(password, salt, key_bits // 8), _pad16(zip_bytes)
    )
    return write_cfb({"EncryptionInfo": info, "EncryptedPackage": pkg})


# --- agile-scheme writer -----------------------------------------------------------


def encrypt_agile(zip_bytes: bytes, password: str, spin: int = 1000,
                  hash_name: str = "SHA512") -> bytes:
    hfn = {"SHA1": hashlib.sha1, "SHA256": hashlib.sha256,
           "SHA512": hashlib.sha512}[hash_name]
    kd_salt = bytes(range(16, 32))
    pw_salt = bytes(range(32, 48))
    key_bits = 256
    block = 16

    def pad(b, n):
        return b[:n] if len(b) >= n else b + b"\x36" * (n - len(b))

    h = hfn(pw_salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = hfn(struct.pack("<I", i) + h).digest()

    def derive(bk):
        return pad(hfn(h + bk).digest(), key_bits // 8)

    iv = pad(pw_salt, block)
    verifier = bytes(range(200, 216))
    evhi = aes_cbc_encrypt(derive(OC._BK_VERIFIER_INPUT), iv, verifier)
    vhash = hfn(verifier).digest()
    evhv = aes_cbc_encrypt(
        derive(OC._BK_VERIFIER_VALUE), iv,
        vhash + b"\x00" * (-len(vhash) % block),
    )
    package_key = bytes(range(64, 96))
    ekv = aes_cbc_encrypt(derive(OC._BK_KEY_VALUE), iv, package_key)

    body = bytearray()
    padded = zip_bytes + b"\x00" * (-len(zip_bytes) % block)
    for seg in range((len(padded) + 4095) // 4096):
        chunk = padded[seg * 4096 : (seg + 1) * 4096]
        seg_iv = pad(hfn(kd_salt + struct.pack("<I", seg)).digest(), block)
        body += aes_cbc_encrypt(package_key, seg_iv, chunk)
    pkg = struct.pack("<Q", len(zip_bytes)) + bytes(body)

    b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
    xml = (
        '<encryption xmlns="http://schemas.microsoft.com/office/2006/'
        'encryption" xmlns:p="http://schemas.microsoft.com/office/2006/'
        'keyEncryptor/password">'
        f'<keyData saltSize="16" blockSize="{block}" keyBits="{key_bits}" '
        f'hashSize="64" cipherAlgorithm="AES" cipherChaining="Chaining'
        f'ModeCBC" hashAlgorithm="{hash_name}" saltValue="{b64(kd_salt)}"/>'
        "<keyEncryptors>"
        '<keyEncryptor uri="http://schemas.microsoft.com/office/2006/'
        'keyEncryptor/password">'
        f'<p:encryptedKey spinCount="{spin}" saltSize="16" '
        f'blockSize="{block}" keyBits="{key_bits}" hashSize="64" '
        f'cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" '
        f'hashAlgorithm="{hash_name}" saltValue="{b64(pw_salt)}" '
        f'encryptedVerifierHashInput="{b64(evhi)}" '
        f'encryptedVerifierHashValue="{b64(evhv)}" '
        f'encryptedKeyValue="{b64(ekv)}"/>'
        "</keyEncryptor></keyEncryptors></encryption>"
    )
    info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode()
    return write_cfb({"EncryptionInfo": info, "EncryptedPackage": pkg})


INNER = build_xlsx(
    [("Secrets", '<row><c r="A1" t="inlineStr"><is><t>'
                 "the protected cell text</t></is></c></row>")]
)


@pytest.mark.parametrize("password", ["", "VelvetSweatshop"])
@pytest.mark.parametrize("key_bits", [128, 256])
def test_standard_scheme_roundtrips_bytes(password, key_bits):
    enc = encrypt_standard(INNER, password, key_bits=key_bits)
    assert OC.decrypt_ooxml(enc) == INNER


@pytest.mark.parametrize("password", ["", "VelvetSweatshop"])
@pytest.mark.parametrize("hash_name", ["SHA1", "SHA512"])
def test_agile_scheme_roundtrips_bytes(password, hash_name):
    enc = encrypt_agile(INNER, password, hash_name=hash_name)
    assert OC.decrypt_ooxml(enc) == INNER


def test_agile_multisegment_package():
    big = build_pptx(
        [
            [[
                "slide "
                + " ".join(
                    hashlib.sha256(f"{i}-{k}".encode()).hexdigest()
                    for k in range(40)
                )
            ]]
            for i in range(8)
        ]
    )
    assert len(big) > 4096  # spans multiple 4096-byte segments
    assert OC.decrypt_ooxml(encrypt_agile(big, "")) == big


def test_real_password_keeps_named_quarantine():
    for enc in (
        encrypt_standard(INNER, "hunter2"),
        encrypt_agile(INNER, "hunter2"),
    ):
        with pytest.raises(NotImplementedError, match="password-protected"):
            OC.decrypt_ooxml(enc)


def test_scheme_rejections():
    with pytest.raises(ValueError, match="EncryptionInfo/EncryptedPackage"):
        OC.decrypt_ooxml(write_cfb({"SomethingElse": b"\x00" * 64}))
    enc = bytearray(encrypt_standard(INNER, ""))
    at = bytes(enc).find(struct.pack("<HHI", 4, 2, 0x24))
    assert at > 0
    struct.pack_into("<HH", enc, at, 4, 3)  # extensible version
    with pytest.raises(NotImplementedError, match="extensible"):
        OC.decrypt_ooxml(bytes(enc))
    struct.pack_into("<HH", enc, at, 9, 9)
    with pytest.raises(ValueError, match="unrecognized"):
        OC.decrypt_ooxml(bytes(enc))


def test_encrypted_workbook_through_router(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    enc = encrypt_agile(INNER, "VelvetSweatshop")
    assert sniff_document(enc) == "ooxml_enc"
    rows = [
        (0, bytearray(enc)),
        (1, bytearray(encrypt_standard(INNER, ""))),
        (2, bytearray(encrypt_standard(INNER, "realsecret"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "ooxml_enc"
    assert "the protected cell text" in got[0]["text"]
    assert "the protected cell text" in got[1]["text"]
    assert got[2]["text"] is None  # real password: quarantined, job intact
