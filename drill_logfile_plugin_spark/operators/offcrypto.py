"""Encrypted OOXML ([MS-OFFCRYPTO] / ECMA-376): empty-and-default-
password decryption.

Password-"protected" Office documents are an OLE2 container holding an
``EncryptionInfo`` descriptor and the AES-encrypted OOXML zip in
``EncryptedPackage``. Two real-world profiles decode WITHOUT a secret:
the empty password, and Excel's famous silent default
``VelvetSweatshop`` — workbooks saved with "encrypt contents" but no
password prompt are encrypted under that literal string, and every
spreadsheet reader tries it silently (a documented interoperability
convention, not a secret). Everything else keeps a named quarantine.

Both published schemes are implemented:

* **Standard encryption** (EncryptionInfo version x.2): the 50000-round
  SHA-1 spin over ``LE32(i) + H``, the 0x36/0x5C ipad/opad-style key
  expansion, AES-**ECB** for verifier and package, the package stream's
  leading u64 plaintext length;
* **Agile encryption** (version 4.4): the XML descriptor, per-purpose
  block keys (verifier-input / verifier-value / key-value), the
  spinCount hash chain, key/IV padding with 0x36 to the declared
  sizes, AES-**CBC** with the password salt as IV for the key
  envelope, and the 4096-byte package segments whose per-segment IV is
  ``hash(keyDataSalt + LE32(segment))``; SHA-1/256/384/512 supported.

The decrypted bytes are the ordinary OOXML zip, which routes straight
back through the document sniffer (docx/xlsx/pptx), so an encrypted
workbook costs one extra decrypt pass and then behaves like any other
document.

AES and the hash spin ride :mod:`.pdf_crypt`'s FIPS-197 implementation
(vector-pinned) and stdlib ``hashlib``.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import hashlib
import struct
from xml.etree import ElementTree as ET

#: the passwords the no-secret profile tries, in order
DEFAULT_PASSWORDS = ("", "VelvetSweatshop")

_HASHES = {
    "SHA1": hashlib.sha1,
    "SHA256": hashlib.sha256,
    "SHA384": hashlib.sha384,
    "SHA512": hashlib.sha512,
    "SHA-1": hashlib.sha1,
    "SHA-256": hashlib.sha256,
    "SHA-384": hashlib.sha384,
    "SHA-512": hashlib.sha512,
}

#: agile per-purpose block keys ([MS-OFFCRYPTO] 2.3.4.13)
_BK_VERIFIER_INPUT = bytes(
    [0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79]
)
_BK_VERIFIER_VALUE = bytes(
    [0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E]
)
_BK_KEY_VALUE = bytes([0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6])

_MAX_PACKAGE = 512 << 20
_SEGMENT = 4096


def _pad_trunc(b: bytes, n: int) -> bytes:
    """Keys/IVs pad with 0x36 to the declared size, longer truncate
    ([MS-OFFCRYPTO] 2.3.4.12)."""
    return b[:n] if len(b) >= n else b + b"\x36" * (n - len(b))


# --- standard encryption ------------------------------------------------------------


def _std_key(password: str, salt: bytes, key_bytes: int) -> bytes:
    """2.3.4.7: the 50000-round SHA-1 spin + 0x36/0x5C expansion."""
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    buf1 = bytes(b ^ 0x36 for b in h) + b"\x36" * (64 - len(h))
    x1 = hashlib.sha1(buf1).digest()
    buf2 = bytes(b ^ 0x5C for b in h) + b"\x5C" * (64 - len(h))
    x2 = hashlib.sha1(buf2).digest()
    return (x1 + x2)[:key_bytes]


def _decrypt_standard(info: bytes, pkg: bytes, passwords) -> bytes:
    from .pdf_crypt import aes_ecb_decrypt

    if len(info) < 12:
        raise ValueError("EncryptionInfo (standard) truncated")
    _flags, hsize = struct.unpack_from("<II", info, 4)
    if 12 + hsize + 40 > len(info):
        raise ValueError("EncryptionInfo header escapes the stream")
    header = info[12 : 12 + hsize]
    if len(header) < 24:
        raise ValueError("EncryptionHeader truncated")
    alg_id, _alg_hash, key_bits = struct.unpack_from("<III", header, 8)
    if alg_id not in (0x660E, 0x660F, 0x6610):  # AES-128/192/256
        raise NotImplementedError(
            f"OOXML standard encryption AlgID 0x{alg_id:04X} unsupported "
            "(AES-128/192/256 decode)"
        )
    ver = info[12 + hsize :]
    (salt_size,) = struct.unpack_from("<I", ver, 0)
    if salt_size != 16 or len(ver) < 72:
        raise ValueError("EncryptionVerifier geometry invalid")
    salt = ver[4:20]
    enc_verifier = ver[20:36]
    enc_vhash = ver[40:72]
    for pwd in passwords:
        key = _std_key(pwd, salt, key_bits // 8)
        verifier = aes_ecb_decrypt(key, enc_verifier)
        vhash = aes_ecb_decrypt(key, enc_vhash)
        if hashlib.sha1(verifier).digest() == vhash[:20]:
            break
    else:
        raise NotImplementedError(
            "encrypted OOXML: password-protected (neither the empty "
            "password nor the VelvetSweatshop default verifies)"
        )
    if len(pkg) < 8:
        raise ValueError("EncryptedPackage truncated")
    (size,) = struct.unpack_from("<Q", pkg, 0)
    if size > _MAX_PACKAGE:
        raise ValueError("EncryptedPackage size exceeds the decoder bound")
    body = pkg[8 : 8 + (len(pkg) - 8) // 16 * 16]
    plain = aes_ecb_decrypt(key, body)
    if len(plain) < size:
        raise ValueError("EncryptedPackage shorter than its declared size")
    return plain[:size]


# --- agile encryption ---------------------------------------------------------------

_ENC_NS = "{http://schemas.microsoft.com/office/2006/encryption}"
_PWD_NS = "{http://schemas.microsoft.com/office/2006/keyEncryptor/password}"


def _agile_hash(name: str):
    fn = _HASHES.get(name or "")
    if fn is None:
        raise NotImplementedError(
            f"OOXML agile encryption hash {name!r} unsupported"
        )
    return fn


def _decrypt_agile(info: bytes, pkg: bytes, passwords) -> bytes:
    import base64

    from .pdf_crypt import aes_cbc_decrypt

    try:
        root = ET.fromstring(info[8:])
    except ET.ParseError as exc:
        raise ValueError(f"EncryptionInfo (agile) XML malformed: {exc}")
    kd = root.find(f"{_ENC_NS}keyData")
    if kd is None:
        raise ValueError("agile EncryptionInfo has no keyData")
    kd_salt = base64.b64decode(kd.get("saltValue") or "")
    kd_hash = _agile_hash(kd.get("hashAlgorithm"))
    kd_block = int(kd.get("blockSize") or 16)
    kd_bits = int(kd.get("keyBits") or 256)
    if kd_block != 16:
        raise ValueError(
            f"agile keyData blockSize {kd_block} invalid (AES requires 16)"
        )
    if kd_bits not in (128, 192, 256):
        raise ValueError(f"agile keyData keyBits {kd_bits} invalid for AES")
    if (kd.get("cipherAlgorithm") or "AES") != "AES":
        raise NotImplementedError(
            f"OOXML agile cipher {kd.get('cipherAlgorithm')!r} unsupported"
        )
    pk = None
    for ek in root.iter(f"{_PWD_NS}encryptedKey"):
        salt = base64.b64decode(ek.get("saltValue") or "")
        spin = int(ek.get("spinCount") or 100000)
        if spin > 10_000_000:
            raise ValueError("agile spinCount exceeds the decoder bound")
        ek_hash = _agile_hash(ek.get("hashAlgorithm"))
        ek_block = int(ek.get("blockSize") or 16)
        ek_bits = int(ek.get("keyBits") or 256)
        if ek_block != 16:
            raise ValueError(
                f"agile encryptedKey blockSize {ek_block} invalid "
                "(AES requires 16)"
            )
        if ek_bits not in (128, 192, 256):
            raise ValueError(
                f"agile encryptedKey keyBits {ek_bits} invalid for AES"
            )
        evhi = base64.b64decode(ek.get("encryptedVerifierHashInput") or "")
        evhv = base64.b64decode(ek.get("encryptedVerifierHashValue") or "")
        ekv = base64.b64decode(ek.get("encryptedKeyValue") or "")
        iv = _pad_trunc(salt, ek_block)
        for pwd in passwords:
            h = ek_hash(salt + pwd.encode("utf-16-le")).digest()
            for i in range(spin):
                h = ek_hash(struct.pack("<I", i) + h).digest()

            def derive(block_key: bytes) -> bytes:
                return _pad_trunc(
                    ek_hash(h + block_key).digest(), ek_bits // 8
                )

            vin = aes_cbc_decrypt(
                derive(_BK_VERIFIER_INPUT), iv, evhi, unpad=False
            )
            vval = aes_cbc_decrypt(
                derive(_BK_VERIFIER_VALUE), iv, evhv, unpad=False
            )
            want = ek_hash(vin[: len(evhi)]).digest()
            if vval[: len(want)] == want:
                pk = aes_cbc_decrypt(
                    derive(_BK_KEY_VALUE), iv, ekv, unpad=False
                )[: kd_bits // 8]
                break
        if pk is not None:
            break
    if pk is None:
        raise NotImplementedError(
            "encrypted OOXML: password-protected (neither the empty "
            "password nor the VelvetSweatshop default verifies)"
        )
    if len(pkg) < 8:
        raise ValueError("EncryptedPackage truncated")
    (size,) = struct.unpack_from("<Q", pkg, 0)
    if size > _MAX_PACKAGE:
        raise ValueError("EncryptedPackage size exceeds the decoder bound")
    out = bytearray()
    body = pkg[8:]
    for seg in range((len(body) + _SEGMENT - 1) // _SEGMENT):
        chunk = body[seg * _SEGMENT : (seg + 1) * _SEGMENT]
        chunk = chunk[: len(chunk) // kd_block * kd_block]
        if not chunk:
            break
        iv = _pad_trunc(
            kd_hash(kd_salt + struct.pack("<I", seg)).digest(), kd_block
        )
        out += aes_cbc_decrypt(pk, iv, chunk, unpad=False)
        if len(out) >= size:
            break
    if len(out) < size:
        raise ValueError("EncryptedPackage shorter than its declared size")
    return bytes(out[:size])


def decrypt_ooxml(payload: bytes, passwords=DEFAULT_PASSWORDS) -> bytes:
    """The inner OOXML zip bytes of an encrypted Office container,
    decrypted under the no-secret profile (empty password, then the
    VelvetSweatshop Excel default). NotImplementedError names genuinely
    password-protected files and unsupported schemes; ValueError names
    structural corruption."""
    from .ole2 import cfb_streams

    streams = cfb_streams(payload)
    info = streams.get("EncryptionInfo")
    pkg = streams.get("EncryptedPackage")
    if info is None or pkg is None:
        raise ValueError(
            "OLE2 file has no EncryptionInfo/EncryptedPackage streams"
        )
    if len(info) < 8:
        raise ValueError("EncryptionInfo truncated")
    major, minor = struct.unpack_from("<HH", info, 0)
    if minor == 2 and major in (2, 3, 4):
        return _decrypt_standard(info, pkg, passwords)
    if (major, minor) == (4, 4):
        return _decrypt_agile(info, pkg, passwords)
    if minor == 3:
        raise NotImplementedError(
            "OOXML extensible encryption (version x.3) is a plug-in point"
        )
    raise ValueError(
        f"EncryptionInfo version {major}.{minor} unrecognized"
    )
