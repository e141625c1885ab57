"""PDF standard security handler: empty-user-password decryption.

A large share of real-world "encrypted" PDFs are encrypted with an
OWNER password only — the user password is EMPTY, meaning any reader
may open and display them (the encryption exists to gate editing).
Quarantining them wholesale (the prior behavior) drops perfectly
readable documents; this module authenticates the empty user password
and derives the file key so the extractor can read them, while files
with a real (non-empty) password keep the named quarantine.

Implements the published algorithms of PDF 32000-1:2008 §7.6.3 (the
standard security handler):

* **Algorithm 2** — file-key derivation for R2/R3/R4: MD5 over the
  padded password + /O + /P (little-endian signed) + file ID, with the
  R>=3 fifty-round refinement; 40-bit (R2) through 128-bit keys;
* **Algorithms 4/5** — user-password authentication: the expected /U
  value recomputed from the candidate key (RC4 of the pad string for
  R2; MD5(pad + ID) through 20 XOR-keyed RC4 rounds for R>=3, first
  16 bytes compared);
* **Algorithm 7 (owner side)** — an empty OWNER password is also
  tried: RC4-decrypt /O with the owner key to recover the user
  password, then authenticate that;
* **Algorithm 1** — per-object keys: MD5(file key + objnum(3 LE) +
  gen(2 LE) [+ ``sAlT`` for AESV2]); RC4 for V1/V2/V4-V2, AES-128-CBC
  (leading 16-byte IV, PKCS#5 padding) for V4-AESV2;
* **Algorithms 2.A / 2.B** — R6 (AES-256, V5): the iterated
  SHA-256/384/512 hash over AES-128-CBC rounds, validation-salt check,
  file key recovered by AES-256-CBC-decrypting /UE with the
  intermediate key (no per-object salting in V5 — the file key is the
  object key, ISO spec).

The AES primitive is implemented from FIPS-197 with numpy: the S-box
is GENERATED from the spec's GF(2^8) inverse + affine transform (not a
pasted table), and CBC decryption vectorizes across all blocks of a
stream (ECB-decrypt every block in one batched table-lookup pass, then
XOR the shifted ciphertext) — a pure-Python per-byte AES would make
big encrypted streams crawl. RC4 is the classic 20-line KSA/PRGA.

Reference parity note: the reference plugin (LogRecordReader.java)
never parses documents; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import hashlib
import struct

#: §7.6.3.3 padding string (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric): KSA + PRGA per the published cipher."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --- AES (FIPS-197), numpy-vectorized across blocks -------------------------------

_AES_TABLES = {}


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _aes_tables():
    """Generate the S-box from the spec (GF(2^8) inverse + affine
    transform), its inverse, round constants, and the xtime-based
    multiply tables used by (Inv)MixColumns."""
    if _AES_TABLES:
        return _AES_TABLES
    import numpy as np

    # multiplicative inverse via exp/log tables over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(a):
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = [0] * 256
    for a in range(256):
        b = inv(a)
        s = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[a] = s ^ 0x63
    inv_sbox = [0] * 256
    for a, s in enumerate(sbox):
        inv_sbox[s] = a

    _AES_TABLES["sbox"] = np.asarray(sbox, dtype=np.uint8)
    _AES_TABLES["inv_sbox"] = np.asarray(inv_sbox, dtype=np.uint8)
    for m in (2, 3, 9, 11, 13, 14):
        _AES_TABLES[f"mul{m}"] = np.asarray(
            [_gf_mul(a, m) for a in range(256)], dtype=np.uint8
        )
    rcon = [1]
    for _ in range(13):
        rcon.append(_gf_mul(rcon[-1], 2))
    _AES_TABLES["rcon"] = rcon
    _AES_TABLES["np"] = np
    return _AES_TABLES


def _key_schedule(key: bytes) -> list[bytes]:
    """Round keys per FIPS-197 §5.2 (128/192/256-bit)."""
    t = _aes_tables()
    sbox = t["sbox"]
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = list(words[i - 1])
        if i % nk == 0:
            temp = temp[1:] + temp[:1]
            temp = [int(sbox[b]) for b in temp]
            temp[0] ^= t["rcon"][i // nk - 1]
        elif nk == 8 and i % nk == 4:
            temp = [int(sbox[b]) for b in temp]
        words.append([a ^ b for a, b in zip(words[i - nk], temp)])
    return [
        bytes(sum((words[4 * r + c] for c in range(4)), []))
        for r in range(nr + 1)
    ]


#: state columns are bytes 0-3, 4-7, ... (FIPS-197 column-major order);
#: ShiftRows permutation on that flat layout and its inverse
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _ecb_encrypt_blocks(key: bytes, blocks):
    """Forward cipher over an (n, 16) uint8 array, vectorized."""
    t = _aes_tables()
    np = t["np"]
    sbox, m2, m3 = t["sbox"], t["mul2"], t["mul3"]
    rks = _key_schedule(key)
    s = blocks ^ np.frombuffer(rks[0], dtype=np.uint8)
    for rnd in range(1, len(rks)):
        s = sbox[s]
        s = s[:, _SHIFT]
        if rnd != len(rks) - 1:
            a = s.reshape(-1, 4, 4)
            b0, b1, b2, b3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            mixed = np.empty_like(a)
            mixed[:, :, 0] = m2[b0] ^ m3[b1] ^ b2 ^ b3
            mixed[:, :, 1] = b0 ^ m2[b1] ^ m3[b2] ^ b3
            mixed[:, :, 2] = b0 ^ b1 ^ m2[b2] ^ m3[b3]
            mixed[:, :, 3] = m3[b0] ^ b1 ^ b2 ^ m2[b3]
            s = mixed.reshape(-1, 16)
        s = s ^ np.frombuffer(rks[rnd], dtype=np.uint8)
    return s


def _ecb_decrypt_blocks(key: bytes, blocks):
    """Inverse cipher over an (n, 16) uint8 array, vectorized."""
    t = _aes_tables()
    np = t["np"]
    isbox = t["inv_sbox"]
    m9, m11, m13, m14 = t["mul9"], t["mul11"], t["mul13"], t["mul14"]
    rks = _key_schedule(key)
    s = blocks ^ np.frombuffer(rks[-1], dtype=np.uint8)
    for rnd in range(len(rks) - 2, -1, -1):
        s = s[:, _INV_SHIFT]
        s = isbox[s]
        s = s ^ np.frombuffer(rks[rnd], dtype=np.uint8)
        if rnd != 0:
            a = s.reshape(-1, 4, 4)
            b0, b1, b2, b3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            mixed = np.empty_like(a)
            mixed[:, :, 0] = m14[b0] ^ m11[b1] ^ m13[b2] ^ m9[b3]
            mixed[:, :, 1] = m9[b0] ^ m14[b1] ^ m11[b2] ^ m13[b3]
            mixed[:, :, 2] = m13[b0] ^ m9[b1] ^ m14[b2] ^ m11[b3]
            mixed[:, :, 3] = m11[b0] ^ m13[b1] ^ m9[b2] ^ m14[b3]
            s = mixed.reshape(-1, 16)
    return s


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt: every block ECB-decrypts in ONE vectorized pass,
    then XORs the shifted ciphertext (CBC decryption has no serial
    dependency). PKCS#5 padding stripped when ``unpad``."""
    t = _aes_tables()
    np = t["np"]
    if len(data) % 16 or not data:
        raise ValueError("AES-CBC ciphertext length not a block multiple")
    ct = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    plain = _ecb_decrypt_blocks(key, ct)
    prev = np.vstack(
        [np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), ct[:-1]]
    )
    out = (plain ^ prev).tobytes()
    if unpad:
        n = out[-1]
        if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
            raise ValueError("AES-CBC padding invalid")
        out = out[:-n]
    return out


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-ECB decrypt (ECMA-376 standard encryption uses ECB for both
    the verifier and the package) — one vectorized pass."""
    t = _aes_tables()
    np = t["np"]
    if len(data) % 16 or not data:
        raise ValueError("AES-ECB ciphertext length not a block multiple")
    ct = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    return _ecb_decrypt_blocks(key, ct).tobytes()


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    """AES-ECB encrypt (the in-test writers' side of the standard
    encryption contract) — one vectorized pass."""
    t = _aes_tables()
    np = t["np"]
    if len(data) % 16 or not data:
        raise ValueError("AES-ECB plaintext length not a block multiple")
    pt = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    return _ecb_encrypt_blocks(key, pt).tobytes()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt WITHOUT padding (Algorithm 2.B's internal use;
    callers pad themselves). CBC encryption is serial per block, but
    2.B's payloads are one 64-repeat buffer — still cheap."""
    t = _aes_tables()
    np = t["np"]
    if len(data) % 16:
        raise ValueError("AES-CBC plaintext length not a block multiple")
    prev = np.frombuffer(iv, dtype=np.uint8).reshape(1, 16)
    out = []
    for i in range(0, len(data), 16):
        blk = np.frombuffer(data[i : i + 16], dtype=np.uint8).reshape(1, 16)
        prev = _ecb_encrypt_blocks(key, blk ^ prev)
        out.append(prev.tobytes())
    return b"".join(out)


# --- standard security handler ----------------------------------------------------


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def file_key_r234(
    pwd: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key for revisions 2-4."""
    h = hashlib.md5()
    h.update(_pad_password(pwd))
    h.update(o_entry[:32])
    h.update(struct.pack("<I", p & 0xFFFFFFFF))  # /P: signed or unsigned rep
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_bytes]).digest()
    return digest[:key_bytes]


def expected_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R>=3): the /U value a candidate key
    implies. R>=3 returns the 16 significant bytes."""
    if r == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    enc = rc4(key, digest)
    for i in range(1, 20):
        enc = rc4(bytes(b ^ i for b in key), enc)
    return enc


def auth_empty_password_r234(
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """The file key when the EMPTY user password (directly, or recovered
    by the empty OWNER password via Algorithm 7) authenticates; None
    when this file genuinely needs a password."""

    def check(pwd: bytes):
        key = file_key_r234(
            pwd, o_entry, p, id0, r, key_bytes, encrypt_metadata
        )
        want = expected_u(key, id0, r)
        got = u_entry
        if r >= 3:
            want, got = want[:16], got[:16]
        else:
            want, got = want[:32], got[:32]
        return key if want == got else None

    key = check(b"")
    if key is not None:
        return key
    # empty OWNER password: Algorithm 3's RC4 key over the padded owner
    # password decrypts /O back to the (padded) user password
    h = hashlib.md5(_pad_password(b"")).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:key_bytes]).digest()
    okey = h[:key_bytes]
    user_pwd = o_entry[:32]
    if r == 2:
        user_pwd = rc4(okey, user_pwd)
    else:
        for i in range(19, -1, -1):
            user_pwd = rc4(bytes(b ^ i for b in okey), user_pwd)
    # strip the standard pad to recover the bare password
    at = user_pwd.find(PAD[:4])
    bare = user_pwd[:at] if at >= 0 else user_pwd
    return check(bare)


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object key for V<5 encryption."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


# --- R6 (AES-256, V5) ---------------------------------------------------------------


def hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"", r: int = 6) -> bytes:
    """Algorithm 2.B (R6) / plain SHA-256 (R5): the password hash."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e).digest()
            if mod == 0
            else hashlib.sha384(e).digest()
            if mod == 1
            else hashlib.sha512(e).digest()
        )
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def auth_empty_password_r56(
    o_entry: bytes, u_entry: bytes, oe_entry: bytes, ue_entry: bytes, r: int
) -> bytes | None:
    """Algorithm 2.A for the EMPTY password against both the user and
    owner slots; returns the 32-byte file key or None."""
    u48 = u_entry[:48]
    if len(u48) >= 48 and hash_2b(b"", u48[32:40], b"", r) == u48[:32]:
        ikey = hash_2b(b"", u48[40:48], b"", r)
        return aes_cbc_decrypt(ikey, b"\x00" * 16, ue_entry[:32], unpad=False)
    o48 = o_entry[:48]
    if (
        len(o48) >= 48
        and hash_2b(b"", o48[32:40], u48, r) == o48[:32]
    ):
        ikey = hash_2b(b"", o48[40:48], u48, r)
        return aes_cbc_decrypt(ikey, b"\x00" * 16, oe_entry[:32], unpad=False)
    return None
