"""Binary Excel ``.xls`` (BIFF8) text extraction — stdlib only.

The Workbook stream of the OLE2 container ([MS-XLS]) is a sequence of
``(u16 type, u16 length, payload)`` records: a globals substream
(Boundsheet names, the SST shared-string table, FilePass when
encrypted) followed by one substream per sheet (BOF dt=0x0010 ... EOF)
whose cell records reference the SST or carry numbers inline.

Extracted surface — the text a spreadsheet contributes to a training
corpus:

* **SST strings** via ``LabelSst``: the XLUnicodeRichExtendedString
  grammar — per-string ``fHighByte`` (8-bit compressed vs UTF-16LE),
  rich-run and ExtRst payloads skipped by their declared lengths, and
  the BIFF8 **Continue-record rule**: a string's character array may
  split across record boundaries, and each continuation re-states its
  own ``fHighByte`` flag (a string can switch width mid-way — the
  detail naive readers get wrong);
* **numbers**: ``Number`` (IEEE double), ``RK`` and ``MulRk`` (the
  packed 30-bit form: int-or-double flag plus the divide-by-100
  flag), ``BoolErr`` booleans; integral values print without a
  trailing ``.0``;
* **formula results**: the cached value in ``Formula`` — numeric
  directly, string results via the following ``String`` record (same
  continued-string grammar), booleans via the 0xFFFF tag;
* **layout**: one line per row (cells tab-joined in column order),
  sheets prefixed by their Boundsheet name — the pdftotext-style
  linearization.

``FilePass`` workbook encryption decodes under the NO-SECRET profile
(the empty password and Excel's silent ``VelvetSweatshop`` default —
the binary twin of the OOXML lane in :mod:`.offcrypto`): both RC4
schemes are implemented — RC4 standard ([MS-OFFCRYPTO] 2.3.6: MD5
truncated-hash x16 salt mix, per-1024-byte-block MD5 rekey) and RC4
CryptoAPI (2.3.5: SHA-1 chain, 40-bit keys padded with 11 zero bytes
for CryptDeriveKey compatibility). Decryption is positional: the
keystream advances over EVERY stream byte, then record headers, the
never-encrypted records (BOF/FilePass/InterfaceHdr/...), and
BoundSheet8's lbPlyPos are restored as plaintext per [MS-XLS] 2.2.10.
Real passwords and XOR obfuscation keep named quarantines. Record
walks are bounded; declared lengths are validated against the stream.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import struct

_MAX_RECORDS = 1 << 20
_MAX_STRINGS = 1 << 20

_BOF = 0x0809
_EOF = 0x000A
_CONTINUE = 0x003C
_SST = 0x00FC
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F


def _records(stream: bytes):
    """(type, payload) for every BIFF record, bounds-checked."""
    pos = 0
    n = len(stream)
    count = 0
    out = []
    while pos + 4 <= n:
        count += 1
        if count > _MAX_RECORDS:
            raise ValueError(".xls record count exceeds the decoder bound")
        rtype, rlen = struct.unpack_from("<HH", stream, pos)
        pos += 4
        if pos + rlen > n:
            raise ValueError(".xls record length escapes the stream")
        out.append((rtype, stream[pos : pos + rlen]))
        pos += rlen
        if rtype == _EOF and not any(
            t == _BOF for t, _d in out
        ):  # pragma: no cover - defensive
            break
    return out


class _Cursor:
    """A read cursor over a record's payload plus its Continue payloads,
    implementing the BIFF8 continued-string grammar: fixed fields read
    RAW across boundaries; character arrays re-read a fresh option byte
    (fHighByte) at each continuation they straddle."""

    def __init__(self, chunks):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def eof(self) -> bool:
        while self.ci < len(self.chunks) and self.pos >= len(
            self.chunks[self.ci]
        ):
            self.ci += 1
            self.pos = 0
        return self.ci >= len(self.chunks)

    def read_raw(self, n: int) -> bytes:
        out = bytearray()
        while n:
            if self.eof():
                raise ValueError(".xls continued record truncated")
            chunk = self.chunks[self.ci]
            take = min(n, len(chunk) - self.pos)
            out += chunk[self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_u8(self) -> int:
        return self.read_raw(1)[0]

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read_raw(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read_raw(4))[0]

    def read_chars(self, cch: int, high: bool) -> str:
        """The character array: may straddle continuations, each of
        which restates fHighByte for ITS slice."""
        parts = []
        remaining = cch
        while remaining:
            if self.eof():
                raise ValueError(".xls string characters truncated")
            chunk = self.chunks[self.ci]
            avail = len(chunk) - self.pos
            if avail == 0:
                continue  # eof() advanced; loop re-checks
            width = 2 if high else 1
            take = min(remaining, avail // width)
            if take == 0:
                # a UTF-16 char split across records is malformed BIFF
                raise ValueError(".xls UTF-16 char split across records")
            raw = chunk[self.pos : self.pos + take * width]
            self.pos += take * width
            parts.append(
                raw.decode("utf-16-le" if high else "latin-1",
                           errors="replace")
            )
            remaining -= take
            if remaining:
                # continuation boundary: next chunk leads with a fresh
                # option byte
                if self.eof():
                    raise ValueError(".xls string continuation missing")
                high = bool(self.read_u8() & 1)
        return "".join(parts)

    def read_xl_string(self, rich_ext: bool) -> str:
        """XLUnicodeRichExtendedString (rich_ext) or XLUnicodeString."""
        cch = self.read_u16()
        grbit = self.read_u8()
        high = bool(grbit & 0x01)
        c_run = self.read_u16() if rich_ext and (grbit & 0x08) else 0
        cb_ext = self.read_u32() if rich_ext and (grbit & 0x04) else 0
        s = self.read_chars(cch, high)
        if c_run:
            self.read_raw(4 * c_run)
        if cb_ext:
            self.read_raw(cb_ext)
        return s


def _parse_sst(chunks) -> list:
    cur = _Cursor(chunks)
    cur.read_u32()  # cstTotal
    cst_unique = cur.read_u32()
    if cst_unique > _MAX_STRINGS:
        raise ValueError(".xls SST string count exceeds the decoder bound")
    return [cur.read_xl_string(rich_ext=True) for _ in range(cst_unique)]


def _rk_value(rk: int) -> float:
    """The packed 30-bit RK number: bit0 = divide-by-100, bit1 =
    integer-vs-double-high-bits."""
    if rk & 0x02:
        iv = rk >> 2
        if iv & (1 << 29):  # 30-bit two's complement
            iv -= 1 << 30
        v = float(iv)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack(
            "<I", rk & 0xFFFFFFFC
        ))[0]
    return v / 100.0 if rk & 0x01 else v


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


#: records the RC4 stream cipher NEVER encrypts ([MS-XLS] 2.2.10) —
#: their bytes still advance the keystream position
_PLAINTEXT_RECORDS = frozenset(
    [0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138]
)
_RC4_BLOCK = 1024

#: the no-secret profile: the empty password and Excel's silent default
_XLS_PASSWORDS = ("", "VelvetSweatshop")


def _rc4_std_keyfn(password: str, salt: bytes):
    """[MS-OFFCRYPTO] 2.3.6.2 (RC4 standard, MD5): truncated password
    hash + salt repeated 16x, then a per-block MD5 rekey."""
    import hashlib

    h = hashlib.md5(password.encode("utf-16-le")).digest()[:5]
    h = hashlib.md5((h + salt) * 16).digest()[:5]

    def key(block: int) -> bytes:
        return hashlib.md5(h + struct.pack("<I", block)).digest()

    return key


def _rc4_capi_keyfn(password: str, salt: bytes, key_bits: int):
    """[MS-OFFCRYPTO] 2.3.5.2 (RC4 CryptoAPI, SHA-1): per-block SHA-1
    rekey; a 40-bit key pads with 11 zero bytes (CryptDeriveKey
    compatibility)."""
    import hashlib

    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    nbytes = key_bits // 8

    def key(block: int) -> bytes:
        k = hashlib.sha1(h + struct.pack("<I", block)).digest()[:nbytes]
        if key_bits == 40:
            k += b"\x00" * 11
        return k

    return key


def _rc4_try_passwords(
    salt: bytes, enc_verifier: bytes, enc_vhash: bytes, make_keyfn, hash_fn
):
    """The salt/verifier/verifierHash check: the keyfn whose block-0 RC4
    stream decrypts the verifier consistently (hash_fn = MD5 for the
    standard scheme, SHA-1 for CryptoAPI), or None."""
    from .pdf_crypt import rc4

    for pwd in _XLS_PASSWORDS:
        keyfn = make_keyfn(pwd, salt)
        both = rc4(keyfn(0), enc_verifier + enc_vhash)
        if hash_fn(both[:16]).digest() == both[16:]:
            return keyfn
    return None


def _decrypt_workbook_rc4(wb: bytes, keyfn) -> bytes:
    """Positionally XOR the whole stream with the 1024-byte-block RC4
    keystream, then restore the never-encrypted byte ranges (record
    headers, the _PLAINTEXT_RECORDS bodies, BoundSheet8's lbPlyPos) —
    plaintext bytes still consume keystream per the spec."""
    from .pdf_crypt import rc4

    out = bytearray(wb)
    for b0 in range(0, len(wb), _RC4_BLOCK):
        span = min(_RC4_BLOCK, len(wb) - b0)
        ks = rc4(keyfn(b0 // _RC4_BLOCK), bytes(span))
        # whole-block XOR via big-int (no per-byte Python loop)
        out[b0 : b0 + span] = (
            int.from_bytes(out[b0 : b0 + span], "big")
            ^ int.from_bytes(ks, "big")
        ).to_bytes(span, "big")
    pos = 0
    n = len(wb)
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", wb, pos)
        out[pos : pos + 4] = wb[pos : pos + 4]  # headers stay plaintext
        body = pos + 4
        if body + rlen > n:
            raise ValueError(".xls record length escapes the stream")
        if rtype in _PLAINTEXT_RECORDS:
            out[body : body + rlen] = wb[body : body + rlen]
        elif rtype == _BOUNDSHEET and rlen >= 4:
            out[body : body + 4] = wb[body : body + 4]  # lbPlyPos
        pos = body + rlen
    return bytes(out)


def _decrypt_filepass(wb: bytes, data: bytes) -> bytes:
    """A FilePass record's worth of decryption: try the no-secret
    passwords against RC4 standard / RC4 CryptoAPI; XOR obfuscation
    stays a named plug-in point."""
    if len(data) < 2:
        raise ValueError(".xls FilePass record truncated")
    import hashlib

    (enc_type,) = struct.unpack_from("<H", data, 0)
    if enc_type == 0:
        raise NotImplementedError(
            "encrypted .xls (FilePass XOR obfuscation): the legacy XOR "
            "array method is a plug-in point"
        )
    if len(data) < 6:
        raise ValueError(".xls FilePass RC4 header truncated")
    major, minor = struct.unpack_from("<HH", data, 2)
    keyfn = None
    if (major, minor) == (1, 1):  # RC4 standard: salt/verifier/hash
        if len(data) < 6 + 48:
            raise ValueError(".xls FilePass RC4 block truncated")
        keyfn = _rc4_try_passwords(
            data[6:22], data[22:38], data[38:54],
            _rc4_std_keyfn, hashlib.md5,
        )
    elif minor == 2 and major in (2, 3, 4):  # RC4 CryptoAPI
        if len(data) < 14:
            raise ValueError(".xls CryptoAPI FilePass header truncated")
        _flags, hsize = struct.unpack_from("<II", data, 6)
        if hsize > len(data) - 14:
            raise ValueError(".xls CryptoAPI EncryptionHeader truncated")
        header = data[14 : 14 + hsize]
        if len(header) < 24:
            raise ValueError(".xls CryptoAPI EncryptionHeader truncated")
        alg_id, _alg_hash, key_bits = struct.unpack_from("<III", header, 8)
        if alg_id != 0x6801:
            raise NotImplementedError(
                f".xls CryptoAPI AlgID 0x{alg_id:04X} unsupported "
                "(RC4 decodes; AES workbooks are the OOXML lane's shape)"
            )
        key_bits = key_bits or 40
        ver = data[14 + hsize :]
        if len(ver) < 60 or struct.unpack_from("<I", ver, 0)[0] != 16:
            raise ValueError(".xls CryptoAPI verifier truncated")
        # SHA-1 verifier hash: 20 bytes under the stream cipher
        keyfn = _rc4_try_passwords(
            ver[4:20], ver[20:36], ver[40:60],
            lambda pwd, salt: _rc4_capi_keyfn(pwd, salt, key_bits),
            hashlib.sha1,
        )
    else:
        raise NotImplementedError(
            f".xls FilePass version {major}.{minor} unsupported"
        )
    if keyfn is None:
        raise NotImplementedError(
            "encrypted .xls: password-protected (neither the empty "
            "password nor the VelvetSweatshop default verifies)"
        )
    return _decrypt_workbook_rc4(wb, keyfn)


def _xls_extract_text(payload: bytes):
    """``(text, n_cells)`` from a binary Excel workbook."""
    from .ole2 import cfb_streams

    streams = cfb_streams(payload)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("OLE2 file has no Workbook stream")
    recs = _records(wb)
    # BIFF version guard: pre-BIFF8 files (Excel 5/95, the 'Book'
    # stream era) use byte-string Label records without the grbit
    # byte — decoding them with the BIFF8 grammar would emit WRONG
    # text silently, the one failure mode worse than quarantine
    if recs and recs[0][0] == _BOF and len(recs[0][1]) >= 4:
        vers, _dt = struct.unpack_from("<HH", recs[0][1], 0)
        if vers and vers < 0x0600:
            raise NotImplementedError(
                f".xls BIFF version 0x{vers:04X} (Excel 5/95): only "
                "BIFF8 decodes; the pre-BIFF8 string grammar is a "
                "plug-in point"
            )

    # globals pass: encryption, sheet names, SST (with its Continues)
    sheet_names = []
    sst: list = []
    i = 0
    while i < len(recs):
        rtype, data = recs[i]
        if rtype == _FILEPASS:
            # the no-secret profile (empty / VelvetSweatshop) decrypts
            # in place; real passwords keep the named quarantine. The
            # decrypted stream drops FilePass so the pass cannot loop.
            recs = [
                r
                for r in _records(_decrypt_filepass(wb, data))
                if r[0] != _FILEPASS
            ]
            i = 0
            continue
        if rtype == _BOUNDSHEET:
            if len(data) < 8:
                raise ValueError(".xls Boundsheet record truncated")
            cur = _Cursor([data[6:]])
            cch = cur.read_u8()
            high = bool(cur.read_u8() & 1)
            sheet_names.append(cur.read_chars(cch, high))
        elif rtype == _SST:
            chunks = [data]
            j = i + 1
            while j < len(recs) and recs[j][0] == _CONTINUE:
                chunks.append(recs[j][1])
                j += 1
            sst = _parse_sst(chunks)
        elif rtype == _BOF and i > 0:
            break  # first sheet substream begins
        i += 1

    # sheet passes
    sheets: list = []  # (name, {(row, col): text})
    cells = None
    sheet_idx = -1
    pending_formula = None  # (row, col) awaiting a String record
    while i < len(recs):
        rtype, data = recs[i]
        if rtype == _BOF:
            dt = struct.unpack_from("<H", data, 2)[0] if len(data) >= 4 else 0
            sheet_idx += 1
            if dt == 0x0010:
                name = (
                    sheet_names[sheet_idx]
                    if sheet_idx < len(sheet_names)
                    else f"Sheet{sheet_idx + 1}"
                )
                cells = {}
                sheets.append((name, cells))
            else:
                cells = None  # chart/macro substream: ignored
        elif rtype == _EOF:
            cells = None if cells is not None else cells
        elif cells is None:
            pass
        elif rtype == _LABELSST and len(data) >= 10:
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", data, 0)
            if isst < len(sst):
                cells[(row, col)] = sst[isst]
        elif rtype == _LABEL and len(data) >= 9:
            row, col, _ixfe = struct.unpack_from("<HHH", data, 0)
            cur = _Cursor([data[6:]])
            cells[(row, col)] = cur.read_xl_string(rich_ext=False)
        elif rtype == _NUMBER and len(data) >= 14:
            row, col, _ixfe = struct.unpack_from("<HHH", data, 0)
            (v,) = struct.unpack_from("<d", data, 6)
            cells[(row, col)] = _fmt_num(v)
        elif rtype == _RK and len(data) >= 10:
            row, col, _ixfe, rk = struct.unpack_from("<HHHI", data, 0)
            cells[(row, col)] = _fmt_num(_rk_value(rk))
        elif rtype == _MULRK and len(data) >= 12:
            row, col_first = struct.unpack_from("<HH", data, 0)
            n_cells = (len(data) - 6) // 6
            for k in range(n_cells):
                (rk,) = struct.unpack_from("<I", data, 4 + 6 * k + 2)
                cells[(row, col_first + k)] = _fmt_num(_rk_value(rk))
        elif rtype == _BOOLERR and len(data) >= 8:
            row, col, _ixfe, val, is_err = struct.unpack_from(
                "<HHHBB", data, 0
            )
            if not is_err:
                cells[(row, col)] = "TRUE" if val else "FALSE"
        elif rtype == _FORMULA and len(data) >= 14:
            row, col, _ixfe = struct.unpack_from("<HHH", data, 0)
            tag = struct.unpack_from("<H", data, 12)[0]
            if tag != 0xFFFF:
                (v,) = struct.unpack_from("<d", data, 6)
                cells[(row, col)] = _fmt_num(v)
            else:
                kind = data[6]
                if kind == 0:  # string result: the String record follows
                    pending_formula = (row, col)
                elif kind == 1:
                    cells[(row, col)] = "TRUE" if data[8] else "FALSE"
        elif rtype == _STRING and pending_formula is not None:
            chunks = [data]
            j = i + 1
            while j < len(recs) and recs[j][0] == _CONTINUE:
                chunks.append(recs[j][1])
                j += 1
            cur = _Cursor(chunks)
            cells[pending_formula] = cur.read_xl_string(rich_ext=False)
            pending_formula = None
        i += 1

    lines = []
    n_cells = 0
    for name, cells in sheets:
        if not cells:
            continue
        lines.append(f"## {name}")
        n_cells += len(cells)
        by_row: dict = {}
        for (row, col), text in cells.items():
            by_row.setdefault(row, {})[col] = text
        for row in sorted(by_row):
            cols = by_row[row]
            lines.append("\t".join(cols[c] for c in sorted(cols)))
    if not lines:
        raise ValueError(".xls workbook has no extractable cells")
    return "\n".join(lines), n_cells
