"""PDF text extraction (simple profile) — stdlib only (zlib + re).

PDF is THE container scanned-document and publication corpora arrive
in; "extract the text layer" is the standard first stage of a
document-LLM pipeline, ahead of every dedup/quality/chunking operator
in this package. This module implements a CORRECTNESS-grade extractor
for the profile a text-bearing, digitally-authored PDF actually uses:

* classic cross-reference TABLES (``xref`` / ``trailer``) including
  incremental-update chains (``/Prev``), AND the PDF 1.5+ layout:
  cross-reference STREAMS (the trailer fields read from the ``/XRef``
  stream dictionary — the packed offset table itself is not needed
  because the object index is rebuilt by scanning) and object streams
  (``/ObjStm`` — compressed object containers decoded lazily, header
  pairs + ``/First`` offsets per the spec, direct objects taking
  precedence so incremental updates still win);
* PNG row predictors on compressed streams (``/DecodeParms
  /Predictor >= 10``, filter types 0-4) — the layout xref/object
  streams ship with in the wild;
* indirect objects, dictionaries, arrays, names, literal and hex
  strings, numeric/boolean/null primitives — a real tokenizer, not
  regex-over-the-whole-file;
* content streams stored raw or compressed with ``/FlateDecode``
  (zlib), ``/LZWDecode`` (the TIFF-variant LZW decoder this package
  already ships), ``/ASCII85Decode``, or ``/ASCIIHexDecode`` —
  including filter CHAINS — all under bounded-inflate guards (the
  decompression-bomb rule from ``multimodal.decompress_payload``);
* the page tree (``/Root -> /Pages -> /Kids``, nested), page order =
  depth-first Kids order per the spec;
* the text operators: ``Tj`` (show string), ``'`` and ``"``
  (next-line show), ``TJ`` (array show with kerning — negative
  adjustments beyond a threshold become spaces, the convention every
  extractor uses), with ``Td/TD/T*/Tm`` line moves emitting newlines;
* literal-string escapes (``\\n \\t \\( \\) \\\\`` and octal) and
  hex strings, decoded as Latin-1 for simple fonts — and through the
  font's ``/ToUnicode`` CMap for subset/CID (Type0) fonts, whose shown
  bytes are GLYPH IDS, not characters: per-page font resources
  (inherited down the page tree per the spec) parse their CMaps
  (codespace width, ``bfchar``, both ``bfrange`` forms, UTF-16BE
  destinations), the ``Tf`` operator tracks the active font, and
  unmapped codes emit U+FFFD so garbage stays countable instead of
  silently vanishing.

Encrypted files using the STANDARD security handler with an empty
user or owner password (the owner-password-only profile a large share
of real "encrypted" PDFs actually use) decode transparently — RC4-40
through AES-256, see ``pdf_crypt`` (r9). CCITT fax image streams
decode through ``/CCITTFaxDecode`` (r10, operators/ccitt.py) with
``bilevel_images()`` surfacing the rasters. Type0 fonts without
ToUnicode read Identity-H/V codes as direct CIDs, the predefined
UCS-2 CMap families (UniGB/CNS/JIS/KS-UCS2[-HW]-H/V) read their codes
as the UCS-2 values they are defined to be (r11), and the legacy-byte
predefined CMaps whose codespace IS a stdlib charset (90ms-RKSJ →
cp932, KSCms-UHC → cp949, GBK-EUC → gbk, ETen-B5 → cp950, EUC →
euc_jp, the Uni*-UTF8/UTF32 families, ...) decode table-free through
that codec (r11, ``_LEGACY_CMAP_CODECS``); other predefined
CMaps are a COUNTED absence (``pdf_unmapped_glyph_counts``) rather
than Latin-1 mojibake (r10). Genuinely absent capabilities raise
NotImplementedError at the documented plug-in points:
password-protected files, non-Standard security handlers, TIFF
predictor 2, and the remaining image-class filters (DCT passthrough
only / JBIG2). Malformed structures raise ValueError. All
header-derived sizes are bounded before allocation — a PDF is
untrusted input.

The Spark lane (``extract_pdf_text``) is Arrow-batched mapInPandas with
the multimodal tier's per-row quarantine contract, emitting
``(doc_id, text, n_pages, n_chars)`` — the exact shape the text tier
(clean_corpus, dedup, chunking) consumes, so "PDF corpus in, packed
training chunks out" composes end to end.

No reference counterpart (the reference plugin is text-only log scan);
LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import re
import zlib

#: decompressed-stream bound per content stream (the bomb rule)
_PDF_MAX_STREAM = 64 << 20
#: object / page count bounds — a trailer must not drive unbounded loops
_PDF_MAX_OBJECTS = 1 << 20
_PDF_MAX_PAGES = 1 << 16
#: TJ kerning threshold (thousandths of an em): adjustments wider than
#: this render as a word gap — the de-facto extractor convention
_TJ_SPACE_THRESHOLD = -180


class _Lexer:
    """Minimal PDF object lexer over a bytes buffer."""

    _WS = b"\x00\t\n\x0c\r "
    _DELIM = b"()<>[]{}/%"

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in self._WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                nl = buf.find(b"\n", self.pos)
                self.pos = n if nl == -1 else nl + 1
            else:
                return

    def read_object(self):
        """Parse one object at the cursor; returns a Python value
        (dict / list / bytes for strings / str for names / int / float /
        bool / None / ('ref', num) for indirect references)."""
        self._skip_ws()
        buf = self.buf
        if self.pos >= len(buf):
            raise ValueError("PDF object expected at end of buffer")
        c = buf[self.pos]
        if buf.startswith(b"<<", self.pos):
            return self._read_dict()
        if c == 0x3C:  # '<' hex string
            return self._read_hex_string()
        if c == 0x28:  # '(' literal string
            return self._read_literal_string()
        if c == 0x2F:  # '/' name
            return self._read_name()
        if c == 0x5B:  # '['
            return self._read_array()
        if buf.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if buf.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if buf.startswith(b"null", self.pos):
            self.pos += 4
            return None
        return self._read_number_or_ref()

    def _read_name(self) -> str:
        buf = self.buf
        self.pos += 1
        out = bytearray()
        while self.pos < len(buf):
            c = buf[self.pos]
            if c in self._WS or c in self._DELIM:
                break
            if c == 0x23 and self.pos + 2 < len(buf):  # '#xx' escape
                out.append(int(buf[self.pos + 1 : self.pos + 3], 16))
                self.pos += 3
            else:
                out.append(c)
                self.pos += 1
        return out.decode("latin-1")

    def _read_dict(self) -> dict:
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.buf.startswith(b">>", self.pos):
                self.pos += 2
                return out
            if self.pos >= len(self.buf):
                raise ValueError("PDF dictionary unterminated")
            key = self._read_name() if self.buf[self.pos] == 0x2F else None
            if key is None:
                raise ValueError("PDF dictionary key must be a name")
            out[key] = self.read_object()

    def _read_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.buf):
                raise ValueError("PDF array unterminated")
            if self.buf[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.read_object())

    def _read_literal_string(self) -> bytes:
        buf = self.buf
        self.pos += 1
        out = bytearray()
        depth = 1
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
        while self.pos < len(buf):
            c = buf[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= len(buf):
                    break
                e = buf[self.pos]
                self.pos += 1
                if e in esc:
                    out.append(esc[e])
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    val = e - 0x30
                    for _ in range(2):
                        if (
                            self.pos < len(buf)
                            and 0x30 <= buf[self.pos] <= 0x37
                        ):
                            val = val * 8 + (buf[self.pos] - 0x30)
                            self.pos += 1
                    out.append(val & 0xFF)
                elif e == 0x0A:
                    pass  # line continuation
                else:
                    out.append(e)  # \( \) \\ and unknown escapes
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise ValueError("PDF literal string unterminated")

    def _read_hex_string(self) -> bytes:
        end = self.buf.find(b">", self.pos)
        if end == -1:
            raise ValueError("PDF hex string unterminated")
        hexchars = re.sub(rb"\s", b"", self.buf[self.pos + 1 : end])
        self.pos = end + 1
        if len(hexchars) % 2:
            hexchars += b"0"  # odd count: final 0 implied, per spec
        try:
            return bytes.fromhex(hexchars.decode("ascii"))
        except ValueError:
            raise ValueError("PDF hex string has non-hex characters")

    def _read_number_or_ref(self):
        buf = self.buf
        m = re.match(rb"[+-]?\d*\.?\d+", buf[self.pos : self.pos + 64])
        if not m:
            raise ValueError(
                f"PDF object syntax at offset {self.pos}: "
                f"{buf[self.pos:self.pos + 16]!r}"
            )
        tok = m.group(0)
        end = self.pos + len(tok)
        if b"." not in tok:
            # look ahead for "gen R" — an indirect reference
            m2 = re.match(rb"\s+(\d+)\s+R(?![A-Za-z])", buf[end : end + 32])
            if m2:
                self.pos = end + m2.end()
                return ("ref", int(tok))
            self.pos = end
            return int(tok)
        self.pos = end
        return float(tok)


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Undo PNG row predictors (PDF /Predictor >= 10): each row is one
    filter-type byte + ceil(columns*colors*bpc/8) data bytes, unfiltered
    per the PNG spec (types 0-4) against the previous reconstructed
    row."""
    rowlen = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc) // 8)
    if rowlen <= 0 or len(data) % (rowlen + 1):
        raise ValueError("PDF predictor stream length inconsistent with Columns")
    out = bytearray()
    prev = bytearray(rowlen)
    for rstart in range(0, len(data), rowlen + 1):
        ftype = data[rstart]
        row = bytearray(data[rstart + 1 : rstart + 1 + rowlen])
        if ftype == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PDF predictor row filter {ftype} invalid")
        out += row
        prev = row
    return bytes(out)


def _find_trailers(payload: bytes):
    """All trailer dictionaries, newest first (incremental updates put
    the operative trailer last in the file)."""
    out = []
    for m in re.finditer(rb"trailer", payload):
        lex = _Lexer(payload, m.end())
        try:
            obj = lex.read_object()
        except ValueError:
            continue
        if isinstance(obj, dict):
            out.append(obj)
    return list(reversed(out))


def _index_objects(payload: bytes) -> dict:
    """Map object number -> byte offset of its body. Offsets come from
    scanning for ``N G obj`` markers rather than trusting the xref
    table's byte offsets — real-world files disagree with their tables
    often enough that every robust extractor rebuilds this index; the
    xref/trailer still gates which document root to use.

    Markers that fall INSIDE a stream's binary extent are skipped (r9
    ADVICE fix): an unfiltered content stream containing the bytes
    ``5 0 obj`` used to create a phantom offset that shadowed the real
    object 5 under latest-offset-wins, silently corrupting extraction.
    The scan therefore tracks each stream object's extent — body start
    from the ``stream`` keyword, end from a direct ``/Length`` when it
    checks out against ``endstream``, else the next ``endstream``
    marker — and ignores markers inside it."""
    objs = {}
    skip_until = 0
    n = len(payload)
    for m in re.finditer(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b", payload):
        if m.start() < skip_until:
            continue  # phantom marker inside a stream body
        if len(objs) > _PDF_MAX_OBJECTS:
            raise ValueError("PDF object count exceeds the decoder bound")
        objs[int(m.group(1))] = m.end()
        # does this object carry a stream? lex its leading value and
        # look for the stream keyword; on any lexing trouble fall back
        # to indexing alone (the old behavior)
        try:
            lex = _Lexer(payload, m.end())
            val = lex.read_object()
            lex._skip_ws()
        except (ValueError, NotImplementedError):
            continue
        if not isinstance(val, dict) or not payload.startswith(b"stream", lex.pos):
            continue
        p = lex.pos + 6
        if payload.startswith(b"\r\n", p):
            p += 2
        elif payload.startswith(b"\n", p) or payload.startswith(b"\r", p):
            p += 1
        end = None
        length = val.get("Length")
        if isinstance(length, int) and 0 <= length <= n - p:
            # trust a direct /Length only when endstream sits where it says
            tail = payload[p + length : p + length + 20]
            if tail.lstrip(b"\r\n \t").startswith(b"endstream"):
                end = p + length
        if end is None:
            # indirect or lying /Length: next endstream marker bounds it
            at = payload.find(b"endstream", p)
            end = at if at >= 0 else p
        skip_until = end
    return objs


def _object_dicts_of_type(payload: bytes, offsets: dict, type_name: bytes):
    """(objnum, dict) for every indirect object whose dictionary carries
    ``/Type /<type_name>`` — located by scanning for the type marker and
    walking back to the enclosing ``N G obj``, newest (latest in file)
    last."""
    out = []
    starts = sorted((off, num) for num, off in offsets.items())
    for m in re.finditer(rb"/Type\s*/" + type_name + rb"\b", payload):
        # enclosing object = the greatest object start before the match
        lo, hi = 0, len(starts)
        while lo < hi:
            mid = (lo + hi) // 2
            if starts[mid][0] <= m.start():
                lo = mid + 1
            else:
                hi = mid
        if lo == 0:
            continue
        off, num = starts[lo - 1]
        try:
            d = _Lexer(payload, off).read_object()
        except (ValueError, NotImplementedError):
            continue
        if isinstance(d, dict) and d.get("Type") == type_name.decode():
            out.append((num, d))
    return out


class _Document:
    def __init__(self, payload: bytes):
        if not payload.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.payload = payload
        self.offsets = _index_objects(payload)
        self.cache: dict[int, object] = {}
        self._objstms_loaded = False
        self._crypt = None  # (method, file_key) once encryption is set up
        trailers = _find_trailers(payload)
        root_ref = None
        encrypt_ref = None
        file_id = None
        for tr in trailers:  # newest first
            if root_ref is None and "Root" in tr:
                root_ref = tr["Root"]
            if encrypt_ref is None and "Encrypt" in tr:
                encrypt_ref = tr["Encrypt"]
            if file_id is None and "ID" in tr:
                file_id = tr["ID"]
        if root_ref is None or (encrypt_ref is None and file_id is None):
            # PDF 1.5+: the trailer fields live in the cross-reference
            # STREAM's dictionary. The stream's packed offset table is
            # not needed here (the object index is rebuilt by scanning),
            # but its /Root, /Encrypt, and /ID entries are the trailer.
            for _num, d in reversed(
                _object_dicts_of_type(payload, self.offsets, b"XRef")
            ):
                if root_ref is None and "Root" in d:
                    root_ref = d["Root"]
                if encrypt_ref is None and "Encrypt" in d:
                    encrypt_ref = d["Encrypt"]
                if file_id is None and "ID" in d:
                    file_id = d["ID"]
                if root_ref is not None:
                    break
        if root_ref is None:
            raise ValueError("PDF trailer with /Root not found")
        if encrypt_ref is not None:
            # set up BEFORE resolving the root: a 1.5 file's catalog may
            # live inside an (encrypted) object stream
            self._setup_encryption(encrypt_ref, file_id)
        self.root = self.resolve(root_ref)

    def _setup_encryption(self, encrypt_ref, file_id) -> None:
        """Standard-security-handler setup (PDF 32000 §7.6.3): try the
        EMPTY user/owner password; on success store the file key so
        stream reads decrypt transparently, else keep the named
        quarantine. Covers V1/V2 (RC4), V4 (RC4 or AES-128 crypt
        filters), and V5/R6 (AES-256)."""
        from . import pdf_crypt as _crypt

        enc = self.resolve(encrypt_ref)
        if not isinstance(enc, dict):
            raise ValueError("PDF /Encrypt is not a dictionary")
        handler = self.resolve(enc.get("Filter"))
        if handler != "Standard":
            raise NotImplementedError(
                f"encrypted PDF: security handler {handler!r} unsupported "
                "(only the Standard handler's empty-password profile "
                "decodes)"
            )
        v = self.resolve(enc.get("V")) or 0
        r = self.resolve(enc.get("R")) or 2
        o = self.resolve(enc.get("O"))
        u = self.resolve(enc.get("U"))
        p = self.resolve(enc.get("P"))
        if not isinstance(o, bytes) or not isinstance(u, bytes) or not isinstance(p, int):
            raise ValueError("PDF /Encrypt missing O/U/P entries")
        if v in (1, 2):
            method = "rc4"
        elif v in (4, 5):
            cf = self.resolve(enc.get("CF"))
            stmf = self.resolve(enc.get("StmF")) or "Identity"
            cfm = "Identity"
            if stmf != "Identity" and isinstance(cf, dict):
                fdict = self.resolve(cf.get(stmf))
                if isinstance(fdict, dict):
                    cfm = self.resolve(fdict.get("CFM")) or "None"
            method = {
                "V2": "rc4",
                "AESV2": "aes",
                "AESV3": "aes",
                "Identity": "none",
                "None": "none",
            }.get(cfm)
            if method is None:
                raise NotImplementedError(
                    f"encrypted PDF: crypt filter method {cfm!r} unsupported"
                )
        else:
            raise NotImplementedError(
                f"encrypted PDF: /V {v} unsupported (V1/V2/V4/V5 decode)"
            )
        id0 = b""
        if isinstance(file_id, list) and file_id:
            first = self.resolve(file_id[0])
            if isinstance(first, bytes):
                id0 = first
        if r in (2, 3, 4):
            length = self.resolve(enc.get("Length")) or 40
            key_bytes = max(5, min(16, int(length) // 8))
            em = self.resolve(enc.get("EncryptMetadata"))
            key = _crypt.auth_empty_password_r234(
                o, u, p, id0, r, key_bytes,
                True if em is None else bool(em),
            )
        elif r in (5, 6):
            oe = self.resolve(enc.get("OE"))
            ue = self.resolve(enc.get("UE"))
            if not isinstance(oe, bytes) or not isinstance(ue, bytes):
                raise ValueError("PDF /Encrypt R5/R6 missing OE/UE")
            key = _crypt.auth_empty_password_r56(o, u, oe, ue, r)
        else:
            raise NotImplementedError(f"encrypted PDF: /R {r} unsupported")
        if key is None:
            raise NotImplementedError(
                "encrypted PDF: password-protected (a non-empty password "
                "is required; only the empty-password profile decodes)"
            )
        self._crypt = (method, key)

    def _decrypt_bytes(self, raw: bytes, num: int, off: int) -> bytes:
        """Per-object decryption of a stream's raw bytes (Algorithm 1
        keys for V<5; the file key directly for V5)."""
        if self._crypt is None:
            return raw
        from . import pdf_crypt as _crypt

        method, key = self._crypt
        if method == "none" or not raw:
            return raw
        if len(key) == 32:  # V5: AES-256, no per-object salting
            okey = key
            aes = True
        else:
            aes = method == "aes"
            gen = 0
            m = re.search(
                rb"(\d+)\s+(\d+)\s+obj\s*$",
                self.payload[max(0, off - 48) : off],
            )
            if m:
                gen = int(m.group(2))
            okey = _crypt.object_key(key, num, gen, aes)
        if aes:
            if len(raw) < 16 or (len(raw) - 16) % 16:
                raise ValueError("PDF AES stream length invalid")
            return _crypt.aes_cbc_decrypt(okey, raw[:16], raw[16:])
        return _crypt.rc4(okey, raw)

    def resolve(self, obj):
        """Follow ('ref', n) chains to the object value."""
        seen = 0
        while isinstance(obj, tuple) and obj and obj[0] == "ref":
            num = obj[1]
            seen += 1
            if seen > 64:
                raise ValueError("PDF reference chain too deep")
            if num in self.cache:
                obj = self.cache[num]
                continue
            off = self.offsets.get(num)
            if off is None:
                # not a direct object: it may live inside an object
                # stream (PDF 1.5 /ObjStm) — load those lazily once
                self._load_objstms()
                if num in self.cache:
                    obj = self.cache[num]
                    continue
                return None  # dangling reference: treated as null per spec
            val = _Lexer(self.payload, off).read_object()
            self.cache[num] = val
            obj = val
        return obj

    def _load_objstms(self) -> None:
        """Decode every /ObjStm once: header = N (objnum, offset) pairs,
        bodies lexed at /First + offset. Direct objects take precedence
        (an incremental update that rewrites an object writes it
        directly)."""
        if self._objstms_loaded:
            return
        self._objstms_loaded = True
        for num, d in _object_dicts_of_type(
            self.payload, self.offsets, b"ObjStm"
        ):
            try:
                data = self.stream_bytes(num)
            except (ValueError, NotImplementedError):
                continue  # a broken container stream loses its objects only
            n = self.resolve(d.get("N"))
            first = self.resolve(d.get("First"))
            if (
                not isinstance(n, int)
                or not isinstance(first, int)
                or not 0 <= n <= _PDF_MAX_OBJECTS
                or not 0 <= first <= len(data)
            ):
                continue
            header = data[:first].split()
            for i in range(n):
                try:
                    onum = int(header[2 * i])
                    ooff = int(header[2 * i + 1])
                except (IndexError, ValueError):
                    break
                if onum in self.offsets or onum in self.cache:
                    continue
                try:
                    self.cache[onum] = _Lexer(data, first + ooff).read_object()
                except (ValueError, NotImplementedError):
                    continue

    def stream_bytes(self, num: int) -> bytes:
        """The decoded stream of object ``num`` (raw or FlateDecode)."""
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"PDF stream object {num} missing")
        lex = _Lexer(self.payload, off)
        sdict = lex.read_object()
        if not isinstance(sdict, dict):
            raise ValueError(f"PDF object {num} is not a stream")
        lex._skip_ws()
        if not self.payload.startswith(b"stream", lex.pos):
            raise ValueError(f"PDF object {num} missing stream keyword")
        p = lex.pos + 6
        if self.payload.startswith(b"\r\n", p):
            p += 2
        elif self.payload.startswith(b"\n", p) or self.payload.startswith(b"\r", p):
            p += 1
        length = self.resolve(sdict.get("Length"))
        if not isinstance(length, int) or length < 0:
            raise ValueError(f"PDF stream {num} /Length invalid")
        if length > _PDF_MAX_STREAM:
            raise ValueError("PDF stream length exceeds the decoder bound")
        raw = self.payload[p : p + length]
        if len(raw) != length:
            raise ValueError(f"PDF stream {num} truncated")
        raw = self._decrypt_bytes(raw, num, off)
        filt = self.resolve(sdict.get("Filter"))
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                d = zlib.decompressobj()
                try:
                    raw = d.decompress(raw, _PDF_MAX_STREAM)
                except zlib.error as exc:
                    raise ValueError(f"PDF Flate stream corrupt: {exc}")
                if d.unconsumed_tail:
                    raise ValueError(
                        "PDF stream inflates past the decoder bound"
                    )
            elif f == "LZWDecode":
                # PDF LZW IS the TIFF variant (MSB-first, early change)
                from .tiff import _tiff_lzw_decode

                raw = _tiff_lzw_decode(raw, _PDF_MAX_STREAM)
            elif f == "ASCII85Decode":
                import base64

                body = re.sub(rb"\s", b"", raw)
                if body.startswith(b"<~"):
                    body = body[2:]
                if body.endswith(b"~>"):
                    body = body[:-2]
                try:
                    raw = base64.a85decode(body)
                except ValueError as exc:
                    raise ValueError(f"PDF ASCII85 stream malformed: {exc}")
            elif f == "ASCIIHexDecode":
                h = re.sub(rb"[\s>]", b"", raw)
                if len(h) % 2:
                    h += b"0"  # final 0 implied, per spec
                try:
                    raw = bytes.fromhex(h.decode("ascii"))
                except ValueError:
                    raise ValueError("PDF ASCIIHex stream malformed")
            elif f == "RunLengthDecode":
                # spec 7.4.5: n<=127 copies n+1 literals; n>=129 repeats
                # the next byte 257-n times; 128 is EOD
                out = bytearray()
                pos = 0
                while pos < len(raw):
                    n = raw[pos]
                    pos += 1
                    if n == 128:
                        break
                    if n <= 127:
                        chunk = raw[pos : pos + n + 1]
                        if len(chunk) != n + 1:
                            raise ValueError("PDF RunLength literal truncated")
                        out += chunk
                        pos += n + 1
                    else:
                        if pos >= len(raw):
                            raise ValueError("PDF RunLength repeat truncated")
                        out += raw[pos : pos + 1] * (257 - n)
                        pos += 1
                    if len(out) > _PDF_MAX_STREAM:
                        raise ValueError(
                            "PDF stream inflates past the decoder bound"
                        )
                raw = bytes(out)
            elif f == "CCITTFaxDecode":
                # fax-coded bilevel raster (PDF 32000-1 §7.4.6) via the
                # from-scratch ITU T.4/T.6 decoder; output = packed
                # byte-aligned rows, 0 bits black unless /BlackIs1
                from .ccitt import ccitt_decode_packed

                cp = self.resolve(sdict.get("DecodeParms") or sdict.get("DP"))
                if isinstance(cp, list):
                    cp = next(
                        (
                            p
                            for p in (self.resolve(x) for x in cp)
                            if isinstance(p, dict)
                        ),
                        None,
                    )
                cp = cp if isinstance(cp, dict) else {}
                k = self.resolve(cp.get("K", 0)) or 0
                columns = self.resolve(cp.get("Columns", 1728)) or 1728
                prows = self.resolve(cp.get("Rows"))
                if not (isinstance(prows, int) and prows > 0):
                    h = self.resolve(sdict.get("Height"))
                    prows = h if isinstance(h, int) and h > 0 else None
                mode = "g4" if k < 0 else ("g3-2d" if k > 0 else "mh")
                if k == 0 and self.resolve(cp.get("EndOfLine", False)):
                    mode = "g3"
                # K > 0 with /EndOfLine false (the PDF default): EOLs
                # are tolerated, not required — the per-row tag bit is
                # read either way (r11; Xpdf/pdf.js read it after the
                # optional EOL check on every coding line). /EndOfLine
                # true keeps the strict T.4 framing demand.
                eol_required = bool(self.resolve(cp.get("EndOfLine", False)))
                try:
                    raw = ccitt_decode_packed(
                        raw,
                        columns=int(columns),
                        rows=prows,
                        mode=mode,
                        byte_align=bool(
                            self.resolve(cp.get("EncodedByteAlign", False))
                        ),
                        black_bit=1
                        if self.resolve(cp.get("BlackIs1", False))
                        else 0,
                        require_eol=eol_required if k > 0 else True,
                    )
                except ValueError as exc:
                    raise ValueError(f"PDF CCITT stream corrupt: {exc}")
            else:
                raise NotImplementedError(
                    f"PDF stream filter {f}: Flate/LZW/ASCII85/ASCIIHex/"
                    "RunLength/CCITTFax are decodable here (DCT/JBIG2 are "
                    "plug-in points)"
                )
            if len(raw) > _PDF_MAX_STREAM:
                raise ValueError("PDF stream inflates past the decoder bound")
        parms = self.resolve(sdict.get("DecodeParms") or sdict.get("DP"))
        if isinstance(parms, list):
            parms = next(
                (p for p in (self.resolve(x) for x in parms) if isinstance(p, dict)),
                None,
            )
        if isinstance(parms, dict):
            pred = self.resolve(parms.get("Predictor", 1))
            if isinstance(pred, int) and pred >= 10:
                raw = _png_unpredict(
                    raw,
                    int(self.resolve(parms.get("Columns", 1)) or 1),
                    int(self.resolve(parms.get("Colors", 1)) or 1),
                    int(self.resolve(parms.get("BitsPerComponent", 8)) or 8),
                )
            elif pred == 2:
                # TIFF predictor: horizontal differencing, no row tag
                columns = int(self.resolve(parms.get("Columns", 1)) or 1)
                colors = int(self.resolve(parms.get("Colors", 1)) or 1)
                bpc = int(self.resolve(parms.get("BitsPerComponent", 8)) or 8)
                if bpc != 8:
                    raise NotImplementedError(
                        "PDF TIFF predictor with sub-byte components is a "
                        "plug-in point"
                    )
                rowlen = columns * colors
                if rowlen <= 0 or len(raw) % rowlen:
                    raise ValueError(
                        "PDF predictor stream length inconsistent with Columns"
                    )
                buf = bytearray(raw)
                for r0 in range(0, len(buf), rowlen):
                    for i in range(colors, rowlen):
                        buf[r0 + i] = (buf[r0 + i] + buf[r0 + i - colors]) & 0xFF
                raw = bytes(buf)
        return raw

    def pages(self):
        """(page dict, effective /Resources) in document order — the
        depth-first Kids walk, with Resources INHERITED from ancestor
        Pages nodes per the spec (subset-font documents routinely hang
        the font table on the tree root)."""
        pages_ref = self.root.get("Pages") if isinstance(self.root, dict) else None
        node = self.resolve(pages_ref)
        if not isinstance(node, dict):
            raise ValueError("PDF /Root has no /Pages tree")
        out = []

        def walk(nd, inherited, depth=0):
            if depth > 64:
                raise ValueError("PDF page tree too deep")
            res = self.resolve(nd.get("Resources"))
            if not isinstance(res, dict):
                res = inherited
            t = nd.get("Type")
            if t == "Page":
                out.append((nd, res))
                if len(out) > _PDF_MAX_PAGES:
                    raise ValueError("PDF page count exceeds the decoder bound")
                return
            for kid in self.resolve(nd.get("Kids")) or []:
                k = self.resolve(kid)
                if isinstance(k, dict):
                    walk(k, res, depth + 1)

        walk(node, None)
        return out

    def page_image_counts(self) -> list:
        """Per-page count of image XObjects referenced by the page's
        effective /Resources (r11, verdict item 6): the 'image-only
        page' accounting signal for scanned documents. CCITT fax
        rasters now DECODE to pixels (``bilevel_images``) but carry no
        text layer without OCR — a page with images and an empty text
        layer must be countable as a scanned page, never mistaken for
        a blank one. Counts every /Subtype /Image (fax, DCT, ...):
        the signal is 'this page's content lives in rasters', not
        'this raster decodes here'."""
        out = []
        for _page, res in self.pages():
            n = 0
            xobjs = (
                self.resolve(res.get("XObject"))
                if isinstance(res, dict)
                else None
            )
            if isinstance(xobjs, dict):
                for ref in xobjs.values():
                    xd = self.resolve(ref)
                    if (
                        isinstance(xd, dict)
                        and self.resolve(xd.get("Subtype")) == "Image"
                    ):
                        n += 1
            out.append(n)
        return out

    def page_fonts(self, resources):
        """name -> ``(code_len, mapping)`` for a page's font resources,
        from the highest-fidelity source available per font: the
        ``/ToUnicode`` CMap when present and parseable (the spec's
        authoritative text source); else for Type0 fonts the encoding
        CMap lane (Identity-H/V direct CID reading, predefined CMaps as
        the counted absent-value contract — r10); else the simple-font
        ``/Encoding`` tables (base encoding + ``/Differences``, r9),
        else None (raw Latin-1 reading)."""
        if not isinstance(resources, dict):
            return {}
        fonts = self.resolve(resources.get("Font"))
        out = {}
        if isinstance(fonts, dict):
            for name, ref in fonts.items():
                fd = self.resolve(ref)
                cmap = None
                if isinstance(fd, dict):
                    tu = fd.get("ToUnicode")
                    if isinstance(tu, tuple) and tu and tu[0] == "ref":
                        try:
                            cmap = _parse_tounicode(self.stream_bytes(tu[1]))
                        except (ValueError, NotImplementedError):
                            cmap = None
                    if cmap is None:
                        if self.resolve(fd.get("Subtype")) == "Type0":
                            cmap = self._type0_mapping(fd)
                        else:
                            cmap = self._simple_font_mapping(fd)
                out[name] = cmap
        return out

    def _type0_mapping(self, fd: dict):
        """The Type0-without-ToUnicode lane (r10, the CJK-book slice;
        r11 widened to the predefined UCS-2 CMap families).

        ``Identity-H``/``Identity-V``: 2-byte codes ARE the CIDs; they
        are read directly as Unicode scalar values (the shape emitted
        by generators that subset with Unicode-valued CIDs). CIDs in
        the surrogate gap have no scalar value and count as unmapped.

        ``Uni{GB,CNS,JIS,KS}-UCS2[-HW]-{H,V}`` (r11): these predefined
        CMaps are DEFINED by Adobe as the UCS-2 encoding of their
        character collection (Adobe-GB1/CNS1/Japan1/Korea1), so the
        2-byte character codes in the content stream are literally
        UCS-2 code units — text extraction needs no table at all, and
        unlike the Identity heuristic above this reading is spec-exact.
        UCS-2 has no surrogates, so surrogate-gap codes count as
        unmapped exactly as in the Identity lane.

        Legacy-byte predefined CMaps whose CODESPACE is exactly a
        stdlib charset (r11, ``_LEGACY_CMAP_CODECS``): per Adobe's
        cmap-resources each of these CMaps is defined over a national
        encoding of its character collection — 90ms-RKSJ over
        Microsoft KanjiCode (cp932), KSCms-UHC over Unified Hangul
        Code (cp949), GBK-EUC over GBK, ETen-B5 over Big5+ETen
        (cp950), EUC over EUC-JP, the Uni*-UTF8/UTF32 families over
        those Unicode forms — so the content-stream string bytes ARE
        text in that charset, and text extraction needs no CID table:
        the CID indirection selects glyphs, not character values.
        Whole-string codec decode (the codespaces are variable-width:
        1-byte ASCII/kana ranges beside 2-byte lead/trail ranges) with
        errors="replace", so extension-zone codes the codec does not
        cover stay countable as U+FFFD.

        Any OTHER predefined CMap (the Mac variants 90pv/83pv-RKSJ /
        B5pc / KSCpc-EUC, CNS-EUC whose EUC-TW has no stdlib codec,
        GBKp-EUC's replaced codes, ...) or an embedded CMap stream
        maps every 2-byte code to the unmapped marker: those tables
        cannot be independently cross-verified in this environment
        (the repo's in-test-writer discipline — an unverifiable table
        is worse than an honest count), so the contract is COUNT +
        QUARANTINE, surfaced per page by
        :func:`pdf_unmapped_glyph_counts`, never silent Latin-1
        mojibake. Mixed-width predefined CMaps are counted in 2-byte
        units — an approximation documented here, affecting only the
        count of a lane that is already absent-valued."""
        enc = self.resolve(fd.get("Encoding"))
        if enc in ("Identity-H", "Identity-V"):
            return (2, _IdentityCidMap())
        if isinstance(enc, str) and _UCS2_CMAP_RE.match(enc):
            return (2, _IdentityCidMap())
        if isinstance(enc, str) and _UTF16_CMAP_RE.match(enc):
            # UTF-16BE encoding of the collection: variable-width
            # (surrogate pairs), decoded whole-string (r11)
            return (2, _Utf16CidMap())
        if isinstance(enc, str):
            codec = _legacy_cmap_codec(enc)
            if codec is not None:
                return (2, _CodecCidMap(codec))
        if enc is None:
            return None
        return (2, {})  # predefined/embedded CMap: counted absence

    def _simple_font_mapping(self, fd: dict):
        """``(1, code->str)`` from a simple font's ``/Encoding`` entry —
        a base-encoding name or a dict of /BaseEncoding + /Differences
        (glyph names resolved through the AGL convention; unknown names
        drop their code so the U+FFFD contract keeps garbage visible).
        None for Type0 fonts (their lane is the ToUnicode CMap) and for
        fonts with no usable /Encoding."""
        from .pdf_encodings import base_encoding_table, glyph_to_unicode

        if self.resolve(fd.get("Subtype")) == "Type0":
            return None
        enc = self.resolve(fd.get("Encoding"))
        if isinstance(enc, str):
            table = base_encoding_table(enc)
            return (1, table) if table is not None else None
        if not isinstance(enc, dict):
            return None
        base_name = self.resolve(enc.get("BaseEncoding"))
        table = (
            base_encoding_table(base_name)
            if isinstance(base_name, str)
            else None
        )
        if table is None:
            # spec default is the font's built-in encoding; Standard is
            # the conventional stand-in for non-symbolic text fonts
            table = base_encoding_table("StandardEncoding")
        diffs = self.resolve(enc.get("Differences"))
        if isinstance(diffs, list):
            code = None
            for el in diffs:
                el = self.resolve(el)
                if isinstance(el, (int, float)):
                    code = int(el)
                elif isinstance(el, str) and code is not None and 0 <= code <= 0xFF:
                    got = glyph_to_unicode(el)
                    if got is not None:
                        table[code] = got
                    else:
                        table.pop(code, None)
                    code += 1
        return (1, table)

    def page_content(self, page: dict) -> bytes:
        """A page's concatenated content-stream bytes."""
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        chunks = []
        for r in refs:
            if isinstance(r, tuple) and r and r[0] == "ref":
                chunks.append(self.stream_bytes(r[1]))
            elif r is None:
                continue
            else:
                raise ValueError("PDF /Contents must reference streams")
        return b"\n".join(chunks)

    def images(self):
        """Every DCT-coded image XObject in the document:
        ``(obj_num, width, height, jpeg_bytes)`` — a /DCTDecode image
        stream's raw bytes ARE a complete JPEG (the scanned-document
        payload; this package's own JPEG decoder opens them). Non-DCT
        images (Flate RGB rasters, JBIG2, CCITT fax) are skipped here —
        their pixel layouts need /ColorSpace plumbing this method
        doesn't model."""
        out = []
        for num, d in _object_dicts_of_type(
            self.payload, self.offsets, b"XObject"
        ):
            if self.resolve(d.get("Subtype")) != "Image":
                continue
            filt = self.resolve(d.get("Filter"))
            filters = filt if isinstance(filt, list) else [filt]
            if "DCTDecode" not in [self.resolve(f) for f in filters]:
                continue
            w = self.resolve(d.get("Width"))
            h = self.resolve(d.get("Height"))
            # read the RAW stream (no filter application: DCT bytes ARE
            # the JPEG); reuse the /Length + bounds plumbing
            off = self.offsets.get(num)
            lex = _Lexer(self.payload, off)
            lex.read_object()
            lex._skip_ws()
            if not self.payload.startswith(b"stream", lex.pos):
                continue
            p = lex.pos + 6
            if self.payload.startswith(b"\r\n", p):
                p += 2
            elif self.payload[p : p + 1] in (b"\n", b"\r"):
                p += 1
            length = self.resolve(d.get("Length"))
            if not isinstance(length, int) or not 0 <= length <= _PDF_MAX_STREAM:
                continue
            raw = self.payload[p : p + length]
            if len(raw) != length:
                continue
            try:
                raw = self._decrypt_bytes(raw, num, off)
            except ValueError:
                continue
            if raw[:2] != b"\xff\xd8":
                continue
            out.append((num, w, h, raw))
        return out

    def bilevel_images(self):
        """Every CCITT-fax image XObject decoded to a black-pixel mask:
        ``(obj_num, width, height, numpy bool array)`` — the scanned-
        document raster surface beside :meth:`images`' JPEG one. The
        stream runs through the full filter chain (Flate-wrapped fax
        data decodes in order); undecodable images are skipped (the
        caller's count of skips is its quarantine signal)."""
        import numpy as np

        out = []
        for num, d in _object_dicts_of_type(
            self.payload, self.offsets, b"XObject"
        ):
            if self.resolve(d.get("Subtype")) != "Image":
                continue
            filt = self.resolve(d.get("Filter"))
            filters = filt if isinstance(filt, list) else [filt]
            if "CCITTFaxDecode" not in [self.resolve(f) for f in filters]:
                continue
            w = self.resolve(d.get("Width"))
            h = self.resolve(d.get("Height"))
            if not (isinstance(w, int) and isinstance(h, int) and w > 0 and h > 0):
                continue
            try:
                packed = self.stream_bytes(num)
            except (ValueError, NotImplementedError):
                continue
            cp = self.resolve(d.get("DecodeParms") or d.get("DP"))
            if isinstance(cp, list):
                cp = next(
                    (
                        p
                        for p in (self.resolve(x) for x in cp)
                        if isinstance(p, dict)
                    ),
                    None,
                )
            cp = cp if isinstance(cp, dict) else {}
            black1 = bool(self.resolve(cp.get("BlackIs1", False)))
            rowbytes = (w + 7) // 8
            if len(packed) < rowbytes * h:
                continue
            bits = np.unpackbits(
                np.frombuffer(
                    packed[: rowbytes * h], dtype=np.uint8
                ).reshape(h, rowbytes),
                axis=1,
            )[:, :w]
            mask = bits.astype(bool) if black1 else ~bits.astype(bool)
            out.append((num, w, h, mask))
        return out


#: content-stream token pattern: strings, hex strings, arrays handled by
#: the lexer; operators are bare keyword runs
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")

_HEX_TOKEN = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_CMAP_MAX_ENTRIES = 1 << 20


def _parse_tounicode(data: bytes):
    """Parse a /ToUnicode CMap stream: returns ``(code_len, mapping)``
    with ``mapping`` code-int -> str. Covers the forms subset fonts
    actually emit: codespace ranges (fixing the code byte width),
    ``bfchar`` pairs, and both ``bfrange`` forms (offset destination
    and explicit array). Destination hex is UTF-16BE per the spec."""
    code_len = 2  # Type0/CID default; codespace overrides
    m = _CODESPACE_RE.search(data)
    if m:
        toks = _HEX_TOKEN.findall(m.group(1))
        if toks:
            code_len = max(1, len(toks[0]) // 2)

    def _dst(hexbytes: bytes) -> str:
        raw = bytes.fromhex(hexbytes.decode("ascii"))
        if len(raw) % 2:
            raw += b"\x00"
        return raw.decode("utf-16-be", errors="replace")

    mapping: dict[int, str] = {}
    for block in _BFCHAR_RE.finditer(data):
        toks = _HEX_TOKEN.findall(block.group(1))
        for i in range(0, len(toks) - 1, 2):
            mapping[int(toks[i], 16)] = _dst(toks[i + 1])
            if len(mapping) > _CMAP_MAX_ENTRIES:
                raise ValueError("PDF CMap entry count exceeds the bound")
    for block in _BFRANGE_RE.finditer(data):
        body = block.group(1)
        # each range line: <lo> <hi> then either <dst> or [<d> <d> ...]
        pos = 0
        while True:
            mlo = _HEX_TOKEN.search(body, pos)
            if not mlo:
                break
            mhi = _HEX_TOKEN.search(body, mlo.end())
            if not mhi:
                break
            lo, hi = int(mlo.group(1), 16), int(mhi.group(1), 16)
            if hi < lo or hi - lo > _CMAP_MAX_ENTRIES:
                raise ValueError("PDF CMap range exceeds the bound")
            nxt = body[mhi.end() :].lstrip()
            if nxt.startswith(b"["):
                close = body.find(b"]", mhi.end())
                if close == -1:
                    break
                dsts = _HEX_TOKEN.findall(body[mhi.end() : close])
                for k, d in enumerate(dsts):
                    if lo + k <= hi:
                        mapping[lo + k] = _dst(d)
                pos = close + 1
            else:
                md = _HEX_TOKEN.search(body, mhi.end())
                if not md:
                    break
                base_hex = md.group(1)
                base_raw = bytes.fromhex(base_hex.decode("ascii"))
                base = int(base_hex, 16)
                width = len(base_raw)
                for k in range(hi - lo + 1):
                    mapping[lo + k] = _dst(
                        b"%0*X" % (width * 2, base + k)
                    )
                pos = md.end()
            if len(mapping) > _CMAP_MAX_ENTRIES:
                raise ValueError("PDF CMap entry count exceeds the bound")
    return code_len, mapping


#: the predefined UCS-2 CMap families (PDF 32000-1 §9.7.5.2 table 118):
#: per Adobe's CMap resources these are "UCS-2 encoding for the
#: Adobe-GB1/CNS1/Japan1/Korea1 character collection" — the character
#: code IS the UCS-2 code unit, so Unicode reading is table-free.
_UCS2_CMAP_RE = re.compile(r"^Uni(?:GB|CNS|JIS|KS)-UCS2(?:-HW)?-[HV]$")

#: the UTF-16 twins (UniJIS-UTF16-H etc., incl. the JIS2004 variants):
#: "UTF-16BE encoding for the ... character collection" — variable
#: width (surrogate pairs), so they decode whole-string, not per-unit.
_UTF16_CMAP_RE = re.compile(
    r"^Uni(?:GB|CNS|JIS|JIS2004|KS)-UTF16-[HV]$"
)


#: legacy-byte predefined CMaps whose codespace is EXACTLY a stdlib
#: charset (PDF 32000-1 §9.7.5.2 table 118 names; encodings per
#: Adobe's cmap-resources READMEs). Keyed by the name minus its
#: writing-mode suffix (-H/-V share one encoding). Families whose
#: encoding has no exact stdlib codec (Mac variants 90pv/83pv-RKSJ,
#: B5pc, KSCpc-EUC; EUC-TW for CNS-EUC; GBKp-EUC's replaced codes)
#: are deliberately ABSENT — they keep the counted quarantine.
_LEGACY_CMAP_CODECS = {
    # Adobe-Japan1
    "90ms-RKSJ": "cp932",      # Microsoft KanjiCode (Shift-JIS, MS)
    "90msp-RKSJ": "cp932",     # same encoding, proportional forms
    "Add-RKSJ": "shift_jis",   # JIS X 0208 zone exact; NEC/Fujitsu
    "Ext-RKSJ": "shift_jis",   # extension rows fail -> counted U+FFFD
    "EUC": "euc_jp",
    # Adobe-Korea1
    "KSCms-UHC": "cp949",      # Unified Hangul Code (MS)
    "KSCms-UHC-HW": "cp949",
    "KSC-EUC": "euc_kr",
    # Adobe-GB1
    "GB-EUC": "gb2312",        # EUC-CN
    "GBK-EUC": "gbk",
    "GBK2K": "gb18030",
    # Adobe-CNS1
    "ETen-B5": "cp950",        # Big5 + ETen extensions
    "HKscs-B5": "big5hkscs",
}
#: the Unicode-transform twins of the UCS2/UTF16 families: same
#: whole-string table-free reading, different Unicode form.
for _fam in ("GB", "CNS", "JIS", "JIS2004", "KS"):
    _LEGACY_CMAP_CODECS[f"Uni{_fam}-UTF8"] = "utf-8"
    _LEGACY_CMAP_CODECS[f"Uni{_fam}-UTF32"] = "utf-32-be"
del _fam


def _legacy_cmap_codec(name: str) -> str | None:
    """Codec for a legacy-byte predefined CMap name, or None. The
    writing-mode suffix (-H horizontal / -V vertical) selects glyph
    orientation only — both modes share one character encoding."""
    if name.endswith(("-H", "-V")):
        return _LEGACY_CMAP_CODECS.get(name[:-2])
    return None


class _CodecCidMap:
    """Legacy-byte predefined CMap reading (r11): the shown bytes ARE
    text in the CMap's national charset, decoded whole-string (the
    codespaces mix 1-byte and 2-byte codes). Codes outside the codec
    (extension zones, truncated trail bytes) become U+FFFD so they
    stay countable under the unmapped-glyph convention."""

    __slots__ = ("codec",)

    def __init__(self, codec: str) -> None:
        self.codec = codec

    def decode_bytes(self, s: bytes) -> str:
        return s.decode(self.codec, errors="replace")


class _Utf16CidMap:
    """Predefined UTF-16 CMap reading (r11): shown bytes ARE UTF-16BE.
    ``decode_bytes`` handles surrogate pairs; malformed units (lone
    surrogates, odd tails) become U+FFFD so they stay countable under
    the same convention as every other unmapped glyph."""

    __slots__ = ()

    def decode_bytes(self, s: bytes) -> str:
        return s.decode("utf-16-be", errors="replace")


class _IdentityCidMap:
    """Identity-H/V CID reading: ``get(code)`` returns the code's
    Unicode scalar value; surrogate-gap codes (no scalar value) fall to
    the default, keeping them countable as unmapped."""

    __slots__ = ()

    def get(self, code: int, default=None):
        if 0xD800 <= code <= 0xDFFF:
            return default
        return chr(code)


def _content_text(content: bytes, fonts: dict | None = None) -> str:
    """Extract show-text output from one page's content stream.
    ``fonts`` maps resource names to parsed /ToUnicode CMaps: while a
    mapped font is selected (``Tf``), shown strings split into
    code-width units and translate through the CMap (subset/CID fonts
    whose bytes are glyph ids, not characters); unmapped codes emit
    U+FFFD so garbage stays visible instead of silently vanishing.
    Fonts without a CMap keep the simple-profile Latin-1 reading."""
    lex = _Lexer(content)
    stack: list = []
    lines: list[str] = [""]
    active = None  # the selected font's (code_len, mapping), if any

    def show(s):
        if not isinstance(s, bytes):
            return
        if active:
            code_len, mapping = active
            if hasattr(mapping, "decode_bytes"):
                # variable-width CMap (UTF-16 families, r11): the
                # string decodes whole, not in fixed code_len units
                lines[-1] += mapping.decode_bytes(s)
                return
            out = []
            for i in range(0, len(s) - code_len + 1, code_len):
                code = int.from_bytes(s[i : i + code_len], "big")
                out.append(mapping.get(code, "\ufffd"))
            lines[-1] += "".join(out)
        else:
            lines[-1] += s.decode("latin-1")

    def newline():
        if lines[-1]:
            lines.append("")

    n = len(content)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        if c in b"([</+-.0123456789":
            try:
                stack.append(lex.read_object())
            except ValueError:
                lex.pos += 1  # tolerate junk inside content (spec: skip)
            continue
        m = _OP_RE.match(content, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group(0)
        lex.pos = m.end()
        if op == b"Tj":
            show(stack[-1] if stack else b"")
        elif op == b"TJ":
            arr = stack[-1] if stack and isinstance(stack[-1], list) else []
            for el in arr:
                if isinstance(el, bytes):
                    show(el)
                elif (
                    isinstance(el, (int, float))
                    and el < _TJ_SPACE_THRESHOLD
                    and lines[-1]
                    and not lines[-1].endswith(" ")
                ):
                    lines[-1] += " "
        elif op in (b"'", b'"'):
            newline()
            show(stack[-1] if stack else b"")
        elif op == b"Tf":
            # operands: /FontName size — switch the active CMap
            name = (
                stack[-2]
                if len(stack) >= 2 and isinstance(stack[-2], str)
                else None
            )
            active = (fonts or {}).get(name)
        elif op in (b"Td", b"TD", b"T*", b"Tm"):
            newline()
        elif op == b"ID":
            # inline image (BI ... ID <binary> EI): the binary data can
            # contain bytes that lex as strings — skipped to the EI
            # operator (whitespace-delimited per the spec) so image
            # bytes never masquerade as text (r9)
            at = lex.pos
            while True:
                at = content.find(b"EI", at)
                if at < 0:
                    lex.pos = n  # unterminated: drop the tail
                    break
                before = content[at - 1 : at]
                after = content[at + 2 : at + 3]
                if before in b" \t\r\n\x00" and (
                    after in b" \t\r\n" or after == b""
                ):
                    lex.pos = at + 2
                    break
                at += 2
        elif op == b"ET":
            newline()
        # operands always precede and are consumed by their operator
        stack.clear()
    return "\n".join(ln for ln in lines if ln).strip()


def _pdf_page_texts(payload: bytes) -> list:
    doc = _Document(payload)
    return [
        _content_text(doc.page_content(pg), doc.page_fonts(res))
        for pg, res in doc.pages()
    ]


def _pdf_extract_text(payload: bytes):
    """Extract the text layer: returns ``(text, n_pages)`` with pages
    separated by form feeds (``\\f``) — the convention pdftotext uses."""
    texts = _pdf_page_texts(payload)
    return "\f".join(texts), len(texts)


def pdf_unmapped_glyph_counts(payload: bytes) -> list:
    """Per-page count of unmapped glyphs (U+FFFD emissions) — the
    visible absent-value signal for CID fonts whose predefined CMap is
    the counted quarantine (``_Document._type0_mapping``) and for any
    code a ToUnicode/encoding table does not cover. A page with a high
    count is a page whose text layer is NOT trustworthy; pipelines gate
    on it instead of ingesting mojibake."""
    return [t.count("\ufffd") for t in _pdf_page_texts(payload)]


def pdf_page_image_counts(payload: bytes) -> list:
    """Per-page count of image XObjects (r11): the scanned-document
    accounting surface beside :func:`pdf_unmapped_glyph_counts`. A
    CCITT-fax page now decodes to PIXELS but has no text without OCR;
    this count lets corpus accounting see 'image-only page' (images
    present, empty text layer) distinctly from 'blank page' — no
    silent empty text."""
    return _Document(payload).page_image_counts()


def extract_pdf_text(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "null",
    with_unmapped: bool = False,
    with_page_images: bool = False,
):
    """Spark lane: PDF payloads -> ``(doc_id, text, n_pages, n_chars)``.

    Arrow-batched mapInPandas with the multimodal tier's quarantine
    contract (``on_error``: "null" keeps the row with NULL text —
    undecodable PDFs stay countable; "skip" drops; "strict" aborts).
    The output is the text tier's input shape: feed it straight into
    clean_corpus / exact dedup / chunk_docs.

    ``with_unmapped=True`` (r10) appends ``unmapped_glyphs``
    (``array<int>``, one U+FFFD count per page — the CID-font trust
    signal of :func:`pdf_unmapped_glyph_counts` at the corpus surface)
    so a pipeline gates untrustworthy text layers in the same pass.
    """
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .multimodal import _check_on_error

    _check_on_error(on_error)
    fields = [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_chars", LongType()),
    ]
    if with_unmapped:
        fields.append(StructField("unmapped_glyphs", ArrayType(IntegerType())))
    if with_page_images:
        fields.append(StructField("page_images", ArrayType(IntegerType())))
    schema = StructType(fields)
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, texts, pages, chars, unmapped = [], [], [], [], []
            img_counts = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    page_texts = _pdf_page_texts(bytes(p))
                    text, n_pages = "\f".join(page_texts), len(page_texts)
                    counts = (
                        [t.count("\ufffd") for t in page_texts]
                        if with_unmapped
                        else None
                    )
                    imgs = (
                        _Document(bytes(p)).page_image_counts()
                        if with_page_images
                        else None
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    if on_error == "skip":
                        continue
                    text, n_pages, counts, imgs = None, None, None, None
                ids.append(doc_id)
                texts.append(text)
                pages.append(n_pages)
                chars.append(None if text is None else len(text))
                unmapped.append(counts)
                img_counts.append(imgs)
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "text": pd.Series(texts, dtype="object"),
                "n_pages": pd.Series(pages, dtype="Int32"),
                "n_chars": pd.Series(chars, dtype="Int64"),
            }
            if with_unmapped:
                out["unmapped_glyphs"] = pd.Series(unmapped, dtype="object")
            if with_page_images:
                out["page_images"] = pd.Series(img_counts, dtype="object")
            yield pd.DataFrame(out)

    return narrow.mapInPandas(batches, schema)


def extract_pdf_images(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
):
    """Spark lane (one-to-many): PDF payloads -> one row per embedded
    DCT image ``(doc_id, img_idx, width, height, payload, n_bytes)`` —
    the payload column holds a complete JPEG, so the rows feed straight
    into ``decode_media(codec="jpeg")`` / ``phash_signatures`` /
    ``extract_features``: scanned-PDF corpora join the image dedup tier
    in one composition. Unreadable PDFs follow ``on_error``
    ("skip" default / "strict")."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from .multimodal import _check_on_error

    _check_on_error(on_error, allowed=("skip", "strict"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("img_idx", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("payload", BinaryType()),
            StructField("n_bytes", LongType()),
        ]
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ws, hs, blobs, sizes = [], [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    images = _Document(bytes(p)).images()
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    continue
                for i, (_num, w, h, raw) in enumerate(images):
                    ids.append(doc_id)
                    idxs.append(i)
                    ws.append(w if isinstance(w, int) else None)
                    hs.append(h if isinstance(h, int) else None)
                    blobs.append(raw)
                    sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "img_idx": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "payload": pd.Series(blobs, dtype="object"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
