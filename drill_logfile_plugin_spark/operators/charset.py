"""Charset detection + transcoding for the text ingestion lanes.

The document router and the WARC adapters historically decoded
UTF-8-only: a windows-1251 page, a Shift-JIS page, or a UTF-16-BOM
.txt (the Windows default export) either mojibaked silently or
quarantined. This module closes that path with the stdlib-feasible
subset of the WHATWG Encoding Standard's sniffing rules:

1. **BOM wins** (UTF-32 checked before UTF-16 — ``FF FE 00 00`` is a
   UTF-32-LE BOM, not a UTF-16-LE BOM followed by NULs);
2. **declared charset** (an HTTP ``Content-Type`` header parameter,
   or any caller-supplied label), alias-normalized and decoded
   STRICTLY — a declared label whose bytes don't decode under it is a
   *declared-vs-detected mismatch* and falls through the rest of the
   chain (policy pinned in tests/test_charset.py);
3. for HTML payloads, a ``<meta charset=…>`` / ``<meta http-equiv=
   "Content-Type" …>`` scan of the first 1024 bytes (the WHATWG
   prescan), also strict;
4. a BOM-less UTF-16 heuristic: ASCII-range text in UTF-16 is >=40%
   NUL bytes concentrated on one parity — the shape of a Windows
   export whose BOM was stripped in transit (checked BEFORE the UTF-8
   probe: such bytes are all < 0x80 and would pass it);
5. a strict UTF-8 probe (the old behavior, now one rung of a chain);
6. a **windows-1252 fallback** that never fails: latin-1 decode plus
   the WHATWG windows-1252 C0/C1 table (the 27 codepoints where
   cp1252 differs; the five bytes cp1252 leaves undefined map to
   their C1 controls per the standard, so no byte is ever lost).

The fallback preserves bytes 1:1, so an *undeclared* windows-1251
page still comes out as recoverable single-byte text rather than
U+FFFD soup — honest-degradation, not silent loss. Statistical
charset *guessing* (chardet-style models) is out of scope by design:
every rung above is deterministic and spec-anchored.

``decode_text`` returns ``(text, encoding, source)`` where source is
one of ``bom | declared | meta | utf-8 | utf-16-heuristic |
fallback`` — a caller that supplied a declared label and got back a
different source has observed the mismatch.

JVM side: :func:`declared_charset_expr` and :func:`decode_expr` build
the same chain as Catalyst expressions (hex-prefix BOM matching,
``regexp_extract`` for header/meta labels, a CASE of ``decode`` calls
over the canonical charset set), so the WARC adapters stay
exchange-free whole-stage-codegen maps. They require the engine
session (``configure_session`` sets ``spark.sql.legacy.javaCharsets``
and ``spark.sql.legacy.codingErrorAction`` so Spark's ``decode``
accepts the full JVM charset set with replacement semantics). One
DOCUMENTED divergence from the Python chain: JVM ``decode`` has no
strict mode, so a LYING declared label yields replacement characters
instead of falling through to the next rung — the mismatch is visible
(U+FFFD density) but not auto-recovered; rows needing the strict
fall-through route through the Python lane
(``extract_document_text(charset_col=...)``).

No reference counterpart (the reference reads log lines as
platform-default text, `LogRecordReader.java:202-232`); LLM-pipeline
extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import codecs
import re

# --- BOM table (order matters: UTF-32 prefixes collide with UTF-16) ----------

_BOMS = (
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def sniff_bom(payload: bytes):
    """``(encoding, bom_length)`` or None."""
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            return enc, len(bom)
    return None


# --- label normalization ------------------------------------------------------

#: WHATWG-ish alias map. latin-1/ascii labels mean windows-1252 on the
#: real web (the standard's rule); the rest canonicalize spelling only.
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "cp1252": "windows-1252",
    "x-sjis": "shift_jis",
    "sjis": "shift_jis",
    "shift-jis": "shift_jis",
    "ms_kanji": "shift_jis",
    "windows-31j": "shift_jis",
    "gb2312": "gbk",
    "x-gbk": "gbk",
    "csgb2312": "gbk",
    "ks_c_5601-1987": "euc-kr",
    "korean": "euc-kr",
    "windows-949": "euc-kr",
    "unicode": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "utf-32le": "utf-32-le",
    "utf-32be": "utf-32-be",
}

_LABEL_RE = re.compile(r"[^a-z0-9_.\-]+")


def normalize_charset(label) -> str | None:
    """A Python codec name for ``label``, or None if unknown/empty.
    UTF-7 is rejected (never legitimate on the web; historic sniffing
    vector)."""
    if not label:
        return None
    lab = _LABEL_RE.sub("", str(label).strip().lower())
    if not lab:
        return None
    lab = _ALIASES.get(lab, lab)
    if lab in ("utf-7", "u7", "utf7"):
        return None
    try:
        info = codecs.lookup(lab)
    except LookupError:
        return None
    # codecs.lookup("utf-16") etc. is fine; reject non-text codecs
    if info.name in ("base64", "bz2", "hex", "quopri", "uu", "zlib"):
        return None
    return lab


_CT_CHARSET_RE = re.compile(
    rb"(?i)charset\s*=\s*[\"']?\s*([A-Za-z0-9_.\-]+)"
)
_META_CHARSET_RE = re.compile(
    rb"(?i)<meta[^>]{0,256}?charset\s*=\s*[\"']?\s*([A-Za-z0-9_.\-]+)"
)


def charset_from_content_type(content_type) -> str | None:
    """The normalized charset parameter of an HTTP Content-Type value."""
    if not content_type:
        return None
    if isinstance(content_type, str):
        content_type = content_type.encode("latin-1", "replace")
    m = _CT_CHARSET_RE.search(content_type)
    return normalize_charset(m.group(1).decode("latin-1")) if m else None


def html_meta_charset(payload: bytes) -> str | None:
    """The WHATWG prescan: a ``<meta charset>`` (or http-equiv content)
    label in the first 1024 bytes, normalized."""
    m = _META_CHARSET_RE.search(payload[:1024])
    return normalize_charset(m.group(1).decode("latin-1")) if m else None


# --- the WHATWG windows-1252 fallback (never fails) ---------------------------

#: codepoint 0x80-0x9F -> windows-1252 char; the five cp1252-undefined
#: bytes (81 8D 8F 90 9D) stay their C1 controls per the standard.
_W1252_TABLE = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}


def _decode_w1252(payload: bytes) -> str:
    return payload.decode("latin-1").translate(_W1252_TABLE)


# --- the BOM-less UTF-16 heuristic --------------------------------------------


def _utf16_heuristic(payload: bytes) -> str | None:
    """utf-16-le / utf-16-be when >= 40% of bytes are NUL and they sit
    overwhelmingly on one parity (mostly-ASCII text in UTF-16); None
    otherwise. Even length and >= 8 bytes required."""
    n = len(payload)
    if n < 8 or n % 2:
        return None
    nul_even = payload[0::2].count(0)
    nul_odd = payload[1::2].count(0)
    total = nul_even + nul_odd
    if total < 0.4 * n:
        return None
    if nul_odd >= 0.9 * total:
        return "utf-16-le"
    if nul_even >= 0.9 * total:
        return "utf-16-be"
    return None


# --- the chain -----------------------------------------------------------------


def decode_text(
    payload: bytes,
    declared: str | None = None,
    html: bool = False,
) -> tuple[str, str, str]:
    """Decode ``payload`` through the detection chain (module doc).
    Returns ``(text, encoding, source)``; never raises on content —
    the windows-1252 rung decodes every byte string. A leading BOM
    character is stripped from the result."""
    bom = sniff_bom(payload)
    if bom is not None:
        enc, blen = bom
        text = payload[blen:].decode(enc, errors="replace")
        return text, enc, "bom"
    enc = normalize_charset(declared)
    if enc is not None:
        try:
            return payload.decode(enc), enc, "declared"
        except (UnicodeDecodeError, ValueError):
            pass  # declared-vs-detected mismatch: fall through
    if html:
        enc = html_meta_charset(payload)
        if enc is not None:
            try:
                return payload.decode(enc), enc, "meta"
            except (UnicodeDecodeError, ValueError):
                pass
    # Heuristic before the UTF-8 probe: ASCII text in BOM-less UTF-16 is
    # byte-wise VALID UTF-8 (every byte < 0x80), so probing first would
    # accept NUL-riddled text; no real UTF-8 document is >= 40% NULs on
    # one byte parity.
    enc = _utf16_heuristic(payload)
    if enc is not None:
        return (
            payload.decode(enc, errors="replace"),
            enc,
            "utf-16-heuristic",
        )
    try:
        return payload.decode("utf-8"), "utf-8", "utf-8"
    except UnicodeDecodeError:
        pass
    return _decode_w1252(payload), "windows-1252", "fallback"


_CONTROL_RE = re.compile(r"[\x00-\x08\x0b\x0e-\x1f\x7f]")


def is_texty(text: str, max_control_ratio: float = 0.02) -> bool:
    """The binary-junk gate for fallback-decoded payloads: text whose
    control-character ratio (excluding tab/newline/CR/form-feed)
    exceeds the bound is not a text document."""
    if not text:
        return False
    n_ctl = len(_CONTROL_RE.findall(text))
    return n_ctl <= max_control_ratio * len(text)


# --- JVM-side builders (the WARC lanes) ----------------------------------------

#: canonical label -> JVM charset name, the CASE branches of decode_expr.
#: Small by design: the charsets that carry measurable crawl share.
_JVM_CHARSETS = {
    "utf-8": "UTF-8",
    "utf-16": "UTF-16",
    "utf-16-le": "UTF-16LE",
    "utf-16-be": "UTF-16BE",
    "utf-32-le": "UTF-32LE",
    "utf-32-be": "UTF-32BE",
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251",
    "windows-1252": "windows-1252",
    "windows-1253": "windows-1253",
    "windows-1254": "windows-1254",
    "windows-1255": "windows-1255",
    "windows-1256": "windows-1256",
    "windows-1257": "windows-1257",
    "windows-1258": "windows-1258",
    "iso-8859-2": "ISO-8859-2",
    "iso-8859-5": "ISO-8859-5",
    "iso-8859-7": "ISO-8859-7",
    "iso-8859-9": "ISO-8859-9",
    "iso-8859-15": "ISO-8859-15",
    "koi8-r": "KOI8-R",
    "koi8-u": "KOI8-U",
    "shift_jis": "Shift_JIS",
    "euc-jp": "EUC-JP",
    "euc-kr": "x-windows-949",
    "gbk": "GBK",
    "gb18030": "GB18030",
    "big5": "Big5",
    "tis-620": "TIS-620",
}

#: SQL-side alias rewrites applied to the raw extracted label before the
#: CASE lookup (the Python _ALIASES entries that reach canonical form).
_JVM_ALIASES = {
    "utf8": "utf-8",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "cp1252": "windows-1252",
    "x-sjis": "shift_jis",
    "sjis": "shift_jis",
    "shift-jis": "shift_jis",
    "windows-31j": "shift_jis",
    "gb2312": "gbk",
    "x-gbk": "gbk",
    "ks_c_5601-1987": "euc-kr",
    "windows-949": "euc-kr",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def declared_charset_expr(content_type_col, body_col=None, meta=True):
    """A Catalyst expression for the detected charset label of a row:
    BOM hex-prefix match on the body, else the Content-Type header's
    charset parameter, else (when ``body_col`` is given and ``meta``)
    the HTML meta prescan over the first 1024 bytes — alias-normalized
    to the canonical labels :func:`decode_expr` switches on. Empty
    string when nothing matched (decode_expr's UTF-8 default)."""
    from pyspark.sql import functions as F

    label = F.lower(
        F.regexp_extract(
            F.coalesce(content_type_col, F.lit("")),
            r"(?i)charset\s*=\s*[\"']?\s*([A-Za-z0-9_.\-]+)",
            1,
        )
    )
    if body_col is not None and meta:
        head = F.decode(F.substring(body_col, 1, 1024), "ISO-8859-1")
        meta = F.lower(
            F.regexp_extract(
                head,
                r"(?i)<meta[^>]{0,256}?charset\s*=\s*[\"']?\s*"
                r"([A-Za-z0-9_.\-]+)",
                1,
            )
        )
        label = F.when(label != "", label).otherwise(meta)
    alias_map = F.create_map(
        *[F.lit(x) for kv in _JVM_ALIASES.items() for x in kv]
    )
    label = F.coalesce(F.element_at(alias_map, label), label)
    if body_col is not None:
        hexhead = F.hex(F.substring(body_col, 1, 4))
        label = (
            F.when(hexhead.startswith("0000FEFF"), F.lit("utf-32-be"))
            .when(hexhead.startswith("FFFE0000"), F.lit("utf-32-le"))
            # JVM UTF-16 consumes either BOM itself
            .when(hexhead.startswith("FEFF"), F.lit("utf-16"))
            .when(hexhead.startswith("FFFE"), F.lit("utf-16"))
            .when(hexhead.startswith("EFBBBF"), F.lit("utf-8"))
            .otherwise(label)
        )
    return label


def decode_expr(body_col, charset_label_col):
    """``decode(body, <charset>)`` switched per row over the canonical
    set, defaulting to UTF-8; the leading BOM character (if the label
    came from a BOM) is stripped. Requires the engine session
    (configure_session enables spark.sql.legacy.javaCharsets +
    codingErrorAction for full-charset replacement-mode decode)."""
    from pyspark.sql import functions as F

    out = F.decode(body_col, "UTF-8")
    for label, jvm in _JVM_CHARSETS.items():
        out = F.when(charset_label_col == label, F.decode(body_col, jvm)).otherwise(out)
    return F.regexp_replace(out, "^\\uFEFF", "")
