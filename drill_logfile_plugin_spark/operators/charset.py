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
6. (r11) **structural + frequency sniffing of undeclared legacy
   encodings** — Shift-JIS(cp932)/EUC-JP/EUC-KR(cp949)/GBK/Big5 and
   the single-byte scripts KOI8-R/windows-1251/iso-8859-5 (Cyrillic),
   iso-8859-7 (Greek), cp1256 (Arabic), cp874 (Thai), cp037 (EBCDIC —
   mainframe dumps, this engine's home domain): a strict decode per
   candidate is the structural lead/trail-grammar validator (the
   stdlib codecs implement the published grammars), then deterministic
   script-block + pinned frequent-character scoring picks among
   survivors (see the rung-5.5 section comment for the full design);
7. a **windows-1252 fallback** that never fails: latin-1 decode plus
   the WHATWG windows-1252 C0/C1 table (the 27 codepoints where
   cp1252 differs; the five bytes cp1252 leaves undefined map to
   their C1 controls per the standard, so no byte is ever lost).

The fallback preserves bytes 1:1, so an *undeclared* windows-1251
page still comes out as recoverable single-byte text rather than
U+FFFD soup — honest-degradation, not silent loss. Trained-model
charset *guessing* (chardet-style) remains out of scope by design:
every rung above, including the r11 sniffer, is deterministic and
anchored in the encodings' published byte grammars and published
character-frequency lists.

``decode_text`` returns ``(text, encoding, source)`` where source is
one of ``bom | declared | meta | utf-8 | utf-16-heuristic | sniffed |
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


# --- rung 5.5: structural sniffing of undeclared legacy encodings (r11) -------
#
# An UNDECLARED Shift-JIS/GBK/EUC-KR/Big5/EUC-JP page, or a KOI8-R /
# windows-1251 Cyrillic page, previously fell to the windows-1252
# byte-preserving fallback: recoverable bytes, mojibake text. The
# sniffer below is deterministic and spec-anchored, not a chardet-style
# trained model:
#
#   1. STRUCTURAL VALIDATION — a strict decode under each candidate
#      codec. The stdlib codecs implement the encodings' published
#      lead/trail byte grammars exactly, so a strict decode succeeding
#      IS the structural validator (Shift-JIS leads 81-9F/E0-FC with
#      their trail ranges, EUC lead/trail A1-FE, Big5 trails
#      40-7E/A1-FE, ...). Candidates whose grammar the bytes violate
#      drop out here.
#   2. FREQUENCY SCORING — several encodings often accept the same
#      bytes (GBK's grammar covers most high-byte pairs), so survivors
#      are scored on where the DECODED characters land: the home
#      script block of the encoding's language, weighted by membership
#      in a small pinned set of the language's most frequent
#      characters (top hanzi from published modern-Chinese frequency
#      lists, top hangul syllables, kana, Russian letter frequencies).
#      A wrong decode is a substitution cipher: its output lands on
#      essentially random code points that hit the frequent sets at
#      the chance rate, while the right decode hits them at natural-
#      text rates — a wide, deterministic margin.
#
# KOI8-R vs windows-1251 (both decode every byte to mostly-Cyrillic)
# separate by case statistics: the two layouts SWAP the upper/lower
# halves (1251 lowercase 0xE0-0xFF is KOI8-R uppercase), so scoring
# uppercase letters at a quarter weight makes the wrong candidate's
# all-caps output lose. Single-byte Cyrillic claims are additionally
# gated on a high-byte-heavy letter mix (>= 25%): accented Latin text
# (a few percent high bytes) can never claim Cyrillic, while real
# Russian text is high-byte-dominated.
#
# The first r11 cut documented a Greek boundary (iso-8859-7 letters
# alias into cp1251's letter range); it is closed the prescribed way —
# iso-8859-7 is a candidate with its own Greek unigram table, and
# iso-8859-5 covers the third Cyrillic layout. The same recipe extends
# to further single-byte scripts: add (codec, frequency table) to
# _SB_CANDIDATES; never loosen the gates.

_SNIFF_SAMPLE = 65536

#: frequent CJK ideographs: the union of top simplified hanzi (Jun Da's
#: modern-Chinese corpus list), their traditional forms, and common
#: Japanese kanji — shared across candidates (discrimination comes from
#: the decode MAPPING: a wrong decode hits this set only by chance).
_FREQ_HANZI = frozenset(
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得"
    "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日"
    "于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同"
    "三已老从动两长知民样现分将外但身些与高意进把法此实回二理美点月"
    "明其种声全工己话儿者向情部正名定女问力机给等几很业最间新什打便"
    "位因重被走电四第门相次东政海口使教西再平真听世期"
    "這個們來說時為後裡學對會沒發經頭見長樣現將與問間東兩點讓國務員"
    "動機關於過還開無業華實體質歷險應當壓縮證據讀寫講買賣錢銀鐵馬車"
    "書廣統傳遠近親愛覺觀歸舊勢單雙總聲臺灣"
    "私本日年月時分間人大学生中国社会事物語気電車駅新聞雨空山川田町"
)

#: frequent hangul syllables (top of published modern-Korean syllable
#: frequency lists); a wrong decode lands uniformly over ~2350
#: syllables and hits these at ~2%, real Korean text at ~50%.
_FREQ_HANGUL = frozenset(
    "이다의는에하고지서기를은가을로한것수있사니아대어인스트년요그리"
    "시만적문자제주우와전해정상소부중심개국생성연비학교경제도무엇때"
    "까함나습니었면으원회용라공장동보통신"
)

#: Russian letter frequencies, per-mille (published counts, rounded).
_RU_FREQ = {
    "о": 110, "е": 85, "а": 80, "и": 74, "н": 67, "т": 63, "с": 55,
    "р": 47, "в": 45, "л": 44, "к": 35, "м": 32, "д": 30, "п": 28,
    "у": 26, "я": 20, "ы": 19, "ь": 17, "г": 17, "з": 16, "б": 16,
    "ч": 14, "й": 12, "х": 9, "ж": 9, "ш": 7, "ю": 6, "ц": 5,
    "щ": 4, "э": 3, "ф": 2, "ё": 2, "ъ": 1,
}

#: Modern-Greek letter frequencies, per-mille (published counts,
#: rounded; final sigma listed separately — it is its own code point).
_EL_FREQ = {
    "α": 120, "ο": 95, "ι": 89, "ε": 84, "τ": 80, "σ": 45, "ν": 63,
    "η": 57, "υ": 43, "ρ": 43, "π": 40, "κ": 40, "μ": 36, "λ": 34,
    "ω": 25, "δ": 21, "γ": 19, "ς": 35, "χ": 14, "θ": 13, "φ": 11,
    "β": 7, "ξ": 5, "ζ": 4, "ψ": 1,
    # accented vowels are everyday Greek orthography, not edge cases
    "ά": 35, "ό": 30, "ί": 28, "έ": 25, "ή": 20, "ύ": 12, "ώ": 12,
}

#: Modern-Standard-Arabic letter frequencies, per-mille (published
#: counts, rounded; hamza/alef variants listed — they are their own
#: code points). Arabic has no case, so the orientation machinery in
#: :func:`_sb_stats` reduces to a plain weighted sum.
_AR_FREQ = {
    "ا": 120, "ل": 95, "ي": 70, "م": 60, "و": 58, "ن": 55, "ر": 45,
    "ت": 42, "ب": 40, "ة": 35, "ع": 32, "أ": 30, "د": 30, "س": 28,
    "ف": 25, "ه": 25, "ق": 22, "ك": 20, "ح": 18, "إ": 15, "ج": 15,
    "ى": 10, "ص": 10, "خ": 10, "ش": 10, "ذ": 8, "ط": 8, "ض": 6,
    "ء": 5, "غ": 5, "ث": 5, "ز": 5, "آ": 3, "ظ": 2,
}

#: Thai character frequencies, per-mille (published counts, rounded;
#: vowel signs and tone marks ARE separate code points and carry real
#: mass in running text). Caseless like Arabic.
_TH_FREQ = {
    "า": 90, "น": 70, "ร": 60, "อ": 55, "่": 50, "ก": 50, "เ": 48,
    "ี": 45, "ง": 40, "้": 40, "ม": 38, "ย": 35, "ั": 35, "ล": 30,
    "ว": 30, "ส": 28, "ด": 25, "ท": 25, "บ": 22, "ต": 22, "ห": 20,
    "ป": 18, "ุ": 18, "ื": 15, "จ": 15, "ไ": 15, "ค": 15, "ช": 12,
    "ข": 10, "ใ": 10, "ำ": 10, "ถ": 8, "โ": 8, "พ": 12, "แ": 12,
    "ะ": 15, "ิ": 25, "ู": 12, "็": 10, "๊": 2, "ๆ": 3, "ฯ": 1,
    "ผ": 5, "ฝ": 2, "ภ": 4, "ศ": 5, "ษ": 4, "ซ": 5, "ญ": 4, "ธ": 4,
    "ณ": 4, "ฐ": 2, "ฬ": 1, "ฮ": 1, "ฎ": 1, "ฏ": 1, "๋": 1, "ฉ": 2,
}

#: English letter frequencies, per-mille — the scoring table for the
#: EBCDIC candidate (cp037 decodes its HIGH-byte letters to ASCII, so
#: the source-byte rule in :func:`_sb_stats` is what lets this work).
_EN_FREQ = {
    "e": 127, "t": 91, "a": 82, "o": 75, "i": 70, "n": 67, "s": 63,
    "h": 61, "r": 60, "d": 43, "l": 40, "u": 28, "c": 28, "m": 24,
    "w": 24, "f": 22, "g": 20, "y": 20, "p": 19, "b": 15, "v": 10,
    "k": 8, "j": 2, "x": 2, "q": 1, "z": 1,
}

#: deterministic priority: first-listed wins score ties.
_MB_CANDIDATES = ("cp932", "euc_jp", "cp949", "gbk", "big5")
#: single-byte candidates: (codec, unigram table). iso-8859-5 is the
#: THIRD Cyrillic layout in the wild; iso-8859-7 closes the Greek
#: boundary the r11 first cut documented (Greek letters alias into
#: cp1251's letter range, so without a Greek candidate a Greek page
#: could sniff as Cyrillic — now Greek text outscores the alias);
#: cp1256 (Arabic) and cp874 (Thai) extend the recipe to the two most
#: common remaining legacy single-byte scripts. NOT candidates, by
#: design: Latin-script legacy pages (iso-8859-9 Turkish etc.) never
#: pass the high-byte ratio gate — their bytes fall to the
#: byte-preserving cp1252 rung, which differs from their true layout
#: in only a handful of positions (recoverable, documented).
_SB_CANDIDATES = (
    ("cp1251", _RU_FREQ),
    ("koi8_r", _RU_FREQ),
    ("iso8859_5", _RU_FREQ),
    ("iso8859_7", _EL_FREQ),
    ("cp1256", _AR_FREQ),
    ("cp874", _TH_FREQ),
    # EBCDIC (r11): mainframe log/text dumps — squarely this engine's
    # home domain. Letters live at 0x81-0xA9/0xC1-0xE9, space is 0x40,
    # digits F0-F9: English EBCDIC text is high-byte-DOMINATED and its
    # cp037 decode scores the English table at natural-text rates,
    # while random high bytes land mostly on EBCDIC punctuation
    # (penalized) — measured ~65‰ correct vs < 5‰ junk.
    ("cp037", _EN_FREQ),
)


def _cjk_stats(text: str) -> tuple[float, int, int]:
    """(avg weight per non-ASCII char, n non-ASCII, distinctive hits).
    Distinctive = kana or a frequent-set ideograph/syllable — evidence
    a wrong decode produces only at the chance rate."""
    score = 0
    n = 0
    distinctive = 0
    for ch in text:
        cp = ord(ch)
        if cp < 0x80:
            continue
        n += 1
        if 0x3041 <= cp <= 0x30FF:  # hiragana + katakana
            score += 60
            distinctive += 1
        elif 0xAC00 <= cp <= 0xD7A3:  # hangul syllables
            if ch in _FREQ_HANGUL:
                score += 60
                distinctive += 1
            else:
                score += 25
        elif 0x4E00 <= cp <= 0x9FFF:  # CJK unified
            if ch in _FREQ_HANZI:
                score += 55
                distinctive += 1
            else:
                score += 25
        elif 0x3000 <= cp <= 0x303F or 0xFF01 <= cp <= 0xFF60:
            score += 20  # CJK punctuation / fullwidth forms
        elif 0xFF61 <= cp <= 0xFF9F:
            score += 20  # halfwidth katakana: NOT distinctive (Big5
            # leads alias into cp932's single-byte kana range)
        elif 0x3400 <= cp <= 0x4DBF:
            score += 5  # ext A: rare in genuine modern text
        elif 0xE000 <= cp <= 0xF8FF or 0x80 <= cp <= 0x9F:
            score -= 80  # PUA / C1: decode junk
        else:
            score -= 10
    return (score / n if n else 0.0), n, distinctive


def _sb_stats(sample: bytes, text: str, freq: dict) -> tuple[float, int]:
    """(avg weight per high-SOURCE-byte char, n such chars) under a
    language's unigram table. Membership is decided by the SOURCE byte
    (single-byte codecs decode 1:1, so ``zip(sample, text)`` aligns):
    for the non-Latin scripts this is identical to filtering on
    non-ASCII decoded chars, but EBCDIC (r11) decodes its high-byte
    letters TO ASCII — scoring by source byte lets the English table
    see them. Natural text is predominantly ONE case, so the
    score is the better of two orientations (lowercase-dominant /
    uppercase-dominant: the dominant case at full weight, the other at
    a quarter). The KOI8-R/1251 layouts swap the case halves, so the
    wrong candidate's output is case-flipped — its frequency weights
    then belong to a substitution cipher's letters, measured ~38‰ vs
    ~54‰ for the right decode on the same bytes (and ~19‰ for random
    letters), a stable deterministic margin for BOTH lowercase and
    ALL-CAPS source text. The same comparison separates the Greek and
    Cyrillic tables: a Greek page decoded as cp1251 lands on Cyrillic
    letters whose Russian frequencies misalign with the Greek source
    distribution, while the iso-8859-7 decode scores the Greek table
    at natural-text rates."""
    s_lower = 0.0
    s_upper = 0.0
    n = 0
    for b, ch in zip(sample, text):
        if b < 0x80:
            continue
        n += 1
        w = freq.get(ch)
        if w is not None:  # lowercase letter
            s_lower += w
            s_upper += w / 4
            continue
        w = freq.get(ch.lower())
        if w is not None:  # uppercase letter
            s_lower += w / 4
            s_upper += w
        else:
            s_lower -= 20
            s_upper -= 20
    score = max(s_lower, s_upper)
    return (score / n if n else 0.0), n


def sniff_legacy(payload: bytes) -> str | None:
    """The best-scoring legacy-candidate codec name for ``payload``, or
    None when no candidate passes its gates (then the caller falls to
    the byte-preserving windows-1252 rung as before). Detection runs on
    a bounded head sample; the caller re-decodes the full payload."""
    sample = payload[:_SNIFF_SAMPLE]
    if len(sample) < len(payload):
        sample = sample[:-4]  # never split a multibyte char at the cut
    n_high = sum(1 for b in sample if b >= 0x80)
    if n_high < 4:
        return None
    best = None
    best_score = 0.0
    for codec in _MB_CANDIDATES:
        try:
            text = sample.decode(codec)
        except (UnicodeDecodeError, ValueError):
            continue
        score, n, distinctive = _cjk_stats(text)
        if (
            n >= 4
            and distinctive >= max(2, 0.05 * n)
            and score >= 30
            and score > best_score
        ):
            best, best_score = codec, score
    ascii_letters = sum(
        1 for b in sample if 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A
    )
    # Cyrillic gates: real Russian text is HIGH-BYTE-DOMINATED (every
    # letter is a high byte; >= 0.6 in practice, ~0.5 with HTML markup)
    # and uses a wide letter inventory, while accented Latin text has a
    # few percent high bytes clustered on a handful of code points that
    # can alias into frequent Cyrillic letters — the 0.4 ratio and the
    # >= 8 distinct-high-bytes gates keep it out deterministically.
    if (
        n_high / (n_high + ascii_letters) >= 0.4
        and len({b for b in sample if b >= 0x80}) >= 8
    ):
        for codec, freq in _SB_CANDIDATES:
            try:
                text = sample.decode(codec)
            except (UnicodeDecodeError, ValueError):
                continue
            score, n = _sb_stats(sample, text, freq)
            if n >= 4 and score >= 35 and score > best_score:
                best, best_score = codec, score
    return best


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
    # rung 5.5 (r11): structural + frequency sniffing of undeclared
    # legacy CJK/Cyrillic pages — the full payload re-decodes STRICTLY
    # (the sniffer saw a bounded head sample; a tail the grammar
    # rejects falls through to the byte-preserving rung).
    enc = sniff_legacy(payload)
    if enc is not None:
        try:
            return payload.decode(enc), enc, "sniffed"
        except (UnicodeDecodeError, ValueError):
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


#: route-to-Python threshold for :func:`decode_suspect_expr`: 1% of
#: characters replaced. Real text under its right charset produces
#: essentially zero U+FFFD (the odd corrupt byte); a LYING declared
#: label (cp1251 bytes decoded as UTF-8, say) replaces a large share of
#: every multi-byte-looking run. 0.01 sits orders of magnitude from
#: both populations (policy pinned in tests/test_charset_sniff.py).
FFFD_SUSPECT_THRESHOLD = 0.01


def fffd_density_expr(text_col):
    """Scan-fused U+FFFD density of a decoded text column: replaced
    chars / total chars (0.0 for empty). Pure JVM expressions — no
    shuffle, no Python — so the WARC lanes can carry the decode-audit
    column at scan speed.

    This is the machine-actionable form of the documented JVM-lane
    divergence (module docstring): JVM ``decode`` has no strict mode,
    so a lying declared label yields replacement characters instead of
    falling through the chain the way the Python lane does. The
    density makes that visible as a number a pipeline can route on."""
    from pyspark.sql import functions as F

    n = F.length(text_col)
    replaced = n - F.length(F.replace(text_col, F.lit("�"), F.lit("")))
    return (
        replaced.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    )


def decode_suspect_expr(text_col, threshold: float = FFFD_SUSPECT_THRESHOLD):
    """Boolean: this JVM-decoded row needs the Python strict chain
    (``extract_document_text(charset_col=...)`` / :func:`decode_text`)
    — its replacement-character density crosses ``threshold``."""
    from pyspark.sql import functions as F

    return fffd_density_expr(text_col) >= F.lit(float(threshold))
