"""PDF simple-font encodings: base tables + the AGL glyph-name map.

Simple (non-Type0) fonts show SINGLE-BYTE codes whose meaning is set by
the font's ``/Encoding`` entry — a base encoding name
(``/WinAnsiEncoding`` | ``/MacRomanEncoding``) or a dictionary carrying
``/BaseEncoding`` plus a ``/Differences`` array that re-points
individual codes at named glyphs. Subset fonts routinely ship ONLY a
Differences array and no ``/ToUnicode`` CMap; reading their bytes as
Latin-1 (the prior fallback) silently emits wrong characters — the one
failure mode worse than quarantine. This module supplies the public
tables that decode them:

* ``base_encoding_table(name)`` — 256-slot code→str tables for
  WinAnsi (PDF 32000 Annex D.2; cp1252 plus the Annex D note that
  unused codes above 0x40 render the bullet), MacRoman (Annex D.2 —
  the Mac OS Roman layout), and Adobe StandardEncoding (Annex D.2's
  own column: ASCII with quoteright/quoteleft at 0x27/0x60 and the
  ligature/accent block at 0xA1-0xFB);
* ``glyph_to_unicode(name)`` — the Adobe Glyph List convention: an
  explicit AGL subset covering every name the three base encodings
  use, the ``uniXXXX`` / ``uXXXX[XX]`` forms, suffix stripping
  (``a.smallcap`` → ``a``), and ``gNN``/``cidNN`` rejection (those are
  glyph ids, not characters — mapping them would fabricate text).

Tables are data from the published spec (PDF 32000-1:2008 Annex D;
Adobe Glyph List 2.0), not code from any implementation. Reference
parity note: the reference plugin (LogRecordReader.java) never parses
documents; this belongs to the LLM-pipeline extension tier
(SURVEY.md §2 Tier C, document extraction).
"""

from __future__ import annotations

import re

#: Adobe StandardEncoding, the Annex D high block: code -> glyph name.
_STD_HIGH = {
    0xA1: "exclamdown", 0xA2: "cent", 0xA3: "sterling", 0xA4: "fraction",
    0xA5: "yen", 0xA6: "florin", 0xA7: "section", 0xA8: "currency",
    0xA9: "quotesingle", 0xAA: "quotedblleft", 0xAB: "guillemotleft",
    0xAC: "guilsinglleft", 0xAD: "guilsinglright", 0xAE: "fi", 0xAF: "fl",
    0xB1: "endash", 0xB2: "dagger", 0xB3: "daggerdbl",
    0xB4: "periodcentered", 0xB6: "paragraph", 0xB7: "bullet",
    0xB8: "quotesinglbase", 0xB9: "quotedblbase", 0xBA: "quotedblright",
    0xBB: "guillemotright", 0xBC: "ellipsis", 0xBD: "perthousand",
    0xBF: "questiondown", 0xC1: "grave", 0xC2: "acute", 0xC3: "circumflex",
    0xC4: "tilde", 0xC5: "macron", 0xC6: "breve", 0xC7: "dotaccent",
    0xC8: "dieresis", 0xCA: "ring", 0xCB: "cedilla", 0xCD: "hungarumlaut",
    0xCE: "ogonek", 0xCF: "caron", 0xD0: "emdash", 0xE1: "AE",
    0xE3: "ordfeminine", 0xE8: "Lslash", 0xE9: "Oslash", 0xEA: "OE",
    0xEB: "ordmasculine", 0xF1: "ae", 0xF5: "dotlessi", 0xF8: "lslash",
    0xF9: "oslash", 0xFA: "oe", 0xFB: "germandbls",
}

#: AGL 2.0 subset: every glyph name the Annex D encodings use, plus the
#: digit/punctuation names Differences arrays commonly carry. Letters
#: and digits are generated below; this dict holds the named ones.
_AGL_NAMED = {
    # ASCII punctuation
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # digits
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    # Latin-1 supplement
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·", "cedilla": "¸",
    "onesuperior": "¹", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "multiply": "×", "divide": "÷",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý", "Thorn": "Þ",
    "germandbls": "ß",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ae": "æ", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î",
    "idieresis": "ï", "eth": "ð", "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "ocircumflex": "ô",
    "otilde": "õ", "odieresis": "ö", "oslash": "ø",
    "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "thorn": "þ",
    "ydieresis": "ÿ",
    # typographic / Latin Extended (the WinAnsi 0x80-0x9F block et al.)
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ", "perthousand": "‰",
    "Scaron": "Š", "guilsinglleft": "‹", "OE": "Œ",
    "Zcaron": "Ž", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”", "bullet": "•",
    "endash": "–", "emdash": "—", "tilde": "˜",
    "trademark": "™", "scaron": "š", "guilsinglright": "›",
    "oe": "œ", "zcaron": "ž", "Ydieresis": "Ÿ",
    "fraction": "⁄", "fi": "ﬁ", "fl": "ﬂ",
    "Lslash": "Ł", "lslash": "ł", "dotlessi": "ı",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "hungarumlaut": "˝", "caron": "ˇ",
    "minus": "−", "softhyphen": "­", "sfthyphen": "­",
    "nbspace": " ", "apple": "",
    # Central-European letters Differences arrays commonly remap
    "Amacron": "Ā", "amacron": "ā", "Abreve": "Ă",
    "abreve": "ă", "Aogonek": "Ą", "aogonek": "ą",
    "Cacute": "Ć", "cacute": "ć", "Ccaron": "Č",
    "ccaron": "č", "Dcaron": "Ď", "dcaron": "ď",
    "Dcroat": "Đ", "dcroat": "đ", "Emacron": "Ē",
    "emacron": "ē", "Edotaccent": "Ė", "edotaccent": "ė",
    "Eogonek": "Ę", "eogonek": "ę", "Ecaron": "Ě",
    "ecaron": "ě", "Gbreve": "Ğ", "gbreve": "ğ",
    "Gcommaaccent": "Ģ", "gcommaaccent": "ģ",
    "Imacron": "Ī", "imacron": "ī", "Iogonek": "Į",
    "iogonek": "į", "Idotaccent": "İ",
    "Kcommaaccent": "Ķ", "kcommaaccent": "ķ",
    "Lacute": "Ĺ", "lacute": "ĺ", "Lcommaaccent": "Ļ",
    "lcommaaccent": "ļ", "Lcaron": "Ľ", "lcaron": "ľ",
    "Nacute": "Ń", "nacute": "ń", "Ncommaaccent": "Ņ",
    "ncommaaccent": "ņ", "Ncaron": "Ň", "ncaron": "ň",
    "Omacron": "Ō", "omacron": "ō", "Ohungarumlaut": "Ő",
    "ohungarumlaut": "ő", "Racute": "Ŕ", "racute": "ŕ",
    "Rcommaaccent": "Ŗ", "rcommaaccent": "ŗ",
    "Rcaron": "Ř", "rcaron": "ř", "Sacute": "Ś",
    "sacute": "ś", "Scedilla": "Ş", "scedilla": "ş",
    "Tcommaaccent": "Ţ", "tcommaaccent": "ţ",
    "Tcaron": "Ť", "tcaron": "ť", "Umacron": "Ū",
    "umacron": "ū", "Uring": "Ů", "uring": "ů",
    "Uhungarumlaut": "Ű", "uhungarumlaut": "ű",
    "Uogonek": "Ų", "uogonek": "ų", "Zacute": "Ź",
    "zacute": "ź", "Zdotaccent": "Ż", "zdotaccent": "ż",
}


def _build_agl() -> dict:
    agl = dict(_AGL_NAMED)
    for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
        agl[c] = c
    return agl


_AGL = _build_agl()

_UNI_RE = re.compile(r"^uni((?:[0-9A-F]{4})+)$")
_U_RE = re.compile(r"^u([0-9A-F]{4,6})$")
_GID_RE = re.compile(r"^(?:g|cid|G)\d+$")


def glyph_to_unicode(name: str) -> str | None:
    """AGL-convention glyph name -> text, or None when the name carries
    no character semantics (glyph-id names, unknown private names)."""
    if not name:
        return None
    got = _AGL.get(name)
    if got is not None:
        return got
    # suffixed variants: 'a.smallcap', 'fi.alt1' carry the base's text
    if "." in name:
        return glyph_to_unicode(name.split(".", 1)[0])
    m = _UNI_RE.match(name)
    if m:
        hexes = m.group(1)
        try:
            return "".join(
                chr(int(hexes[i : i + 4], 16))
                for i in range(0, len(hexes), 4)
            )
        except ValueError:
            return None
    m = _U_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else None
    if _GID_RE.match(name):
        return None  # glyph ids: mapping them would fabricate text
    return None


def _winansi_table() -> dict:
    tbl = {}
    for code in range(0x20, 0x100):
        try:
            tbl[code] = bytes([code]).decode("cp1252")
        except UnicodeDecodeError:
            # Annex D note 5: unused WinAnsi codes above 0x40 show bullet
            tbl[code] = "•"
    return tbl


def _macroman_table() -> dict:
    return {
        code: bytes([code]).decode("mac_roman") for code in range(0x20, 0x100)
    }


def _standard_table() -> dict:
    tbl = {code: chr(code) for code in range(0x20, 0x7F)}
    tbl[0x27] = "’"  # quoteright
    tbl[0x60] = "‘"  # quoteleft
    for code, name in _STD_HIGH.items():
        got = glyph_to_unicode(name)
        if got is not None:
            tbl[code] = got
    return tbl


_BASE_TABLES: dict[str, dict] = {}


def base_encoding_table(name: str) -> dict | None:
    """code -> str table for a base-encoding NAME ('WinAnsiEncoding',
    'MacRomanEncoding', 'StandardEncoding'); None when unrecognized
    (e.g. MacExpertEncoding — expert sets carry no prose)."""
    if name not in ("WinAnsiEncoding", "MacRomanEncoding", "StandardEncoding"):
        return None
    if name not in _BASE_TABLES:
        _BASE_TABLES[name] = {
            "WinAnsiEncoding": _winansi_table,
            "MacRomanEncoding": _macroman_table,
            "StandardEncoding": _standard_table,
        }[name]()
    return dict(_BASE_TABLES[name])
