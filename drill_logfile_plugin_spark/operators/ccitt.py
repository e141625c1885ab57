"""CCITT Group 3 / Group 4 fax decoding (ITU-T T.4 / T.6).

The scanned-document corpus ships almost entirely as bilevel fax-coded
rasters: TIFF compression 2 (T.4 one-dimensional Modified Huffman),
3 (T.4 with EOL framing, optionally mixed 1-D/2-D), and 4 (T.6 MMR,
pure two-dimensional), and the same codings inside PDF as the
``/CCITTFaxDecode`` stream filter. Until round 10 these were named
quarantines; this module closes them with a from-scratch decoder built
from the published ITU tables:

* the T.4 white/black run-length alphabets (64 terminating codes per
  colour, makeup codes 64..1728 per colour, extended makeup codes
  1792..2560 shared by both colours — T.4 §2 tables 2/3 and T.6 §5),
* the two-dimensional mode alphabet (V0/VR/VL to distance 3,
  horizontal, pass — T.4 table 4), decoded with the changing-elements
  algorithm over a reference line,
* EOL (``000000000001``) framing with fill tolerance, the 1-D/2-D tag
  bit of mixed G3, and the EOFB/RTC terminators.

Verification follows the repo's independent-writer discipline: the
tests carry their own spec-following ENCODER (run→code direction,
separate table literals) plus literal spot-pins of published code
words, prefix-freeness/structure checks of both alphabets, and exact
pixel recovery across 1-D/2-D × both photometrics (tests/test_ccitt.py).

Decoded output is a black-pixel mask (numpy bool, shape rows×columns);
:func:`ccitt_decode_packed` packs it MSB-first per byte-aligned row for
the TIFF/PDF integration layers, which own the photometric/BlackIs1
polarity (TIFF 6 §10-11; PDF 32000-1:2008 §7.4.6).

Reference scope: the reference plugin reads text logs
(`LogRecordReader.java:202-304`); this is LLM-pipeline extension tier
(SURVEY.md §2 Tier C), prescribed by the round-9 verdict ("Next
round" #4).
"""

from __future__ import annotations

import numpy as np

# --- T.4 run-length alphabets (code bitstring -> run length) -----------------

_WHITE_CODES = {
    # terminating, runs 0..63
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3,
    "1011": 4, "1100": 5, "1110": 6, "1111": 7,
    "10011": 8, "10100": 9, "00111": 10, "01000": 11,
    "001000": 12, "000011": 13, "110100": 14, "110101": 15,
    "101010": 16, "101011": 17, "0100111": 18, "0001100": 19,
    "0001000": 20, "0010111": 21, "0000011": 22, "0000100": 23,
    "0101000": 24, "0101011": 25, "0010011": 26, "0100100": 27,
    "0011000": 28, "00000010": 29, "00000011": 30, "00011010": 31,
    "00011011": 32, "00010010": 33, "00010011": 34, "00010100": 35,
    "00010101": 36, "00010110": 37, "00010111": 38, "00101000": 39,
    "00101001": 40, "00101010": 41, "00101011": 42, "00101100": 43,
    "00101101": 44, "00000100": 45, "00000101": 46, "00001010": 47,
    "00001011": 48, "01010010": 49, "01010011": 50, "01010100": 51,
    "01010101": 52, "00100100": 53, "00100101": 54, "01011000": 55,
    "01011001": 56, "01011010": 57, "01011011": 58, "01001010": 59,
    "01001011": 60, "00110010": 61, "00110011": 62, "00110100": 63,
    # makeup, runs 64..1728
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704, "011001101": 768,
    "011010010": 832, "011010011": 896, "011010100": 960,
    "011010101": 1024, "011010110": 1088, "011010111": 1152,
    "011011000": 1216, "011011001": 1280, "011011010": 1344,
    "011011011": 1408, "010011000": 1472, "010011001": 1536,
    "010011010": 1600, "011000": 1664, "010011011": 1728,
}

_BLACK_CODES = {
    # terminating, runs 0..63
    "0000110111": 0, "010": 1, "11": 2, "10": 3,
    "011": 4, "0011": 5, "0010": 6, "00011": 7,
    "000101": 8, "000100": 9, "0000100": 10, "0000101": 11,
    "0000111": 12, "00000100": 13, "00000111": 14, "000011000": 15,
    "0000010111": 16, "0000011000": 17, "0000001000": 18,
    "00001100111": 19, "00001101000": 20, "00001101100": 21,
    "00000110111": 22, "00000101000": 23, "00000010111": 24,
    "00000011000": 25, "000011001010": 26, "000011001011": 27,
    "000011001100": 28, "000011001101": 29, "000001101000": 30,
    "000001101001": 31, "000001101010": 32, "000001101011": 33,
    "000011010010": 34, "000011010011": 35, "000011010100": 36,
    "000011010101": 37, "000011010110": 38, "000011010111": 39,
    "000001101100": 40, "000001101101": 41, "000011011010": 42,
    "000011011011": 43, "000001010100": 44, "000001010101": 45,
    "000001010110": 46, "000001010111": 47, "000001100100": 48,
    "000001100101": 49, "000001010010": 50, "000001010011": 51,
    "000000100100": 52, "000000110111": 53, "000000111000": 54,
    "000000100111": 55, "000000101000": 56, "000001011000": 57,
    "000001011001": 58, "000000101011": 59, "000000101100": 60,
    "000001011010": 61, "000001100110": 62, "000001100111": 63,
    # makeup, runs 64..1728
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

#: extended makeup codes 1792..2560, shared by both colours (T.4 table 3b)
_EXT_CODES = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}

_EOL = "000000000001"

# (bits, value) -> run tables for fast prefix decode, per colour
def _compile(codes: dict) -> dict:
    table = {}
    for bits, run in codes.items():
        table[(len(bits), int(bits, 2))] = run
    return table


_WHITE_LUT = _compile({**_WHITE_CODES, **_EXT_CODES})
_BLACK_LUT = _compile({**_BLACK_CODES, **_EXT_CODES})
_MAX_CODE_LEN = 13

# 2-D mode alphabet (T.4 table 4): value by (length, bits)
_MODE_LUT = {
    (1, 0b1): "v0",
    (3, 0b011): "vr1",
    (3, 0b010): "vl1",
    (3, 0b001): "h",
    (4, 0b0001): "p",
    (6, 0b000011): "vr2",
    (6, 0b000010): "vl2",
    (7, 0b0000011): "vr3",
    (7, 0b0000010): "vl3",
}
_MAX_MODE_LEN = 7


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def peek(self, n: int) -> int:
        """The next n bits MSB-first, zero-padded past the end."""
        v = 0
        p = self.pos
        for _ in range(n):
            byte = self.data[p >> 3] if p < self.nbits else 0
            v = (v << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        return v

    def skip(self, n: int) -> None:
        self.pos += n

    def eof(self) -> bool:
        return self.pos >= self.nbits

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(br: _BitReader, white: bool) -> int:
    """One complete run length: zero or more makeup codes + one
    terminating code (T.4 §2.2.1.1; repeated 2560 makeups carry runs
    beyond 2623)."""
    lut = _WHITE_LUT if white else _BLACK_LUT
    total = 0
    for _ in range(64):  # bound: no legal run needs more codes
        run = None
        for n in range(2, _MAX_CODE_LEN + 1):
            run = lut.get((n, br.peek(n)))
            if run is not None:
                br.skip(n)
                break
        if run is None:
            raise ValueError(
                f"CCITT: invalid {'white' if white else 'black'} run code "
                f"at bit {br.pos}"
            )
        total += run
        if run < 64:  # terminating code ends the run
            return total
    raise ValueError("CCITT: run assembled from too many makeup codes")


def _decode_1d_row(br: _BitReader, columns: int) -> np.ndarray:
    """One Modified-Huffman row: alternating white/black runs summing
    to exactly ``columns``. Returns the black mask."""
    row = np.zeros(columns, dtype=bool)
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(br, white)
        if pos + run > columns:
            raise ValueError(
                f"CCITT: 1-D row overruns {columns} columns at {pos}+{run}"
            )
        if not white:
            row[pos : pos + run] = True
        pos += run
        white = not white
    return row


def _changes_of(row: np.ndarray) -> np.ndarray:
    """Positions where the colour changes, first change = white→black
    (rows start white by convention)."""
    padded = np.concatenate(([0], row.view(np.int8)))
    return np.flatnonzero(np.diff(padded))


def _find_b1(ref_changes: np.ndarray, a0: int, color: int, columns: int):
    """b1 = first changing element on the reference line strictly right
    of a0 whose colour is OPPOSITE a0's run colour; b2 = the next one.
    A change at even index in the change list is a transition to black."""
    # want a transition to !color: to-black (even index) if color white
    want_parity = 0 if color == 0 else 1
    idx = int(np.searchsorted(ref_changes, a0, side="right"))
    if idx % 2 != want_parity:
        idx += 1
    b1 = int(ref_changes[idx]) if idx < len(ref_changes) else columns
    b2 = int(ref_changes[idx + 1]) if idx + 1 < len(ref_changes) else columns
    return b1, b2


def _decode_2d_row(
    br: _BitReader, ref_changes: np.ndarray, columns: int
) -> np.ndarray:
    """One two-dimensional row against the reference line's changing
    elements (T.4 §2.2.4 / T.6 §5): vertical, horizontal, and pass
    modes; extension codes reject."""
    row = np.zeros(columns, dtype=bool)
    a0 = -1  # imaginary element before the row, colour white
    color = 0
    for _ in range(2 * columns + 8):
        if a0 >= columns:
            return row
        mode = None
        for n in range(1, _MAX_MODE_LEN + 1):
            mode = _MODE_LUT.get((n, br.peek(n)))
            if mode is not None:
                br.skip(n)
                break
        if mode is None:
            if br.peek(7) == 0b0000000:
                # EOL/EOFB prefix reached mid-row, or uncompressed-mode
                # extension (0000001xxx) — neither is a row body here
                raise ValueError(
                    "CCITT: 2-D row hit an EOL/extension code mid-row"
                )
            raise ValueError(f"CCITT: invalid 2-D mode code at bit {br.pos}")
        b1, b2 = _find_b1(ref_changes, a0, color, columns)
        start = max(a0, 0)
        if mode == "p":
            if color:
                row[start:b2] = True
            a0 = b2
        elif mode == "h":
            r1 = _read_run(br, white=color == 0)
            r2 = _read_run(br, white=color != 0)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > columns or a1 > columns:
                raise ValueError("CCITT: horizontal runs overrun the row")
            if color:
                row[start:a1] = True
            else:
                row[a1:a2] = True
            a0 = a2
        else:  # vertical family
            delta = {"v0": 0, "vr1": 1, "vr2": 2, "vr3": 3,
                     "vl1": -1, "vl2": -2, "vl3": -3}[mode]
            a1 = b1 + delta
            if not start <= a1 <= columns:
                raise ValueError(
                    f"CCITT: vertical mode lands at {a1} outside "
                    f"[{start}, {columns}]"
                )
            if color:
                row[start:a1] = True
            a0 = a1
            color ^= 1
    raise ValueError("CCITT: 2-D row failed to terminate")


def _skip_fill_to_eol(br: _BitReader) -> bool:
    """Consume fill zeros + one EOL if present at the cursor; True if an
    EOL was consumed. Fill may be LONG (T.4 uses it to satisfy minimum
    scan-line transmission time); the bound caps a crafted all-zeros
    stream at constant work per row attempt, far above any legal fill."""
    start = br.pos
    zeros = 0
    while zeros < 4096 and not br.eof() and br.peek(1) == 0:
        br.skip(1)
        zeros += 1
    if zeros >= 11 and not br.eof() and br.peek(1) == 1:
        br.skip(1)
        return True
    br.pos = start
    return False


def ccitt_decode(
    data: bytes,
    columns: int,
    rows: int | None = None,
    mode: str = "g4",
    byte_align: bool = False,
    require_eol: bool = True,
) -> np.ndarray:
    """Decode a CCITT-coded raster to a black-pixel mask (bool,
    rows×columns).

    ``mode``:
      * ``"g4"`` — T.6 MMR (TIFF compression 4, PDF K < 0): every row
        2-D against the previous row (imaginary all-white first
        reference); an optional EOFB terminator is consumed.
      * ``"mh"`` — bare Modified Huffman rows with no EOL framing
        (TIFF compression 2, PDF K = 0 without /EndOfLine).
      * ``"g3"`` — T.4 1-D with EOL framing (TIFF compression 3 /
        PDF K = 0 with /EndOfLine): an EOL precedes every row; RTC
        ends the image.
      * ``"g3-2d"`` — mixed T.4 (TIFF compression 3 with T4Options
        bit 0, PDF K > 0): every EOL is followed by a tag bit, 1 = the
        next row is 1-D, 0 = 2-D.

    ``rows=None`` decodes until the data (or RTC/EOFB) runs out;
    ``byte_align`` realigns to a byte boundary before each row
    (TIFF compression 2's layout; PDF /EncodedByteAlign).

    ``require_eol`` (r11): applies to ``"g3-2d"`` only. True (the
    default, and the TIFF compression-3 contract — T.4 framing is
    mandatory there) demands an EOL before every row. False matches
    PDF K > 0 with /EndOfLine false (the PDF default): EOLs are
    *tolerated* when present but not required — the per-row 1-D/2-D
    tag bit is read at the start of every row either way, which is
    the established public-decoder reading of the spec (Xpdf and
    pdf.js ``CCITTFaxStream`` read the tag bit after the optional
    EOL check on every coding line).
    """
    if columns <= 0 or columns > 1 << 16:
        raise ValueError(f"CCITT: invalid Columns {columns}")
    if rows is not None and (rows <= 0 or rows > 1 << 20):
        raise ValueError(f"CCITT: invalid Rows {rows}")
    if mode not in ("g4", "mh", "g3", "g3-2d"):
        raise ValueError(f"CCITT: unknown mode {mode!r}")
    br = _BitReader(data)
    out: list[np.ndarray] = []
    ref_changes = np.array([columns, columns], dtype=np.int64)
    max_rows = rows if rows is not None else 1 << 20
    while len(out) < max_rows:
        if byte_align:
            br.align()
        two_d = mode == "g4"
        if mode in ("g3", "g3-2d"):
            got_eol = _skip_fill_to_eol(br)
            if not got_eol and (mode == "g3" or require_eol):
                if rows is None:
                    break  # data exhausted without RTC: done
                raise ValueError(
                    f"CCITT: missing EOL before row {len(out)}"
                )
            if got_eol and _skip_fill_to_eol(br):
                break  # two EOLs in a row: RTC begins
            if mode == "g3-2d":
                if br.eof():
                    break
                two_d = br.peek(1) == 0
                br.skip(1)
        elif br.eof():
            break
        elif mode == "g4" and br.peek(24) == int(_EOL + _EOL, 2):
            break  # EOFB
        try:
            if two_d:
                row = _decode_2d_row(br, ref_changes, columns)
            else:
                row = _decode_1d_row(br, columns)
        except ValueError:
            if rows is None and out:
                break  # unframed trailing garbage after the last row
            raise
        out.append(row)
        ref_changes = np.concatenate(
            (_changes_of(row), [columns, columns])
        )
    if rows is not None and len(out) < rows:
        raise ValueError(
            f"CCITT: stream ended after {len(out)} of {rows} rows"
        )
    if not out:
        raise ValueError("CCITT: stream holds no decodable rows")
    return np.stack(out)


def ccitt_decode_packed(
    data: bytes,
    columns: int,
    rows: int | None = None,
    mode: str = "g4",
    byte_align: bool = False,
    black_bit: int = 1,
    require_eol: bool = True,
) -> bytes:
    """The packed form the TIFF/PDF layers consume: MSB-first bits per
    byte-aligned row, black pixels as ``black_bit`` (TIFF photometric 0
    and PDF /BlackIs1 true use 1; PDF default /BlackIs1 false uses 0)."""
    mask = ccitt_decode(data, columns, rows, mode, byte_align, require_eol)
    bits = mask if black_bit == 1 else ~mask
    return np.packbits(bits, axis=1).tobytes()
