"""Pure-Python Zstandard DECODER from RFC 8878.

Why: ``.jsonl.zst`` / ``.tar.zst`` / ``.warc.zst`` is the shipping
format of the modern public corpora (The Pile, RedPajama, Dolma,
Common Crawl's newer drops), and this environment has neither the
stdlib ``compression.zstd`` (Python >= 3.14) nor the ``zstandard``
package — until now every zstd lane was an import-guarded named
absence whose live tests auto-skip. This module closes that gap the
way the repo closed CCITT/LZ4/snappy: implemented from the published
specification (RFC 8878), pinned against an independent in-test
ENCODER that exercises every entropy path (raw/RLE blocks, raw/RLE
literals, direct- and FSE-described Huffman trees, 1- and 4-stream
literals, predefined/RLE/FSE/repeat sequence table modes, repeat
offsets), plus the xxHash64 content checksum verified end to end.

Scope, stated plainly:

* Frames: standard frames (header descriptor, window descriptor,
  frame content size, content checksum VERIFIED when present),
  skippable frames, concatenated frames. DICTIONARY frames decode
  too (RFC 8878 §5: entropy tables + initial repeat offsets +
  content window) — pass a :class:`ZstdDict`, or use the Common
  Crawl ``.warc.zst`` convention of a ``0x184D2A5D`` skippable frame
  carrying the (optionally zstd-compressed) dictionary in-stream. A
  frame naming an unavailable Dictionary_ID is a ValueError naming
  the id — never silent wrong output.
* Blocks: Raw, RLE, Compressed, with the 128 KiB block bound and the
  caller's total-output cap enforced during, not after, decode.
* Entropy: full FSE (table description with the low-probability and
  zero-repeat encodings, interleaved-state bitstreams) and Huffman
  (canonical weight construction incl. the implied last weight,
  FSE-compressed weight descriptions, 4-stream jump table), the
  three predefined sequence-code tables and the published
  baseline/extra-bit tables, repeat-offset history with the
  literals_length==0 special case.

Performance posture: this is the CORRECTNESS/portability fallback —
roughly (single-digit) MB/s per core, fine for tests, fixtures and
modest sidecar files. When a native module exists it is ALWAYS
preferred (``multimodal._zstd_module`` probes for it first); at
100 TB the native path is the only sane one and this module's role
is to keep the format from being a hard absence on hosts without it.

The decoder is liberal exactly where real decoders are (trailing
unread bits in entropy streams are legal padding) and strict where
the spec is (reserved bits/block types, oversized table
descriptions, offset 0, checksum mismatches are all ValueError).
"""

from __future__ import annotations

_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 — the frame content checksum primitive (low 32 bits
    stored). Pinned against the published check values in tests."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i <= n - 32:
            v1 = _round64(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round64(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round64(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round64(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round64(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = ((_rotl64(h ^ _round64(0, lane), 27) * _P64_1) + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl64(h ^ (lane * _P64_1) & _M64, 23) * _P64_2) + _P64_3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ (data[i] * _P64_5) & _M64, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ----------------------------------------------------------- bit readers

class _FwdBits:
    """Forward bit reader, LSB-first within each byte (FSE table
    descriptions are read this way)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        out = 0
        for k in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ValueError("zstd: FSE description overruns its area")
            bit = (self.data[byte] >> (self.bitpos & 7)) & 1
            out |= bit << k
            self.bitpos += 1
        return out

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) >> 3


class _BackBits:
    """Backward bit reader: bits were written LSB-first; the last
    byte's highest set bit is the padding marker; reads proceed from
    just below the marker downward. Reading past the end zero-fills
    (legal padding slack for the fixed-count consumers; the
    FSE-weights consumer uses ``pos`` to detect exhaustion)."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: entropy stream lacks its marker bit")
        self.val = int.from_bytes(data, "little")
        self.pos = self.val.bit_length() - 1  # bits below the marker

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        out = (self.val << -self.pos) & ((1 << n) - 1)
        return out


# ------------------------------------------------------------------ FSE

def fse_build_table(probs: list[int], accuracy_log: int):
    """(symbol, nbits, baseline) arrays for one FSE decode table
    (RFC 8878 §4.1): -1 entries are the low-probability symbols that
    take one high cell each; positive counts spread with the
    (T/2 + T/8 + 3) step."""
    size = 1 << accuracy_log
    sym = [0] * size
    high = size - 1
    counts = list(probs)
    for s, p in enumerate(counts):
        if p == -1:
            sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(counts):
        if p <= 0:
            continue
        for _ in range(p):
            sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    nxt = [1 if p == -1 else p for p in counts]
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = sym[i]
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return sym, nbits, base


def fse_read_distribution(data: bytes, max_symbol: int):
    """(probs, accuracy_log, bytes_consumed) from a table description
    (the FSE_readNCount algorithm)."""
    br = _FwdBits(data)
    accuracy_log = br.read(4) + 5
    if accuracy_log > 9:
        raise ValueError(f"zstd: FSE accuracy log {accuracy_log} > 9")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nb_bits = accuracy_log + 1
    probs: list[int] = []
    prev0 = False
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ValueError("zstd: FSE description exceeds symbol bound")
        if prev0:
            rep = br.read(2)
            probs.extend([0] * rep)
            if rep == 3:
                continue
            prev0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        low = br.read(nb_bits - 1)
        if low < maxv:
            count = low
        else:
            top = br.read(1)
            v = low | (top << (nb_bits - 1))
            if v >= threshold:
                v -= maxv
            count = v
        count -= 1  # shifted: 0 encodes the -1 low-probability form
        remaining -= -count if count < 0 else count
        probs.append(count)
        prev0 = count == 0
        while remaining < threshold and remaining > 1:
            threshold >>= 1
            nb_bits -= 1
    if remaining != 1:
        raise ValueError("zstd: FSE distribution does not sum to table size")
    return probs, accuracy_log, br.bytes_consumed()


def _fse_decode_interleaved(table, accuracy_log: int, stream: bytes,
                            max_out: int) -> list[int]:
    """Two-state interleaved FSE decode (the Huffman-weights stream):
    symbols emitted until the bitstream is exhausted."""
    sym, nbits, base = table
    br = _BackBits(stream)
    s1 = br.read(accuracy_log)
    s2 = br.read(accuracy_log)
    if br.pos < 0:
        raise ValueError("zstd: weight stream shorter than its states")
    out: list[int] = []
    while True:
        out.append(sym[s1])
        if len(out) > max_out:
            raise ValueError("zstd: weight stream exceeds the bound")
        if br.pos - nbits[s1] < 0:
            out.append(sym[s2])
            break
        s1 = base[s1] + br.read(nbits[s1])
        s1, s2 = s2, s1
    if len(out) > max_out:
        raise ValueError("zstd: weight stream exceeds the bound")
    return out


# -------------------------------------------------------------- Huffman

class _Huff:
    """Canonical Huffman decode table from weights (RFC 8878 §4.2.1):
    symbols sorted by weight then index fill 2^(w-1) consecutive cells
    from position 0; peek max_bits, consume (max_bits + 1 - w)."""

    __slots__ = ("max_bits", "cells")

    def __init__(self, weights: list[int]):
        total = sum(1 << (w - 1) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: Huffman tree has no symbols")
        self.max_bits = total.bit_length() - 1
        if (1 << self.max_bits) != total:
            raise ValueError("zstd: Huffman weights do not sum to a power of 2")
        if self.max_bits > 11:
            raise ValueError("zstd: Huffman max bits exceeds 11")
        size = 1 << self.max_bits
        cells = [None] * size
        pos = 0
        for w in range(1, self.max_bits + 1):
            for s, ws in enumerate(weights):
                if ws != w:
                    continue
                n = 1 << (w - 1)
                nb = self.max_bits + 1 - w
                for k in range(pos, pos + n):
                    cells[k] = (s, nb)
                pos += n
        if pos != size:
            raise ValueError("zstd: Huffman table underfilled")
        self.cells = cells

    def decode_stream(self, stream: bytes, count: int) -> bytes:
        br = _BackBits(stream)
        out = bytearray()
        mb = self.max_bits
        # peek-with-zero-fill: read then "push back" via local tracking
        val, pos = br.val, br.pos
        for _ in range(count):
            if pos >= mb:
                code = (val >> (pos - mb)) & ((1 << mb) - 1)
            else:
                code = (val << (mb - pos)) & ((1 << mb) - 1) if pos > 0 else 0
            s, nb = self.cells[code]
            out.append(s)
            pos -= nb
            if pos < -mb:
                raise ValueError("zstd: Huffman stream exhausted early")
        return bytes(out)


def _read_huffman(data: bytes) -> tuple[_Huff, int]:
    """(table, bytes consumed) from a Huffman tree description."""
    if not data:
        raise ValueError("zstd: empty Huffman description")
    head = data[0]
    if head >= 128:  # direct 4-bit weights
        n = head - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(data):
            raise ValueError("zstd: direct weights truncated")
        weights = []
        for i in range(n):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        consumed = 1 + nbytes
    else:  # FSE-compressed weights
        if 1 + head > len(data):
            raise ValueError("zstd: FSE weight area truncated")
        area = data[1 : 1 + head]
        probs, al, used = fse_read_distribution(area, 255)
        if al > 6:
            raise ValueError("zstd: weight FSE accuracy log > 6")
        table = fse_build_table(probs, al)
        weights = _fse_decode_interleaved(
            table, al, area[used:], max_out=255
        )
        consumed = 1 + head
    # the LAST weight is implied: it completes the next power of two
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: Huffman weights all zero")
    target = 1 << total.bit_length()
    rest = target - total
    if rest & (rest - 1):
        raise ValueError("zstd: implied Huffman weight impossible")
    weights.append(rest.bit_length())
    return _Huff(weights), consumed


# --------------------------------------------------- sequence code tables

def _ll_code(code: int) -> tuple[int, int]:
    """(baseline, extra bits) for a literals-length code."""
    if code < 16:
        return code, 0
    table = [
        (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
        (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
        (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
        (32768, 15), (65536, 16),
    ]
    if code - 16 >= len(table):
        raise ValueError(f"zstd: literals-length code {code} invalid")
    return table[code - 16]


def _ml_code(code: int) -> tuple[int, int]:
    if code < 32:
        return code + 3, 0
    table = [
        (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
        (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8),
        (515, 9), (1027, 10), (2051, 11), (4099, 12), (8195, 13),
        (16387, 14), (32771, 15), (65539, 16),
    ]
    if code - 32 >= len(table):
        raise ValueError(f"zstd: match-length code {code} invalid")
    return table[code - 32]


#: predefined distributions (RFC 8878 §3.1.1.3.2.2) + accuracy logs
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

_MAX_AL = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}


def _seq_table(mode: int, which: str, data: bytes, pos: int, ctx: dict):
    """Resolve one of the three sequence tables per its 2-bit mode;
    returns (table, accuracy_log, new_pos). ``ctx`` carries the
    previous tables for Repeat mode."""
    key = f"tbl_{which}"
    if mode == 0:  # predefined
        probs, al = _DEFAULTS[which]
        tbl = fse_build_table(probs, al)
        ctx[key] = (tbl, al)
        return tbl, al, pos
    if mode == 1:  # RLE: one byte, a single-symbol "table"
        if pos >= len(data):
            raise ValueError("zstd: RLE sequence symbol truncated")
        s = data[pos]
        if s > _MAX_SYM[which]:
            raise ValueError(f"zstd: RLE {which} symbol {s} out of range")
        tbl = ([s], [0], [0])  # state 0 forever, 0 update bits
        ctx[key] = (tbl, 0)
        return tbl, 0, pos + 1
    if mode == 2:  # FSE-described
        probs, al, used = fse_read_distribution(
            data[pos:], _MAX_SYM[which]
        )
        if al > _MAX_AL[which]:
            raise ValueError(
                f"zstd: {which} accuracy log {al} exceeds its bound"
            )
        tbl = fse_build_table(probs, al)
        ctx[key] = (tbl, al)
        return tbl, al, pos + used
    if key not in ctx:  # mode 3: repeat
        raise ValueError(f"zstd: {which} Repeat mode with no prior table")
    tbl, al = ctx[key]
    return tbl, al, pos


# ------------------------------------------------------- block decoding

_BLOCK_MAX = 128 << 10


def _decode_literals(data: bytes, ctx: dict) -> tuple[bytes, int]:
    """(literals, bytes consumed) for a compressed block's literals
    section."""
    if not data:
        raise ValueError("zstd: empty literals section")
    b0 = data[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif sf == 1:
            if len(data) < 2:
                raise ValueError("zstd: literals header truncated")
            regen = (b0 >> 4) | (data[1] << 4)
            hdr = 2
        else:
            if len(data) < 3:
                raise ValueError("zstd: literals header truncated")
            regen = (b0 >> 4) | (data[1] << 4) | (data[2] << 12)
            hdr = 3
        if regen > _BLOCK_MAX:
            raise ValueError("zstd: literals size exceeds the block bound")
        if ltype == 0:
            if hdr + regen > len(data):
                raise ValueError("zstd: raw literals truncated")
            return data[hdr : hdr + regen], hdr + regen
        if hdr >= len(data):
            raise ValueError("zstd: RLE literal byte missing")
        return bytes([data[hdr]]) * regen, hdr + 1
    # Compressed (2) / Treeless (3)
    if sf == 0:
        streams, hdr = 1, 3
        if len(data) < 3:
            raise ValueError("zstd: literals header truncated")
        bits = b0 | (data[1] << 8) | (data[2] << 16)
        regen = (bits >> 4) & 0x3FF
        comp = (bits >> 14) & 0x3FF
    elif sf == 1:
        streams, hdr = 4, 3
        bits = int.from_bytes(data[:3], "little")
        regen = (bits >> 4) & 0x3FF
        comp = (bits >> 14) & 0x3FF
    elif sf == 2:
        streams, hdr = 4, 4
        if len(data) < 4:
            raise ValueError("zstd: literals header truncated")
        bits = int.from_bytes(data[:4], "little")
        regen = (bits >> 4) & 0x3FFF
        comp = (bits >> 18) & 0x3FFF
    else:
        streams, hdr = 4, 5
        if len(data) < 5:
            raise ValueError("zstd: literals header truncated")
        bits = int.from_bytes(data[:5], "little")
        regen = (bits >> 4) & 0x3FFFF
        comp = (bits >> 22) & 0x3FFFF
    if regen > _BLOCK_MAX:
        raise ValueError("zstd: literals size exceeds the block bound")
    if hdr + comp > len(data):
        raise ValueError("zstd: compressed literals truncated")
    area = data[hdr : hdr + comp]
    if ltype == 2:
        huff, used = _read_huffman(area)
        ctx["huff"] = huff
        area = area[used:]
    else:
        huff = ctx.get("huff")
        if huff is None:
            raise ValueError("zstd: Treeless literals with no prior tree")
    if streams == 1:
        return huff.decode_stream(area, regen), hdr + comp
    if len(area) < 6:
        raise ValueError("zstd: 4-stream jump table truncated")
    s1 = int.from_bytes(area[0:2], "little")
    s2 = int.from_bytes(area[2:4], "little")
    s3 = int.from_bytes(area[4:6], "little")
    body = area[6:]
    if s1 + s2 + s3 > len(body):
        raise ValueError("zstd: 4-stream sizes exceed the area")
    part = (regen + 3) // 4
    sizes = [part, part, part, regen - 3 * part]
    if sizes[3] < 0:
        raise ValueError("zstd: negative fourth-stream size")
    chunks = [
        body[:s1],
        body[s1 : s1 + s2],
        body[s1 + s2 : s1 + s2 + s3],
        body[s1 + s2 + s3 :],
    ]
    out = bytearray()
    for chunk, want in zip(chunks, sizes):
        out += huff.decode_stream(chunk, want)
    return bytes(out), hdr + comp


def _decode_block(data: bytes, out: bytearray, frame_start: int,
                  ctx: dict, max_bytes: int) -> None:
    literals, used = _decode_literals(data, ctx)
    pos = used
    if pos >= len(data):
        raise ValueError("zstd: sequences header missing")
    b0 = data[pos]
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        if pos + 2 > len(data):
            raise ValueError("zstd: sequence count truncated")
        n_seq = ((b0 - 128) << 8) + data[pos + 1]
        pos += 2
    else:
        if pos + 3 > len(data):
            raise ValueError("zstd: sequence count truncated")
        n_seq = data[pos + 1] + (data[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        if len(out) - frame_start + len(literals) > max_bytes or \
                len(out) + len(literals) > max_bytes:
            raise ValueError("zstd output exceeds the bound")
        out += literals
        return
    if pos >= len(data):
        raise ValueError("zstd: compression modes byte missing")
    modes = data[pos]
    pos += 1
    if modes & 0x3:
        raise ValueError("zstd: reserved compression-mode bits set")
    ll_tbl, ll_al, pos = _seq_table((modes >> 6) & 3, "ll", data, pos, ctx)
    of_tbl, of_al, pos = _seq_table((modes >> 4) & 3, "of", data, pos, ctx)
    ml_tbl, ml_al, pos = _seq_table((modes >> 2) & 3, "ml", data, pos, ctx)
    br = _BackBits(data[pos:])
    ll_state = br.read(ll_al)
    of_state = br.read(of_al)
    ml_state = br.read(ml_al)
    if br.pos < 0:
        raise ValueError("zstd: sequence bitstream shorter than its states")
    lit_pos = 0
    reps = ctx["reps"]
    for s in range(n_seq):
        of_code = of_tbl[0][of_state]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_value = (1 << of_code) + br.read(of_code)
        ml_base, ml_extra = _ml_code(ml_tbl[0][ml_state])
        match_len = ml_base + br.read(ml_extra)
        ll_base, ll_extra = _ll_code(ll_tbl[0][ll_state])
        lit_len = ll_base + br.read(ll_extra)
        if s + 1 < n_seq:
            ll_state = ll_tbl[2][ll_state] + br.read(ll_tbl[1][ll_state])
            ml_state = ml_tbl[2][ml_state] + br.read(ml_tbl[1][ml_state])
            of_state = of_tbl[2][of_state] + br.read(of_tbl[1][of_state])
        # repeat-offset resolution
        if offset_value > 3:
            offset = offset_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_value
            if lit_len == 0:
                idx += 1
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 3:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # idx == 4: rep1 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + lit_len > len(literals):
            raise ValueError("zstd: sequence overruns its literals")
        if len(out) + lit_len + match_len > max_bytes:
            raise ValueError("zstd output exceeds the bound")
        out += literals[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out) - frame_start:
            raise ValueError("zstd: match offset reaches before the frame")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            pattern = bytes(out[start:])
            out += (pattern * (match_len // offset + 1))[:match_len]
    rest = literals[lit_pos:]
    if len(out) + len(rest) > max_bytes:
        raise ValueError("zstd output exceeds the bound")
    out += rest


# ---------------------------------------------------------- dictionaries

_DICT_MAGIC = b"\x37\xa4\x30\xec"  # 0xEC30A437 little-endian


class ZstdDict:
    """A parsed zstd dictionary (RFC 8878 §5): entropy tables the
    first block may Treeless/Repeat into, initial recent offsets, and
    the content window matches may reach back into. Raw payloads
    (no magic) are content-only dictionaries with id 0."""

    __slots__ = ("dict_id", "huff", "tables", "reps", "content")

    def __init__(self, payload: bytes):
        if payload[:4] != _DICT_MAGIC:
            self.dict_id = 0
            self.huff = None
            self.tables = {}
            self.reps = [1, 4, 8]
            self.content = bytes(payload)
            return
        if len(payload) < 8:
            raise ValueError("zstd dictionary truncated")
        self.dict_id = int.from_bytes(payload[4:8], "little")
        pos = 8
        self.huff, used = _read_huffman(payload[pos:])
        pos += used
        self.tables = {}
        for which in ("of", "ml", "ll"):  # the spec's serialization order
            probs, al, used = fse_read_distribution(
                payload[pos:], _MAX_SYM[which]
            )
            if al > _MAX_AL[which]:
                raise ValueError(
                    f"zstd dictionary {which} accuracy log {al} invalid"
                )
            self.tables[f"tbl_{which}"] = (fse_build_table(probs, al), al)
            pos += used
        if pos + 12 > len(payload):
            raise ValueError("zstd dictionary offsets truncated")
        self.reps = [
            int.from_bytes(payload[pos + 4 * k : pos + 4 * k + 4], "little")
            for k in range(3)
        ]
        if any(r == 0 for r in self.reps):
            raise ValueError("zstd dictionary repeat offset 0 invalid")
        pos += 12
        self.content = bytes(payload[pos:])


# --------------------------------------------------------------- frames

def zstd_decompress(
    payload: bytes, max_bytes: int, dictionary: ZstdDict | None = None
) -> bytes:
    """Decode a complete ``.zst`` payload: standard frames (content
    checksum verified when present), skippable frames, concatenated.

    Dictionaries: pass one explicitly, or embed it the way Common
    Crawl's ``.warc.zst`` convention does — a skippable frame with
    magic ``0x184D2A5D`` whose content is the dictionary (itself
    optionally zstd-compressed); it then applies to every following
    frame in the payload. A frame naming a Dictionary_ID with no
    matching dictionary available is a ValueError naming the id."""
    out = bytearray()
    cur_dict = dictionary
    pos = 0
    n = len(payload)
    if n < 4:
        raise ValueError("zstd payload shorter than a magic")
    while pos < n:
        if pos + 4 > n:
            raise ValueError("zstd trailing bytes after the last frame")
        magic = int.from_bytes(payload[pos : pos + 4], "little")
        pos += 4
        if 0x184D2A50 <= magic <= 0x184D2A5F:
            if pos + 4 > n:
                raise ValueError("zstd skippable frame truncated")
            skip = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
            if pos + skip > n:
                raise ValueError("zstd skippable size exceeds payload")
            if magic == 0x184D2A5D:
                # the warc.zst convention: this skippable frame CARRIES
                # the dictionary for the following frames, itself
                # optionally zstd-compressed
                body = payload[pos : pos + skip]
                if body[:4] == b"\x28\xb5\x2f\xfd":
                    body = zstd_decompress(body, max_bytes)
                cur_dict = ZstdDict(body)
            pos += skip
            continue
        if magic != 0xFD2FB528:
            raise ValueError(f"zstd frame magic {magic:#010x} unrecognized")
        if pos >= n:
            raise ValueError("zstd frame header truncated")
        fhd = payload[pos]
        pos += 1
        if fhd & 0x08:
            raise ValueError("zstd frame header reserved bit set")
        single = bool(fhd & 0x20)
        checksum = bool(fhd & 0x04)
        did_size = (0, 1, 2, 4)[fhd & 0x03]
        fcs_flag = fhd >> 6
        if not single:
            if pos >= n:
                raise ValueError("zstd window descriptor truncated")
            pos += 1  # window descriptor: bound comes from max_bytes
        use_dict = None
        if did_size:
            if pos + did_size > n:
                raise ValueError("zstd dictionary id truncated")
            did = int.from_bytes(payload[pos : pos + did_size], "little")
            pos += did_size
            if did:
                if cur_dict is None or (
                    cur_dict.dict_id and cur_dict.dict_id != did
                ):
                    raise ValueError(
                        f"zstd frame requires dictionary {did}, which "
                        "was not provided (pass dictionary= or embed it "
                        "in a 0x184D2A5D skippable frame)"
                    )
                use_dict = cur_dict
        fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
        content_size = None
        if fcs_size:
            if pos + fcs_size > n:
                raise ValueError("zstd frame content size truncated")
            content_size = int.from_bytes(
                payload[pos : pos + fcs_size], "little"
            )
            if fcs_size == 2:
                content_size += 256
            if content_size > max_bytes:
                raise ValueError("zstd declared size exceeds the bound")
            pos += fcs_size
        # the frame decodes into a buffer seeded with the dictionary
        # content, so matches reach into it like history; entropy
        # tables and repeat offsets seed the block context the same way
        if use_dict is not None:
            fbuf = bytearray(use_dict.content)
            ctx: dict = {"reps": list(use_dict.reps)}
            if use_dict.huff is not None:
                ctx["huff"] = use_dict.huff
            ctx.update(use_dict.tables)
        else:
            fbuf = bytearray()
            ctx = {"reps": [1, 4, 8]}
        seed = len(fbuf)
        budget = seed + (max_bytes - len(out))
        while True:
            if pos + 3 > n:
                raise ValueError("zstd block header truncated")
            word = int.from_bytes(payload[pos : pos + 3], "little")
            pos += 3
            last = word & 1
            btype = (word >> 1) & 3
            bsize = word >> 3
            if btype == 3:
                raise ValueError("zstd reserved block type")
            if btype == 1:  # RLE
                if pos >= n:
                    raise ValueError("zstd RLE block truncated")
                if bsize > _BLOCK_MAX:
                    raise ValueError("zstd block exceeds the block bound")
                if len(fbuf) + bsize > budget:
                    raise ValueError("zstd output exceeds the bound")
                fbuf += bytes([payload[pos]]) * bsize
                pos += 1
            else:
                if bsize > _BLOCK_MAX:
                    raise ValueError("zstd block exceeds the block bound")
                if pos + bsize > n:
                    raise ValueError("zstd block truncated")
                body = payload[pos : pos + bsize]
                pos += bsize
                if btype == 0:  # raw
                    if len(fbuf) + bsize > budget:
                        raise ValueError("zstd output exceeds the bound")
                    fbuf += body
                else:
                    _decode_block(body, fbuf, 0, ctx, budget)
            if last:
                break
        if content_size is not None and len(fbuf) - seed != content_size:
            raise ValueError(
                "zstd decoded size differs from the declared content size"
            )
        if checksum:
            if pos + 4 > n:
                raise ValueError("zstd content checksum truncated")
            want = int.from_bytes(payload[pos : pos + 4], "little")
            got = xxh64(bytes(fbuf[seed:])) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd content checksum mismatch")
            pos += 4
        out += fbuf[seed:]
    return bytes(out)
