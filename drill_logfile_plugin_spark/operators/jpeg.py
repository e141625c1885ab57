"""Huffman JPEG decoder (stdlib + numpy) for the multimodal tier.

The dominant crawl image format, decoded with no external libraries:
marker parse, Huffman entropy decode (interleaved MCUs, restart markers,
byte stuffing), dequantization, 8x8 IDCT on the luma plane, and
4:4:4 / 4:2:2 / 4:2:0 chroma subsampling geometry. Output is
``(width, height, gray)`` with ``gray`` the (h, w) uint8 luma plane —
JPEG's Y channel IS BT.601 luma, so no color conversion is needed for the
gray lanes (chroma blocks are entropy-decoded to keep the bitstream
position honest, but never IDCT'd).

Correctness-grade, like the PNG decoder (multimodal.py): the per-block
Huffman loop is Python, fine for thumbnails and fixtures; a production
pipeline swaps in a vectorized codec behind the same dispatch. Verified
in pytest against independent in-test encoders (sequential AND
progressive) at two layers — exact quantized-coefficient recovery (the
entropy layers are lossless) and an independently-computed IDCT pixel
reference — plus hypothesis sweeps over random geometry and random
progressive scan scripts.

Supported profiles: baseline + extended-sequential Huffman (SOF0/SOF1)
and PROGRESSIVE Huffman (SOF2 — spectral selection, successive
approximation with the G.1.2.3 refinement algorithm, EOB-run batching,
restarts), 8-bit precision, grayscale or 3-component YCbCr with
integer-ratio sampling factors. Hierarchical, arithmetic coding, and
12-bit precision raise NotImplementedError — the explicit plug-in
points. Malformed bytes raise ValueError.

No reference counterpart: the reference plugin is text-only
(LogRecordReader.java:125); this module is LLM-pipeline extension tier.
"""

from __future__ import annotations

import struct

#: zigzag scan order: position i of the zigzag sequence -> (row*8 + col)
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: decoded pixel-count bound — IHDR-equivalent dims are untrusted input
#: (same rationale and value as multimodal._PNG_MAX_PIXELS)
_JPEG_MAX_PIXELS = 1 << 26

_SOF_UNSUPPORTED = {
    0xC3: "lossless sequential",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "extended sequential, arithmetic",
    0xCA: "progressive, arithmetic",
    0xCB: "lossless, arithmetic",
    0xCD: "differential sequential, arithmetic",
    0xCE: "differential progressive, arithmetic",
    0xCF: "differential lossless, arithmetic",
}


class _Huff:
    """Canonical Huffman decode table from a DHT segment's (counts,
    symbols): maps (code_length, code_value) -> symbol, walked one bit at
    a time — correct for any spec-valid table, no assumptions about
    which code points are assigned."""

    __slots__ = ("lut",)

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if k >= len(symbols):
                    raise ValueError("JPEG DHT counts exceed symbols")
                self.lut[(length, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with JPEG byte
    stuffing (FF 00 -> literal FF) and restart-marker awareness."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("JPEG entropy data truncated at FF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            else:  # a real marker: the scan's bits have run out
                raise ValueError("JPEG entropy data ended at marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Discard padding bits, read a 2-byte marker, return its low
        byte. Used at restart boundaries."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        if p + 1 >= len(d) or d[p] != 0xFF:
            raise ValueError("expected JPEG restart marker")
        self.pos = p + 2
        return d[p + 1]

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG F.2.2.1 sign extension of a t-bit magnitude value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_decode_coefficients(payload: bytes):
    """Parse + entropy-decode a Huffman JPEG — baseline/extended
    sequential (SOF0/SOF1, one scan) or PROGRESSIVE (SOF2: any spec-
    valid succession of DC/AC spectral-selection and successive-
    approximation scans, folded into one coefficient store). Returns
    ``(width, height, comps, coef, qtables)`` where ``comps`` is the
    SOF component list ``[{id, h, v, tq}]`` and ``coef`` maps component
    id -> int32 ndarray (blocks_y, blocks_x, 64) of QUANTIZED
    coefficients in zigzag order. The lossless layer — the pytest
    encoders (sequential AND progressive) pin it exactly.
    """
    import numpy as np

    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    dc_tables: dict[int, _Huff] = {}
    ac_tables: dict[int, _Huff] = {}
    width = height = None
    comps: list[dict] = []
    restart_interval = 0
    progressive = False
    coef: dict[int, "np.ndarray"] = {}
    n = len(payload)

    while True:
        # markers may be preceded by fill bytes (FF FF ... FF marker)
        if pos + 1 >= n:
            raise ValueError("JPEG truncated before EOI")
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            if progressive and coef:
                return width, height, comps, coef, qtables
            raise ValueError("JPEG has no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RST
            continue
        if pos + 2 > n:
            raise ValueError("JPEG segment length truncated")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError("JPEG segment overruns payload")
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen

        if marker in (0xC0, 0xC1, 0xC2):  # Huffman sequential/progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ValueError("JPEG SOF truncated")
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[0:6]
            )
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG {precision}-bit precision not supported"
                )
            if width == 0 or height == 0:
                raise ValueError("JPEG with zero dimension")
            if width * height > _JPEG_MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} exceed the decoder "
                    f"bound ({_JPEG_MAX_PIXELS} pixels)"
                )
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("JPEG SOF component list truncated")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError("JPEG sampling factors out of range")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} not supported by the "
                "built-in decoder (baseline/extended-sequential Huffman "
                "only)"
            )
        elif marker == 0xCC:  # DAC
            raise NotImplementedError("JPEG arithmetic coding not supported")
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    if p + 64 > len(seg):
                        raise ValueError("JPEG DQT truncated")
                    qtables[tq] = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                elif pq == 1:
                    if p + 128 > len(seg):
                        raise ValueError("JPEG DQT truncated")
                    qtables[tq] = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                else:
                    raise ValueError("JPEG DQT precision flag invalid")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("JPEG DHT truncated")
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = seg[p + 1 : p + 17]
                total = sum(counts)
                if p + 17 + total > len(seg):
                    raise ValueError("JPEG DHT symbols truncated")
                symbols = seg[p + 17 : p + 17 + total]
                table = _Huff(counts, symbols)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                if tc > 1:
                    raise ValueError("JPEG DHT class invalid")
                p += 17 + total
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                raise ValueError("JPEG DRI malformed")
            (restart_interval,) = struct.unpack(">H", seg)
        elif marker == 0xDA:  # SOS
            if width is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if len(seg) != 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS header malformed")
            scan_comps = []
            by_id = {c["id"]: c for c in comps}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in by_id:
                    raise ValueError("JPEG SOS names unknown component")
                scan_comps.append(
                    (by_id[cs], tdta >> 4, tdta & 0x0F)
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if not progressive:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError(
                        "JPEG sequential scan with progressive parameters"
                    )
                if ns != len(comps):
                    raise NotImplementedError(
                        "JPEG multi-scan (non-interleaved) sequential not "
                        "supported"
                    )
                coef = _decode_scan(
                    payload, pos, scan_comps, width, height,
                    dc_tables, ac_tables, restart_interval,
                )
                return width, height, comps, coef, qtables
            # progressive: fold this scan into the standing coefficients
            if not coef:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mx = (width + 8 * hmax - 1) // (8 * hmax)
                my = (height + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    coef[c["id"]] = np.zeros(
                        (my * c["v"], mx * c["h"], 64), dtype=np.int32
                    )
            pos = _decode_progressive_scan(
                payload, pos, scan_comps, comps, width, height,
                dc_tables, ac_tables, restart_interval,
                ss, se, ah, al, coef,
            )
        # APPn (E0-EF), COM (FE), DNL etc.: skipped via seglen

    raise ValueError("JPEG ended without a scan")


def _decode_scan(
    payload, pos, scan_comps, width, height, dc_tables, ac_tables,
    restart_interval,
):
    """Entropy-decode one interleaved sequential scan. Returns
    comp_id -> (blocks_y, blocks_x, 64) int32 quantized coefficients in
    zigzag order."""
    import numpy as np

    if len(scan_comps) == 1:
        # A single-component scan is non-interleaved by definition
        # (A.2.2): one data unit per MCU over the component's own block
        # grid — equivalent to forcing (h, v) = (1, 1) here. (With a
        # single-component SOF the component is full-resolution whatever
        # its declared factors, so geometry is unaffected.)
        c0, td0, ta0 = scan_comps[0]
        scan_comps = [(dict(c0, h=1, v=1), td0, ta0)]

    hmax = max(c["h"] for c, _, _ in scan_comps)
    vmax = max(c["v"] for c, _, _ in scan_comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    out = {}
    for c, _, _ in scan_comps:
        out[c["id"]] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
        )

    reader = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c, _, _ in scan_comps}
    rst_next = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                m = reader.align_to_marker()
                if m != 0xD0 + rst_next:
                    raise ValueError("JPEG restart marker out of sequence")
                rst_next = (rst_next + 1) & 7
                preds = {cid: 0 for cid in preds}
            for c, td, ta in scan_comps:
                try:
                    dc_t = dc_tables[td]
                    ac_t = ac_tables[ta]
                except KeyError:
                    raise ValueError(
                        "JPEG scan references undefined Huffman table"
                    ) from None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = out[c["id"]][
                            my * c["v"] + by, mx * c["h"] + bx
                        ]
                        t = reader.decode(dc_t)
                        if t > 11:
                            raise ValueError("JPEG DC magnitude invalid")
                        preds[c["id"]] += _extend(reader.bits(t), t)
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(reader.bits(s), s)
                            k += 1
            mcu_count += 1
    return out


def _decode_progressive_scan(
    payload, pos, scan_comps, comps_all, width, height,
    dc_tables, ac_tables, restart_interval, ss, se, ah, al, coef,
):
    """Entropy-decode ONE progressive scan (spec G.2) into the standing
    ``coef`` store; returns the byte offset of the next marker.

    Four scan kinds, selected by (ss, ah):

    * DC first (ss=0, ah=0): sequential DC coding, values shifted left
      by ``al`` (the DC point transform is an arithmetic shift, so
      successive bits reassemble exactly); may be interleaved.
    * DC refinement (ss=0, ah>0): one raw bit per block, ORed at ``al``.
    * AC first (ss>0, ah=0): run-length coding within the [ss, se] band
      plus EOB runs batched across blocks; values shifted left by
      ``al`` (the AC point transform truncates toward zero).
    * AC refinement (ss>0, ah>0): the G.1.2.3 correction-bit algorithm —
      one bit refines each already-nonzero coefficient crossed, (run, 1)
      symbols place newly-significant ±2^al coefficients, EOB runs
      refine the band remainder.
    """
    hmax = max(c["h"] for c in comps_all)
    vmax = max(c["v"] for c in comps_all)
    ns = len(scan_comps)
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG progressive DC scan must have Se=0")
    else:
        if ns != 1:
            raise ValueError("JPEG progressive AC scan must be single-component")
        if not ss <= se <= 63:
            raise ValueError("JPEG progressive spectral band invalid")
    if ah not in range(14) or al not in range(14):
        raise ValueError("JPEG successive-approximation bits invalid")

    # block traversal: (comp, block_row, block_col) per MCU
    if ns == 1:
        c0 = scan_comps[0][0]
        # non-interleaved: the component's OWN block grid (no MCU padding)
        cw = (width * c0["h"] + hmax - 1) // hmax
        chh = (height * c0["v"] + vmax - 1) // vmax
        bx, by = (cw + 7) // 8, (chh + 7) // 8
        mcus = [
            [(c0, r, c)]
            for r in range(by)
            for c in range(bx)
        ]
    else:
        mx = (width + 8 * hmax - 1) // (8 * hmax)
        my = (height + 8 * vmax - 1) // (8 * vmax)
        mcus = []
        for myy in range(my):
            for mxx in range(mx):
                units = []
                for c, _td, _ta in scan_comps:
                    for byy in range(c["v"]):
                        for bxx in range(c["h"]):
                            units.append(
                                (c, myy * c["v"] + byy, mxx * c["h"] + bxx)
                            )
                mcus.append(units)

    tables = {}
    for c, td, ta in scan_comps:
        if ss == 0 and ah == 0:
            if td not in dc_tables:
                raise ValueError("JPEG scan references undefined DC table")
            tables[c["id"]] = dc_tables[td]
        elif ss > 0:
            if ta not in ac_tables:
                raise ValueError("JPEG scan references undefined AC table")
            tables[c["id"]] = ac_tables[ta]
        # DC refinement needs no Huffman table

    reader = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c, _, _ in scan_comps}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    rst_next = 0

    for mcu_i, units in enumerate(mcus):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            m = reader.align_to_marker()
            if m != 0xD0 + rst_next:
                raise ValueError("JPEG restart marker out of sequence")
            rst_next = (rst_next + 1) & 7
            preds = {cid: 0 for cid in preds}
            eobrun = 0
        for c, br, bc in units:
            blk = coef[c["id"]][br, bc]
            if ss == 0 and ah == 0:  # DC first
                t = reader.decode(tables[c["id"]])
                if t > 11:
                    raise ValueError("JPEG DC magnitude invalid")
                preds[c["id"]] += _extend(reader.bits(t), t)
                blk[0] = preds[c["id"]] << al
            elif ss == 0:  # DC refinement
                if reader.bit():
                    blk[0] = int(blk[0]) | p1
            elif ah == 0:  # AC first
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(tables[c["id"]])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run exceeds band")
                    blk[k] = _extend(reader.bits(s), s) << al
                    k += 1
            else:  # AC refinement (G.1.2.3 / the jdphuff structure)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(tables[c["id"]])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r)
                                if r:
                                    eobrun += reader.bits(r)
                                break  # EOB: remainder refined below
                            newval = 0  # ZRL: skip 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "JPEG AC refinement magnitude must be 1"
                                )
                            newval = p1 if reader.bit() else m1
                        # cross the band: refine nonzero-history coeffs,
                        # count down r zero-history positions
                        while k <= se:
                            v = int(blk[k])
                            if v != 0:
                                if reader.bit() and (v & p1) == 0:
                                    blk[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    # EOB phase: correction bits for every remaining
                    # nonzero-history coefficient in the band
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if reader.bit() and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1

    # the next marker starts at the first unconsumed byte (skip any
    # residual padding the bit reader never pulled)
    return reader.pos


def _idct_blocks(blocks):
    """Vectorized 8x8 type-III DCT over (n, 8, 8) float coefficients:
    the standard separable form f = M^T F M with
    M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)."""
    import numpy as np

    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return np.einsum("ux,nuv,vy->nxy", m, blocks, m)


def _jpeg_decode(payload: bytes):
    """Decode a baseline JPEG to ``(width, height, gray)`` — ``gray`` the
    (h, w) uint8 luma (Y) plane, nearest-neighbor upsampled if Y itself
    is subsampled (unusual). Chroma components are entropy-decoded (the
    bitstream is interleaved) but not reconstructed."""
    import numpy as np

    width, height, comps, coef, qtables = _jpeg_decode_coefficients(payload)
    y = comps[0]  # first SOF component is Y (or the only gray component)
    if y["tq"] not in qtables:
        raise ValueError("JPEG luma quant table undefined")
    q = qtables[y["tq"]].astype(np.float64)

    blocks_z = coef[y["id"]].astype(np.float64)  # (by, bx, 64) zigzag
    by, bx, _ = blocks_z.shape
    deq = blocks_z * q  # dequantize in zigzag order
    nat = np.zeros_like(deq)
    nat[:, :, list(_ZIGZAG)] = deq  # de-zigzag to row-major
    px = _idct_blocks(nat.reshape(by * bx, 8, 8)) + 128.0
    px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
    plane = (
        px.reshape(by, bx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(by * 8, bx * 8)
    )

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    comp_w = (width * y["h"] + hmax - 1) // hmax
    comp_h = (height * y["v"] + vmax - 1) // vmax
    plane = plane[:comp_h, :comp_w]
    if (comp_w, comp_h) != (width, height):
        if hmax % y["h"] or vmax % y["v"]:
            raise NotImplementedError(
                "JPEG non-integer luma upsampling ratio not supported"
            )
        plane = np.repeat(
            np.repeat(plane, vmax // y["v"], axis=0), hmax // y["h"], axis=1
        )[:height, :width]
    return int(width), int(height), plane
