"""Progressive-JPEG contract for operators/jpeg.py.

Same discipline as the baseline tests: an independent in-test PROGRESSIVE
encoder (spectral selection + successive approximation + EOB-run
batching + restarts, built directly from spec G.1/G.2) produces
bitstreams whose quantized coefficients the package decoder must recover
EXACTLY — the entropy layers of every scan kind (DC first/refine, AC
first/refine) are lossless — and whose luma must match the
direct-formula IDCT reference within ±1. The encoder's coefficient
ground truth is the same quantization used by the sequential tests, so
progressive and sequential encodings of the same planes pin to the same
store.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators import jpeg as J

from tests.test_jpeg_codec import (
    _Q50,
    _BitWriter,
    _build_table,
    _expected_luma,
    _fdct_direct,
    _mag,
    encode_jpeg,
)

ZZ = list(J._ZIGZAG)


def _quantize_all(planes, width, height, samplings, qtable):
    """(comp_id -> (by, bx, 64) zigzag quantized coefficients) over the
    interleaved MCU grid — identical math to encode_jpeg's."""
    hmax = max(h for h, _ in samplings.values())
    vmax = max(v for _, v in samplings.values())
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    qz = qtable.astype(np.float64)[ZZ].reshape(8, 8)
    coefs = {}
    for cid, p in planes.items():
        h, v = samplings[cid]
        gw, gh = mcus_x * h * 8, mcus_y * v * 8
        p = np.pad(
            p, ((0, gh - p.shape[0]), (0, gw - p.shape[1])), mode="edge"
        ).astype(np.float64) - 128.0
        by, bx = gh // 8, gw // 8
        out = np.zeros((by, bx, 64), dtype=np.int64)
        for r in range(by):
            for c in range(bx):
                f = _fdct_direct(p[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8])
                out[r, c] = np.round(f / qz).astype(np.int64).reshape(64)[ZZ]
        coefs[cid] = out
    return coefs, mcus_x, mcus_y


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: truncation toward zero (G.1.2.2)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ScanWriter(_BitWriter):
    """_BitWriter plus the correction-bit side buffer refinement scans
    interleave after each symbol."""

    def __init__(self):
        super().__init__()
        self.pending: list[int] = []

    def flush_pending(self):
        for b in self.pending:
            self.put(b, 1)
        self.pending = []


def _emit_eobrun(w, enc, eobrun_bits):
    """Flush a pending EOB run: symbol r<<4 (2^r <= E), E - 2^r extra
    bits, then the buffered correction bits (refinement scans)."""
    e, bits_after = eobrun_bits
    if e == 0:
        return (0, [])
    r = e.bit_length() - 1
    code, length = enc[r << 4]
    w.put(code, length)
    if r:
        w.put(e - (1 << r), r)
    for b in bits_after:
        w.put(b, 1)
    return (0, [])


def encode_jpeg_progressive(
    planes, width, height, samplings, qtable, scans, dri=0
):
    """Encode a progressive JPEG per the given scan script.

    ``scans``: list of dicts — {"comps": [ids], "ss": int, "se": int,
    "ah": int, "al": int}. DC scans (ss=0) may be interleaved; AC scans
    must name one component (the spec's rule). Tables are rebuilt and
    emitted per scan (fixed-length canonical over the scan's symbols).
    Returns (payload, truth_coefficients).
    """
    coefs, mcus_x, mcus_y = _quantize_all(
        planes, width, height, samplings, qtable
    )
    hmax = max(h for h, _ in samplings.values())
    vmax = max(v for _, v in samplings.values())
    # Progressive AC scans are non-interleaved (spec rule), so MCU
    # padding blocks beyond a component's OWN block grid never have AC
    # coefficients transmitted — they stay zero in any decoder. The
    # returned ground truth must be the TRANSMITTED store. (DC is
    # interleaved and does cover padding blocks.) Their pixels lie
    # entirely outside the image crop, so the luma reference is
    # unaffected.
    for cid, (hh, vv) in samplings.items():
        cw = (width * hh + hmax - 1) // hmax
        chh = (height * vv + vmax - 1) // vmax
        bx_n, by_n = (cw + 7) // 8, (chh + 7) // 8
        coefs[cid][by_n:, :, 1:] = 0
        coefs[cid][:, bx_n:, 1:] = 0

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + qtable.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for cid in planes:
        h, v = samplings[cid]
        sof += bytes([cid, (h << 4) | v, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))

    for scan in scans:
        out += _encode_one_scan(
            scan, coefs, samplings, mcus_x, mcus_y, hmax, vmax,
            width, height, dri, seg,
        )
    out += b"\xff\xd9"
    return bytes(out), coefs


def _scan_blocks(scan, coefs, samplings, mcus_x, mcus_y, hmax, vmax, w, h):
    """Yield per-MCU lists of (comp_id, block) in scan order."""
    ids = scan["comps"]
    if len(ids) == 1 and scan["ss"] > 0 or len(ids) == 1:
        cid = ids[0]
        hh, vv = samplings[cid]
        cw = (w * hh + hmax - 1) // hmax
        chh = (h * vv + vmax - 1) // vmax
        bx, by = (cw + 7) // 8, (chh + 7) // 8
        for r in range(by):
            for c in range(bx):
                yield [(cid, coefs[cid][r, c])]
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                units = []
                for cid in ids:
                    hh, vv = samplings[cid]
                    for byy in range(vv):
                        for bxx in range(hh):
                            units.append(
                                (cid, coefs[cid][my * vv + byy, mx * hh + bxx])
                            )
                yield units


def _encode_one_scan(
    scan, coefs, samplings, mcus_x, mcus_y, hmax, vmax, width, height,
    dri, seg,
):
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    ids = scan["comps"]
    mcus = list(
        _scan_blocks(
            scan, coefs, samplings, mcus_x, mcus_y, hmax, vmax,
            width, height,
        )
    )
    tid = {cid: (0 if i == 0 else 1) for i, cid in enumerate(sorted(coefs))}

    # ---- pass 1: collect symbols per table id ----
    pools: dict[int, list[int]] = {}

    def pool(cid):
        return pools.setdefault(tid[cid], [])

    preds = {cid: 0 for cid in ids}
    eobrun = 0
    for mcu_i, units in enumerate(mcus):
        if dri and mcu_i and mcu_i % dri == 0:
            if eobrun:
                e = eobrun
                pool(last_eob_cid).append((e.bit_length() - 1) << 4)
                eobrun = 0
            preds = {cid: 0 for cid in ids}
        for cid, blk in units:
            if ss == 0 and ah == 0:
                v = int(blk[0]) >> al
                t, _ = _mag(v - preds[cid])
                preds[cid] = v
                pool(cid).append(t)
            elif ss == 0:
                pass  # DC refinement: raw bits, no symbols
            elif ah == 0:
                band = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
                if not any(band):
                    eobrun += 1
                    last_eob_cid = cid
                    if eobrun == 0x7FFF:
                        pool(cid).append((eobrun.bit_length() - 1) << 4)
                        eobrun = 0
                    continue
                if eobrun:
                    pool(cid).append((eobrun.bit_length() - 1) << 4)
                    eobrun = 0
                run = 0
                last_nz = max(i for i, t in enumerate(band) if t)
                for i, t in enumerate(band):
                    if i > last_nz:
                        eobrun += 1
                        last_eob_cid = cid
                        break
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        pool(cid).append(0xF0)
                        run -= 16
                    s, _ = _mag(t)
                    pool(cid).append((run << 4) | s)
                    run = 0
            else:
                tn = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
                tp = [_pt_ac(int(blk[k]), ah) for k in range(ss, se + 1)]
                if eobrun:  # pending EOB covers blocks w/o new coeffs
                    if not any(
                        abs(n) == 1 and p == 0 for n, p in zip(tn, tp)
                    ):
                        eobrun += 1
                        last_eob_cid = cid
                        continue
                    pool(cid).append((eobrun.bit_length() - 1) << 4)
                    eobrun = 0
                run = 0
                emitted_any = False
                news = [
                    i for i, (n, p) in enumerate(zip(tn, tp))
                    if abs(n) == 1 and p == 0
                ]
                last_new = news[-1] if news else -1
                for i, (n, p) in enumerate(zip(tn, tp)):
                    if i > last_new:
                        break
                    if p != 0:
                        continue  # history coeff: correction bit only
                    if abs(n) == 1:
                        while run > 15:
                            pool(cid).append(0xF0)
                            run -= 16
                        pool(cid).append((run << 4) | 1)
                        run = 0
                        emitted_any = True
                    else:
                        run += 1
                if last_new < len(tn) - 1 or not emitted_any:
                    eobrun += 1
                    last_eob_cid = cid
    if eobrun and ss > 0:
        pool(last_eob_cid).append((eobrun.bit_length() - 1) << 4)

    # ---- tables ----
    out = bytearray()
    tables = {}
    if ss == 0 and ah == 0:
        for cid in ids:
            t = tid[cid]
            if (0, t) not in tables:
                tables[(0, t)] = _build_table(pools.get(t) or [0])
    elif ss > 0:
        for cid in ids:
            t = tid[cid]
            if (1, t) not in tables:
                tables[(1, t)] = _build_table(pools.get(t) or [0])
    for (tc, th), (counts, syms, _enc) in sorted(tables.items()):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + syms)

    sos = bytes([len(ids)])
    for cid in ids:
        sos += bytes([cid, (tid[cid] << 4) | tid[cid]])
    sos += bytes([ss, se, (ah << 4) | al])
    out += seg(0xDA, sos)

    # ---- pass 2: emit ----
    def enc_for(cid):
        cls = 0 if ss == 0 else 1
        return tables[(cls, tid[cid])][2]

    w = _ScanWriter()
    preds = {cid: 0 for cid in ids}
    eob = (0, [])  # (count, correction bits buffered for EOB phase)
    rst = 0
    body = bytearray()
    for mcu_i, units in enumerate(mcus):
        if dri and mcu_i and mcu_i % dri == 0:
            if ss > 0:
                eob = _emit_eobrun(w, enc_for(units[0][0]), eob)
            w.pad_align()
            body += w.out
            w = _ScanWriter()
            body += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = {cid: 0 for cid in ids}
        for cid, blk in units:
            enc = None if (ss == 0 and ah > 0) else enc_for(cid)
            if ss == 0 and ah == 0:  # DC first
                v = int(blk[0]) >> al
                t, bits = _mag(v - preds[cid])
                preds[cid] = v
                code, length = enc[t]
                w.put(code, length)
                if t:
                    w.put(bits, t)
            elif ss == 0:  # DC refinement: one raw bit
                w.put((int(blk[0]) >> al) & 1, 1)
            elif ah == 0:  # AC first
                band = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
                if not any(band):
                    eob = (eob[0] + 1, [])
                    if eob[0] == 0x7FFF:
                        eob = _emit_eobrun(w, enc, eob)
                    continue
                eob = _emit_eobrun(w, enc, eob)
                run = 0
                last_nz = max(i for i, t in enumerate(band) if t)
                for i, t in enumerate(band):
                    if i > last_nz:
                        eob = (eob[0] + 1, [])
                        break
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc[0xF0]
                        w.put(code, length)
                        run -= 16
                    s, bits = _mag(t)
                    code, length = enc[(run << 4) | s]
                    w.put(code, length)
                    w.put(bits, s)
                    run = 0
            else:  # AC refinement
                tn = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
                tp = [_pt_ac(int(blk[k]), ah) for k in range(ss, se + 1)]
                news = [
                    i for i, (nw, p) in enumerate(zip(tn, tp))
                    if abs(nw) == 1 and p == 0
                ]
                if eob[0] and not news:
                    bits_this = [
                        abs(tn[i]) & 1
                        for i in range(len(tn))
                        if tp[i] != 0
                    ]
                    eob = (eob[0] + 1, eob[1] + bits_this)
                    continue
                eob = _emit_eobrun(w, enc, eob)
                last_new = news[-1] if news else -1
                # walk positions exactly the way the decoder crosses
                # them: correction bits interleave in position order,
                # segmented at every 16th zero-history crossing (ZRL)
                pos = 0
                for j in news:
                    r = sum(
                        1 for x in range(pos, j)
                        if tp[x] == 0 and abs(tn[x]) != 1
                    )
                    while r > 15:
                        code, length = enc[0xF0]
                        w.put(code, length)
                        consumed = 0
                        while consumed < 16:
                            if tp[pos] != 0:
                                w.put(abs(tn[pos]) & 1, 1)
                            else:
                                consumed += 1
                            pos += 1
                        r -= 16
                    code, length = enc[(r << 4) | 1]
                    w.put(code, length)
                    w.put(1 if tn[j] > 0 else 0, 1)
                    while pos < j:
                        if tp[pos] != 0:
                            w.put(abs(tn[pos]) & 1, 1)
                        pos += 1
                    pos = j + 1
                if last_new < len(tn) - 1 or last_new == -1:
                    tail_bits = [
                        abs(tn[j]) & 1
                        for j in range(last_new + 1, len(tn))
                        if tp[j] != 0
                    ]
                    eob = (eob[0] + 1, eob[1] + tail_bits)
    if ss > 0:
        enc = enc_for(ids[0])
        eob = _emit_eobrun(w, enc, eob)
    w.pad_align()
    body += w.out
    return bytes(out) + bytes(body)


# --- decoder contract -------------------------------------------------------


def _rng(seed):
    return np.random.default_rng(seed)


def _smooth(seed, h, w):
    """Low-frequency content: most AC coefficients quantize to zero, so
    EOB-run batching paths actually fire."""
    y = np.linspace(0, 40, h).reshape(h, 1)
    x = np.linspace(0, 40, w).reshape(1, w)
    base = 100 + y + x + _rng(seed).integers(0, 3, size=(h, w))
    return np.clip(base, 0, 255).astype(np.uint8)


SPECTRAL = [
    {"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 0},
    {"comps": [1], "ss": 1, "se": 5, "ah": 0, "al": 0},
    {"comps": [1], "ss": 6, "se": 63, "ah": 0, "al": 0},
]

SUCCESSIVE = [
    {"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 1},
    {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
    {"comps": [1], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
]


def _check(payload, truth, w, h):
    ww, hh, comps, coef, qt = J._jpeg_decode_coefficients(payload)
    assert (ww, hh) == (w, h)
    for cid, blocks in truth.items():
        assert np.array_equal(coef[cid], blocks), f"component {cid}"
    _, _, gray = J._jpeg_decode(payload)
    expect = _expected_luma(truth[1], _Q50, w, h)
    assert np.max(np.abs(gray.astype(np.int64) - expect.astype(np.int64))) <= 1


def test_progressive_spectral_selection_gray_dense():
    plane = _rng(1).integers(0, 256, size=(13, 7), dtype=np.uint8)
    payload, truth = encode_jpeg_progressive(
        {1: plane}, 7, 13, {1: (1, 1)}, _Q50, SPECTRAL
    )
    _check(payload, truth, 7, 13)


def test_progressive_spectral_selection_gray_sparse_eobruns():
    plane = _smooth(2, 24, 17)
    payload, truth = encode_jpeg_progressive(
        {1: plane}, 17, 24, {1: (1, 1)}, _Q50, SPECTRAL
    )
    assert b"\xff\xc2" in payload
    _check(payload, truth, 17, 24)


def test_progressive_successive_approximation_gray():
    plane = _rng(3).integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload, truth = encode_jpeg_progressive(
        {1: plane}, 16, 16, {1: (1, 1)}, _Q50, SUCCESSIVE
    )
    _check(payload, truth, 16, 16)


def test_progressive_successive_approximation_sparse():
    plane = _smooth(4, 21, 19)
    payload, truth = encode_jpeg_progressive(
        {1: plane}, 19, 21, {1: (1, 1)}, _Q50, SUCCESSIVE
    )
    _check(payload, truth, 19, 21)


def test_progressive_matches_sequential_coefficients():
    """Progressive and sequential encodings of the same planes decode to
    the IDENTICAL coefficient store."""
    plane = _rng(5).integers(0, 256, size=(10, 12), dtype=np.uint8)
    prog, truth_p = encode_jpeg_progressive(
        {1: plane}, 12, 10, {1: (1, 1)}, _Q50, SUCCESSIVE
    )
    seq, truth_s = encode_jpeg({1: plane}, 12, 10, {1: (1, 1)}, _Q50)
    assert np.array_equal(truth_p[1], truth_s[1])
    _, _, _, coef_p, _ = J._jpeg_decode_coefficients(prog)
    _, _, _, coef_s, _ = J._jpeg_decode_coefficients(seq)
    assert np.array_equal(coef_p[1], coef_s[1])


def test_progressive_color_420_full_script():
    r = _rng(6)
    h, w = 21, 19
    ch, cw = (h + 1) // 2, (w + 1) // 2
    planes = {
        1: r.integers(0, 256, size=(h, w), dtype=np.uint8),
        2: r.integers(0, 256, size=(ch, cw), dtype=np.uint8),
        3: r.integers(0, 256, size=(ch, cw), dtype=np.uint8),
    }
    samp = {1: (2, 2), 2: (1, 1), 3: (1, 1)}
    scans = [
        {"comps": [1, 2, 3], "ss": 0, "se": 0, "ah": 0, "al": 1},
        {"comps": [1], "ss": 1, "se": 20, "ah": 0, "al": 1},
        {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [3], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [1], "ss": 21, "se": 63, "ah": 0, "al": 1},
        {"comps": [1, 2, 3], "ss": 0, "se": 0, "ah": 1, "al": 0},
        {"comps": [1], "ss": 1, "se": 20, "ah": 1, "al": 0},
        {"comps": [1], "ss": 21, "se": 63, "ah": 1, "al": 0},
        {"comps": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [3], "ss": 1, "se": 63, "ah": 1, "al": 0},
    ]
    payload, truth = encode_jpeg_progressive(planes, w, h, samp, _Q50, scans)
    _check(payload, truth, w, h)


def test_progressive_with_restart_markers():
    plane = _smooth(7, 32, 24)
    payload, truth = encode_jpeg_progressive(
        {1: plane}, 24, 32, {1: (1, 1)}, _Q50, SPECTRAL, dri=3
    )
    assert any(
        bytes([0xFF, 0xD0 + i]) in payload for i in range(8)
    )
    _check(payload, truth, 24, 32)
