"""Real-codec contract for the baseline JPEG decoder (operators/jpeg.py).

Discipline mirrors test_png_codec.py: the test encodes JPEGs with its OWN
spec-following baseline encoder (forward DCT, quantization, canonical
Huffman tables it constructs itself, byte stuffing, restart markers) — an
independent reference implementation — and verifies the package's decoder
at two layers:

1. the ENTROPY layer is lossless: the decoder must recover the encoder's
   quantized coefficients EXACTLY (Huffman + DC prediction + zigzag +
   stuffing + restarts all bit-exact);
2. the PIXEL layer: decoder luma must match an INDEPENDENTLY-implemented
   direct-formula IDCT of those same coefficients to within +/-1 (two
   float implementations of the same math may round a half-ULP apart).

Then the Spark lanes (decode_media / extract_features / frame_sample with
codec="jpeg") run end-to-end, including the on_error quarantine contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import jpeg as J
from drill_logfile_plugin_spark.operators import multimodal as M

# --- independent reference encoder -----------------------------------------

ZZ = list(J._ZIGZAG)  # spec constant, not decoder logic


def _fdct_direct(block: np.ndarray) -> np.ndarray:
    """Direct-formula forward 8x8 DCT-II (A.3.3), explicit loops —
    deliberately NOT the decoder's separable-matrix form."""
    out = np.zeros((8, 8))
    xs = np.arange(8)
    for u in range(8):
        cu = 1 / np.sqrt(2) if u == 0 else 1.0
        for v in range(8):
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            cosu = np.cos((2 * xs + 1) * u * np.pi / 16)
            cosv = np.cos((2 * xs + 1) * v * np.pi / 16)
            out[u, v] = cu * cv / 4.0 * (cosu[:, None] * cosv[None, :] * block).sum()
    return out


def _idct_direct(coefs: np.ndarray) -> np.ndarray:
    """Direct-formula inverse (A.3.3) — the pixel reference."""
    out = np.zeros((8, 8))
    us = np.arange(8)
    c = np.where(us == 0, 1 / np.sqrt(2), 1.0)
    for x in range(8):
        for y in range(8):
            cosx = np.cos((2 * x + 1) * us * np.pi / 16)
            cosy = np.cos((2 * y + 1) * us * np.pi / 16)
            out[x, y] = (
                (c[:, None] * c[None, :] * coefs
                 * cosx[:, None] * cosy[None, :]).sum() / 4.0
            )
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_align(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _build_table(symbols_used):
    """Fixed-length canonical Huffman over the used symbol set: every
    code has length L with 2**L > n (so the all-ones padding never forms
    an assigned code). Returns (counts16, symbols, {sym: (code, L)})."""
    syms = sorted(set(symbols_used))
    L = 1
    while (1 << L) <= len(syms):
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return counts, bytes(syms), enc


def _mag(v: int):
    """(category t, magnitude bits) for a DC diff / AC value."""
    t = int(abs(v)).bit_length()
    if t == 0:
        return 0, 0
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_jpeg(
    planes: dict,
    width: int,
    height: int,
    samplings: dict,
    qtable: np.ndarray,
    dri: int = 0,
    q16: bool = False,
):
    """Encode component planes into a baseline JPEG.

    planes: comp_id -> (comp_h, comp_w) uint8 plane ALREADY at its
    subsampled size; samplings: comp_id -> (h, v). One shared quant
    table. Returns (payload_bytes, {comp_id: (by, bx, 64) int zigzag
    quantized coefficients}) — the ground truth for the exactness pin.
    """
    comp_ids = list(planes)
    hmax = max(h for h, _ in samplings.values())
    vmax = max(v for _, v in samplings.values())
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    # forward DCT + quantize every block, grid padded by edge replication
    qz = qtable.astype(np.float64)[ZZ].reshape(8, 8)  # natural order
    coefs = {}
    for cid in comp_ids:
        h, v = samplings[cid]
        gw, gh = mcus_x * h * 8, mcus_y * v * 8
        p = planes[cid]
        p = np.pad(
            p, ((0, gh - p.shape[0]), (0, gw - p.shape[1])), mode="edge"
        ).astype(np.float64) - 128.0
        by, bx = gh // 8, gw // 8
        out = np.zeros((by, bx, 64), dtype=np.int64)
        for r in range(by):
            for c in range(bx):
                f = _fdct_direct(p[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8])
                qq = np.round(f / qz).astype(np.int64)
                out[r, c] = qq.reshape(64)[ZZ]  # to zigzag
        coefs[cid] = out

    # gather symbols for table construction (two-pass)
    def _block_symbols(blk, pred):
        dc_syms, ac_syms = [], []
        diff = int(blk[0]) - pred
        t, _ = _mag(diff)
        dc_syms.append(t)
        k = 1
        run = 0
        while k < 64:
            v = int(blk[k])
            if v == 0:
                run += 1
            else:
                while run > 15:
                    ac_syms.append(0xF0)
                    run -= 16
                s, _ = _mag(v)
                ac_syms.append((run << 4) | s)
                run = 0
            k += 1
        if run:
            ac_syms.append(0x00)  # EOB
        return dc_syms, ac_syms, int(blk[0])

    # MCU traversal order (shared by symbol pass and emit pass)
    def _mcu_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in comp_ids:
                    h, v = samplings[cid]
                    for byy in range(v):
                        for bxx in range(h):
                            yield cid, coefs[cid][my * v + byy, mx * h + bxx]

    # table id 0 for the first component, 1 for the rest (classic Y/C)
    tid = {cid: (0 if i == 0 else 1) for i, cid in enumerate(comp_ids)}
    dc_pool: dict[int, list] = {0: [], 1: []}
    ac_pool: dict[int, list] = {0: [], 1: []}
    preds = {cid: 0 for cid in comp_ids}
    mcu_i = 0
    per_mcu = sum(h * v for h, v in samplings.values())
    blk_i = 0
    for cid, blk in _mcu_blocks():
        if blk_i % per_mcu == 0 and dri and mcu_i and mcu_i % dri == 0:
            preds = {c: 0 for c in comp_ids}
        d, a, newpred = _block_symbols(blk, preds[cid])
        preds[cid] = newpred
        dc_pool[tid[cid]].extend(d)
        ac_pool[tid[cid]].extend(a)
        blk_i += 1
        if blk_i % per_mcu == 0:
            mcu_i += 1

    tables = {}
    for t in set(tid.values()):
        tables[(0, t)] = _build_table(dc_pool[t] or [0])
        tables[(1, t)] = _build_table(ac_pool[t] or [0])

    # --- emit ---
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    if q16:
        out += seg(
            0xDB, bytes([0x10]) + qtable.astype(">u2").tobytes()
        )
    else:
        out += seg(0xDB, bytes([0x00]) + qtable.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, height, width, len(comp_ids))
    for cid in comp_ids:
        h, v = samplings[cid]
        sof += bytes([cid, (h << 4) | v, 0])
    out += seg(0xC0, sof)
    for (tc, th), (counts, syms, _enc) in sorted(tables.items()):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + syms)
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comp_ids)])
    for cid in comp_ids:
        sos += bytes([cid, (tid[cid] << 4) | tid[cid]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    w = _BitWriter()
    preds = {cid: 0 for cid in comp_ids}
    mcu_i = 0
    blk_i = 0
    rst = 0
    for cid, blk in _mcu_blocks():
        if blk_i % per_mcu == 0 and dri and mcu_i and mcu_i % dri == 0:
            w.pad_align()
            out += w.out
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = {c: 0 for c in comp_ids}
        dc_enc = tables[(0, tid[cid])][2]
        ac_enc = tables[(1, tid[cid])][2]
        diff = int(blk[0]) - preds[cid]
        preds[cid] = int(blk[0])
        t, bits = _mag(diff)
        code, L = dc_enc[t]
        w.put(code, L)
        if t:
            w.put(bits, t)
        k = 1
        run = 0
        while k < 64:
            v = int(blk[k])
            if v == 0:
                run += 1
            else:
                while run > 15:
                    code, L = ac_enc[0xF0]
                    w.put(code, L)
                    run -= 16
                s, bits = _mag(v)
                code, L = ac_enc[(run << 4) | s]
                w.put(code, L)
                w.put(bits, s)
                run = 0
            k += 1
        if run:
            code, L = ac_enc[0x00]
            w.put(code, L)
        blk_i += 1
        if blk_i % per_mcu == 0:
            mcu_i += 1
    w.pad_align()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out), coefs


def _expected_luma(coefs_y, qtable, width, height):
    """Independent pixel reference: dequant + direct-formula IDCT of the
    encoder's own quantized Y coefficients."""
    qz = qtable.astype(np.float64)
    by, bx, _ = coefs_y.shape
    plane = np.zeros((by * 8, bx * 8))
    for r in range(by):
        for c in range(bx):
            dq = coefs_y[r, c].astype(np.float64) * qz  # zigzag order
            nat = np.zeros(64)
            nat[ZZ] = dq
            plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = _idct_direct(
                nat.reshape(8, 8)
            )
    return np.clip(np.rint(plane + 128.0), 0, 255)[:height, :width]


_Q50 = np.array(  # the Annex K luminance table, zigzag order
    [16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
     26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
     56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
     95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
     103, 99], dtype=np.int64
)


def _rng(seed):
    return np.random.default_rng(seed)


def _gray_jpeg(seed, h, w, dri=0, q16=False):
    plane = _rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    return encode_jpeg(
        {1: plane}, w, h, {1: (1, 1)}, _Q50, dri=dri, q16=q16
    )


# --- decoder contract -------------------------------------------------------

def test_jpeg_gray_single_block_exact_coefficients():
    payload, truth = _gray_jpeg(1, 8, 8)
    w, h, comps, coef, qt = J._jpeg_decode_coefficients(payload)
    assert (w, h) == (8, 8)
    assert np.array_equal(coef[1], truth[1])
    assert np.array_equal(qt[0], _Q50)


def test_jpeg_gray_padded_dims_coefficients_and_pixels():
    payload, truth = _gray_jpeg(2, 13, 7)
    w, h, gray = J._jpeg_decode(payload)
    assert (w, h) == (7, 13)
    _, _, _, coef, _ = J._jpeg_decode_coefficients(payload)
    assert np.array_equal(coef[1], truth[1])
    expect = _expected_luma(truth[1], _Q50, 7, 13)
    assert gray.shape == (13, 7)
    assert np.max(np.abs(gray.astype(np.int64) - expect.astype(np.int64))) <= 1


def test_jpeg_gray_restart_markers():
    # 24x24 -> 9 MCUs; dri=2 forces 4 restart markers + predictor resets
    payload, truth = _gray_jpeg(3, 24, 24, dri=2)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    _, _, _, coef, _ = J._jpeg_decode_coefficients(payload)
    assert np.array_equal(coef[1], truth[1])


def test_jpeg_color_444_and_16bit_dqt():
    r = _rng(4)
    h, w = 10, 18
    planes = {
        1: r.integers(0, 256, size=(h, w), dtype=np.uint8),
        2: r.integers(0, 256, size=(h, w), dtype=np.uint8),
        3: r.integers(0, 256, size=(h, w), dtype=np.uint8),
    }
    samp = {1: (1, 1), 2: (1, 1), 3: (1, 1)}
    payload, truth = encode_jpeg(planes, w, h, samp, _Q50, q16=True)
    ww, hh, gray = J._jpeg_decode(payload)
    assert (ww, hh) == (w, h)
    _, _, _, coef, qt = J._jpeg_decode_coefficients(payload)
    for cid in (1, 2, 3):
        assert np.array_equal(coef[cid], truth[cid])
    assert np.array_equal(qt[0], _Q50)  # 16-bit DQT path read correctly
    expect = _expected_luma(truth[1], _Q50, w, h)
    assert np.max(np.abs(gray.astype(np.int64) - expect.astype(np.int64))) <= 1


@pytest.mark.parametrize("samp_y", [(2, 2), (2, 1)])  # 4:2:0 and 4:2:2
def test_jpeg_subsampled_chroma(samp_y):
    r = _rng(5)
    h, w = 21, 19
    hy, vy = samp_y
    # chroma planes at their subsampled size (ceil division)
    comp_h = (h + vy - 1) // vy
    comp_w = (w + hy - 1) // hy
    planes = {
        1: r.integers(0, 256, size=(h, w), dtype=np.uint8),
        2: r.integers(0, 256, size=(comp_h, comp_w), dtype=np.uint8),
        3: r.integers(0, 256, size=(comp_h, comp_w), dtype=np.uint8),
    }
    samp = {1: samp_y, 2: (1, 1), 3: (1, 1)}
    payload, truth = encode_jpeg(planes, w, h, samp, _Q50, dri=3)
    ww, hh, gray = J._jpeg_decode(payload)
    assert (ww, hh) == (w, h)
    assert gray.shape == (h, w)
    _, _, _, coef, _ = J._jpeg_decode_coefficients(payload)
    for cid in (1, 2, 3):  # chroma blocks entropy-decoded exactly too
        assert np.array_equal(coef[cid], truth[cid])
    expect = _expected_luma(truth[1], _Q50, w, h)
    assert np.max(np.abs(gray.astype(np.int64) - expect.astype(np.int64))) <= 1


def test_jpeg_rejects_unsupported_and_malformed():
    with pytest.raises(ValueError, match="SOI"):
        J._jpeg_decode(b"\x89PNG not a jpeg")
    # minimal SOF9 (extended sequential, ARITHMETIC) header — the
    # explicit remaining plug-in point now that progressive decodes
    arith = (
        b"\xff\xd8"
        + b"\xff\xc9" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J._jpeg_decode_coefficients(arith)
    payload, _ = _gray_jpeg(6, 8, 8)
    with pytest.raises(ValueError):
        J._jpeg_decode(payload[: len(payload) // 2])  # truncated scan
    # implausible dimensions rejected before allocation
    bomb = bytearray(payload)
    sof_at = bomb.index(b"\xff\xc0")
    bomb[sof_at + 5 : sof_at + 9] = struct.pack(">HH", 65000, 65000)
    with pytest.raises(ValueError, match="bound"):
        J._jpeg_decode_coefficients(bytes(bomb))


# --- Spark lanes ------------------------------------------------------------

@pytest.fixture(scope="module")
def jpeg_frame(spark):
    rows = []
    for i, (hh, ww) in enumerate([(13, 7), (8, 8), (24, 24)]):
        payload, _ = _gray_jpeg(100 + i, hh, ww)
        rows.append((i, ww, hh, bytearray(payload)))
    # row 3: corrupt payload (exercises the quarantine lane)
    rows.append((3, None, None, bytearray(b"\xff\xd8garbage")))
    return spark.createDataFrame(
        rows, "doc_id long, true_w int, true_h int, payload binary"
    )


def test_decode_media_jpeg_quarantines_corrupt_row(spark, jpeg_frame):
    out = {
        r["doc_id"]: r
        for r in M.decode_media(jpeg_frame, codec="jpeg").collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for i in (0, 1, 2):
        t = {r["doc_id"]: r for r in jpeg_frame.collect()}[i]
        assert out[i]["media_format"] == "jpeg"
        assert (out[i]["width"], out[i]["height"]) == (t["true_w"], t["true_h"])
    # the corrupt row survives as a NULL-metadata quarantine row
    q = out[3]
    assert q["media_format"] is None
    assert q["width"] is None and q["height"] is None and q["n_pixels"] is None
    assert q["n_bytes"] == len(b"\xff\xd8garbage")


def test_decode_media_jpeg_skip_and_strict(spark, jpeg_frame):
    skipped = M.decode_media(jpeg_frame, codec="jpeg", on_error="skip")
    assert {r["doc_id"] for r in skipped.collect()} == {0, 1, 2}
    with pytest.raises(Exception, match="JPEG"):
        M.decode_media(
            jpeg_frame, codec="jpeg", on_error="strict"
        ).collect()
    with pytest.raises(ValueError, match="on_error"):
        M.decode_media(jpeg_frame, codec="jpeg", on_error="bogus")


def test_extract_features_jpeg_histogram_with_quarantine(spark, jpeg_frame):
    dim = 8
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(
            jpeg_frame, dim=dim, codec="jpeg"
        ).collect()
    }
    assert feats[3] is None  # quarantined
    for t in jpeg_frame.where("doc_id < 3").collect():
        _, _, gray = J._jpeg_decode(bytes(t["payload"]))
        hist = np.bincount(
            (gray.ravel().astype(np.int64) * dim) // 256, minlength=dim
        ) / gray.size
        assert np.allclose(np.asarray(feats[t["doc_id"]]), hist)


def test_frame_sample_jpeg_single_frame_skips_corrupt(spark, jpeg_frame):
    rows = M.frame_sample(jpeg_frame, codec="jpeg").collect()
    assert {r["doc_id"] for r in rows} == {0, 1, 2}
    assert all(r["frame_idx"] == 0 for r in rows)
