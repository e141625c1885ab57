"""GIF codec contract (operators/gif.py + the codec="gif" lanes).

Independent in-test GIF WRITER: its LZW compressor tracks the decoder's
table growth explicitly (the spec's grow-at-2^codesize rule, 12-bit cap,
CLEAR on full table), frames pack into GIF87a/89a containers with
global/local color tables, interlacing, and graphic-control delays. The
package decoder must recover exact indexed pixels per frame. A raw LZW
round-trip property hammers the variable-width machinery on random index
streams, including streams long enough to overflow the 12-bit table.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import gif as G
from drill_logfile_plugin_spark.operators import multimodal as M

# --- independent writer -----------------------------------------------------


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW compressor that mirrors the decoder's table timeline: the
    decoder adds one table entry per code consumed (after the first
    post-CLEAR code), so the width used for code k is determined by the
    decoder's table length at that moment — tracked here explicitly."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {}
    next_code = 0
    width = 0
    dec_len = 0

    def reset() -> None:
        nonlocal table, next_code, width, dec_len
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code_size + 1
        dec_len = eoi + 1  # decoder table length right after CLEAR

    reset()
    put(clear, width)
    prev = b""
    first_after_clear = True
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        # decoder consumes that code; unless it was the first after a
        # CLEAR it appends an entry and may widen
        if not first_after_clear:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
        first_after_clear = False
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
        else:
            put(clear, width)
            reset()  # decoder resets in lockstep on CLEAR
            first_after_clear = True
        prev = bytes([b])
    if prev:
        put(table[prev], width)
        if not first_after_clear:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def write_gif(
    frames,
    width: int,
    height: int,
    palette: np.ndarray,
    delays_ms=None,
    interlace: bool = False,
    local_palettes=None,
    disposals=None,
    trans_idxs=None,
    bg_index: int = 0,
) -> bytes:
    """frames: list of (x, y, (h, w) uint8 index arrays). The global
    palette must be a power-of-two length >= 2. ``disposals`` /
    ``trans_idxs`` (per-frame, None = absent) populate the graphic
    control extension's packed field per GIF89a."""
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    assert n == 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), bg_index, 0)
    out += palette.astype(np.uint8).tobytes()
    for fi, (x, y, idx) in enumerate(frames):
        h, w = idx.shape
        if delays_ms is not None or disposals is not None or trans_idxs is not None:
            packed = 0
            tidx = 0
            if disposals is not None and disposals[fi] is not None:
                packed |= (disposals[fi] & 0x7) << 2
            if trans_idxs is not None and trans_idxs[fi] is not None:
                packed |= 0x01
                tidx = trans_idxs[fi]
            delay = 0 if delays_ms is None else delays_ms[fi] // 10
            out += b"\x21\xf9" + _blocks(
                struct.pack("<BHB", packed, delay, tidx)
            )
        lp = None if local_palettes is None else local_palettes[fi]
        iflags = 0x40 if interlace else 0
        if lp is not None:
            lbits = max(1, (len(lp) - 1).bit_length())
            iflags |= 0x80 | (lbits - 1)
        out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, iflags)
        if lp is not None:
            out += lp.astype(np.uint8).tobytes()
        rows = idx
        if interlace:
            order = []
            for off, step in G._GIF_INTERLACE:
                order.extend(range(off, h, step))
            rows = idx[order]
        min_code = max(2, bits if lp is None else max(2, (len(lp) - 1).bit_length()))
        out += bytes([min_code])
        out += _blocks(lzw_encode(rows.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)


def _rng(seed):
    return np.random.default_rng(seed)


def _luma(palette, idx):
    rgb = palette[idx].astype(np.int64)
    return (
        (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    ).astype(np.uint8)


# --- raw LZW ----------------------------------------------------------------


def test_lzw_roundtrip_exercises_width_growth_and_table_overflow():
    r = _rng(1)
    for size, alpha, mcs in [(50, 4, 2), (4000, 16, 4), (30000, 8, 3)]:
        data = r.integers(0, alpha, size=size, dtype=np.uint8).tobytes()
        enc = lzw_encode(data, mcs)
        assert G._lzw_decode(enc, mcs, len(data)) == data


def test_lzw_output_bound_rejects_oversized_stream():
    data = bytes(_rng(2).integers(0, 4, size=500, dtype=np.uint8))
    enc = lzw_encode(data, 2)
    with pytest.raises(ValueError, match="exceeds"):
        G._lzw_decode(enc, 2, 499)


# --- container decode ------------------------------------------------------


def test_gif_single_frame_exact_luma():
    pal = _rng(3).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(4).integers(0, 16, size=(11, 7), dtype=np.uint8)
    payload = write_gif([(0, 0, idx)], 7, 11, pal)
    w, h, frames = G._gif_decode(payload)
    assert (w, h) == (7, 11)
    assert len(frames) == 1
    assert np.array_equal(frames[0]["luma"], _luma(pal, idx))


def test_gif_interlaced_frame_reorders_rows():
    pal = _rng(5).integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = _rng(6).integers(0, 8, size=(13, 5), dtype=np.uint8)
    payload = write_gif([(0, 0, idx)], 5, 13, pal, interlace=True)
    _, _, frames = G._gif_decode(payload)
    assert np.array_equal(frames[0]["luma"], _luma(pal, idx))


def test_gif_animation_frames_delays_and_local_palette():
    gpal = _rng(7).integers(0, 256, size=(4, 3), dtype=np.uint8)
    lpal = _rng(8).integers(0, 256, size=(8, 3), dtype=np.uint8)
    f0 = _rng(9).integers(0, 4, size=(6, 6), dtype=np.uint8)
    f1 = _rng(10).integers(0, 8, size=(3, 4), dtype=np.uint8)
    f2 = _rng(11).integers(0, 4, size=(2, 2), dtype=np.uint8)
    payload = write_gif(
        [(0, 0, f0), (1, 2, f1), (4, 4, f2)],
        6,
        6,
        gpal,
        delays_ms=[40, 120, 80],
        local_palettes=[None, lpal, None],
    )
    w, h, frames = G._gif_decode(payload)
    assert (w, h) == (6, 6)
    assert [f["delay_ms"] for f in frames] == [40, 120, 80]
    assert (frames[1]["x"], frames[1]["y"]) == (1, 2)
    assert np.array_equal(frames[0]["luma"], _luma(gpal, f0))
    assert np.array_equal(frames[1]["luma"], _luma(lpal, f1))
    assert np.array_equal(frames[2]["luma"], _luma(gpal, f2))
    # feature-lane view: frame 0 on the logical screen
    _, _, screen = G._gif_first_frame_screen(payload)
    assert np.array_equal(screen, _luma(gpal, f0))


def test_gif_rejections():
    with pytest.raises(ValueError, match="signature"):
        G._gif_decode(b"\x89PNG not a gif")
    pal = _rng(12).integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = _rng(13).integers(0, 4, size=(4, 4), dtype=np.uint8)
    good = write_gif([(0, 0, idx)], 4, 4, pal)
    with pytest.raises(ValueError):
        G._gif_decode(good[:-3])  # truncated before trailer
    huge = bytearray(good)
    huge[6:10] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="bound"):
        G._gif_decode(bytes(huge))


# --- Spark lanes -------------------------------------------------------------


@pytest.fixture(scope="module")
def gif_frame(spark):
    pal = _rng(20).integers(0, 256, size=(16, 3), dtype=np.uint8)
    still = write_gif(
        [(0, 0, _rng(21).integers(0, 16, size=(9, 12), dtype=np.uint8))],
        12, 9, pal,
    )
    anim = write_gif(
        [
            (0, 0, _rng(22 + i).integers(0, 16, size=(5, 5), dtype=np.uint8))
            for i in range(4)
        ],
        5, 5, pal, delays_ms=[100, 100, 50, 50],
    )
    rows = [
        (0, bytearray(still)),
        (1, bytearray(anim)),
        (2, bytearray(b"GIF89a broken")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_media_gif(spark, gif_frame):
    out = {
        r["doc_id"]: r
        for r in M.decode_media(gif_frame, codec="gif").collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (12, 9)
    assert out[0]["media_format"] == "gif"
    assert (out[1]["width"], out[1]["height"]) == (5, 5)
    assert out[2]["media_format"] is None  # quarantined


def test_frame_sample_gif_animation_delays(spark, gif_frame):
    rows = M.frame_sample(gif_frame, codec="gif", every_n=1).collect()
    anim = sorted(
        (r["frame_idx"], r["t_ms"]) for r in rows if r["doc_id"] == 1
    )
    # cumulative starts of delays [100, 100, 50, 50]
    assert anim == [(0, 0), (1, 100), (2, 200), (3, 250)]
    still = [(r["frame_idx"], r["t_ms"]) for r in rows if r["doc_id"] == 0]
    assert still == [(0, 0)]
    assert not [r for r in rows if r["doc_id"] == 2]  # corrupt skipped


def test_extract_features_gif_first_frame_histogram(spark, gif_frame):
    dim = 8
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(
            gif_frame, dim=dim, codec="gif"
        ).collect()
    }
    assert feats[2] is None
    payload = bytes(gif_frame.where("doc_id = 0").collect()[0]["payload"])
    _, _, screen = G._gif_first_frame_screen(payload)
    hist = np.bincount(
        (screen.ravel().astype(np.int64) * dim) // 256, minlength=dim
    ) / screen.size
    assert np.allclose(np.asarray(feats[0]), hist)


# --- content-level perceptual hash across encodings --------------------------


def test_content_phash_collapses_reencodings(spark):
    """The real-codec aHash hashes PIXELS, not bytes: the SAME image
    written as (a) a PNG with filters [0], (b) a PNG with all five
    filters (byte-different payload), and (c) a GIF, must band together
    at Hamming ~0 — while the byte-level raw hash sees three unrelated
    payloads. This is the re-encoded-crawl-image case byte dedup can
    never catch."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_png_codec import encode_png

    rng = _rng(40)
    # grayscale image drawn from a 16-gray palette so the GIF encoding
    # is EXACT (palette luma == pixel value)
    levels = (np.arange(16) * 17).astype(np.uint8)
    idx = rng.integers(0, 16, size=(24, 24), dtype=np.uint8)
    gray = levels[idx]

    png_a = encode_png(gray[:, :, None], 0, [0])
    png_b = encode_png(gray[:, :, None], 0, [0, 1, 2, 3, 4])
    pal = np.stack([levels] * 3, axis=1)  # (16, 3) gray palette
    gif_c = write_gif([(0, 0, idx)], 24, 24, pal)
    assert png_a != png_b

    df = spark.createDataFrame(
        [(0, bytearray(png_a)), (1, bytearray(png_b))],
        "doc_id long, payload binary",
    )
    sigs_png = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(df, codec="png").collect()
    }
    gif_df = spark.createDataFrame(
        [(2, bytearray(gif_c))], "doc_id long, payload binary"
    )
    sig_gif = M.phash_signatures(gif_df, codec="gif").collect()[0]["sig"]
    # content identical -> signatures identical across containers
    assert sigs_png[0] == sigs_png[1] == sig_gif

    # byte-level hashes see three different payloads (sanity contrast)
    raw = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(df, codec="raw").collect()
    }
    assert raw[0] != raw[1]

    # and the near-dup lane pairs the two PNGs at hamming 0
    pairs = M.phash_neardup(df, codec="png").collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [
        (0, 1, 0)
    ]


def test_content_phash_robust_to_small_pixel_edits(spark):
    """A few changed pixels move few (often zero) cells: Hamming stays
    within the banding budget, so crawl variants pair up."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_png_codec import encode_png

    rng = _rng(41)
    gray = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    edited = gray.copy()
    edited[5, 5] ^= 0x80
    edited[20, 11] ^= 0x40
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_png(gray[:, :, None], 0, [0]))),
            (1, bytearray(encode_png(edited[:, :, None], 0, [2]))),
        ],
        "doc_id long, payload binary",
    )
    pairs = M.phash_neardup(df, codec="png", max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] <= 3

    # quarantine: a corrupt payload yields no signature under skip
    bad = spark.createDataFrame(
        [(9, bytearray(b"nope"))], "doc_id long, payload binary"
    )
    assert M.phash_signatures(bad, codec="png").collect() == []


# --- disposal-chain compositing (r9) -----------------------------------------


def _pal4():
    # luma of each entry: 0 -> 0, 1 -> 255, 2 -> 76 (red), 3 -> 149 (green)
    return np.array(
        [[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0]],
        dtype=np.uint8,
    )


def test_composite_partial_updates_build_complete_frames():
    """A full base frame, then two PARTIAL updates with transparency:
    every composited frame must equal the hand-built expected raster
    (the viewer's screen), not the update rectangle."""
    pal = _pal4()
    base = np.zeros((8, 8), dtype=np.uint8)
    base[0:4, :] = 1  # top half white
    # update 1: a 2x2 red patch at (2,2); index 0 transparent elsewhere
    upd1 = np.zeros((2, 2), dtype=np.uint8) + 2
    # update 2: 4x4 at (4,4) — green diagonal, transparent off-diagonal
    upd2 = np.zeros((4, 4), dtype=np.uint8)
    np.fill_diagonal(upd2, 3)
    gif = write_gif(
        [(0, 0, base), (2, 2, upd1), (4, 4, upd2)],
        8, 8, pal,
        delays_ms=[40, 40, 40],
        disposals=[1, 1, 1],
        trans_idxs=[None, None, 0],
    )
    w, h, screens = G._gif_composite_frames(gif)
    assert (w, h) == (8, 8) and len(screens) == 3

    lum = _luma(pal, base)
    exp0 = lum.copy()
    assert np.array_equal(screens[0][0], exp0)

    exp1 = exp0.copy()
    exp1[2:4, 2:4] = 76  # red patch drawn opaque (no transparency set)
    assert np.array_equal(screens[1][0], exp1)

    exp2 = exp1.copy()
    for k in range(4):  # green diagonal only; rest shows through
        exp2[4 + k, 4 + k] = 149
    assert np.array_equal(screens[2][0], exp2)
    assert [d for _s, d in screens] == [40, 40, 40]


def test_composite_restore_to_background_and_previous():
    pal = _pal4()
    base = np.full((6, 6), 1, dtype=np.uint8)  # white screen
    patch = np.full((3, 3), 2, dtype=np.uint8)  # red patch
    patch2 = np.full((2, 2), 3, dtype=np.uint8)  # green patch
    # frame 1 disposal=2 (restore to background color = index 0 -> luma 0)
    # frame 2 disposal=3 (restore to previous)
    gif = write_gif(
        [(0, 0, base), (1, 1, patch), (3, 3, patch2), (0, 0, base[:1, :1])],
        6, 6, pal,
        disposals=[1, 2, 3, None],
        trans_idxs=[None, None, None, None],
        bg_index=0,
    )
    w, h, screens = G._gif_composite_frames(gif)
    white = _luma(pal, base)

    # frame 1: patch visible over white
    exp1 = white.copy()
    exp1[1:4, 1:4] = 76
    assert np.array_equal(screens[1][0], exp1)

    # frame 2: patch rect was restored to BACKGROUND (luma 0), green drawn
    exp2 = white.copy()
    exp2[1:4, 1:4] = 0
    exp2[3:5, 3:5] = 149
    assert np.array_equal(screens[2][0], exp2)

    # frame 3: green patch REVERTED (restore-to-previous), then 1x1 white
    exp3 = exp2.copy()
    exp3[3:5, 3:5] = exp2[3:5, 3:5]  # previous state = post-frame-1 disposal
    exp3 = white.copy()
    exp3[1:4, 1:4] = 0  # frame 1's rect still background-cleared
    exp3[0, 0] = 255
    assert np.array_equal(screens[3][0], exp3)


def test_composite_nonzero_background_color():
    pal = _pal4()
    patch = np.full((2, 2), 2, dtype=np.uint8)
    gif = write_gif(
        [(1, 1, patch)], 4, 4, pal, disposals=[1], trans_idxs=[None],
        bg_index=1,  # white background
    )
    _w, _h, screens = G._gif_composite_frames(gif)
    exp = np.full((4, 4), 255, dtype=np.uint8)
    exp[1:3, 1:3] = 76
    assert np.array_equal(screens[0][0], exp)


def test_gif_frame_signatures_match_partial_update_copies(spark):
    """The lane this exists for: two GIFs of the SAME animation — one
    encoded as full frames, one as partial updates with transparency —
    must match in the video fingerprint engine; without compositing the
    partial encoding hashes update rectangles and cannot."""
    from drill_logfile_plugin_spark.operators import video_fp as VF

    rng = _rng(77)
    pal = np.array(
        [[0, 0, 0]] + [[c, c, c] for c in range(8, 256, 17)][:15],
        dtype=np.uint8,
    )
    n, size = 12, 16
    # full-frame encoding: a moving 6x6 bright block over a textured bg
    bg = rng.integers(1, 16, size=(size, size)).astype(np.uint8)
    fulls = []
    for t in range(n):
        f = bg.copy()
        f[t % 10 : t % 10 + 6, t % 10 : t % 10 + 6] = 15
        fulls.append((0, 0, f))
    gif_full = write_gif(fulls, size, size, pal,
                         disposals=[1] * n, trans_idxs=[None] * n)
    # partial encoding: frame 0 full, then only the changed rows, with
    # index 0 transparent where unchanged
    parts = [(0, 0, fulls[0][2])]
    for t in range(1, n):
        prev_f, cur = fulls[t - 1][2], fulls[t][2]
        changed = np.any(prev_f != cur, axis=1)
        y0, y1 = np.argmax(changed), size - np.argmax(changed[::-1])
        rect = cur[y0:y1].copy()
        rect[prev_f[y0:y1] == cur[y0:y1]] = 0  # transparent where same
        parts.append((0, int(y0), rect))
    gif_part = write_gif(parts, size, size, pal,
                         disposals=[1] * n, trans_idxs=[None] + [0] * (n - 1))
    # sanity: composited screens are pixel-identical
    _w, _h, s_full = G._gif_composite_frames(gif_full)
    _w, _h, s_part = G._gif_composite_frames(gif_part)
    for (a, _), (b, _) in zip(s_full, s_part):
        assert np.array_equal(a, b)

    df = spark.createDataFrame(
        [(0, bytearray(gif_full)), (1, bytearray(gif_part))],
        "doc_id long, payload binary",
    )
    fps = VF.frame_signatures(df, codec="gif")
    out = VF.video_near_dup(fps, min_votes=4 * n).collect()
    assert [(r["doc_a"], r["doc_b"], r["offset_frames"]) for r in out] == [
        (0, 1, 0)
    ]
