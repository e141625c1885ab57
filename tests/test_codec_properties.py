"""Property-based codec pins (hypothesis, Spark-free).

The codec contract tests (test_png_codec.py / test_jpeg_codec.py) cover
hand-chosen profiles; these properties drive the same independent
in-test encoders over RANDOM geometry — any (size, depth, color type,
interlace) PNG must round-trip pixel-exact, and any (size, restart
interval, subsampling) baseline JPEG must round-trip its quantized
coefficients EXACTLY (the entropy layer is lossless) with luma within
±1 of the direct-formula IDCT reference. Random geometry is where codec
bugs live: pass-empty Adam7 sizes, stride edges, MCU padding, restart
boundaries that land mid-row.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from drill_logfile_plugin_spark.operators import jpeg as J
from drill_logfile_plugin_spark.operators import multimodal as M

from tests.test_jpeg_codec import _Q50, _expected_luma, encode_jpeg
from tests.test_png_codec import _CHANNELS, encode_png

SETTINGS = settings(max_examples=25, deadline=None)


#: spec-valid (color_type, depth) pairs the property sweeps (palette
#: covered in the explicit tests — it needs a PLTE argument)
_PNG_PROFILES = [
    (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
    (2, 8), (2, 16), (4, 8), (4, 16), (6, 8), (6, 16),
]


@given(
    h=st.integers(1, 21),
    w=st.integers(1, 21),
    profile=st.sampled_from(_PNG_PROFILES),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31 - 1),
)
@SETTINGS
def test_png_roundtrip_any_geometry(h, w, profile, interlace, seed):
    color_type, depth = profile
    rng = np.random.default_rng(seed)
    nch = _CHANNELS[color_type]
    dtype = np.uint16 if depth == 16 else np.uint8
    px = rng.integers(0, 1 << depth, size=(h, w, nch), dtype=dtype)
    filters = [int(rng.integers(0, 5)) for _ in range(max(1, h))]
    payload = encode_png(
        px, color_type, filters, depth=depth, interlace=interlace
    )
    ww, hh, gray = M._png_decode(payload)
    assert (ww, hh) == (w, h)
    if depth == 16:
        samples = (px >> 8).astype(np.int64)
    elif depth < 8:
        samples = px.astype(np.int64) * (255 // ((1 << depth) - 1))
    else:
        samples = px.astype(np.int64)
    if color_type in (2, 6):
        expect = (
            samples[:, :, 0] * 299
            + samples[:, :, 1] * 587
            + samples[:, :, 2] * 114
        ) // 1000
    else:
        expect = samples[:, :, 0]
    assert np.array_equal(gray, expect.astype(np.uint8))


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    dri=st.integers(0, 4),
    samp=st.sampled_from([None, (1, 1), (2, 2), (2, 1), (1, 2)]),
    seed=st.integers(0, 2**31 - 1),
)
@SETTINGS
def test_jpeg_roundtrip_any_geometry(h, w, dri, samp, seed):
    rng = np.random.default_rng(seed)
    if samp is None:  # grayscale
        planes = {1: rng.integers(0, 256, size=(h, w), dtype=np.uint8)}
        samplings = {1: (1, 1)}
    else:
        hy, vy = samp
        ch, cw = (h + vy - 1) // vy, (w + hy - 1) // hy
        planes = {
            1: rng.integers(0, 256, size=(h, w), dtype=np.uint8),
            2: rng.integers(0, 256, size=(ch, cw), dtype=np.uint8),
            3: rng.integers(0, 256, size=(ch, cw), dtype=np.uint8),
        }
        samplings = {1: samp, 2: (1, 1), 3: (1, 1)}
    payload, truth = encode_jpeg(planes, w, h, samplings, _Q50, dri=dri)
    ww, hh, comps, coef, qt = J._jpeg_decode_coefficients(payload)
    assert (ww, hh) == (w, h)
    for cid, blocks in truth.items():
        assert np.array_equal(coef[cid], blocks), f"component {cid}"
    _, _, gray = J._jpeg_decode(payload)
    assert gray.shape == (h, w)
    expect = _expected_luma(truth[1], _Q50, w, h)
    assert np.max(np.abs(gray.astype(np.int64) - expect.astype(np.int64))) <= 1


@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    cuts=st.sets(st.integers(2, 62), max_size=3),
    refine=st.booleans(),
    dri=st.sampled_from([0, 2]),
    sparse=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@SETTINGS
def test_jpeg_progressive_roundtrip_any_script(
    h, w, cuts, refine, dri, sparse, seed
):
    """Random image x random spectral-band split x optional successive
    approximation x restarts: the decoder must recover the transmitted
    coefficient store exactly for ANY spec-valid gray scan script."""
    from tests.test_jpeg_progressive import (
        _smooth,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    plane = (
        _smooth(seed, h, w)
        if sparse
        else rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    )
    edges = [1] + sorted(cuts) + [64]
    bands = [
        (a, b - 1) for a, b in zip(edges, edges[1:]) if a <= b - 1
    ]
    al = 1 if refine else 0
    scans = [{"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": al}]
    scans += [
        {"comps": [1], "ss": a, "se": b, "ah": 0, "al": al}
        for a, b in bands
    ]
    if refine:
        scans.append({"comps": [1], "ss": 0, "se": 0, "ah": 1, "al": 0})
        scans += [
            {"comps": [1], "ss": a, "se": b, "ah": 1, "al": 0}
            for a, b in bands
        ]
    payload, truth = encode_jpeg_progressive(
        {1: plane}, w, h, {1: (1, 1)}, _Q50, scans, dri=dri
    )
    ww, hh, _comps, coef, _qt = J._jpeg_decode_coefficients(payload)
    assert (ww, hh) == (w, h)
    assert np.array_equal(coef[1], truth[1])
    _, _, gray = J._jpeg_decode(payload)
    expect = _expected_luma(truth[1], _Q50, w, h)
    assert np.max(np.abs(gray.astype(np.int64) - expect.astype(np.int64))) <= 1
