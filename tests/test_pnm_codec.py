"""NetPBM codec: exact luma recovery pinned against independent in-test
writers for all six formats (P1-P6, plain and raw, 8- and 16-bit
depths), spec corner cases (comments, arbitrary whitespace, P4 row
padding, maxval scaling), the rejection matrix for the untrusted
header, and the Spark lanes end to end — including the cross-container
pin: the same pixels written as PGM, plain PGM, and PNG must produce
identical perceptual-hash signatures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.pnm import _pnm_decode


def _luma_rgb(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.int64)
    return ((77 * p[:, :, 0] + 150 * p[:, :, 1] + 29 * p[:, :, 2]) >> 8).astype(
        np.uint8
    )


# --- independent writers (string/struct assembly per the spec) ----------------


def write_pgm(gray: np.ndarray, maxval=255, plain=False, comment=False) -> bytes:
    h, w = gray.shape
    hdr = b"P2" if plain else b"P5"
    c = b"# a comment\n" if comment else b""
    head = hdr + b"\n" + c + f"{w} {h}\n{maxval}\n".encode()
    if plain:
        return head + "\n".join(" ".join(map(str, r)) for r in gray.tolist()).encode()
    body = (
        gray.astype(">u2").tobytes() if maxval > 255 else gray.astype(np.uint8).tobytes()
    )
    return head + body


def write_ppm(px: np.ndarray, maxval=255, plain=False) -> bytes:
    h, w, _ = px.shape
    hdr = b"P3" if plain else b"P6"
    head = hdr + f" {w} {h} {maxval} ".encode()
    if plain:
        return head + " ".join(map(str, px.reshape(-1).tolist())).encode()
    body = (
        px.astype(">u2").tobytes() if maxval > 255 else px.astype(np.uint8).tobytes()
    )
    return head + body


def write_pbm(bits: np.ndarray, plain=False) -> bytes:
    h, w = bits.shape
    if plain:
        return (
            f"P1\n{w} {h}\n".encode()
            + "\n".join(" ".join(map(str, r)) for r in bits.tolist()).encode()
        )
    pad = (-w) % 8
    packed = np.packbits(np.pad(bits, ((0, 0), (0, pad))), axis=1)
    return f"P4\n{w} {h}\n".encode() + packed.tobytes()


def _rng(seed):
    return np.random.default_rng(seed)


# --- decoder contract ----------------------------------------------------------


@pytest.mark.parametrize("plain", [False, True])
def test_pgm_exact(plain):
    g = _rng(1).integers(0, 256, size=(9, 13), dtype=np.int64).astype(np.uint8)
    w, h, luma = _pnm_decode(write_pgm(g, plain=plain, comment=True))
    assert (w, h) == (13, 9)
    assert np.array_equal(luma, g)


def test_pgm_16bit_scaling():
    g = _rng(2).integers(0, 65536, size=(5, 4), dtype=np.int64)
    w, h, luma = _pnm_decode(write_pgm(g, maxval=65535))
    assert np.array_equal(luma, (g * 255 // 65535).astype(np.uint8))


def test_pgm_nonstandard_maxval():
    g = _rng(3).integers(0, 100, size=(3, 3), dtype=np.int64)
    w, h, luma = _pnm_decode(write_pgm(g, maxval=99))
    assert np.array_equal(luma, (g * 255 // 99).astype(np.uint8))


@pytest.mark.parametrize("plain", [False, True])
def test_ppm_bt601_luma(plain):
    px = _rng(4).integers(0, 256, size=(6, 5, 3), dtype=np.int64).astype(np.uint8)
    w, h, luma = _pnm_decode(write_ppm(px, plain=plain))
    assert (w, h) == (5, 6)
    assert np.array_equal(luma, _luma_rgb(px))


@pytest.mark.parametrize("plain", [False, True])
def test_pbm_one_is_black_and_row_padding(plain):
    bits = _rng(5).integers(0, 2, size=(4, 10), dtype=np.uint8)  # stride pads
    w, h, luma = _pnm_decode(write_pbm(bits, plain=plain))
    assert (w, h) == (10, 4)
    assert np.array_equal(luma, np.where(bits == 1, 0, 255).astype(np.uint8))


def test_plain_comments_between_samples():
    payload = b"P2\n# c1\n3 2 # c2\n10\n1 2 # mid-raster comment\n3 4 5 6"
    w, h, luma = _pnm_decode(payload)
    ref = np.array([[1, 2, 3], [4, 5, 6]]) * 255 // 10
    assert np.array_equal(luma, ref.astype(np.uint8))


def test_rejection_matrix():
    with pytest.raises(ValueError, match="magic"):
        _pnm_decode(b"BM not a pnm")
    with pytest.raises(NotImplementedError, match="PAM"):
        _pnm_decode(b"P7\nWIDTH 2\n")
    with pytest.raises(ValueError, match="invalid dimensions"):
        _pnm_decode(b"P5 0 4 255 ")
    with pytest.raises(ValueError, match="decoder bound"):
        _pnm_decode(b"P5 70000 70000 255 ")
    with pytest.raises(ValueError, match="spec range"):
        _pnm_decode(b"P5 2 2 70000 ")
    with pytest.raises(ValueError, match="truncated"):
        _pnm_decode(b"P5 3 3 255 \x00\x01")
    with pytest.raises(ValueError, match="truncated"):
        _pnm_decode(b"P2 3 3 255 1 2 3 4")
    with pytest.raises(ValueError, match="not a number"):
        _pnm_decode(b"P5 x 4 255 ")
    with pytest.raises(ValueError, match="exceeds the declared maxval"):
        _pnm_decode(b"P2 2 1 10 5 11")
    with pytest.raises(ValueError, match="exceeds 1"):
        _pnm_decode(b"P1 2 1 0 2")
    g = _rng(6).integers(0, 256, size=(3, 3), dtype=np.int64).astype(np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        _pnm_decode(write_pgm(g)[:-2])


# --- Spark lanes ----------------------------------------------------------------


def test_spark_lanes_end_to_end(spark):
    from drill_logfile_plugin_spark.operators import multimodal as M

    g = _rng(7).integers(0, 256, size=(12, 8), dtype=np.int64).astype(np.uint8)
    px = _rng(8).integers(0, 256, size=(4, 6, 3), dtype=np.int64).astype(np.uint8)
    rows = [
        (0, bytearray(write_pgm(g))),
        (1, bytearray(write_ppm(px))),
        (2, bytearray(write_pbm(np.eye(5, dtype=np.uint8)))),
        (3, bytearray(b"P5 garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.decode_media(df, codec="pnm").collect()}
    assert (out[0]["width"], out[0]["height"]) == (8, 12)
    assert (out[1]["width"], out[1]["height"]) == (6, 4)
    assert out[2]["media_format"] == "pnm"
    assert out[3]["media_format"] is None  # quarantined

    dim = 8
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(df, dim=dim, codec="pnm").collect()
    }
    hist = np.bincount((g.ravel().astype(np.int64) * dim) // 256, minlength=dim)
    assert np.allclose(np.asarray(feats[0]), hist / g.size)

    frames = M.frame_sample(df, codec="pnm").collect()
    assert sorted({r["doc_id"] for r in frames}) == [0, 1, 2]
    assert all((r["frame_idx"], r["t_ms"]) == (0, 0) for r in frames)


def test_phash_matches_same_pixels_across_containers(spark):
    """The content-level dedup bridge: one image written as raw PGM,
    plain PGM, and PNG must hash to ONE signature."""
    from drill_logfile_plugin_spark.operators import multimodal as M
    from tests.test_png_codec import encode_png

    g = _rng(9).integers(0, 256, size=(16, 16), dtype=np.int64).astype(np.uint8)
    raw_pgm = write_pgm(g)
    plain_pgm = write_pgm(g, plain=True)
    png = encode_png(g[:, :, None], color_type=0, filters=[0])
    assert raw_pgm != plain_pgm
    a = spark.createDataFrame(
        [(0, bytearray(raw_pgm)), (1, bytearray(plain_pgm))],
        "doc_id long, payload binary",
    )
    b = spark.createDataFrame([(2, bytearray(png))], "doc_id long, payload binary")
    sigs = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(a, codec="pnm")
        .unionByName(M.phash_signatures(b, codec="png"))
        .collect()
    }
    assert sigs[0] == sigs[1] == sigs[2]
