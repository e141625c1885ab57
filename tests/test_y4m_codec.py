"""Y4M (YUV4MPEG2) video codec: header/frame parsing pinned against an
independent in-test writer assembled per the published spec, exact
Y-plane recovery across chroma modes, rational-frame-rate timestamps,
rejection matrix, and the Spark lanes end to end — including the
cross-container pin: the same gray frame as a Y4M keyframe and as a PNG
must produce identical perceptual-hash signatures."""

from __future__ import annotations

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators import multimodal as M
from drill_logfile_plugin_spark.operators import video as V


def write_y4m(
    y_planes: list[np.ndarray],
    chroma: str = "420jpeg",
    fps=(25, 1),
    extra_header: str = "",
    chroma_fill: int = 128,
) -> bytes:
    """Independent spec writer: Y planes supplied, chroma planes filled
    with a constant (chroma bytes don't participate in the luma
    contract)."""
    h, w = y_planes[0].shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}{extra_header}\n"
    factor = {"420jpeg": 6, "420": 6, "420paldv": 6, "420mpeg2": 6,
              "422": 8, "444": 12, "mono": 4}[chroma]
    chroma_bytes = (w * h * factor // 4) - w * h
    out = bytearray(hdr.encode("ascii"))
    for y in y_planes:
        out += b"FRAME\n"
        out += y.astype(np.uint8).tobytes()
        out += bytes([chroma_fill]) * chroma_bytes
    return bytes(out)


def _rng(seed):
    return np.random.default_rng(seed)


def _frames(seed, n, h, w):
    return [
        _rng(seed + i).integers(0, 256, size=(h, w), dtype=np.int64).astype(np.uint8)
        for i in range(n)
    ]


# --- decoder contract ----------------------------------------------------------


@pytest.mark.parametrize("chroma", ["420jpeg", "420", "420mpeg2", "422", "444", "mono"])
def test_y4m_exact_y_plane_recovery(chroma):
    planes = _frames(1, 4, 6, 8)
    payload = write_y4m(planes, chroma=chroma)
    w, h, us, frames = V._y4m_decode(payload)
    assert (w, h, us, len(frames)) == (8, 6, 40000, 4)
    for i, p in enumerate(planes):
        assert np.array_equal(V._y4m_frame_luma(payload, i), p)


def test_y4m_rational_frame_rate_and_x_tags():
    planes = _frames(2, 3, 4, 4)
    payload = write_y4m(planes, fps=(30000, 1001), extra_header=" XCOLORRANGE=FULL")
    w, h, us, frames = V._y4m_decode(payload)
    assert us == (1_000_000 * 1001) // 30000  # 33366 us — NTSC exact
    assert len(frames) == 3


def test_y4m_default_chroma_is_420jpeg():
    planes = _frames(3, 1, 2, 2)
    payload = write_y4m(planes)
    # strip the C tag: the spec default must kick in
    hdr, rest = payload.split(b"\n", 1)
    hdr = b" ".join(t for t in hdr.split(b" ") if not t.startswith(b"C"))
    w, h, us, frames = V._y4m_decode(hdr + b"\n" + rest)
    assert len(frames[0]) == 2 * 2 * 6 // 4


def test_y4m_rejections():
    with pytest.raises(ValueError, match="magic"):
        V._y4m_decode(b"RIFF not y4m")
    with pytest.raises(ValueError, match="unterminated"):
        V._y4m_decode(b"YUV4MPEG2 W2 H2")
    with pytest.raises(ValueError, match="W/H"):
        V._y4m_decode(b"YUV4MPEG2 F25:1\nFRAME\n")
    with pytest.raises(ValueError, match="malformed"):
        V._y4m_decode(b"YUV4MPEG2 Wx H2\nFRAME\n")
    with pytest.raises(ValueError, match="decoder bound"):
        V._y4m_decode(b"YUV4MPEG2 W70000 H70000\n")
    with pytest.raises(ValueError, match="positive rational"):
        V._y4m_decode(b"YUV4MPEG2 W2 H2 F0:1\n")
    with pytest.raises(NotImplementedError, match="C411"):
        V._y4m_decode(b"YUV4MPEG2 W4 H4 C411\n")
    with pytest.raises(ValueError, match="even subsampled"):
        V._y4m_decode(b"YUV4MPEG2 W3 H2 C420\n")
    ok = write_y4m(_frames(4, 2, 2, 2))
    with pytest.raises(ValueError, match="truncated"):
        V._y4m_decode(ok[:-3])
    with pytest.raises(ValueError, match="no frames"):
        V._y4m_decode(b"YUV4MPEG2 W2 H2\n")
    # a frame marker that isn't FRAME
    bad = ok.replace(b"FRAME", b"FRAUD", 1)
    with pytest.raises(ValueError, match="frame header"):
        V._y4m_decode(bad)


# --- Spark lanes ----------------------------------------------------------------


@pytest.fixture(scope="module")
def y4m_frame(spark):
    planes = _frames(10, 6, 13, 7)
    good = write_y4m(planes, chroma="mono", fps=(50, 1))  # 20 ms/frame
    rows = [(0, bytearray(good)), (1, bytearray(b"YUV4MPEG2 junk\n"))]
    return (
        spark.createDataFrame(rows, "doc_id long, payload binary"),
        planes,
        good,
    )


def test_decode_media_y4m(spark, y4m_frame):
    df, planes, _good = y4m_frame
    out = {r["doc_id"]: r for r in M.decode_media(df, codec="y4m").collect()}
    assert (out[0]["width"], out[0]["height"]) == (7, 13)
    assert out[0]["media_format"] == "y4m"
    assert out[1]["media_format"] is None  # quarantined


def test_frame_sample_y4m_real_timestamps(spark, y4m_frame):
    df, planes, _good = y4m_frame
    rows = M.frame_sample(df, codec="y4m", every_n=2).collect()
    got = sorted((r["frame_idx"], r["t_ms"]) for r in rows)
    assert got == [(0, 0), (2, 40), (4, 80)]
    assert {r["doc_id"] for r in rows} == {0}


def test_extract_features_y4m_first_frame_luma(spark, y4m_frame):
    df, planes, _good = y4m_frame
    dim = 8
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(df, dim=dim, codec="y4m").collect()
    }
    assert feats[1] is None
    hist = np.bincount(
        (planes[0].ravel().astype(np.int64) * dim) // 256, minlength=dim
    ) / planes[0].size
    assert np.allclose(np.asarray(feats[0]), hist)


def test_phash_y4m_keyframe_matches_png(spark):
    from tests.test_png_codec import encode_png

    g = _rng(20).integers(0, 256, size=(16, 16), dtype=np.int64).astype(np.uint8)
    y4m = write_y4m([g], chroma="mono")
    png = encode_png(g[:, :, None], color_type=0, filters=[0])
    df = spark.createDataFrame(
        [(0, bytearray(y4m))], "doc_id long, payload binary"
    )
    dfp = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    sigs = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(df, codec="y4m")
        .unionByName(M.phash_signatures(dfp, codec="png"))
        .collect()
    }
    assert sigs[0] == sigs[1]
