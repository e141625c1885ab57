"""decompress_payload: exact roundtrips across all five codecs (stdlib
compressors as the independent reference), multi-member gzip, the
decompression-bomb guard (bounded work, named error), the quarantine
matrix, and NULL passthrough."""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.multimodal import decompress_payload

BODY = b"the quick brown fox " * 200


def _df(spark, payloads):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )


@pytest.mark.parametrize(
    "codec,compress",
    [
        ("gzip", gzip.compress),
        ("zlib", zlib.compress),
        ("raw-deflate", lambda b: zlib.compress(b)[2:-4]),
        ("bz2", bz2.compress),
        ("xz", lzma.compress),
    ],
)
def test_roundtrip_all_codecs(spark, codec, compress):
    df = _df(spark, [compress(BODY), compress(b"x")])
    rows = decompress_payload(df, codec=codec).orderBy("doc_id").collect()
    assert bytes(rows[0]["payload"]) == BODY
    assert bytes(rows[1]["payload"]) == b"x"


def test_gzip_multi_member(spark):
    """The WARC layout: concatenated gzip members inflate to the
    concatenated bodies."""
    blob = gzip.compress(b"first|") + gzip.compress(b"second")
    rows = decompress_payload(_df(spark, [blob]), codec="gzip").collect()
    assert bytes(rows[0]["payload"]) == b"first|second"


def test_bomb_guard(spark):
    """A tiny payload inflating past max_bytes is quarantined (default),
    and names the bound under strict — work stays bounded either way."""
    bomb = zlib.compress(b"\x00" * (1 << 20))  # ~1 KiB -> 1 MiB
    df = _df(spark, [bomb, zlib.compress(b"fine")])
    rows = (
        decompress_payload(df, codec="zlib", max_bytes=1 << 16)
        .orderBy("doc_id")
        .collect()
    )
    assert rows[0]["payload"] is None  # quarantined
    assert bytes(rows[1]["payload"]) == b"fine"
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(
        (PythonException, Py4JJavaError), match="exceeds max_bytes"
    ):
        decompress_payload(
            df, codec="zlib", max_bytes=1 << 16, on_error="strict"
        ).collect()


def test_quarantine_matrix_and_nulls(spark):
    df = _df(spark, [gzip.compress(b"ok"), b"not gzip at all", None])
    got = {
        r["doc_id"]: r["payload"]
        for r in decompress_payload(df, codec="gzip").collect()
    }
    assert bytes(got[0]) == b"ok" and got[1] is None and got[2] is None
    skipped = decompress_payload(df, codec="gzip", on_error="skip").collect()
    # skip drops the CORRUPT row; the NULL row passes through as NULL
    assert {r["doc_id"] for r in skipped} == {0, 2}
    with pytest.raises(NotImplementedError, match="brotli"):
        decompress_payload(df, codec="brotli")
    with pytest.raises(ValueError, match="max_bytes"):
        decompress_payload(df, max_bytes=0)


def test_composes_with_decode(spark):
    """The crawl shape: stored-gzip PNG bytes → decompress → decode."""
    from drill_logfile_plugin_spark.operators.multimodal import (
        _png_encode_gray,
        decode_media,
    )
    import numpy as np

    png = _png_encode_gray(
        np.arange(64, dtype=np.uint8).reshape(8, 8)
    )
    df = _df(spark, [gzip.compress(png)])
    meta = decode_media(
        decompress_payload(df, codec="gzip"), codec="png"
    ).first()
    assert (meta["width"], meta["height"]) == (8, 8)


# --- zstd lane (r8; LIVE everywhere as of r11 via the pure RFC 8878
# decoder — compression uses the native module when present, else the
# in-test RFC encoder, so these tests never skip) ---

from drill_logfile_plugin_spark.operators.multimodal import _zstd_module

_ZSTD_MOD, _ZSTD_FLAVOR = _zstd_module()


def _zstd_compress(data: bytes) -> bytes:
    if _ZSTD_MOD is None:
        from tests.test_zstd_dec import _zstd_compress as _enc

        return _enc(data)
    if _ZSTD_FLAVOR == "zstandard":
        return _ZSTD_MOD.ZstdCompressor().compress(data)
    return _ZSTD_MOD.compress(data)


def test_zstd_roundtrip_and_quarantine(spark):
    df = _df(spark, [_zstd_compress(b"hello zstd"), b"not zstd", None])
    got = {
        r["doc_id"]: r["payload"]
        for r in decompress_payload(df, codec="zstd").collect()
    }
    assert bytes(got[0]) == b"hello zstd"
    assert got[1] is None and got[2] is None  # quarantine + NULL-through


def test_zstd_bomb_guard(spark):
    bomb = _zstd_compress(b"\x00" * (1 << 20))  # 1 MiB of zeros
    df = _df(spark, [bomb])
    out = decompress_payload(df, codec="zstd", max_bytes=1024).collect()
    assert out[0]["payload"] is None  # bounded, quarantined — no abort
    ok = decompress_payload(df, codec="zstd", max_bytes=1 << 21).collect()
    assert len(bytes(ok[0]["payload"])) == 1 << 20


def test_zstd_live_without_module(spark):
    """r11: with NO native module the pure RFC 8878 decoder carries the
    lane — a real zstd frame decodes through Spark regardless of what
    is installed (the r8 absent-module setup error is gone)."""
    from tests.test_zstd_dec import _zstd_compress as _enc

    df = _df(spark, [_enc(b"pure-decoder payload " * 4)])
    out = decompress_payload(df, codec="zstd").collect()
    assert bytes(out[0]["payload"]) == b"pure-decoder payload " * 4


class _FakeZstdDec:
    """zlib.decompressobj dressed in the Python-3.14 compression.zstd
    incremental API (decompress(data, max_length) / eof / needs_input) —
    lets this environment EXECUTE the stdlib-flavor bounded loop that
    would otherwise be dead code until 3.14."""

    def __init__(self):
        self._d = zlib.decompressobj()

    @property
    def eof(self):
        return self._d.eof

    @property
    def needs_input(self):
        return not self._d.unconsumed_tail

    def decompress(self, data, max_length):
        return self._d.decompress(self._d.unconsumed_tail + data, max_length)


class _FakeZstdModule:
    ZstdDecompressor = _FakeZstdDec
    ZstdError = zlib.error


def test_zstd_stdlib_flavor_bounded_loop(spark, monkeypatch):
    """The stdlib-flavor lane, driven end-to-end through Spark with the
    API-faithful fake: roundtrip, bomb stops AT the cap, corrupt and
    truncated streams quarantine."""
    from drill_logfile_plugin_spark.operators import multimodal as M

    monkeypatch.setattr(
        M, "_zstd_module", lambda: (_FakeZstdModule, "stdlib")
    )
    good = zlib.compress(b"hello stdlib zstd")
    bomb = zlib.compress(b"\x00" * (1 << 20))
    df = _df(spark, [good, b"garbage", good[: len(good) // 2], None])
    got = {
        r["doc_id"]: r["payload"]
        for r in M.decompress_payload(df, codec="zstd").collect()
    }
    assert bytes(got[0]) == b"hello stdlib zstd"
    assert got[1] is None  # corrupt -> quarantined
    assert got[2] is None  # truncated -> quarantined
    assert got[3] is None  # NULL-through
    out = M.decompress_payload(
        _df(spark, [bomb]), codec="zstd", max_bytes=1024
    ).collect()
    assert out[0]["payload"] is None
    ok = M.decompress_payload(
        _df(spark, [bomb]), codec="zstd", max_bytes=1 << 21
    ).collect()
    assert len(bytes(ok[0]["payload"])) == 1 << 20


# --- streaming bounded bz2/xz (r9): the one-shot decompress bomb window ---

from drill_logfile_plugin_spark.operators.multimodal import (  # noqa: E402
    bounded_decompress_bytes,
)


@pytest.mark.parametrize(
    "codec,compress",
    [("gzip", gzip.compress), ("bz2", bz2.compress), ("xz", lzma.compress)],
)
def test_bounded_bytes_roundtrip_and_cap(codec, compress):
    """r9 ADVICE fix: bz2/xz previously inflated FULLY before the size
    check (one-shot stdlib decompress). The shared streaming helper
    stops AT the cap via decompressobj/max_length."""
    assert bounded_decompress_bytes(compress(BODY), codec, 1 << 20) == BODY
    bomb = compress(b"\x00" * (1 << 20))  # tiny payload, 1 MiB inflated
    with pytest.raises(ValueError, match="exceeds max_bytes"):
        bounded_decompress_bytes(bomb, codec, 1 << 10)


@pytest.mark.parametrize(
    "codec,compress,ref",
    [
        ("bz2", bz2.compress, bz2.decompress),
        ("xz", lzma.compress, lzma.decompress),
    ],
)
def test_bounded_multistream_stdlib_parity(codec, compress, ref):
    """Concatenated streams inflate to concatenated bodies; invalid
    leftover after >=1 valid stream is ignored; a truncated stream
    raises — byte-for-byte the stdlib one-shot semantics."""
    both = compress(b"first|") + compress(b"second")
    assert bounded_decompress_bytes(both, codec, 1 << 20) == ref(both)
    trailing = compress(b"body") + b"garbage after the stream"
    assert bounded_decompress_bytes(trailing, codec, 1 << 20) == ref(trailing)
    blob = compress(b"0123456789" * 100)
    with pytest.raises(ValueError, match="truncated|bad"):
        bounded_decompress_bytes(blob[: len(blob) // 2], codec, 1 << 20)
    with pytest.raises(ValueError, match="bad"):
        bounded_decompress_bytes(b"definitely not compressed", codec, 1 << 20)


def test_bz2_xz_spark_bomb_guard(spark):
    for codec, compress in (("bz2", bz2.compress), ("xz", lzma.compress)):
        bomb = compress(b"\x00" * (1 << 20))
        df = _df(spark, [bomb, compress(b"fine")])
        rows = (
            decompress_payload(df, codec=codec, max_bytes=1 << 16)
            .orderBy("doc_id")
            .collect()
        )
        assert rows[0]["payload"] is None  # quarantined at the cap
        assert bytes(rows[1]["payload"]) == b"fine"


# --- brotli lane (r9): guarded-import — fake executes the bounded loop ---

from drill_logfile_plugin_spark.operators.multimodal import _brotli_module  # noqa: E402

_BROTLI_MOD = _brotli_module()


@pytest.mark.skipif(_BROTLI_MOD is None, reason="no brotli module available")
def test_brotli_roundtrip_live(spark):
    df = _df(spark, [_BROTLI_MOD.compress(BODY), b"not brotli", None])
    got = {
        r["doc_id"]: r["payload"]
        for r in decompress_payload(df, codec="brotli").collect()
    }
    assert bytes(got[0]) == BODY and got[1] is None and got[2] is None


@pytest.mark.skipif(
    _BROTLI_MOD is not None, reason="brotli module present — lane is live"
)
def test_brotli_absent_is_actionable(spark):
    df = _df(spark, [b"x"])
    with pytest.raises(NotImplementedError, match="brotlicffi"):
        decompress_payload(df, codec="brotli")


class _FakeBrotliDec:
    """zlib.decompressobj dressed in the brotli ``Decompressor`` API
    (process(data, output_buffer_limit=) / is_finished()) so this
    environment EXECUTES the bounded brotli loop end-to-end."""

    def __init__(self):
        self._d = zlib.decompressobj()

    def is_finished(self):
        return self._d.eof

    def process(self, data, output_buffer_limit=None):
        if output_buffer_limit is None:
            return self._d.decompress(self._d.unconsumed_tail + data)
        return self._d.decompress(
            self._d.unconsumed_tail + data, output_buffer_limit
        )


class _FakeBrotliLegacyDec(_FakeBrotliDec):
    """Pre-1.1 binding: no output_buffer_limit kwarg — exercises the
    slice-level fallback path."""

    def process(self, data, **kw):
        if kw:
            raise TypeError("process() got an unexpected keyword argument")
        return self._d.decompress(self._d.unconsumed_tail + data)


def _fake_brotli_module(dec_cls):
    class _Mod:
        Decompressor = dec_cls
        error = zlib.error
    return _Mod


@pytest.mark.parametrize("dec_cls", [_FakeBrotliDec, _FakeBrotliLegacyDec])
def test_brotli_bounded_loop_via_fake(spark, monkeypatch, dec_cls):
    from drill_logfile_plugin_spark.operators import multimodal as M

    monkeypatch.setattr(
        M, "_brotli_module", lambda: _fake_brotli_module(dec_cls)
    )
    good = zlib.compress(b"hello brotli lane")
    bomb = zlib.compress(b"\x00" * (1 << 20))
    df = _df(spark, [good, b"garbage", good[: len(good) // 2], None, bomb])
    got = {
        r["doc_id"]: r["payload"]
        for r in M.decompress_payload(
            df, codec="brotli", max_bytes=1 << 16
        ).collect()
    }
    assert bytes(got[0]) == b"hello brotli lane"
    assert got[1] is None  # corrupt -> quarantined
    assert got[2] is None  # truncated -> quarantined
    assert got[3] is None  # NULL-through
    assert got[4] is None  # bomb -> quarantined at the cap
    ok = M.decompress_payload(
        _df(spark, [bomb]), codec="brotli", max_bytes=1 << 21
    ).collect()
    assert len(bytes(ok[0]["payload"])) == 1 << 20
