"""zstd document envelopes + .tar.zst: the `.jsonl.zst` / `.html.zst`
shipping format of the modern public corpora (The Pile, RedPajama,
Dolma) routes through the bounded zstd lane — magic ``28 B5 2F FD``
in the document router's envelope table and the archive tier's
tar-envelope table.

As of r11 the lane is LIVE on every host: a native module is used
when present, else the pure-Python RFC 8878 decoder
(operators/zstd_dec.py). These tests compress with the native module
when available — which then also cross-validates the in-test RFC
encoder from tests/test_zstd_dec.py — and with that in-test encoder
otherwise, so nothing here ever skips."""

import io
import tarfile

import pytest

import drill_logfile_plugin_spark.operators.archives as AR
import drill_logfile_plugin_spark.operators.documents as DOC
from drill_logfile_plugin_spark.operators.multimodal import _zstd_module
from tests.test_zstd_dec import _zstd_compress

_ZSTD_MOD, _ZSTD_FLAVOR = _zstd_module()
_MAGIC = b"\x28\xb5\x2f\xfd"


@pytest.fixture
def zstd_lane():
    """Real-format compression callable: the native module when
    present, else the in-test RFC 8878 encoder."""
    if _ZSTD_MOD is not None:
        if _ZSTD_FLAVOR == "zstandard":
            return lambda b: _ZSTD_MOD.ZstdCompressor().compress(b)
        return _ZSTD_MOD.compress
    return _zstd_compress


# --- document router -----------------------------------------------------------


def test_html_zst_envelope_routes_and_extracts(zstd_lane):
    html = (
        b"<html><body><p>"
        + b"Zstd envelope prose with the of and a to for stopwords. " * 6
        + b"</p></body></html>"
    )
    payload = zstd_lane(html)
    assert DOC.sniff_document(payload) == "gz:html"
    text, n = DOC._extract_one("gz:html", payload)
    assert "Zstd envelope prose" in text


def test_txt_zst_envelope(zstd_lane):
    payload = zstd_lane("compressed plain text — zstd".encode())
    assert DOC.sniff_document(payload) == "gz:txt"
    text, n = DOC._extract_one("gz:txt", payload)
    assert text == "compressed plain text — zstd" and n == 1


def test_tar_zst_redirects_to_archive_lane(zstd_lane):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"member body"
        info = tarfile.TarInfo("a.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    payload = zstd_lane(buf.getvalue())
    with pytest.raises(ValueError, match="explode_archive"):
        DOC.sniff_document(payload)
    got = dict(AR.archive_members(payload))
    assert got == {"a.txt": b"member body"}


def test_zst_bomb_costs_the_cap(zstd_lane, monkeypatch):
    monkeypatch.setattr(DOC, "_ENVELOPE_MAX", 1024)
    bomb = zstd_lane(b"\x00" * (1 << 20))
    with pytest.raises(ValueError, match="max_bytes|bound"):
        DOC._unwrap_envelope(bomb)


def test_corrupt_zst_quarantines(zstd_lane):
    with pytest.raises(ValueError, match="zstd|magic|bad"):
        DOC._extract_one("gz:txt", _MAGIC + b"\xde\xad\xbe\xef" * 8)


def test_zst_document_row_is_live_through_spark(spark):
    """The round-10 absent-module quarantine is gone: a .zst document
    row decodes through the Spark lane on ANY host (native module or
    the pure RFC 8878 decoder) — the lane is live, never a skip."""
    text = (
        "The zstd envelope now decodes everywhere, with sentences "
        "that read like an ordinary paragraph of prose. " * 3
    )
    payload = _zstd_compress(text.encode())
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    )
    out = DOC.extract_document_text(df).collect()
    assert out[0]["text"] is not None
    assert "decodes everywhere" in out[0]["text"]


def test_native_module_cross_validates_intest_encoder():
    """When a native zstd exists, it must decode the in-test RFC
    encoder's frames byte-exactly (reference cross-validation); with
    no module this degenerates to the pure-decoder roundtrip, which
    tests/test_zstd_dec.py already pins."""
    data = b"cross validation payload, repeated twice. " * 20
    frame = _zstd_compress(data)
    if _ZSTD_MOD is None:
        from drill_logfile_plugin_spark.operators.zstd_dec import (
            zstd_decompress,
        )

        assert zstd_decompress(frame, 1 << 20) == data
        return
    if _ZSTD_FLAVOR == "zstandard":
        got = _ZSTD_MOD.ZstdDecompressor().decompress(
            frame, max_output_size=1 << 20
        )
    else:
        got = _ZSTD_MOD.decompress(frame)
    assert got == data
