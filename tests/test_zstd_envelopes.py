"""zstd document envelopes + .tar.zst (round 10): the `.jsonl.zst` /
`.html.zst` shipping format of the modern public corpora (The Pile,
RedPajama, Dolma) routes through the existing import-guarded bounded
zstd lane — magic ``28 B5 2F FD`` in the document router's envelope
table and the archive tier's tar-envelope table.

Where no zstd module exists (this container), the stdlib-flavor
bounded loop is executed end-to-end with an API-faithful fake (the
r8/r9 zstd/brotli test discipline) at the Python layer — Spark-lane
tests pin the absent-module actionability instead (a monkeypatched
fake does not cross the executor process boundary)."""

import io
import tarfile
import zlib

import pytest

import drill_logfile_plugin_spark.operators.archives as AR
import drill_logfile_plugin_spark.operators.documents as DOC
from drill_logfile_plugin_spark.operators.multimodal import _zstd_module

_ZSTD_MOD, _ZSTD_FLAVOR = _zstd_module()
_MAGIC = b"\x28\xb5\x2f\xfd"


# --- the API-faithful fake (zlib dressed as compression.zstd) -----------------


class _FakeZstdDec:
    """zlib.decompressobj behind the Python-3.14 ``compression.zstd``
    incremental API; skips the 4-byte zstd frame magic our fixtures
    prepend so routing (which keys on the magic) and decompression
    (which here is zlib) compose."""

    def __init__(self):
        self._d = zlib.decompressobj()
        self._stripped = False

    @property
    def eof(self):
        return self._d.eof

    @property
    def needs_input(self):
        return not self._d.unconsumed_tail

    def decompress(self, data, max_length):
        if not self._stripped:
            if data[:4] != _MAGIC:
                raise zlib.error("bad magic")
            data = data[4:]
            self._stripped = True
        return self._d.decompress(self._d.unconsumed_tail + data, max_length)


class _FakeZstdModule:
    ZstdDecompressor = _FakeZstdDec
    ZstdError = zlib.error


@pytest.fixture
def zstd_lane(monkeypatch):
    """Compression callable for fixtures; real module when present,
    else the fake wired through the guarded import."""
    if _ZSTD_MOD is not None:
        if _ZSTD_FLAVOR == "zstandard":
            return lambda b: _ZSTD_MOD.ZstdCompressor().compress(b)
        return _ZSTD_MOD.compress
    from drill_logfile_plugin_spark.operators import multimodal as M

    monkeypatch.setattr(
        M, "_zstd_module", lambda: (_FakeZstdModule, "stdlib")
    )
    return lambda b: _MAGIC + zlib.compress(b)


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
    with pytest.raises(ValueError, match="max_bytes"):
        DOC._unwrap_envelope(bomb)


def test_corrupt_zst_quarantines(zstd_lane):
    with pytest.raises(ValueError, match="zstd|magic|bad"):
        DOC._extract_one("gz:txt", _MAGIC + b"\xde\xad\xbe\xef" * 8)


@pytest.mark.skipif(
    _ZSTD_MOD is not None, reason="zstd module present — lane is live"
)
def test_absent_module_is_actionable_through_spark(spark):
    """No zstd module: a .zst row quarantines under on_error='null'
    (NotImplementedError is in the quarantine contract) and the message
    names both ways to get a module under strict."""
    rows = [(0, bytearray(_MAGIC + b"\x00" * 16))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = DOC.extract_document_text(df).collect()
    assert out[0]["text"] is None
    with pytest.raises(Exception, match="zstandard|compression.zstd"):
        DOC.extract_document_text(df, on_error="strict").collect()
