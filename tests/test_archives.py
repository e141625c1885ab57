"""Archive explosion: zip/tar/tar.gz members to rows, bomb guards, and
the headline composition — a tarball of mixed documents becomes
training text via explode_archive -> extract_document_text."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pytest

from drill_logfile_plugin_spark.operators import archives as A

from tests.test_boilerplate import PROSE, _page
from tests.test_pdf import build_pdf, text_stream


def build_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("emptydir/", b"")
        for name, data in members.items():
            zf.writestr(name, data)
        zf.writestr("zero.txt", b"")
    return buf.getvalue()


def build_tar(members: dict[str, bytes], gz=False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("adir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw) if gz else raw


MEMBERS = {
    "a/report.pdf": None,  # filled in fixture
    "b/page.html": None,
    "c/note.txt": f"{PROSE}".encode(),
}


def _members():
    return {
        "a/report.pdf": build_pdf([text_stream(f"({PROSE}) Tj")]),
        "b/page.html": _page(f"<p>{PROSE}</p>").encode(),
        "c/note.txt": PROSE.encode(),
    }


@pytest.mark.parametrize("kind", ["zip", "tar", "targz"])
def test_members_roundtrip(kind):
    m = _members()
    payload = build_zip(m) if kind == "zip" else build_tar(m, gz=(kind == "targz"))
    got = dict(A.archive_members(payload))
    assert got == m  # dirs and zero-byte members never appear


def test_rejections_and_bombs():
    with pytest.raises(ValueError, match="neither a zip nor"):
        list(A.archive_members(b"%PDF- not an archive"))
    with pytest.raises(ValueError, match="malformed"):
        list(A.archive_members(b"PK\x03\x04 truncated"))
    # forged central-directory size past the total bound
    z = bytearray(build_zip({"x.txt": b"tiny"}))
    cd = z.rindex(b"PK\x01\x02")
    z[cd + 24 : cd + 28] = (A._MAX_TOTAL + 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="declared size|malformed"):
        list(A.archive_members(bytes(z)))


def test_explode_then_route_composition(spark):
    """The ingestion headline: one tarball of mixed documents -> rows ->
    routed text, one call each."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )

    tarball = build_tar(_members(), gz=True)
    df = spark.createDataFrame(
        [(0, bytearray(tarball)), (1, bytearray(b"not an archive"))],
        "doc_id long, payload binary",
    )
    members = A.explode_archive(df)
    rows = members.collect()
    assert len(rows) == 3  # bad archive skipped, dirs/zero members dropped
    assert {r["member_name"] for r in rows} == set(_members())
    # route each member by its own magic; key on (doc_id, member_idx)
    texts = extract_document_text(
        members.withColumn(
            "doc_id", F.col("doc_id") * 1000 + F.col("member_idx")
        )
    )
    got = {r["doc_format"] for r in texts.collect()}
    assert got == {"pdf", "html", "txt"}
    for r in texts.collect():
        assert PROSE.split()[0] in r["text"]


def test_compressed_envelope_bomb_is_bounded(monkeypatch):
    """r9 ADVICE fix: bz2/xz tar envelopes previously inflated with
    one-shot stdlib decompress and checked _MAX_TOTAL only AFTER full
    inflation — a small bomb could exhaust executor memory before the
    guard fired. The envelope now rides the shared streaming bounded
    helper, capped AT _MAX_TOTAL."""
    import bz2
    import lzma

    monkeypatch.setattr(A, "_MAX_TOTAL", 1 << 16)
    for compress in (gzip.compress, bz2.compress, lzma.compress):
        bomb = compress(b"\x00" * (1 << 20))  # tiny envelope, 1 MiB out
        with pytest.raises(ValueError, match="envelope corrupt"):
            list(A.archive_members(bomb))
    # a genuine compressed tar still roundtrips under the default bound
    monkeypatch.setattr(A, "_MAX_TOTAL", 1 << 31)
    m = _members()
    assert dict(A.archive_members(build_tar(m, gz=True))) == m
