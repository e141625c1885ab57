"""7z extraction: an independent in-test writer assembles spec-shaped
archives from 7zFormat.txt (signature header, variable-length numbers,
PackInfo/UnPackInfo/SubStreamsInfo/FilesInfo trees, LZMA2/LZMA1/Copy/
BZip2 coders, solid folders, compressed kEncodedHeader) and pins exact
member recovery, the rejection matrix, and the explode_archive route."""

from __future__ import annotations

import bz2
import lzma
import struct

import pytest

from drill_logfile_plugin_spark.operators import sevenzip as SZ
from drill_logfile_plugin_spark.operators.archives import archive_members


# --- independent writer ------------------------------------------------------------


def wnum(v: int) -> bytes:
    """7z variable-length number, shortest form."""
    if v < 0x80:
        return bytes([v])
    for n in range(1, 8):  # n extra bytes
        if v < (1 << (8 * n + (7 - n))):
            low = v & ((1 << (8 * n)) - 1)
            high = v >> (8 * n)
            top = (0xFF << (8 - n)) & 0xFF
            return bytes([top | high]) + low.to_bytes(n, "little")
    return b"\xff" + v.to_bytes(8, "little")


def _lzma2_compress(data: bytes) -> tuple[bytes, bytes]:
    """(packed, props) for the LZMA2 coder; dict prop 16 = 1 MiB."""
    packed = lzma.compress(
        data,
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    # preset 6 dict = 8 MiB -> prop byte: find p with table value >= 8MiB
    return packed, bytes([22])  # (2|0)<<(22//2+11) = 2<<22 = 8 MiB


def _lzma1_compress(data: bytes) -> tuple[bytes, bytes]:
    lc, lp, pb, dict_size = 3, 0, 2, 1 << 20
    packed = lzma.compress(
        data,
        format=lzma.FORMAT_RAW,
        filters=[
            {"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
             "dict_size": dict_size}
        ],
    )
    props = bytes([(pb * 5 + lp) * 9 + lc]) + struct.pack("<I", dict_size)
    return packed, props


_CODERS = {
    "copy": (b"\x00", lambda d: (d, b"")),
    "lzma2": (b"\x21", _lzma2_compress),
    "lzma1": (b"\x03\x01\x01", _lzma1_compress),
    "bzip2": (b"\x04\x02\x02", lambda d: (bz2.compress(d), b"")),
}


def _folder_record(coder_id: bytes, props: bytes) -> bytes:
    flags = len(coder_id) | (0x20 if props else 0)
    out = wnum(1) + bytes([flags]) + coder_id
    if props:
        out += wnum(len(props)) + props
    return out


def _names_block(names) -> bytes:
    raw = b"\x00" + b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n in names
    )
    return wnum(SZ._K_NAME) + wnum(len(raw)) + raw


def build_7z(members: dict, coder: str = "lzma2", solid: bool = False,
             encoded_header: bool = False, empty_names=()) -> bytes:
    """members: name -> bytes. ``solid`` packs everything into ONE
    folder with substreams; otherwise one folder per member.
    ``empty_names`` adds stream-less entries (dirs/empty files)."""
    cid, compress = _CODERS[coder]
    names = list(members) + list(empty_names)
    bodies = list(members.values())

    if solid:
        joined = b"".join(bodies)
        packed_list = [compress(joined)]
        unpack_sizes = [len(joined)]
    else:
        packed_list = [compress(b) for b in bodies]
        unpack_sizes = [len(b) for b in bodies]

    pack_area = b"".join(p for p, _pr in packed_list)

    def streams_info():
        out = wnum(SZ._K_PACK_INFO)
        out += wnum(0)  # pack pos
        out += wnum(len(packed_list))
        out += wnum(SZ._K_SIZE)
        for p, _pr in packed_list:
            out += wnum(len(p))
        out += wnum(SZ._K_END)
        out += wnum(SZ._K_UNPACK_INFO)
        out += wnum(SZ._K_FOLDER) + wnum(len(packed_list)) + b"\x00"
        for _p, pr in packed_list:
            out += _folder_record(cid, pr)
        out += wnum(SZ._K_UNPACK_SIZES)
        for sz in unpack_sizes:
            out += wnum(sz)
        out += wnum(SZ._K_END)
        if solid and len(bodies) > 1:
            out += wnum(SZ._K_SUBSTREAMS)
            out += wnum(SZ._K_NUM_UNPACK_STREAM) + wnum(len(bodies))
            out += wnum(SZ._K_SIZE)
            for b in bodies[:-1]:
                out += wnum(len(b))
            out += wnum(SZ._K_END)
        out += wnum(SZ._K_END)
        return out

    header = wnum(SZ._K_HEADER)
    header += wnum(SZ._K_MAIN_STREAMS) + streams_info()
    header += wnum(SZ._K_FILES_INFO) + wnum(len(names))
    if empty_names:
        bits = bytearray((len(names) + 7) // 8)
        for i in range(len(members), len(names)):
            bits[i // 8] |= 0x80 >> (i % 8)
        header += (
            wnum(SZ._K_EMPTY_STREAM) + wnum(len(bits)) + bytes(bits)
        )
    header += _names_block(names)
    header += wnum(SZ._K_END)
    header += wnum(SZ._K_END)

    if encoded_header:
        hpacked, hprops = _lzma2_compress(header)
        enc = wnum(SZ._K_ENCODED_HEADER)
        enc += wnum(SZ._K_PACK_INFO) + wnum(len(pack_area)) + wnum(1)
        enc += wnum(SZ._K_SIZE) + wnum(len(hpacked)) + wnum(SZ._K_END)
        enc += wnum(SZ._K_UNPACK_INFO)
        enc += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
        enc += _folder_record(b"\x21", hprops)
        enc += wnum(SZ._K_UNPACK_SIZES) + wnum(len(header))
        enc += wnum(SZ._K_END) + wnum(SZ._K_END)
        pack_area += hpacked
        header = enc

    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4  # StartHeaderCRC: not validated by the reader
    sig += struct.pack("<QQ", len(pack_area), len(header))
    sig += b"\x00" * 4  # NextHeaderCRC
    return bytes(sig) + pack_area + header


MEMBERS = {
    "docs/readme.txt": b"the quick brown fox jumps over the lazy dog " * 40,
    "data.bin": bytes(range(256)) * 17,
    "notes.md": "unicode contents: näï—ve ✓".encode(),
}


def test_number_codec_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 0xFFFF, 1 << 20,
              (1 << 35) + 12345, (1 << 56) - 1, 1 << 60]:
        r = SZ._Reader(wnum(v))
        assert r.number() == v, v


@pytest.mark.parametrize("coder", ["copy", "lzma2", "lzma1", "bzip2"])
def test_members_roundtrip_per_coder(coder):
    got = dict(SZ.sevenzip_members(build_7z(MEMBERS, coder=coder)))
    assert got == MEMBERS


def test_solid_folder_substreams():
    got = dict(SZ.sevenzip_members(build_7z(MEMBERS, solid=True)))
    assert got == MEMBERS


def test_encoded_header_and_empty_entries():
    sz = build_7z(
        MEMBERS, solid=True, encoded_header=True,
        empty_names=("emptydir/", "zero.txt"),
    )
    got = dict(SZ.sevenzip_members(sz))
    assert got == MEMBERS  # stream-less entries never emit


def test_rejections():
    with pytest.raises(ValueError, match="magic"):
        list(SZ.sevenzip_members(b"not 7z at all padding here"))
    ok = build_7z(MEMBERS)
    bad = bytearray(ok)
    struct.pack_into("<Q", bad, 12, 1 << 40)  # next-header offset wild
    with pytest.raises(ValueError, match="escapes"):
        list(SZ.sevenzip_members(bytes(bad)))
    # encrypted marker: swap the coder id for 7zAES
    aes = build_7z({"x.txt": b"secret"}, coder="lzma2").replace(
        b"\x21", b"\x24\x06\xf1\x07\x01", 1
    )
    # (hand-spliced flags byte: id size 4, no props)
    with pytest.raises((NotImplementedError, ValueError)):
        list(SZ.sevenzip_members(aes))
    # truncated packed stream
    trunc = ok[: len(ok) - len(ok) // 2]
    with pytest.raises(ValueError):
        list(SZ.sevenzip_members(trunc))


def test_explode_archive_route(spark):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.archives import explode_archive
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )

    text_members = {
        "a.txt": b"first member prose",
        "b/c.txt": b"second member prose",
    }
    sz = build_7z(text_members, solid=True, encoded_header=True)
    assert dict(archive_members(sz)) == text_members
    df = spark.createDataFrame(
        [(0, bytearray(sz))], "doc_id long, payload binary"
    )
    members = explode_archive(df)
    routed = extract_document_text(
        members.withColumn("doc_id", F.col("member_idx").cast("long"))
    )
    got = {r["doc_id"]: r["text"] for r in routed.collect()}
    assert got == {0: "first member prose", 1: "second member prose"}
