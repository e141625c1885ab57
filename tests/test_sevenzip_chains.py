"""7z multi-coder filter chains (round 10): LZMA-head + BCJ/delta
folders decode as one fused stdlib-lzma raw chain; bind pairs resolve
the decode order; the folder's unpack size reads from the UNBOUND out
index; delta-over-Copy decodes numerically. Builders here assemble the
chain layout from 7zFormat.txt directly (the independent-writer rule)."""

import lzma
import struct

import numpy as np
import pytest

import drill_logfile_plugin_spark.operators.sevenzip as SZ
from tests.test_sevenzip import _names_block, wnum

#: x86-flavored payload: relative CALL/JMP opcodes BCJ actually rewrites
X86ISH = (
    b"\x55\x48\x89\xe5" + b"\xe8\x12\x34\x00\x00\x90" * 120
    + b"\xe9\x44\x00\x00\x00\xc3" * 80 + bytes(range(256)) * 4
)

_X86 = b"\x03\x03\x01\x03"
_DELTA = b"\x03"
_LZMA2 = b"\x21"


def _coder(cid: bytes, props: bytes) -> bytes:
    flags = len(cid) | (0x20 if props else 0)
    out = bytes([flags]) + cid
    if props:
        out += wnum(len(props)) + props
    return out


def build_chain_7z(
    name: str,
    packed: bytes,
    coders: list,
    bind_pairs: list,
    out_sizes: list,
) -> bytes:
    """One-folder archive with an explicit multi-coder chain:
    ``coders`` = [(cid, props)], ``bind_pairs`` = [(in, out)] over the
    folder-global stream numbering, ``out_sizes`` = kCodersUnpackSize
    entries in out-index order."""
    info = wnum(SZ._K_PACK_INFO) + wnum(0) + wnum(1)
    info += wnum(SZ._K_SIZE) + wnum(len(packed)) + wnum(SZ._K_END)
    info += wnum(SZ._K_UNPACK_INFO)
    info += wnum(SZ._K_FOLDER) + wnum(1) + b"\x00"
    info += wnum(len(coders))
    for cid, props in coders:
        info += _coder(cid, props)
    for i, o in bind_pairs:
        info += wnum(i) + wnum(o)
    info += wnum(SZ._K_UNPACK_SIZES)
    for sz in out_sizes:
        info += wnum(sz)
    info += wnum(SZ._K_END) + wnum(SZ._K_END)

    header = wnum(SZ._K_HEADER)
    header += wnum(SZ._K_MAIN_STREAMS) + info
    header += wnum(SZ._K_FILES_INFO) + wnum(1) + _names_block([name])
    header += wnum(SZ._K_END) + wnum(SZ._K_END)

    sig = bytearray(SZ.MAGIC + b"\x00\x04")
    sig += b"\x00" * 4
    sig += struct.pack("<QQ", len(packed), len(header))
    sig += b"\x00" * 4
    return bytes(sig) + packed + header


def _raw(filters, data):
    return lzma.compress(data, format=lzma.FORMAT_RAW, filters=filters)


LZMA2_PROPS = bytes([22])  # 8 MiB dict (the test_sevenzip convention)


def test_x86_bcj_plus_lzma2_chain():
    packed = _raw(
        [{"id": lzma.FILTER_X86}, {"id": lzma.FILTER_LZMA2, "preset": 6}],
        X86ISH,
    )
    # coder0 = LZMA2 (consumes the packed stream), coder1 = BCJ;
    # bind pair: BCJ's input (in 1) <- LZMA2's output (out 0)
    blob = build_chain_7z(
        "prog.bin", packed,
        [(_LZMA2, LZMA2_PROPS), (_X86, b"")],
        [(1, 0)],
        [len(X86ISH), len(X86ISH)],
    )
    got = dict(SZ.sevenzip_members(blob))
    assert got == {"prog.bin": X86ISH}


def test_chain_with_permuted_coder_order_uses_unbound_out():
    """Same chain, coders listed filter-first: the folder output is out
    index 0 (the unbound one) — sizes must be read by index, not
    position-last."""
    packed = _raw(
        [{"id": lzma.FILTER_X86}, {"id": lzma.FILTER_LZMA2, "preset": 6}],
        X86ISH,
    )
    blob = build_chain_7z(
        "prog.bin", packed,
        [(_X86, b""), (_LZMA2, LZMA2_PROPS)],
        [(0, 1)],  # BCJ(in 0) <- LZMA2(out 1)
        [len(X86ISH), len(X86ISH)],
    )
    got = dict(SZ.sevenzip_members(blob))
    assert got == {"prog.bin": X86ISH}


@pytest.mark.parametrize("dist", [1, 2, 4])
def test_delta_plus_lzma2_chain(dist):
    data = bytes((i * 7 + (i // dist)) & 0xFF for i in range(3000))
    packed = _raw(
        [
            {"id": lzma.FILTER_DELTA, "dist": dist},
            {"id": lzma.FILTER_LZMA2, "preset": 6},
        ],
        data,
    )
    blob = build_chain_7z(
        "wave.pcm", packed,
        [(_LZMA2, LZMA2_PROPS), (_DELTA, bytes([dist - 1]))],
        [(1, 0)],
        [len(data), len(data)],
    )
    assert dict(SZ.sevenzip_members(blob)) == {"wave.pcm": data}


def test_three_stage_delta_then_x86_over_lzma2():
    data = X86ISH * 2
    packed = _raw(
        [
            {"id": lzma.FILTER_DELTA, "dist": 2},
            {"id": lzma.FILTER_X86},
            {"id": lzma.FILTER_LZMA2, "preset": 6},
        ],
        data,
    )
    # decode order: LZMA2 -> X86 -> DELTA (coders 0,1,2)
    blob = build_chain_7z(
        "mix.bin", packed,
        [(_LZMA2, LZMA2_PROPS), (_X86, b""), (_DELTA, bytes([1]))],
        [(1, 0), (2, 1)],
        [len(data)] * 3,
    )
    assert dict(SZ.sevenzip_members(blob)) == {"mix.bin": data}


def test_delta_over_copy_numeric_path():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 997, dtype=np.uint8)
    dist = 3
    enc = raw.copy().astype(np.int16)
    enc[dist:] = (raw[dist:].astype(np.int16) - raw[:-dist]) % 256
    packed = enc.astype(np.uint8).tobytes()
    blob = build_chain_7z(
        "raw.bin", packed,
        [(b"\x00", b""), (_DELTA, bytes([dist - 1]))],
        [(1, 0)],
        [len(raw), len(raw)],
    )
    assert dict(SZ.sevenzip_members(blob)) == {"raw.bin": raw.tobytes()}


def test_chain_rejections():
    packed = _raw([{"id": lzma.FILTER_LZMA2, "preset": 6}], b"x" * 64)
    bcj2 = b"\x03\x03\x01\x1b"
    blob = build_chain_7z(
        "a", packed, [(_LZMA2, LZMA2_PROPS), (bcj2, b"")], [(1, 0)],
        [64, 64],
    )
    with pytest.raises(NotImplementedError, match="plug-in point"):
        dict(SZ.sevenzip_members(blob))
    # bzip2 head under a filter stays a named plug-in point
    import bz2

    blob = build_chain_7z(
        "a", bz2.compress(b"y" * 64),
        [(b"\x04\x02\x02", b""), (_X86, b"")], [(1, 0)], [64, 64],
    )
    with pytest.raises(NotImplementedError, match="chain head"):
        dict(SZ.sevenzip_members(blob))
    # a cyclic bind graph (coders 0<->1, coder 2 dangling) is
    # structural corruption, not a decodable chain
    blob = build_chain_7z(
        "a", packed,
        [(_LZMA2, LZMA2_PROPS), (_X86, b""), (_DELTA, bytes([0]))],
        [(0, 1), (1, 0)], [64, 64, 64],
    )
    with pytest.raises(ValueError, match="linear|cycle|cover"):
        dict(SZ.sevenzip_members(blob))
    # 7zAES anywhere in a chain keeps the password quarantine
    blob = build_chain_7z(
        "a", packed, [(b"\x06\xf1\x07\x01", b""), (_X86, b"")],
        [(1, 0)], [64, 64],
    )
    with pytest.raises(NotImplementedError, match="password"):
        dict(SZ.sevenzip_members(blob))


def test_chain_archive_through_spark_lane(spark):
    from drill_logfile_plugin_spark.operators.archives import explode_archive

    packed = _raw(
        [{"id": lzma.FILTER_X86}, {"id": lzma.FILTER_LZMA2, "preset": 6}],
        X86ISH,
    )
    blob = build_chain_7z(
        "prog.bin", packed,
        [(_LZMA2, LZMA2_PROPS), (_X86, b"")], [(1, 0)],
        [len(X86ISH), len(X86ISH)],
    )
    df = spark.createDataFrame([(0, bytearray(blob))], "doc_id long, payload binary")
    rows = explode_archive(df).collect()
    assert len(rows) == 1
    assert rows[0]["member_name"] == "prog.bin"
    assert bytes(rows[0]["payload"]) == X86ISH
