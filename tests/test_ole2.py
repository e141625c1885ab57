"""Legacy .doc extraction: an independent in-test CFB writer assembles
spec-shaped compound files ([MS-CFB] header/DIFAT/FAT/directory/
miniFAT) and Word piece tables ([MS-DOC] FIB + Clx/PlcPcd), sharing
nothing with the reader. Pins exact text recovery across compressed
(CP1252) and UTF-16 pieces, the mini-stream path, ccpText truncation,
the rejection matrix (encrypted .doc, encrypted OOXML, .xls/.ppt,
corrupt FAT), and the router integration."""

from __future__ import annotations

import struct

import pytest

from drill_logfile_plugin_spark.operators import ole2 as O

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


# --- independent CFB writer --------------------------------------------------------


def write_cfb(streams: dict[str, bytes], mini_cutoff: int = 4096,
              storages: dict | None = None) -> bytes:
    """Assemble a 512-byte-sector compound file: header DIFAT, one or
    more FAT sectors, a miniFAT chain, a directory chain, the root's
    mini stream, and big-stream chains — REAL sector numbers
    throughout. ``storages`` adds sub-storages (name -> {stream:
    bytes}) with REAL directory-tree pointers: the root's child starts
    the top-level sibling chain, each storage's child starts its own —
    the [MS-CFB] shape tree-aware readers must honor."""
    SSZ = 512
    storages = storages or {}
    # flat data map keyed by (storage_or_None, name)
    flat = {(None, n): b for n, b in streams.items()}
    for sto, members in storages.items():
        for n, b in members.items():
            flat[(sto, n)] = b
    names = list(streams)
    big = {k: b for k, b in flat.items() if len(b) >= mini_cutoff}
    small = {k: b for k, b in flat.items() if len(b) < mini_cutoff}

    # mini stream: 64-byte slots, sequential miniFAT chains
    mini_data = bytearray()
    mini_first = {}
    minifat: list[int] = []
    for k_, b in small.items():
        slots = max(1, (len(b) + 63) // 64)
        mini_first[k_] = len(minifat)
        for k in range(slots - 1):
            minifat.append(len(minifat) + 1)
        minifat.append(ENDOFCHAIN)
        mini_data += b + b"\x00" * (slots * 64 - len(b))

    n_dir_entries = (
        1 + len(names) + len(storages) + sum(len(m) for m in storages.values())
    )
    n_dir_sectors = max(1, (n_dir_entries * 128 + SSZ - 1) // SSZ)
    n_minifat_sectors = (len(minifat) * 4 + SSZ - 1) // SSZ if minifat else 0
    n_mini_sectors = (len(mini_data) + SSZ - 1) // SSZ
    big_sectors = {k: (len(b) + SSZ - 1) // SSZ for k, b in big.items()}

    # iterate FAT sizing to a fixed point
    n_fat = 1
    while True:
        n_data = (
            n_fat + n_minifat_sectors + n_dir_sectors + n_mini_sectors
            + sum(big_sectors.values())
        )
        need = (n_data * 4 + SSZ - 1) // SSZ
        if need <= n_fat:
            break
        n_fat = need

    # sector layout
    fat_at = 0
    minifat_at = fat_at + n_fat
    dir_at = minifat_at + n_minifat_sectors
    mini_at = dir_at + n_dir_sectors
    big_at = {}
    cursor = mini_at + n_mini_sectors
    for k_ in big:
        big_at[k_] = cursor
        cursor += big_sectors[k_]
    n_total = cursor

    fat = [FREESECT] * (((n_total * 4 + SSZ - 1) // SSZ * SSZ) // 4)
    for s in range(n_fat):
        fat[fat_at + s] = FATSECT

    def chain(at: int, count: int):
        for k in range(count - 1):
            fat[at + k] = at + k + 1
        fat[at + count - 1] = ENDOFCHAIN

    if n_minifat_sectors:
        chain(minifat_at, n_minifat_sectors)
    chain(dir_at, n_dir_sectors)
    if n_mini_sectors:
        chain(mini_at, n_mini_sectors)
    for k_, cnt in big_sectors.items():
        chain(big_at[k_], cnt)

    def dir_entry(name: str, otype: int, start: int, size: int,
                  left=FREESECT, right=FREESECT, child=FREESECT) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 0x40, len(raw) + 2)
        e[0x42] = otype
        e[0x43] = 1  # black
        struct.pack_into("<III", e, 0x44, left, right, child)
        struct.pack_into("<I", e, 0x74, start)
        struct.pack_into("<Q", e, 0x78, size)
        return bytes(e)

    def loc(key):
        if key in big:
            return big_at[key], len(big[key])
        return mini_first[key], len(small[key])

    # directory ids: 0 root; 1..len(names) top-level streams; then one
    # id per storage followed by its members. Sibling chains via right
    # pointers (a degenerate-but-valid RB shape).
    n_top = len(names) + len(storages)
    entries = [
        dir_entry(
            "Root Entry", 5,
            mini_at if n_mini_sectors else ENDOFCHAIN, len(mini_data),
            child=1 if n_top else FREESECT,
        )
    ]
    next_id = 1 + len(names) + len(storages)
    storage_children = {}
    for si, (sto, members) in enumerate(storages.items()):
        storage_children[sto] = next_id
        next_id += len(members)
    top_ids = list(range(1, 1 + n_top))
    for pos, n in enumerate(names):
        right = top_ids[pos + 1] if pos + 1 < n_top else FREESECT
        st, sz = loc((None, n))
        entries.append(dir_entry(n, 2, st, sz, right=right))
    for si, (sto, members) in enumerate(storages.items()):
        pos = len(names) + si
        right = top_ids[pos + 1] if pos + 1 < n_top else FREESECT
        child = storage_children[sto] if members else FREESECT
        entries.append(dir_entry(sto, 1, 0, 0, right=right, child=child))
    for sto, members in storages.items():
        mnames = list(members)
        base = storage_children[sto]
        for mi, n in enumerate(mnames):
            right = base + mi + 1 if mi + 1 < len(mnames) else FREESECT
            st, sz = loc((sto, n))
            entries.append(dir_entry(n, 2, st, sz, right=right))
    dir_bytes = b"".join(entries)
    dir_bytes += b"\x00" * (n_dir_sectors * SSZ - len(dir_bytes))

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 0x18, 0x003E)  # minor version
    struct.pack_into("<H", header, 0x1A, 3)  # major version 3
    struct.pack_into("<H", header, 0x1C, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 0x1E, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 0x20, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 0x2C, n_fat)
    struct.pack_into("<I", header, 0x30, dir_at)
    struct.pack_into("<I", header, 0x38, mini_cutoff)
    struct.pack_into(
        "<I", header, 0x3C,
        minifat_at if n_minifat_sectors else ENDOFCHAIN,
    )
    struct.pack_into("<I", header, 0x40, n_minifat_sectors)
    struct.pack_into("<I", header, 0x44, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 0x48, 0)
    for k in range(109):
        struct.pack_into(
            "<I", header, 0x4C + 4 * k,
            fat_at + k if k < n_fat else FREESECT,
        )

    body = bytearray()
    body += struct.pack(f"<{len(fat)}I", *fat)[: n_fat * SSZ]
    if n_minifat_sectors:
        mf = struct.pack(f"<{len(minifat)}I", *minifat)
        body += mf + b"\x00" * (n_minifat_sectors * SSZ - len(mf))
    body += dir_bytes
    if n_mini_sectors:
        body += mini_data + b"\x00" * (n_mini_sectors * SSZ - len(mini_data))
    for k_ in big:
        b = big[k_]
        body += b + b"\x00" * (big_sectors[k_] * SSZ - len(b))
    return bytes(header) + bytes(body)


# --- independent .doc writer -------------------------------------------------------


def build_doc(pieces, encrypted: bool = False, ccp_text: int | None = None,
              big_word_stream: bool = False) -> bytes:
    """A binary Word file from (text, compressed) pieces: FIB +
    1Table Clx/PlcPcd with REAL fc offsets into WordDocument."""
    text_area = bytearray()
    pcds = []
    cps = [0]
    base = 0x800  # text area starts here in WordDocument
    for text, compressed in pieces:
        cps.append(cps[-1] + len(text))
        at = base + len(text_area)
        if compressed:
            pcds.append(struct.pack("<HIH", 0, (at * 2) | 0x40000000, 0))
            text_area += text.encode("cp1252")
        else:
            pcds.append(struct.pack("<HIH", 0, at, 0))
            text_area += text.encode("utf-16-le")
    plc = b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    fib = bytearray(0x200)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib: Word97
    flags = 0x0200  # fWhichTblStm = 1 -> "1Table"
    if encrypted:
        flags |= 0x0100
    struct.pack_into("<H", fib, 0x0A, flags)
    struct.pack_into(
        "<I", fib, 0x4C,
        ccp_text if ccp_text is not None else cps[-1],
    )
    fc_clx = 64
    struct.pack_into("<I", fib, 0x1A2, fc_clx)
    struct.pack_into("<I", fib, 0x1A6, len(clx))

    word = bytes(fib) + b"\x00" * (base - 0x200) + bytes(text_area)
    if big_word_stream:
        word += b"\x00" * max(0, 5000 - len(word))
    table = b"\x00" * fc_clx + clx
    return write_cfb({"WordDocument": word, "1Table": table})


# --- CFB layer ----------------------------------------------------------------------


def test_cfb_streams_big_and_mini():
    big = bytes(range(256)) * 20  # 5120 B: FAT chain
    small = b"tiny stream body"  # mini stream via miniFAT
    cfb = write_cfb({"BigOne": big, "SmallOne": small})
    got = O.cfb_streams(cfb)
    assert got["BigOne"] == big
    assert got["SmallOne"] == small


def test_cfb_multi_sector_fat_and_many_streams():
    streams = {f"s{i:02d}": bytes([i]) * (4096 + i) for i in range(40)}
    got = O.cfb_streams(write_cfb(streams))
    assert got == streams


def test_cfb_rejections():
    with pytest.raises(ValueError, match="magic"):
        O.cfb_streams(b"not ole2 " * 60)
    ok = write_cfb({"WordDocument": b"x" * 5000})
    # corrupt the FAT: point the directory chain at FREESECT
    bad = bytearray(ok)
    struct.pack_into("<I", bad, 0x30, 0x00FFFFF0)  # first dir sector wild
    with pytest.raises(ValueError, match="out of range|escapes"):
        O.cfb_streams(bytes(bad))
    # cycle: make sector 0's FAT entry point at itself via dir chain
    bad2 = bytearray(ok)
    dir_at = struct.unpack_from("<I", ok, 0x30)[0]
    struct.pack_into("<I", bad2, 512 + 4 * dir_at, dir_at)  # self-loop
    with pytest.raises(ValueError, match="cycle"):
        O.cfb_streams(bytes(bad2))


# --- .doc layer ---------------------------------------------------------------------


def test_doc_mixed_pieces_roundtrip_exactly():
    doc = build_doc(
        [
            ("Hello from CP1252 — déjà vu.\r", True),
            ("Вторая часть in UTF-16 with em—dash.\r", False),
            ("Tail piece, compressed again.\r", True),
        ]
    )
    text, n = O._doc_extract_text(doc)
    assert text.split("\n") == [
        "Hello from CP1252 — déjà vu.",
        "Вторая часть in UTF-16 with em—dash.",
        "Tail piece, compressed again.",
    ]
    assert n == 3


def test_doc_control_char_mapping_and_ccptext_truncation():
    body = "Cell one\x07Cell two\x07Row end\x07line\x0bbreak\rpage\x0c"
    hidden = "FOOTNOTE TEXT THAT MUST NOT LEAK\r"
    doc = build_doc(
        [(body, True), (hidden, True)], ccp_text=len(body)
    )
    text, _ = O._doc_extract_text(doc)
    assert "Cell one" in text and "line" in text and "break" in text
    assert "FOOTNOTE" not in text  # beyond ccpText: not main-document text


def test_doc_big_wordstream_and_utf16_only():
    doc = build_doc([("Unicode only: ünïcode ✓\r", False)],
                    big_word_stream=True)
    text, n = O._doc_extract_text(doc)
    assert text == "Unicode only: ünïcode ✓" and n == 1


def test_doc_rejection_matrix():
    with pytest.raises(NotImplementedError, match="fEncrypted"):
        O._doc_extract_text(build_doc([("x\r", True)], encrypted=True))
    with pytest.raises(NotImplementedError, match="EncryptedPackage"):
        O._doc_extract_text(
            write_cfb({"EncryptedPackage": b"\x00" * 64})
        )
    with pytest.raises(NotImplementedError, match=r"\.xls"):
        O._doc_extract_text(write_cfb({"Workbook": b"\x00" * 64}))
    with pytest.raises(NotImplementedError, match=r"\.ppt"):
        O._doc_extract_text(
            write_cfb({"PowerPoint Document": b"\x00" * 64})
        )
    with pytest.raises(ValueError, match="WordDocument"):
        O._doc_extract_text(write_cfb({"SomethingElse": b"\x00" * 64}))
    with pytest.raises(ValueError, match="wIdent"):
        O._doc_extract_text(
            write_cfb({"WordDocument": b"\x00" * 0x200, "1Table": b""})
        )
    # a PCD whose fc points past the end of the WordDocument stream
    doc = bytearray(build_doc([("escape me\r", True)]))
    at = bytes(doc).find(struct.pack("<I", (0x800 * 2) | 0x40000000))
    assert at > 0  # the piece's FcCompressed in the 1Table stream
    struct.pack_into("<I", doc, at, (0x4000000 * 2) | 0x40000000)
    with pytest.raises(ValueError, match="escapes"):
        O._doc_extract_text(bytes(doc))


def test_doc_through_router_and_spark_lane(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    doc = build_doc([("Legacy doc body, routed by magic.\r", True)])
    assert sniff_document(doc) == "doc"
    rows = [
        (0, bytearray(doc)),
        (1, bytearray(build_doc([("locked\r", True)], encrypted=True))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "doc"
    assert got[0]["text"] == "Legacy doc body, routed by magic."
    assert got[1]["text"] is None  # encrypted: quarantined, job intact
