"""Legacy binary ``.doc`` extraction: OLE2 compound file + piece table.

Legacy government/enterprise troves are ``.doc``-heavy, and the format
is two published layers deep:

1. **CFB / OLE2 compound file** ([MS-CFB]): a FAT filesystem in a
   file. Header (512 bytes, magic ``D0 CF 11 E0 A1 B1 1A E1``) carries
   the sector size, the DIFAT (locations of FAT sectors), the first
   directory sector, and the mini-stream geometry. Streams are FAT
   sector chains; streams smaller than the mini-stream cutoff (4096)
   chain 64-byte mini-sectors through the miniFAT inside the ROOT
   entry's stream. ``cfb_streams`` walks all of it with cycle guards
   (a chain longer than the sector count is corrupt, not long).

2. **WordDocument stream** ([MS-DOC]): the FIB starts at offset 0
   (``wIdent`` 0xA5EC); flag bit 0x0100 = encrypted (named
   quarantine), bit 0x0200 selects the ``0Table``/``1Table`` stream.
   The text lives in PIECES: ``fcClx/lcbClx`` (FIB offsets
   0x1A2/0x1A6) point at the Clx in the table stream, whose Pcdt
   holds a PlcPcd — n+1 character positions plus n PCDs, each PCD's
   30-bit ``fc`` locating the piece's bytes in WordDocument with bit
   30 marking 8-bit CP1252 ("compressed", fc halved) vs UTF-16LE.
   Only the first ``ccpText`` characters (FIB 0x4C) are main-document
   text — the tail of the CP space is footnotes/headers/annotations,
   excluded by design (repeated headers are the boilerplate the dedup
   tier strips anyway).

Word's in-text control characters map to plain text: CR and 0x0B
(line break) -> newline, 0x07 (cell/row mark) -> newline, 0x0C (page
break) -> form feed, 0x1E/0x1F (non-breaking/optional hyphen) ->
hyphen/nothing, field markers 0x13/0x14/0x15 dropped.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_MAX_STREAM = 256 << 20
_MAX_SECTORS = 1 << 22  # 2 GiB of 512-byte sectors


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def cfb_stream_names(payload: bytes) -> list:
    """Directory-only walk: the stream NAMES of an OLE2 compound file,
    without reading any stream content — the sniffing cost model (the
    zip central-directory precedent applied to OLE2: O(directory), not
    O(content))."""
    entries, _read = _cfb_open(payload)
    return [name for name, _s, _z in entries]


def cfb_streams(payload: bytes) -> dict:
    """All STREAM objects of an OLE2 compound file: name -> bytes
    (FLAT — storage hierarchy ignored; later duplicates win).
    ValueError on structural corruption; bounded against forged
    geometry (sector counts, chain cycles, stream sizes)."""
    entries, read_stream = _cfb_open(payload)
    return {name: read_stream(start, size) for name, start, size in entries}


def cfb_top_level_streams(payload: bytes) -> dict:
    """TOP-LEVEL streams only: the root storage's red-black tree is
    walked from the root entry's child pointer, so streams inside
    sub-storages (e.g. an Outlook .msg's attachment storages, which
    reuse the SAME property-stream names as the message itself) can
    never shadow the root-level ones. Falls back to the flat dict when
    the file carries no tree pointers (some writers emit none)."""
    entries, read_stream, records = _cfb_open(payload, want_records=True)
    by_id = {i: rec for i, rec in records.items()}
    root_child = None
    for _i, rec in records.items():
        if rec["type"] == 5:
            root_child = rec["child"]
            break
    if root_child is None or root_child == _FREESECT:
        return {
            name: read_stream(start, size) for name, start, size in entries
        }
    out = {}
    stack = [root_child]
    seen = set()
    while stack:
        i = stack.pop()
        if i in seen or i == _FREESECT or i not in by_id:
            continue
        seen.add(i)
        if len(seen) > len(by_id):
            raise ValueError("OLE2 directory tree cycles")
        rec = by_id[i]
        stack.extend([rec["left"], rec["right"]])
        if rec["type"] == 2:
            out[rec["name"]] = read_stream(rec["start"], rec["size"])
        # type 1 (storage): present at top level but NOT descended into
    return out


def _cfb_open(payload: bytes, want_records: bool = False):
    """``(entries, read_stream[, records])`` — the CFB walk shared by
    the names-only sniff and the full read: ``entries`` is
    ``[(name, start, size), ...]`` and ``read_stream(start, size)``
    resolves a FAT or miniFAT chain on demand. With ``want_records``,
    also returns ``{entry_id: {name, type, left, right, child, start,
    size}}`` for tree-aware callers."""
    if payload[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound file (magic missing)")
    if len(payload) < 512:
        raise ValueError("OLE2 header truncated")
    sector_shift = _u16(payload, 0x1E)
    if sector_shift not in (9, 12):
        raise ValueError(f"OLE2 sector shift {sector_shift} invalid")
    ssz = 1 << sector_shift
    mini_shift = _u16(payload, 0x20)
    if mini_shift != 6:
        raise ValueError(f"OLE2 mini-sector shift {mini_shift} invalid")
    n_fat = _u32(payload, 0x2C)
    first_dir = _u32(payload, 0x30)
    mini_cutoff = _u32(payload, 0x38)
    first_minifat = _u32(payload, 0x3C)
    first_difat = _u32(payload, 0x44)
    n_difat = _u32(payload, 0x48)
    n_sectors = (len(payload) - 512 + ssz - 1) // ssz
    if n_sectors > _MAX_SECTORS:
        raise ValueError("OLE2 sector count exceeds the decoder bound")

    def sector(i: int) -> bytes:
        if not 0 <= i < n_sectors:
            raise ValueError(f"OLE2 sector {i} out of range")
        off = 512 + i * ssz
        s = payload[off : off + ssz]
        return s + b"\x00" * (ssz - len(s))  # trailing sector may be short

    # DIFAT: 109 header slots + chained DIFAT sectors
    difat = [_u32(payload, 0x4C + 4 * k) for k in range(109)]
    cur = first_difat
    hops = 0
    while cur not in (_ENDOFCHAIN, _FREESECT):
        hops += 1
        if hops > n_difat + 1 or hops > n_sectors:
            raise ValueError("OLE2 DIFAT chain corrupt")
        s = sector(cur)
        difat.extend(
            _u32(s, 4 * k) for k in range((ssz - 4) // 4)
        )
        cur = _u32(s, ssz - 4)
    fat_sectors = [x for x in difat if x != _FREESECT][:n_fat]
    if len(fat_sectors) < n_fat:
        raise ValueError("OLE2 DIFAT names fewer FAT sectors than declared")
    fat_raw = b"".join(sector(s) for s in fat_sectors)
    fat = struct.unpack(f"<{len(fat_raw) // 4}I", fat_raw)

    def chain(start: int) -> list:
        out = []
        cur = start
        while cur != _ENDOFCHAIN:
            if cur >= len(fat) or cur in (_FREESECT, _FATSECT, _DIFSECT):
                raise ValueError("OLE2 FAT chain escapes the table")
            out.append(cur)
            if len(out) > n_sectors:
                raise ValueError("OLE2 FAT chain cycles")
            cur = fat[cur]
        return out

    dir_bytes = b"".join(sector(s) for s in chain(first_dir))
    entries = []
    records: dict = {}
    root = None
    for idx, off in enumerate(range(0, len(dir_bytes), 128)):
        e = dir_bytes[off : off + 128]
        if len(e) < 128:
            break
        nlen = _u16(e, 0x40)
        if not 2 <= nlen <= 64:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="replace")
        otype = e[0x42]
        start = _u32(e, 0x74)
        size = _u32(e, 0x78)  # high dword only meaningful for 4096 sectors
        if size > _MAX_STREAM:
            raise ValueError("OLE2 stream size exceeds the decoder bound")
        if want_records:
            records[idx] = {
                "name": name,
                "type": otype,
                "left": _u32(e, 0x44),
                "right": _u32(e, 0x48),
                "child": _u32(e, 0x4C),
                "start": start,
                "size": size,
            }
        if otype == 5 and root is None:
            root = (start, size)
        elif otype == 2:
            entries.append((name, start, size))
    if root is None:
        raise ValueError("OLE2 directory has no root entry")

    mini: dict = {}

    def _mini_state():
        """Lazy mini-stream + miniFAT load (a names-only walk never
        touches them)."""
        if not mini:
            mini["stream"] = b"".join(sector(s) for s in chain(root[0]))[
                : root[1]
            ]
            mini["fat"] = ()
            if first_minifat not in (_ENDOFCHAIN, _FREESECT):
                mf_raw = b"".join(sector(s) for s in chain(first_minifat))
                mini["fat"] = struct.unpack(f"<{len(mf_raw) // 4}I", mf_raw)
        return mini["stream"], mini["fat"]

    def read_stream(start: int, size: int) -> bytes:
        if size == 0:
            return b""
        if size >= mini_cutoff:
            data = b"".join(sector(s) for s in chain(start))[:size]
        else:
            mini_stream, minifat = _mini_state()
            out = []
            cur = start
            while cur != _ENDOFCHAIN:
                if cur >= len(minifat) or cur in (
                    _FREESECT, _FATSECT, _DIFSECT,
                ):
                    raise ValueError("OLE2 miniFAT chain escapes the table")
                out.append(mini_stream[cur * 64 : (cur + 1) * 64])
                if len(out) * 64 > root[1] + 64:
                    raise ValueError("OLE2 miniFAT chain cycles")
                cur = minifat[cur]
            data = b"".join(out)[:size]
        if len(data) < size:
            raise ValueError("OLE2 stream shorter than its declared size")
        return data

    if want_records:
        return entries, read_stream, records
    return entries, read_stream


#: in-text control characters -> extraction mapping ([MS-DOC] §2.8.24 et al.)
_DOC_CTRL = {
    0x0D: "\n", 0x0B: "\n", 0x07: "\n", 0x0C: "\f",
    0x1E: "-", 0x1F: "", 0x13: "", 0x14: "", 0x15: "",
    0x01: "", 0x02: "", 0x05: "", 0x08: "",
}


def _map_controls(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if o in _DOC_CTRL:
            out.append(_DOC_CTRL[o])
        elif o >= 0x20 or ch in "\t\n":
            out.append(ch)
    return "".join(out)


def _parse_clx(clx: bytes):
    """The Pcdt's PlcPcd out of a Clx: ``(cps, pcds)`` with cps a list
    of n+1 character positions and pcds n raw FcCompressed values."""
    pos = 0
    while pos < len(clx):
        clxt = clx[pos]
        if clxt == 1:  # Prc: skip the property modifier
            if pos + 3 > len(clx):
                raise ValueError(".doc Clx Prc truncated")
            cb = _u16(clx, pos + 1)
            pos += 3 + cb
        elif clxt == 2:  # Pcdt
            if pos + 5 > len(clx):
                raise ValueError(".doc Clx Pcdt truncated")
            lcb = _u32(clx, pos + 1)
            plc = clx[pos + 5 : pos + 5 + lcb]
            if len(plc) != lcb or lcb < 4 or (lcb - 4) % 12:
                raise ValueError(".doc PlcPcd geometry invalid")
            n = (lcb - 4) // 12
            cps = [_u32(plc, 4 * i) for i in range(n + 1)]
            pcds = [
                _u32(plc, 4 * (n + 1) + 8 * i + 2) for i in range(n)
            ]
            return cps, pcds
        else:
            raise ValueError(f".doc Clx type {clxt} invalid")
    raise ValueError(".doc Clx has no piece table (Pcdt)")


def _doc_extract_text(payload: bytes):
    """``(text, n_paragraphs)`` from a binary Word ``.doc``."""
    streams = cfb_streams(payload)
    wd = streams.get("WordDocument")
    if wd is None:
        if "EncryptedPackage" in streams:
            raise NotImplementedError(
                "encrypted OOXML (OLE2 EncryptedPackage): route via "
                "offcrypto.decrypt_ooxml — the empty-password/"
                "VelvetSweatshop profile decodes there (the document "
                "router does this automatically)"
            )
        for marker, kind in (
            ("Workbook", ".xls"), ("Book", ".xls"),
            ("PowerPoint Document", ".ppt"),
        ):
            if marker in streams:
                raise NotImplementedError(
                    f"OLE2 {kind} (stream {marker!r}): binary "
                    "Excel/PowerPoint extraction is a plug-in point"
                )
        raise ValueError("OLE2 file has no WordDocument stream")
    if len(wd) < 0x200:
        raise ValueError(".doc WordDocument FIB truncated")
    if _u16(wd, 0) != 0xA5EC:
        raise ValueError(".doc FIB wIdent mismatch (not a Word binary)")
    flags = _u16(wd, 0x0A)
    if flags & 0x0100:
        # Deliberately descoped (r9): unlike Excel there is no silent
        # default password (VelvetSweatshop) for Word, so the
        # empty-password population is negligible, and the [MS-DOC]
        # RC4 stream-offset conventions (which byte ranges of the
        # WordDocument/Table/Data streams consume keystream) cannot be
        # independently cross-checked in this environment — an in-test
        # writer would only mirror this module's own assumption.
        raise NotImplementedError(
            "encrypted .doc (FIB fEncrypted): a password or XOR "
            "obfuscation key is required"
        )
    ccp_text = _u32(wd, 0x4C)
    table_name = f"{1 if flags & 0x0200 else 0}Table"
    tbl = streams.get(table_name)
    if tbl is None:
        raise ValueError(f".doc table stream {table_name!r} missing")
    fc_clx = _u32(wd, 0x1A2)
    lcb_clx = _u32(wd, 0x1A6)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(tbl):
        raise ValueError(".doc piece table (Clx) missing or out of range")
    cps, pcds = _parse_clx(tbl[fc_clx : fc_clx + lcb_clx])
    parts = []
    remaining = min(ccp_text, cps[-1]) if ccp_text else cps[-1]
    for i, raw in enumerate(pcds):
        if remaining <= 0:
            break
        n_chars = min(cps[i + 1] - cps[i], remaining)
        if n_chars < 0:
            raise ValueError(".doc piece CPs not monotonic")
        fc = raw & 0x3FFFFFFF
        if raw & 0x40000000:  # compressed: 8-bit CP1252 at fc/2
            at = fc // 2
            chunk = wd[at : at + n_chars]
            if len(chunk) != n_chars:
                raise ValueError(".doc piece escapes the WordDocument stream")
            parts.append(chunk.decode("cp1252", errors="replace"))
        else:
            chunk = wd[fc : fc + 2 * n_chars]
            if len(chunk) != 2 * n_chars:
                raise ValueError(".doc piece escapes the WordDocument stream")
            parts.append(chunk.decode("utf-16-le", errors="replace"))
        remaining -= n_chars
    text = _map_controls("".join(parts))
    lines = [ln for ln in text.split("\n") if ln.strip()]
    return "\n".join(lines).strip(), len(lines)
