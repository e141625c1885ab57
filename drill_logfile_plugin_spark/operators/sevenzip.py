"""7z archive member extraction — stdlib only (lzma/bz2 + the spec).

The third real archive family in scraped dumps after zip and tar. The
7z container (the published ``7zFormat.txt`` layout) is a 32-byte
signature header (magic ``37 7A BC AF 27 1C``, next-header
offset/size) plus a property-tree header of byte-tagged records and
variable-length numbers:

* **PackInfo** — packed-stream position and sizes;
* **UnPackInfo** — folders (coder chains): this reader decodes
  single-coder folders with **LZMA2** (coder id ``21``, one-byte
  dict-size property), **LZMA1** (``030101``, 5-byte lc/lp/pb + dict
  property), **Copy** (``00``), and **BZip2** (``040202``) via the
  stdlib's raw-filter decompressors — bounded with ``max_length`` so
  a forged size costs the cap, not memory. LINEAR filter chains
  (r10) — an LZMA1/LZMA2 compressor followed by BCJ branch converters
  (x86/PowerPC/IA64/ARM/ARM-Thumb/SPARC) and/or delta — fuse into ONE
  stdlib-lzma raw decompressor (liblzma applies the inverse transforms
  on decode), with bind pairs resolved to the decode order and the
  folder's output stream taken from the UNBOUND out index;
  delta-over-Copy decodes numerically. **7zAES** (``06F10701``)
  decrypts when a password is supplied (r11): key = the published
  SHA-256 iteration over salt ‖ UTF-16LE password ‖ 64-bit counter,
  2^NumCyclesPower rounds (7zFormat.txt / 7-Zip 7zAes.cpp), then
  AES-256-CBC through the repo's FIPS-197 implementation
  (``pdf_crypt``) — member folders and encrypted headers alike;
  without a password it stays a named quarantine. BCJ2 (4-input) and
  non-linear graphs raise named quarantines;
* **SubStreamsInfo** — solid archives pack many files into one
  folder; per-folder substream counts and sizes split the unpacked
  stream;
* **FilesInfo** — names (UTF-16LE) and the empty-stream bitfield that
  distinguishes directories/empty files from stream-bearing members;
* **kEncodedHeader** — archives routinely compress their own header;
  it decodes through the same folder machinery, once (no recursive
  re-encoding).

Emits ``(name, bytes)`` members like the zip/tar walkers, under the
same member-count/size bounds, so ``explode_archive`` routes all three
families through one lane.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document ingestion).
"""

from __future__ import annotations

import struct

MAGIC = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_MAX_COUNT = 1 << 20
_MAX_UNPACK = 2 << 30  # matches the archive tier's total bound

_COPY = b"\x00"
_LZMA2 = b"\x21"
_LZMA1 = b"\x03\x01\x01"
_BZIP2 = b"\x04\x02\x02"
_7ZAES = b"\x06\xf1\x07\x01"


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("7z header truncated")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("7z header truncated")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def number(self) -> int:
        """7z variable-length number: the first byte's high bits count
        the extra little-endian bytes; its remaining low bits are the
        value's high part."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if first & mask == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitfield(self, n: int) -> list:
        bits = []
        data = self.bytes((n + 7) // 8)
        for i in range(n):
            bits.append(bool(data[i // 8] & (0x80 >> (i % 8))))
        return bits

    def bitfield_all_defined(self, n: int) -> list:
        return [True] * n if self.byte() else self.bitfield(n)

    def skip_crcs(self, n: int) -> None:
        defined = self.bitfield_all_defined(n)
        self.bytes(4 * sum(defined))


#: branch-convert / delta filter coders -> stdlib lzma raw-filter ids
#: (7-Zip methods registry; liblzma applies the inverse transform on
#: decode, so a compressor+filter chain fuses into ONE raw decompressor)
_FILTER_CODERS = {
    b"\x03": "delta",
    b"\x03\x03\x01\x03": "x86",
    b"\x03\x03\x02\x05": "powerpc",
    b"\x03\x03\x04\x01": "ia64",
    b"\x03\x03\x05\x01": "arm",
    b"\x03\x03\x07\x01": "armthumb",
    b"\x03\x03\x08\x05": "sparc",
}


def _lzma_filter_entry(cid: bytes, props: bytes) -> dict:
    import lzma

    kind = _FILTER_CODERS[cid]
    if kind == "delta":
        if len(props) != 1:
            raise ValueError("7z delta filter property size invalid")
        return {"id": lzma.FILTER_DELTA, "dist": props[0] + 1}
    return {
        "id": getattr(lzma, f"FILTER_{kind.upper()}"),
    }


def _chain_order(coders, bind_pairs, stream_counts=None):
    """Decode order of a LINEAR folder chain (every coder 1-in/1-out,
    one packed stream): coder k owns global in/out stream k, so bind
    pair (i, o) feeds coder o's output into coder i. Returns coder
    indices from the packed stream to the folder output.

    The coder-index-as-stream-index identity HOLDS ONLY when every
    coder is 1-in/1-out, so a multi-stream coder (BCJ2 is 4-in/1-out)
    is rejected explicitly up front (r11, per ADVICE) — previously such
    folders failed only incidentally via the bounds/linearity checks."""
    if stream_counts is not None:
        for k, (n_in, n_out) in enumerate(stream_counts):
            if n_in != 1 or n_out != 1:
                raise ValueError(
                    "7z folder chain is not linear: coder "
                    f"{k} ({coders[k][0].hex()}) has {n_in} input / "
                    f"{n_out} output streams (1-in/1-out required)"
                )
    next_of = {}
    bound_ins = set()
    for i, o in bind_pairs:
        if not (0 <= i < len(coders) and 0 <= o < len(coders)):
            raise ValueError("7z bind pair indexes escape the folder")
        next_of[o] = i
        bound_ins.add(i)
    heads = [k for k in range(len(coders)) if k not in bound_ins]
    if len(heads) != 1:
        raise ValueError("7z folder chain is not linear")
    order = [heads[0]]
    seen = {heads[0]}
    while order[-1] in next_of:
        nxt = next_of[order[-1]]
        if nxt in seen:
            raise ValueError("7z folder chain has a cycle")
        order.append(nxt)
        seen.add(nxt)
    if len(order) != len(coders):
        raise ValueError("7z folder chain does not cover its coders")
    return order


def _decode_filter_chain(coders, order, packed, unpack_size) -> bytes:
    """A compressor followed by BCJ/delta filters, decoded as ONE fused
    stdlib-lzma raw chain (LZMA1/LZMA2 head) or a manual delta pass
    over a Copy head."""
    import lzma

    head_cid, head_props = coders[order[0]]
    tail = [coders[k] for k in order[1:]]
    for cid, _p in tail:
        if cid not in _FILTER_CODERS:
            raise NotImplementedError(
                f"7z coder id {cid.hex()} in a filter chain is a "
                "plug-in point (BCJ/delta filters decode)"
            )
    filters = [_lzma_filter_entry(cid, p) for cid, p in reversed(tail)]
    if head_cid == _LZMA2:
        if len(head_props) != 1:
            raise ValueError("7z LZMA2 property size invalid")
        filters.append(
            {"id": lzma.FILTER_LZMA2, "dict_size": _lzma2_dict(head_props[0])}
        )
    elif head_cid == _LZMA1:
        if len(head_props) != 5:
            raise ValueError("7z LZMA1 property size invalid")
        d = head_props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        if pb > 4:
            raise ValueError("7z LZMA1 properties invalid")
        (dict_size,) = struct.unpack("<I", head_props[1:5])
        filters.append(
            {
                "id": lzma.FILTER_LZMA1,
                "lc": lc, "lp": lp, "pb": pb,
                "dict_size": max(4096, dict_size),
            }
        )
    elif head_cid == _COPY:
        # uncompressed + delta (the raw-capture layout): liblzma raw
        # chains need a compression head, so the delta inverse runs here
        import numpy as np

        out = packed
        for cid, p in reversed(tail):
            if _FILTER_CODERS[cid] != "delta":
                raise NotImplementedError(
                    "7z Copy + BCJ filter chain is a plug-in point "
                    "(delta-over-Copy decodes)"
                )
            if len(p) != 1:
                raise ValueError("7z delta filter property size invalid")
            dist = p[0] + 1
            arr = np.frombuffer(out, dtype=np.uint8).copy()
            pad = (-len(arr)) % dist
            if pad:
                arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
            arr = (
                np.cumsum(arr.reshape(-1, dist), axis=0, dtype=np.uint64)
                % 256
            ).astype(np.uint8)
            out = arr.reshape(-1)[: len(out)].tobytes()
        return out
    else:
        raise NotImplementedError(
            f"7z chain head coder id {head_cid.hex()} is a plug-in "
            "point (LZMA1/LZMA2/Copy heads decode under filters)"
        )
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filters)
    try:
        return dec.decompress(packed, unpack_size)
    except lzma.LZMAError as exc:
        raise ValueError(f"7z filtered stream corrupt: {exc}")


def _parse_aes_props(props: bytes) -> tuple[int, bytes, bytes]:
    """7zAES coder properties -> (num_cycles_power, salt, iv), per the
    published layout (7zFormat.txt / 7-Zip 7zAes.cpp): byte 0 carries
    the cycles power in bits 0-5 and one extra salt/IV length bit each
    in bits 7/6; byte 1 (present when either flag is set) carries the
    remaining length nibbles; salt bytes then IV bytes follow. The IV
    is zero-padded to the AES block size."""
    if not props:
        raise ValueError("7zAES coder properties missing")
    b0 = props[0]
    cycles = b0 & 0x3F
    salt_size = iv_size = 0
    at = 1
    if b0 & 0xC0:
        if len(props) < 2:
            raise ValueError("7zAES coder properties truncated")
        b1 = props[1]
        salt_size = ((b0 >> 7) & 1) + (b1 >> 4)
        iv_size = ((b0 >> 6) & 1) + (b1 & 0x0F)
        at = 2
    if len(props) < at + salt_size + iv_size:
        raise ValueError("7zAES salt/IV escape the coder properties")
    salt = props[at : at + salt_size]
    iv = props[at + salt_size : at + salt_size + iv_size]
    return cycles, salt, iv.ljust(16, b"\x00")


#: derivation-cost ceiling: 7-Zip's own default is 19 (2^19 rounds);
#: a crafted archive demanding 2^62 rounds is a CPU bomb, not a file.
_MAX_AES_CYCLES_POWER = 24


def _aes_key_from_password(password: str, cycles: int, salt: bytes) -> bytes:
    """The 7z key derivation (7zAes.cpp CKeyInfo::CalcKey): password
    UTF-16LE; cycles == 0x3F means the no-hash layout (salt+password
    zero-padded to 32 bytes); otherwise one SHA-256 over 2^cycles
    repetitions of (salt || password || counter_le64)."""
    import hashlib

    pwd = password.encode("utf-16-le")
    if cycles == 0x3F:
        return (salt + pwd)[:32].ljust(32, b"\x00")
    if cycles > _MAX_AES_CYCLES_POWER:
        raise ValueError(
            f"7zAES cycles power {cycles} exceeds the derivation bound "
            f"({_MAX_AES_CYCLES_POWER})"
        )
    h = hashlib.sha256()
    block = salt + pwd
    for i in range(1 << cycles):
        h.update(block)
        h.update(struct.pack("<Q", i))
    return h.digest()


def _aes_decrypt_stream(props: bytes, data: bytes, password: str) -> bytes:
    """Decrypt one 7zAES-coded stream: AES-256-CBC with the derived
    key, no unpadding (7z zero-pads to the block size; the downstream
    decoder reads exactly what it needs). Reuses the from-scratch
    FIPS-197 AES in ``pdf_crypt``."""
    from .pdf_crypt import aes_cbc_decrypt

    cycles, salt, iv = _parse_aes_props(props)
    if len(data) % 16 or not data:
        raise ValueError("7zAES ciphertext length not a block multiple")
    key = _aes_key_from_password(password, cycles, salt)
    return aes_cbc_decrypt(key, iv, data, unpad=False)


def _decode_folder(
    folder, packed: list, unpack_size: int, password: str | None = None
) -> bytes:
    """One folder's unpacked bytes: single coders via bounded stdlib
    decompressors; LINEAR compressor+BCJ/delta chains fused through
    stdlib-lzma raw filters (r10). Non-linear folders — any multi-in/
    multi-out coder (BCJ2) or >1 packed stream — quarantine by the
    NAMED 'not linear' guard (r11, per ADVICE), not incidentally.

    7zAES folders (r11): with a ``password``, the AES stage — always
    adjacent to the packed stream in the coder graph — is stripped
    first (key = the published SHA-256 iteration over salt ‖ UTF-16LE
    password ‖ counter; AES-256-CBC via the repo's FIPS-197 tables),
    then the remaining chain decodes as usual. Without a password the
    named quarantine stands. A wrong password surfaces as the NAMED
    decrypt failure (the decompressor downstream rejects the garbage;
    7zAES itself carries no verifier — integrity lives in the CRCs)."""
    if isinstance(folder, tuple):
        coders, bind_pairs = folder[0], folder[1]
        stream_counts = folder[2] if len(folder) > 2 else None
        n_packed = folder[3] if len(folder) > 3 else 1
    else:
        coders, bind_pairs, stream_counts, n_packed = folder, [], None, 1
    has_aes = any(cid == _7ZAES for cid, _props in coders)
    if has_aes and password is None:
        raise NotImplementedError(
            "7z AES-encrypted archive (7zAES coder): pass password=... "
            "to decrypt"
        )
    if n_packed != 1:
        raise ValueError(
            "7z folder chain is not linear: folder declares "
            f"{n_packed} packed streams (exactly 1 required)"
        )
    if unpack_size > _MAX_UNPACK:
        raise ValueError("7z folder unpack size exceeds the bound")
    data = packed[0]
    if len(coders) == 1:
        order = [0]
    else:
        order = _chain_order(coders, bind_pairs, stream_counts)
    if has_aes:
        if coders[order[0]][0] != _7ZAES:
            raise NotImplementedError(
                "7zAES coder not adjacent to the packed stream: this "
                "chain layout is a plug-in point"
            )
        data = _aes_decrypt_stream(coders[order[0]][1], data, password)
        order = order[1:]
        try:
            return _decode_plain_chain(coders, order, data, unpack_size)
        except ValueError as exc:
            raise ValueError(
                f"7z decrypt failed (wrong password or corrupt): {exc}"
            )
    return _decode_plain_chain(coders, order, data, unpack_size)


def _decode_plain_chain(
    coders, order: list, data: bytes, unpack_size: int
) -> bytes:
    """Decode an already-decrypted linear chain given its decode order
    (empty order = the AES coder was the whole folder: raw copy)."""
    if not order:
        out = data
    elif len(order) > 1:
        out = _decode_filter_chain(
            [coders[k] for k in order],
            list(range(len(order))),
            data,
            unpack_size,
        )
    else:
        out = _decode_single(coders[order[0]], data, unpack_size)
    if len(out) < unpack_size:
        raise ValueError("7z folder shorter than its declared unpack size")
    return out[:unpack_size]


def _decode_single(coder, data: bytes, unpack_size: int) -> bytes:
    """One non-AES coder's decode (Copy/LZMA1/LZMA2/BZip2)."""
    cid, props = coder
    if cid == _COPY:
        out = data
    elif cid == _LZMA2:
        import lzma

        if len(props) != 1:
            raise ValueError("7z LZMA2 property size invalid")
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": _lzma2_dict(props[0])}],
        )
        try:
            out = dec.decompress(data, unpack_size)
        except lzma.LZMAError as exc:
            raise ValueError(f"7z LZMA2 stream corrupt: {exc}")
    elif cid == _LZMA1:
        import lzma

        if len(props) != 5:
            raise ValueError("7z LZMA1 property size invalid")
        d = props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        if pb > 4:
            raise ValueError("7z LZMA1 properties invalid")
        (dict_size,) = struct.unpack("<I", props[1:5])
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[
                {
                    "id": lzma.FILTER_LZMA1,
                    "lc": lc, "lp": lp, "pb": pb,
                    "dict_size": max(4096, dict_size),
                }
            ],
        )
        try:
            out = dec.decompress(data, unpack_size)
        except lzma.LZMAError as exc:
            raise ValueError(f"7z LZMA1 stream corrupt: {exc}")
    elif cid == _BZIP2:
        import bz2

        dec = bz2.BZ2Decompressor()
        try:
            out = dec.decompress(data, unpack_size)
        except OSError as exc:
            raise ValueError(f"7z bzip2 stream corrupt: {exc}")
    else:
        raise NotImplementedError(
            f"7z coder id {cid.hex()} is a plug-in point "
            "(Copy/LZMA1/LZMA2/BZip2 decode)"
        )
    if len(out) < unpack_size:
        raise ValueError("7z folder shorter than its declared unpack size")
    return out[:unpack_size]


def _lzma2_dict(prop: int) -> int:
    """The LZMA2 one-byte dictionary-size property."""
    if prop > 40:
        raise ValueError("7z LZMA2 dictionary property invalid")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _parse_folder(r: _Reader):
    """One folder record -> (coders, total_out_streams, bind_pairs,
    out_index). ``coders`` is [(cid, props)], ``bind_pairs`` is
    [(in_index, out_index)] over the folder-global stream numbering,
    and ``out_index`` is the folder's OUTPUT stream (the out stream no
    bind pair consumes) — the index whose size in kCodersUnpackSize is
    the folder's unpacked size."""
    num_coders = r.number()
    if not 1 <= num_coders <= 64:
        raise ValueError("7z folder coder count invalid")
    coders = []
    stream_counts: list = []
    total_in = total_out = 0
    for _ in range(num_coders):
        flags = r.byte()
        id_size = flags & 0x0F
        cid = r.bytes(id_size)
        n_in = n_out = 1
        if flags & 0x10:  # complex
            n_in = r.number()
            n_out = r.number()
        props = b""
        if flags & 0x20:
            props = r.bytes(r.number())
        coders.append((cid, props))
        stream_counts.append((n_in, n_out))
        total_in += n_in
        total_out += n_out
    n_bind = total_out - 1
    bind_pairs = [(r.number(), r.number()) for _ in range(n_bind)]
    n_packed = total_in - n_bind
    if n_packed > 1:
        for _ in range(n_packed):
            r.number()
    bound_outs = {o for _i, o in bind_pairs}
    out_index = next(
        (o for o in range(total_out) if o not in bound_outs), total_out - 1
    )
    return coders, total_out, bind_pairs, out_index, stream_counts, n_packed


def _parse_streams_info(r: _Reader):
    """kMainStreamsInfo / kEncodedHeader body -> (pack_pos, pack_sizes,
    folders, folder_unpack_sizes, substreams)."""
    pack_pos = 0
    pack_sizes: list = []
    folders: list = []
    unpack_sizes: list = []
    sub_counts = None
    sub_sizes = None
    folder_crc_defined: list = []
    while True:
        prop = r.number()
        if prop == _K_END:
            break
        if prop == _K_PACK_INFO:
            pack_pos = r.number()
            n = r.number()
            if n > _MAX_COUNT:
                raise ValueError("7z pack-stream count exceeds the bound")
            while True:
                p = r.number()
                if p == _K_END:
                    break
                if p == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(n)]
                elif p == _K_CRC:
                    r.skip_crcs(n)
                else:
                    raise ValueError(f"7z PackInfo property {p} invalid")
        elif prop == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise ValueError("7z UnPackInfo missing kFolder")
            n_folders = r.number()
            if n_folders > _MAX_COUNT:
                raise ValueError("7z folder count exceeds the bound")
            if r.byte() != 0:
                raise ValueError("7z external folder data unsupported")
            outs = []
            for _ in range(n_folders):
                (coders, total_out, bind_pairs, out_idx,
                 stream_counts, n_packed) = _parse_folder(r)
                folders.append((coders, bind_pairs, stream_counts, n_packed))
                outs.append((total_out, out_idx))
            if r.number() != _K_UNPACK_SIZES:
                raise ValueError("7z UnPackInfo missing kCodersUnpackSize")
            all_sizes = []
            for total_out, out_idx in outs:
                sizes = [r.number() for _ in range(total_out)]
                all_sizes.append(sizes[out_idx])  # the folder's output
            unpack_sizes = all_sizes
            while True:
                p = r.number()
                if p == _K_END:
                    break
                if p == _K_CRC:
                    # Remember which folders carry a CRC: SubStreamsInfo
                    # digests are stored only for streams whose CRC is
                    # not already defined here (7zFormat.txt, kCRC).
                    folder_crc_defined = r.bitfield_all_defined(n_folders)
                    r.bytes(4 * sum(folder_crc_defined))
                else:
                    raise ValueError(f"7z UnPackInfo property {p} invalid")
        elif prop == _K_SUBSTREAMS:
            sub_counts = None
            sub_sizes = []
            while True:
                p = r.number()
                if p == _K_END:
                    break
                if p == _K_NUM_UNPACK_STREAM:
                    sub_counts = [r.number() for _ in folders]
                elif p == _K_SIZE:
                    counts = sub_counts or [1] * len(folders)
                    for fi, cnt in enumerate(counts):
                        if cnt == 0:
                            continue
                        sizes = [r.number() for _ in range(cnt - 1)]
                        sizes.append(unpack_sizes[fi] - sum(sizes))
                        if sizes[-1] < 0:
                            raise ValueError("7z substream sizes overflow")
                        sub_sizes.append(sizes)
                elif p == _K_CRC:
                    counts = sub_counts or [1] * len(folders)
                    # Digests cover only streams without a folder-level
                    # CRC: a single-substream folder whose CRC was
                    # defined in UnPackInfo stores no digest here.
                    n_digests = sum(
                        cnt
                        for fi, cnt in enumerate(counts)
                        if not (
                            cnt == 1
                            and fi < len(folder_crc_defined)
                            and folder_crc_defined[fi]
                        )
                    )
                    r.skip_crcs(n_digests)
                else:
                    raise ValueError(f"7z SubStreams property {p} invalid")
            if sub_counts is not None and not sub_sizes:
                # counts given without explicit sizes: single substream
                # folders carry their folder size
                for fi, cnt in enumerate(sub_counts):
                    if cnt == 1:
                        sub_sizes.append([unpack_sizes[fi]])
                    elif cnt > 1:
                        raise ValueError(
                            "7z multi-substream folder without kSize"
                        )
        else:
            raise ValueError(f"7z StreamsInfo property {prop} invalid")
    return pack_pos, pack_sizes, folders, unpack_sizes, (sub_counts, sub_sizes)


def _read_names(data: bytes, n_files: int) -> list:
    if data[:1] != b"\x00":
        raise ValueError("7z external names unsupported")
    raw = data[1:]
    names = []
    start = 0
    for i in range(0, len(raw) - 1, 2):
        if raw[i : i + 2] == b"\x00\x00":
            names.append(raw[start:i].decode("utf-16-le", errors="replace"))
            start = i + 2
            if len(names) == n_files:
                break
    if len(names) != n_files:
        raise ValueError("7z name table shorter than the file count")
    return names


def sevenzip_members(payload: bytes, password: str | None = None):
    """Yield ``(name, bytes)`` for each non-empty regular member of a 7z
    archive; ValueError on corruption, NotImplementedError on
    undecodable coder chains. 7zAES archives (r11) decrypt when
    ``password`` is given — both member folders and the encrypted
    header (7-Zip's "encrypt file names" mode) — and stay a named
    NotImplementedError quarantine without one."""
    if payload[:6] != MAGIC:
        raise ValueError("not a 7z archive (magic missing)")
    if len(payload) < 32:
        raise ValueError("7z signature header truncated")
    nh_offset, nh_size = struct.unpack_from("<QQ", payload, 12)
    if nh_size == 0:
        return  # empty archive
    start = 32 + nh_offset
    if nh_size > len(payload) or start + nh_size > len(payload):
        raise ValueError("7z next-header escapes the payload")
    header = payload[start : start + nh_size]

    r = _Reader(header)
    prop = r.number()
    if prop == _K_ENCODED_HEADER:
        pack_pos, pack_sizes, folders, unpack_sizes, _subs = (
            _parse_streams_info(r)
        )
        if not folders or not pack_sizes:
            raise ValueError("7z encoded header has no streams")
        at = 32 + pack_pos
        packed = payload[at : at + pack_sizes[0]]
        if len(packed) != pack_sizes[0]:
            raise ValueError("7z packed header escapes the payload")
        header = _decode_folder(
            folders[0], [packed], unpack_sizes[0], password=password
        )
        r = _Reader(header)
        prop = r.number()
    if prop != _K_HEADER:
        raise ValueError("7z header tag missing")

    folders: list = []
    pack_sizes = []
    pack_pos = 0
    unpack_sizes: list = []
    subs = (None, None)
    n_files = 0
    names: list = []
    empty_stream: list = []
    while True:
        prop = r.number()
        if prop == _K_END:
            break
        if prop == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders, unpack_sizes, subs = (
                _parse_streams_info(r)
            )
        elif prop == _K_FILES_INFO:
            n_files = r.number()
            if n_files > _MAX_COUNT:
                raise ValueError("7z file count exceeds the bound")
            while True:
                p = r.number()
                if p == _K_END:
                    break
                size = r.number()
                body = r.bytes(size)
                if p == _K_NAME:
                    names = _read_names(body, n_files)
                elif p == _K_EMPTY_STREAM:
                    br = _Reader(body)
                    empty_stream = br.bitfield(n_files)
                # every other property (times/attributes/kEmptyFile/
                # kDummy) is skipped by its declared size
        else:
            raise ValueError(f"7z header property {prop} invalid")

    if not names:
        names = [f"member{i}" for i in range(n_files)]
    if not empty_stream:
        empty_stream = [False] * n_files

    # split folders into substreams, pair with stream-bearing names
    sub_counts, sub_sizes = subs
    if sub_counts is None:
        sub_counts = [1] * len(folders)
        sub_sizes = [[sz] for sz in unpack_sizes]
    elif not sub_sizes:
        sub_sizes = [[sz] for sz in unpack_sizes]
    stream_names = [
        nm for nm, empty in zip(names, empty_stream) if not empty
    ]
    if sum(sub_counts) != len(stream_names):
        raise ValueError(
            "7z substream count disagrees with the stream-bearing files"
        )
    pack_at = 32 + pack_pos
    pack_idx = 0
    name_idx = 0
    for fi, coders in enumerate(folders):
        size = pack_sizes[pack_idx] if pack_idx < len(pack_sizes) else 0
        packed = payload[pack_at : pack_at + size]
        if len(packed) != size:
            raise ValueError("7z packed stream escapes the payload")
        pack_at += size
        pack_idx += 1
        if sub_counts[fi] == 0:
            continue
        data = _decode_folder(
            coders, [packed], unpack_sizes[fi], password=password
        )
        off = 0
        for sz in sub_sizes[fi]:
            member = data[off : off + sz]
            off += sz
            name = stream_names[name_idx]
            name_idx += 1
            if member:
                yield name, member
