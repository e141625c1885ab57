"""Archive explosion: zip/tar dumps into one row per member file.

Document dumps rarely arrive as loose files — they arrive as zip,
tar (optionally gz/bz2/xz-compressed), and 7z archives (r9:
:mod:`.sevenzip` — LZMA2/LZMA1/Copy/BZip2 folders, solid archives,
compressed headers). This operator is
the ingestion step AHEAD of the document router: each archive payload
explodes into its member files as ``(doc_id, member_idx, member_name,
payload, n_bytes)`` rows, and ``extract_document_text`` (or the media
lanes) then route each member by its own magic — "a tarball of mixed
PDFs and HTML in, training text out" is two composed calls.

Rules:

* zip via stdlib ``zipfile``; tar via ``tarfile`` over an in-memory
  stream, with the tar bytes first run through the package's bounded
  ``decompress_payload`` sniffing when they carry a gzip/bz2/xz
  envelope (``.tar.gz`` handled without a separate pass);
* directories, links, and zero-byte members are skipped (nothing to
  route); member NAMES pass through untouched — path traversal is a
  non-issue because nothing here touches a filesystem (bytes to bytes);
* zip-bomb guards: declared uncompressed sizes are summed and bounded
  BEFORE any member is read, each member reads through a capped
  stream, and member counts are bounded;
* nested archives are NOT recursed (a member that is itself a zip
  emerges as that zip's bytes — re-apply the operator if a dump nests,
  which keeps every explosion's cost visible in the plan).

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import io
import tarfile
import zipfile
import zlib

_MAX_MEMBERS = 1 << 20
_MAX_TOTAL = 1 << 31  # 2 GiB declared-uncompressed bound per archive
_MAX_MEMBER = 512 << 20

#: magic prefixes for the compressed-tar envelopes decompress_payload opens
_TAR_ENVELOPES = (b"\x1f\x8b", b"BZh", b"\xfd7zXZ\x00", b"\x28\xb5\x2f\xfd")


def _zip_members(payload: bytes):
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"zip archive malformed: {exc}")
    infos = zf.infolist()
    if len(infos) > _MAX_MEMBERS:
        raise ValueError(f"archive member count exceeds the bound ({_MAX_MEMBERS})")
    total = 0
    for info in infos:
        total += info.file_size
        if total > _MAX_TOTAL:
            raise ValueError("archive declared size exceeds the bound")
    for info in infos:
        if info.is_dir() or info.file_size == 0:
            continue
        try:
            with zf.open(info) as fh:
                data = fh.read(_MAX_MEMBER + 1)
        except (zipfile.BadZipFile, zlib.error, OSError, EOFError) as exc:
            raise ValueError(f"archive member corrupt: {exc}")
        if len(data) > _MAX_MEMBER:
            raise ValueError("archive member exceeds the member bound")
        yield info.filename, data


def _tar_members(payload: bytes):
    if any(payload[: len(m)] == m for m in _TAR_ENVELOPES):
        # streaming bounded inflate (decompressobj/max_length) capped AT
        # _MAX_TOTAL — the one-shot gzip/bz2/lzma.decompress functions
        # inflate fully BEFORE any size check, so a small bz2/xz bomb
        # (>10^4:1 ratios) would exhaust executor memory ahead of the
        # guard; the shared bounded primitive closes that window.
        # .tar.zst routes through the import-guarded bounded zstd lane
        # (NotImplementedError names the missing module actionably).
        from .multimodal import _make_zstd_one, bounded_decompress_bytes

        try:
            if payload[:4] == b"\x28\xb5\x2f\xfd":
                payload = _make_zstd_one(_MAX_TOTAL)(payload)
            else:
                codec = (
                    "gzip"
                    if payload[:2] == b"\x1f\x8b"
                    else ("bz2" if payload[:3] == b"BZh" else "xz")
                )
                payload = bounded_decompress_bytes(payload, codec, _MAX_TOTAL)
        except ValueError as exc:
            raise ValueError(f"compressed tar envelope corrupt: {exc}")
    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:")
    except tarfile.TarError as exc:
        raise ValueError(f"tar archive malformed: {exc}")
    count = 0
    total = 0
    for member in tf:
        count += 1
        if count > _MAX_MEMBERS:
            raise ValueError(f"archive member count exceeds the bound ({_MAX_MEMBERS})")
        if not member.isfile() or member.size == 0:
            continue
        total += member.size
        if total > _MAX_TOTAL:
            raise ValueError("archive declared size exceeds the bound")
        fh = tf.extractfile(member)
        if fh is None:
            continue
        data = fh.read(_MAX_MEMBER + 1)
        if len(data) > _MAX_MEMBER:
            raise ValueError("archive member exceeds the member bound")
        yield member.name, data


def archive_members(payload: bytes, password: str | None = None):
    """Yield ``(name, bytes)`` for each regular member; ValueError on
    anything that is not a zip / tar / compressed tar / 7z.
    ``password`` (r11) decrypts 7zAES archives (including encrypted
    headers); zip-crypto is a separate, unimplemented scheme."""
    if payload[:2] == b"PK":
        yield from _zip_members(payload)
        return
    if payload[:6] == b"7z\xbc\xaf\x27\x1c":
        from .sevenzip import sevenzip_members

        total = 0
        count = 0
        for name, data in sevenzip_members(payload, password=password):
            count += 1
            if count > _MAX_MEMBERS:
                raise ValueError(
                    f"archive member count exceeds the bound ({_MAX_MEMBERS})"
                )
            total += len(data)
            if total > _MAX_TOTAL or len(data) > _MAX_MEMBER:
                raise ValueError("archive declared size exceeds the bound")
            yield name, data
        return
    if (
        any(payload[: len(m)] == m for m in _TAR_ENVELOPES)
        or payload[257:262] == b"ustar"
    ):
        yield from _tar_members(payload)
        return
    raise ValueError("payload is neither a zip nor a (compressed) tar nor a 7z")


def explode_archive(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
    password: str | None = None,
):
    """Spark lane (one-to-many): archive payloads -> one row per member
    ``(doc_id, member_idx, member_name, payload, n_bytes)``. An
    unreadable ARCHIVE yields zero rows under "skip" (default) or
    aborts under "strict"; member reads are all-or-nothing per archive
    (a lying member bound fails that archive, not the job, under
    "skip"). ``password`` (r11) decrypts 7zAES archives in the batch;
    a corpus-wide known password is the realistic shape (per-row
    passwords belong to a pre-join against a credential table)."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .multimodal import _check_on_error

    _check_on_error(on_error, allowed=("skip", "strict"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("member_idx", IntegerType()),
            StructField("member_name", StringType()),
            StructField("payload", BinaryType()),
            StructField("n_bytes", LongType()),
        ]
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, names, blobs, sizes = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    members = list(
                        archive_members(bytes(p), password=password)
                    )
                except ValueError:
                    if on_error == "strict":
                        raise
                    continue
                for i, (name, data) in enumerate(members):
                    ids.append(doc_id)
                    idxs.append(i)
                    names.append(name)
                    blobs.append(data)
                    sizes.append(len(data))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "member_idx": pd.Series(idxs, dtype="int32"),
                    "member_name": pd.Series(names, dtype="object"),
                    "payload": pd.Series(blobs, dtype="object"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
