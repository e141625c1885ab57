"""EPUB text extraction — stdlib only (zipfile + ElementTree), composing
the package's HTML block extractor.

Books are the highest-value text an LLM corpus carries, and they ship
as EPUB: a zip package whose reading order is declared in an OPF
manifest and whose chapters are XHTML. Extraction per the spec:

1. ``META-INF/container.xml`` names the OPF rootfile;
2. the OPF ``<manifest>`` maps item ids to hrefs and the ``<spine>``
   lists the READING ORDER by idref — chapter files are read in spine
   order, never zip order (zip order is build noise);
3. each chapter is XHTML — the jusText-style block extractor
   (:mod:`.boilerplate`) segments and classifies it, which also strips
   the per-chapter furniture (nav blocks, footer links) real EPUBs
   carry. Chapters join with form feeds (the page convention the PDF
   extractor uses).

Guards mirror the DOCX lane: summed declared uncompressed sizes
bounded before reads, capped member streams, stdlib ElementTree (no
entity resolution). DRM'd EPUBs (``META-INF/encryption.xml`` present)
raise NotImplementedError — a named plug-in point.

Spark lane: ``extract_epub_text`` -> ``(doc_id, text, n_chapters,
n_chars)``, Arrow-batched with the tier's quarantine contract.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
import zlib
from xml.etree import ElementTree as ET

from .boilerplate import _extract_main

#: zip-bomb guard (shared rule with the DOCX lane)
_EPUB_MAX_UNCOMPRESSED = 256 << 20
_CONTAINER = "META-INF/container.xml"
_ENCRYPTION = "META-INF/encryption.xml"
_CNS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_ONS = "{http://www.idpf.org/2007/opf}"


def _read_member(zf: zipfile.ZipFile, name: str) -> bytes:
    try:
        with zf.open(name) as fh:
            data = fh.read(_EPUB_MAX_UNCOMPRESSED + 1)
    except KeyError:
        raise ValueError(f"EPUB missing required member {name!r}")
    except (zipfile.BadZipFile, zlib.error, OSError, EOFError) as exc:
        # CRC/inflate failures surface at READ time, not open time
        raise ValueError(f"EPUB member corrupt: {exc}")
    if len(data) > _EPUB_MAX_UNCOMPRESSED:
        raise ValueError("EPUB member exceeds the decoder bound")
    return data


def _epub_extract_text(payload: bytes):
    """Extract the book text: returns ``(text, n_chapters)``."""
    if not payload.startswith(b"PK"):
        raise ValueError("not an EPUB (missing zip signature)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"EPUB zip archive malformed: {exc}")
    names = set()
    total = 0
    for info in zf.infolist():
        total += info.file_size
        if total > _EPUB_MAX_UNCOMPRESSED:
            raise ValueError(
                "EPUB declared uncompressed size exceeds the decoder bound"
            )
        names.add(info.filename)
    if _ENCRYPTION in names:
        raise NotImplementedError(
            "DRM'd EPUB (META-INF/encryption.xml): decryption is a "
            "plug-in point"
        )
    if _CONTAINER not in names:
        raise ValueError("EPUB has no META-INF/container.xml")
    try:
        container = ET.fromstring(_read_member(zf, _CONTAINER))
    except ET.ParseError as exc:
        raise ValueError(f"EPUB container.xml malformed: {exc}")
    rootfile = container.find(f".//{_CNS}rootfile")
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError("EPUB container names no rootfile")
    opf_path = rootfile.get("full-path")
    try:
        opf = ET.fromstring(_read_member(zf, opf_path))
    except ET.ParseError as exc:
        raise ValueError(f"EPUB OPF malformed: {exc}")
    base = posixpath.dirname(opf_path)
    items = {
        it.get("id"): it.get("href")
        for it in opf.iter(f"{_ONS}item")
        if it.get("id") and it.get("href")
    }
    spine = [
        ref.get("idref")
        for ref in opf.iter(f"{_ONS}itemref")
        if ref.get("idref")
    ]
    if not spine:
        raise ValueError("EPUB spine is empty")
    chapters = []
    for idref in spine:
        href = items.get(idref)
        if href is None:
            continue  # a dangling idref loses that chapter only
        path = posixpath.normpath(posixpath.join(base, href))
        if path not in names:
            continue
        xhtml = _read_member(zf, path).decode("utf-8", errors="replace")
        text, _nb, _ng = _extract_main(xhtml)
        chapters.append(text)
    if not chapters:
        raise ValueError("EPUB spine references no readable chapters")
    return "\f".join(chapters), len(chapters)


def extract_epub_text(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: EPUB payloads -> ``(doc_id, text, n_chapters,
    n_chars)`` with the tier's quarantine contract."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .multimodal import _check_on_error

    _check_on_error(on_error)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("n_chapters", IntegerType()),
            StructField("n_chars", LongType()),
        ]
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, texts, ncs, nchars = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    text, n_ch = _epub_extract_text(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    if on_error == "skip":
                        continue
                    text, n_ch = None, None
                ids.append(doc_id)
                texts.append(text)
                ncs.append(n_ch)
                nchars.append(None if text is None else len(text))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text": pd.Series(texts, dtype="object"),
                    "n_chapters": pd.Series(ncs, dtype="Int32"),
                    "n_chars": pd.Series(nchars, dtype="Int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
