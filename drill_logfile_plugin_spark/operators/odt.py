"""ODT (OpenDocument Text) extraction — stdlib only (zipfile + ElementTree).

The third office format real dumps carry (LibreOffice/OpenOffice
exports, government document troves). Same package shape as DOCX —
a zip whose text layer is one XML member — with OpenDocument's own
vocabulary:

* ``content.xml`` holds the body; paragraphs are ``text:p`` and
  headings ``text:h`` (both become lines), ``text:tab`` -> ``\\t``,
  ``text:line-break`` -> newline, ``text:s`` (run of spaces) expands
  per its ``text:c`` count — OpenDocument collapses literal runs the
  way XML would, so these elements ARE the whitespace;
* tables (``table:table`` / ``table:table-row`` / ``table:table-cell``)
  flatten with the DOCX linearization (cell paragraphs joined, cells by
  tabs, rows by newlines);
* the DOCX lane's zip-bomb guards apply unchanged; encrypted ODT
  (``manifest:encryption-data`` in the manifest — the payload members
  are then Blowfish/AES blobs) raises NotImplementedError.

Spark lane: ``extract_odt_text`` -> ``(doc_id, text, n_paragraphs,
n_chars)``; also routed by ``documents.sniff_document`` (zip member
``content.xml`` + ``mimetype`` of the OpenDocument family).

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import io
import zipfile
import zlib
from xml.etree import ElementTree as ET

_ODT_MAX_UNCOMPRESSED = 256 << 20
_TNS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TABNS = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_ONS = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"


_MAX_XML_DEPTH = 64


def _walk_paragraph(p) -> str:
    parts: list[str] = []

    def walk(node, depth=0):
        if depth > _MAX_XML_DEPTH:
            raise ValueError("ODF paragraph nested too deeply")
        if node.tag == f"{_TNS}tab":
            parts.append("\t")
        elif node.tag == f"{_TNS}line-break":
            parts.append("\n")
        elif node.tag == f"{_TNS}s":
            parts.append(" " * int(node.get(f"{_TNS}c", "1") or "1"))
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child, depth + 1)
            if child.tail:
                parts.append(child.tail)

    if p.text:
        parts.append(p.text)
    for child in p:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def _odf_content_root(payload: bytes, kind: str):
    """Shared OpenDocument package opener: zip guards, the encrypted-
    manifest quarantine, content.xml parsed — the body element."""
    if not payload.startswith(b"PK"):
        raise ValueError(f"not an {kind} (missing zip signature)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"{kind} zip archive malformed: {exc}")
    total = 0
    names = set()
    for info in zf.infolist():
        total += info.file_size
        if total > _ODT_MAX_UNCOMPRESSED:
            raise ValueError(
                f"{kind} declared uncompressed size exceeds the decoder bound"
            )
        names.add(info.filename)
    if "content.xml" not in names:
        raise ValueError(
            f"{kind} has no content.xml (not an OpenDocument package)"
        )
    if "META-INF/manifest.xml" in names:
        try:
            with zf.open("META-INF/manifest.xml") as fh:
                manifest = fh.read(1 << 20)
        except (zipfile.BadZipFile, zlib.error, OSError, EOFError) as exc:
            raise ValueError(f"{kind} manifest corrupt: {exc}")
        if b"encryption-data" in manifest:
            raise NotImplementedError(
                f"encrypted {kind} (manifest encryption-data): decryption "
                "is a plug-in point"
            )
    try:
        with zf.open("content.xml") as fh:
            xml_bytes = fh.read(_ODT_MAX_UNCOMPRESSED + 1)
    except (zipfile.BadZipFile, zlib.error, OSError, EOFError) as exc:
        raise ValueError(f"{kind} member corrupt: {exc}")
    if len(xml_bytes) > _ODT_MAX_UNCOMPRESSED:
        raise ValueError(f"{kind} content.xml exceeds the decoder bound")
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        raise ValueError(f"{kind} content.xml malformed: {exc}")
    body = root.find(f"{_ONS}body")
    if body is None:
        raise ValueError(f"{kind} content.xml has no office:body")
    return body


def _odt_extract_text(payload: bytes):
    """Extract the text layer: returns ``(text, n_paragraphs)``."""
    body = _odf_content_root(payload, "ODT")
    text_el = body.find(f"{_ONS}text")
    if text_el is None:
        raise ValueError("ODT content.xml has no office:text body")

    lines: list[str] = []
    n_paragraphs = 0

    def walk(node, depth=0):
        if depth > _MAX_XML_DEPTH:
            raise ValueError("ODT body nested too deeply")
        nonlocal n_paragraphs
        for child in node:
            if child.tag in (f"{_TNS}p", f"{_TNS}h"):
                n_paragraphs += 1
                lines.append(_walk_paragraph(child))
            elif child.tag == f"{_TABNS}table":
                for row in child.iter(f"{_TABNS}table-row"):
                    cells = []
                    for cell in row.findall(f"{_TABNS}table-cell"):
                        cell_lines = []
                        for p in cell.iter(f"{_TNS}p"):
                            n_paragraphs += 1
                            cell_lines.append(_walk_paragraph(p))
                        cells.append("\n".join(cell_lines))
                    lines.append("\t".join(cells))
            else:
                walk(child, depth + 1)

    walk(text_el)
    return "\n".join(lines).strip("\n"), n_paragraphs


def extract_odt_text(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: ODT payloads -> ``(doc_id, text, n_paragraphs,
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
            StructField("n_paragraphs", IntegerType()),
            StructField("n_chars", LongType()),
        ]
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, texts, nps, ncs = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    text, n_par = _odt_extract_text(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    if on_error == "skip":
                        continue
                    text, n_par = None, None
                ids.append(doc_id)
                texts.append(text)
                nps.append(n_par)
                ncs.append(None if text is None else len(text))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text": pd.Series(texts, dtype="object"),
                    "n_paragraphs": pd.Series(nps, dtype="Int32"),
                    "n_chars": pd.Series(ncs, dtype="Int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)


_DRAWNS = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"


def _ods_extract_text(payload: bytes):
    """ODS (OpenDocument Spreadsheet): ``(text, n_cells)`` — sheets as
    ``## name`` blocks, rows tab-joined in cell order (honoring
    ``table:number-columns-repeated`` for NON-EMPTY cells only, so a
    million-repeat empty filler costs nothing), matching the xls/xlsx
    linearization so downstream text processing stays format-blind."""
    body = _odf_content_root(payload, "ODS")
    sheet_root = body.find(f"{_ONS}spreadsheet")
    if sheet_root is None:
        raise ValueError("ODS content.xml has no office:spreadsheet body")
    lines: list[str] = []
    n_cells = 0
    for table in sheet_root.findall(f"{_TABNS}table"):
        name = table.get(f"{_TABNS}name") or f"Sheet{len(lines) + 1}"
        sheet_lines: list[str] = []
        for row in table.iter(f"{_TABNS}table-row"):
            cells: list[str] = []
            for cell in row:
                if cell.tag not in (
                    f"{_TABNS}table-cell", f"{_TABNS}covered-table-cell",
                ):
                    continue
                repeat = int(
                    cell.get(f"{_TABNS}number-columns-repeated", "1") or "1"
                )
                paras = [
                    _walk_paragraph(p) for p in cell.iter(f"{_TNS}p")
                ]
                text = "\n".join(p for p in paras if p)
                if text:
                    if repeat > 4096:
                        raise ValueError(
                            "ODS repeated non-empty cell count exceeds the "
                            "decoder bound"
                        )
                    cells.extend([text] * repeat)
                elif cells and repeat <= 4096:
                    # interior empty cells keep column alignment; a
                    # trailing filler run is trimmed below
                    cells.extend([""] * repeat)
            while cells and cells[-1] == "":
                cells.pop()
            if cells:
                n_cells += sum(1 for c in cells if c)
                sheet_lines.append("\t".join(cells))
        if sheet_lines:
            lines.append(f"## {name}")
            lines.extend(sheet_lines)
    if not lines:
        raise ValueError("ODS workbook has no extractable cells")
    return "\n".join(lines), n_cells


def _odp_extract_text(payload: bytes):
    """ODP (OpenDocument Presentation): ``(text, n_slides)`` — each
    ``draw:page``'s paragraphs become lines, pages in document order
    (notes excluded: ``presentation:notes`` subtrees are skipped)."""
    body = _odf_content_root(payload, "ODP")
    pres = body.find(f"{_ONS}presentation")
    if pres is None:
        raise ValueError("ODP content.xml has no office:presentation body")
    pages = pres.findall(f"{_DRAWNS}page")
    lines: list[str] = []
    notes_tag = (
        "{urn:oasis:names:tc:opendocument:xmlns:presentation:1.0}notes"
    )
    for page in pages:
        def walk(node, depth=0):
            if depth > _MAX_XML_DEPTH:
                raise ValueError("ODP page nested too deeply")
            if node.tag == notes_tag:
                return
            if node.tag in (f"{_TNS}p", f"{_TNS}h"):
                text = _walk_paragraph(node)
                if text.strip():
                    lines.append(text)
                return
            for child in node:
                walk(child, depth + 1)

        walk(page)
    if not lines:
        raise ValueError("ODP deck has no text paragraphs")
    return "\n".join(lines), len(pages)
