"""DOCX text extraction — stdlib only (zipfile + xml.etree).

The other document format enterprise and scraped corpora arrive in
beside PDF. OOXML WordprocessingML is a zip archive whose text layer
lives in ``word/document.xml``; extraction is a namespace-aware XML
walk, not an OCR problem:

* paragraphs (``w:p``) become lines; runs (``w:r``) concatenate within
  a paragraph; literal text is ``w:t`` (with ``xml:space="preserve"``
  honored by ElementTree's text handling), tabs (``w:tab``) become
  ``\\t``, explicit breaks (``w:br``, ``w:cr``) become newlines;
* tables (``w:tbl``) flatten in document order — each cell's
  paragraphs are lines, cells joined by tabs, rows by newlines (the
  pdftotext-style linearization);
* headers/footers/footnotes live in OTHER zip members and are
  deliberately excluded — the main story is the training text, and
  repeated headers are exactly the boilerplate the dedup tier removes.

Untrusted-input guards before any allocation: the zip's DECLARED
uncompressed sizes are summed and bounded (zip-bomb rule), the
document member is read through a capped stream, and XML parsing uses
stdlib ElementTree (no external entity resolution — ET ignores DTDs).
Encrypted OOXML (an OLE container, not a zip) and legacy ``.doc``
(OLE2 binary) raise NotImplementedError as named plug-in points.

The Spark lane mirrors :func:`..operators.pdf.extract_pdf_text`:
Arrow-batched mapInPandas, per-row quarantine, output
``(doc_id, text, n_paragraphs, n_chars)`` — the text tier's input
shape.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import io
import zipfile
import zlib
from xml.etree import ElementTree as ET

#: zip-bomb guard: total declared uncompressed size across members
_DOCX_MAX_UNCOMPRESSED = 256 << 20
#: the one member the text layer lives in
_DOC_MEMBER = "word/document.xml"
_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _walk_paragraph(p) -> str:
    """One ``w:p`` to a text line, in document order."""
    parts: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == f"{_W_NS}t":
            parts.append(node.text or "")
        elif tag == f"{_W_NS}tab":
            parts.append("\t")
        elif tag in (f"{_W_NS}br", f"{_W_NS}cr"):
            parts.append("\n")
    return "".join(parts)


def _docx_extract_text(payload: bytes):
    """Extract the text layer: returns ``(text, n_paragraphs)``."""
    if payload[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise NotImplementedError(
            "OLE2 container (legacy .doc or encrypted OOXML) is a "
            "plug-in point; zip-based .docx is supported"
        )
    if not payload.startswith(b"PK"):
        raise ValueError("not a DOCX (missing zip signature)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"DOCX zip archive malformed: {exc}")
    total = 0
    doc_info = None
    for info in zf.infolist():
        total += info.file_size
        if total > _DOCX_MAX_UNCOMPRESSED:
            raise ValueError(
                "DOCX declared uncompressed size exceeds the decoder bound"
            )
        if info.filename == _DOC_MEMBER:
            doc_info = info
    if doc_info is None:
        raise ValueError("DOCX has no word/document.xml (not WordprocessingML)")
    # read through a capped stream: a lying local header cannot blow
    # past the bound even if the central directory undercounted
    try:
        with zf.open(doc_info) as fh:
            xml_bytes = fh.read(_DOCX_MAX_UNCOMPRESSED + 1)
    except (zipfile.BadZipFile, zlib.error, OSError, EOFError) as exc:
        # CRC/inflate failures surface at READ time, not open time
        raise ValueError(f"DOCX member corrupt: {exc}")
    if len(xml_bytes) > _DOCX_MAX_UNCOMPRESSED:
        raise ValueError("DOCX document.xml exceeds the decoder bound")
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        raise ValueError(f"DOCX document.xml malformed: {exc}")

    lines: list[str] = []
    n_paragraphs = 0
    body = root.find(f"{_W_NS}body")
    if body is None:
        raise ValueError("DOCX document.xml has no body")

    def walk(node):
        nonlocal n_paragraphs
        for child in node:
            tag = child.tag
            if tag == f"{_W_NS}p":
                n_paragraphs += 1
                lines.append(_walk_paragraph(child))
            elif tag == f"{_W_NS}tbl":
                for row in child.findall(f"{_W_NS}tr"):
                    cells = []
                    for cell in row.findall(f"{_W_NS}tc"):
                        cell_lines = []
                        for p in cell.iter(f"{_W_NS}p"):
                            n_paragraphs += 1
                            cell_lines.append(_walk_paragraph(p))
                        cells.append("\n".join(cell_lines))
                    lines.append("\t".join(cells))
            elif tag == f"{_W_NS}sectPr":
                continue
            else:
                walk(child)

    walk(body)
    text = "\n".join(lines).strip("\n")
    return text, n_paragraphs


def extract_docx_text(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: DOCX payloads -> ``(doc_id, text, n_paragraphs,
    n_chars)`` with the tier's quarantine contract (see
    :func:`..operators.pdf.extract_pdf_text`)."""
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
                    text, n_par = _docx_extract_text(bytes(p))
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
