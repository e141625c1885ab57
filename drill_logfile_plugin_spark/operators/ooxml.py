"""XLSX / PPTX text extraction — stdlib only (zipfile + xml.etree).

DOCX's two OOXML siblings, closing the family: a document dump's
spreadsheets and slide decks are ``.xlsx``/``.pptx`` far more often
than their binary ancestors.

* **XLSX** (SpreadsheetML): ``xl/workbook.xml`` names the sheets and
  their relationship ids, ``xl/_rels/workbook.xml.rels`` maps ids to
  worksheet parts (the spec's indirection — sheet ORDER in
  workbook.xml is authoritative, file names are not),
  ``xl/sharedStrings.xml`` holds the string table (``<si>`` items
  whose text is the concatenation of their ``<t>`` runs — plain and
  rich forms alike), and each worksheet's cells carry ``t="s"``
  (shared string), ``t="inlineStr"``, ``t="str"`` (cached formula
  text), ``t="b"`` (boolean), or numeric ``<v>``. Cells linearize in
  row order, tab-joined, sheets prefixed ``## name`` — the same
  layout as the binary ``.xls`` lane, so downstream text processing
  is format-blind.
* **PPTX** (PresentationML): text lives in ``ppt/slides/slideN.xml``
  as DrawingML ``<a:t>`` runs inside ``<a:p>`` paragraphs; slides
  order numerically, paragraphs become lines. Notes masters and
  layouts are excluded (template boilerplate, the dedup tier's job).

Zip-bomb guards mirror the DOCX lane: declared uncompressed sizes are
summed and bounded BEFORE reads, every member reads through a capped
stream, and ElementTree ignores DTDs (no external entities).

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree as ET

_MAX_UNCOMPRESSED = 256 << 20
# Depth bound for recursive element walks: deeper nesting than this in
# sharedStrings/slide XML is crafted, not authored (ppt.py uses the same
# discipline via its _MAX_DEPTH).
_MAX_XML_DEPTH = 64
_S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_R_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)


def _open_zip(payload: bytes, kind: str) -> zipfile.ZipFile:
    if not payload.startswith(b"PK"):
        raise ValueError(f"not a {kind} (missing zip signature)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"{kind} zip archive malformed: {exc}")
    total = 0
    for info in zf.infolist():
        total += info.file_size
        if total > _MAX_UNCOMPRESSED:
            raise ValueError(
                f"{kind} declared uncompressed size exceeds the decoder bound"
            )
    return zf


def _read_member(zf: zipfile.ZipFile, name: str, kind: str) -> bytes:
    try:
        with zf.open(name) as fh:
            data = fh.read(_MAX_UNCOMPRESSED + 1)
    except KeyError:
        raise ValueError(f"{kind} has no {name}")
    except (zipfile.BadZipFile, zlib.error, OSError, EOFError) as exc:
        raise ValueError(f"{kind} member corrupt: {exc}")
    if len(data) > _MAX_UNCOMPRESSED:
        raise ValueError(f"{kind} member {name} exceeds the decoder bound")
    return data


def _parse_xml(data: bytes, what: str):
    try:
        return ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"{what} malformed: {exc}")


def _col_index(ref: str) -> int | None:
    """A1-style reference -> zero-based column index."""
    col = 0
    seen = False
    for ch in ref:
        if "A" <= ch <= "Z":
            col = col * 26 + (ord(ch) - 64)
            seen = True
        elif "a" <= ch <= "z":
            col = col * 26 + (ord(ch) - 96)
            seen = True
        else:
            break
    return col - 1 if seen else None


def _si_text(si) -> str:
    """A shared-string item's text: concatenated <t> runs (plain and
    rich forms; phonetic runs <rPh> excluded per the spec's guidance)."""
    parts = []
    skip = {f"{_S_NS}rPh", f"{_S_NS}phoneticPr"}

    def walk(node, depth=0):
        if depth > _MAX_XML_DEPTH:
            raise ValueError("sharedStrings item nested too deeply")
        if node.tag in skip:
            return
        if node.tag == f"{_S_NS}t":
            parts.append(node.text or "")
        for child in node:
            walk(child, depth + 1)

    walk(si)
    return "".join(parts)


def _fmt_num_str(v: str) -> str:
    try:
        f = float(v)
    except ValueError:
        return v
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return v


def _xlsx_extract_text(payload: bytes):
    """``(text, n_cells)`` from a SpreadsheetML workbook."""
    zf = _open_zip(payload, "XLSX")
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise ValueError("XLSX has no xl/workbook.xml (not SpreadsheetML)")

    # shared strings (optional member)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = _parse_xml(
            _read_member(zf, "xl/sharedStrings.xml", "XLSX"),
            "XLSX sharedStrings.xml",
        )
        shared = [_si_text(si) for si in root.findall(f"{_S_NS}si")]

    # sheet order + names from workbook.xml, targets via the rels part
    wb = _parse_xml(
        _read_member(zf, "xl/workbook.xml", "XLSX"), "XLSX workbook.xml"
    )
    rels = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rroot = _parse_xml(
            _read_member(zf, "xl/_rels/workbook.xml.rels", "XLSX"),
            "XLSX workbook rels",
        )
        for rel in rroot.findall(f"{_PKG_REL_NS}Relationship"):
            target = rel.get("Target") or ""
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            rels[rel.get("Id")] = target
    sheets = []
    sheets_el = wb.find(f"{_S_NS}sheets")
    for sheet in (
        sheets_el.findall(f"{_S_NS}sheet") if sheets_el is not None else []
    ):
        rid = sheet.get(f"{_R_NS}id")
        target = rels.get(rid)
        if target is None:
            # rels missing: fall back to conventional naming by position
            target = f"xl/worksheets/sheet{len(sheets) + 1}.xml"
        sheets.append((sheet.get("name") or f"Sheet{len(sheets) + 1}", target))
    if not sheets:
        raise ValueError("XLSX workbook declares no sheets")

    lines: list[str] = []
    n_cells = 0
    for sheet_name, target in sheets:
        if target not in names:
            continue
        root = _parse_xml(_read_member(zf, target, "XLSX"), f"XLSX {target}")
        sheet_lines: list[str] = []
        for row in root.iter(f"{_S_NS}row"):
            cells: dict[int, str] = {}
            next_col = 0
            for c in row.findall(f"{_S_NS}c"):
                ref = c.get("r")
                col = _col_index(ref) if ref else None
                if col is None:
                    col = next_col
                next_col = col + 1
                ctype = c.get("t") or "n"
                text = None
                if ctype == "inlineStr":
                    is_el = c.find(f"{_S_NS}is")
                    if is_el is not None:
                        text = _si_text(is_el)
                else:
                    v = c.find(f"{_S_NS}v")
                    if v is None or v.text is None:
                        continue
                    if ctype == "s":
                        try:
                            idx = int(v.text)
                        except ValueError:
                            continue
                        if 0 <= idx < len(shared):
                            text = shared[idx]
                    elif ctype == "b":
                        text = "TRUE" if v.text.strip() == "1" else "FALSE"
                    elif ctype in ("str", "e"):
                        text = v.text
                    else:  # numeric
                        text = _fmt_num_str(v.text)
                if text is not None:
                    cells[col] = text
                    n_cells += 1
            if cells:
                sheet_lines.append(
                    "\t".join(cells[c] for c in sorted(cells))
                )
        if sheet_lines:
            lines.append(f"## {sheet_name}")
            lines.extend(sheet_lines)
    if not lines:
        raise ValueError("XLSX workbook has no extractable cells")
    return "\n".join(lines), n_cells


_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def _pptx_extract_text(payload: bytes):
    """``(text, n_slides)`` from a PresentationML deck."""
    zf = _open_zip(payload, "PPTX")
    slides = sorted(
        (
            (int(m.group(1)), name)
            for name in zf.namelist()
            if (m := _SLIDE_RE.match(name))
        ),
    )
    if not slides and "ppt/presentation.xml" not in zf.namelist():
        raise ValueError("PPTX has no ppt/presentation.xml (not PresentationML)")
    lines: list[str] = []
    for _num, name in slides:
        root = _parse_xml(_read_member(zf, name, "PPTX"), f"PPTX {name}")
        for p in root.iter(f"{_A_NS}p"):
            parts = []
            for node in p.iter():
                if node.tag == f"{_A_NS}t":
                    parts.append(node.text or "")
                elif node.tag == f"{_A_NS}br":
                    parts.append("\n")
            line = "".join(parts).strip()
            if line:
                lines.append(line)
    if not lines:
        raise ValueError("PPTX deck has no text runs")
    return "\n".join(lines), len(slides)
