"""Caption/transcript (SRT, WebVTT) and notebook (ipynb) extraction.

Two more text-bearing formats large corpora actually mine:

* **Subtitles** — video-caption dumps (the YouTube-subtitle class of
  corpora) ship as SubRip ``.srt`` (numbered cues with
  ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing lines) or WebVTT (the
  ``WEBVTT`` header, ``.`` milliseconds, optional cue ids/settings,
  NOTE/STYLE blocks). Extraction drops cue numbers, timing lines, and
  inline markup tags (``<i>``, ``<c.color>``, VTT voice spans), keeps
  cue text in order, and de-duplicates the CONSECUTIVE-repeat artifact
  of rolling captions. Returns cue count + total span milliseconds —
  the duration is real metadata (last end time), so caption corpora
  can be token-per-second profiled.
* **Notebooks** — code corpora mine Jupyter ``.ipynb`` files: JSON
  (nbformat 4: ``cells`` with ``cell_type`` + ``source`` list-or-str;
  nbformat 3: ``worksheets[].cells`` with ``input`` for code).
  Extraction keeps markdown and code cell sources in order (outputs
  are machine noise), separated by form feeds per cell.

Both are strict parsers over untrusted input: malformed timing lines /
JSON raise ValueError; size bounds cap cue counts. The document router
(:mod:`.documents`) sniffs both: ``WEBVTT`` prefix, the SRT
first-cue shape, and JSON-with-``cells``.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import json
import re

_MAX_CUES = 1 << 20

#: SRT timing: comma milliseconds. VTT: dot milliseconds, hours optional.
_SRT_TIME = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
_VTT_TIME = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)
_TAG = re.compile(r"</?[^>]{0,128}>")


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def _clean_cue(lines: list[str]) -> str:
    text = " ".join(lines)
    text = _TAG.sub("", text)  # <i>, <b>, <c.color>, <v Speaker>
    return re.sub(r"\s+", " ", text).strip()


def _captions_extract_text(payload: bytes):
    """SRT or WebVTT -> ``(text, n_cues, span_ms)``; consecutive repeat
    cues (rolling-caption artifact) collapse. Decoding runs the charset
    chain (r10): subtitle rips are the single most legacy-charset-heavy
    text format in the wild — a cp1251/cp1252 .srt used to mojibake."""
    from .charset import decode_text

    raw = decode_text(payload)[0].lstrip("﻿")
    is_vtt = raw.lstrip().startswith("WEBVTT")
    timing = _VTT_TIME if is_vtt else _SRT_TIME
    cues: list[str] = []
    span_end = None
    span_start = None
    blocks = re.split(r"\r?\n\r?\n+", raw)
    for block in blocks:
        lines = [ln.strip() for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        head = lines[0]
        if is_vtt and (
            head.startswith(("WEBVTT", "NOTE", "STYLE", "REGION"))
        ):
            continue
        # find the timing line (cue id / number may precede it)
        t_idx = None
        for i, ln in enumerate(lines[:2]):
            m = timing.search(ln)
            if m:
                t_idx = i
                break
        if t_idx is None:
            if not cues and not is_vtt:
                raise ValueError("SRT block has no timing line")
            continue  # VTT allows stray metadata blocks
        g = timing.search(lines[t_idx]).groups()
        start, end = _ms(*g[:4]), _ms(*g[4:])
        if end < start:
            raise ValueError("caption cue ends before it starts")
        if span_start is None:
            span_start = start
        span_end = end if span_end is None else max(span_end, end)
        if len(cues) >= _MAX_CUES:
            raise ValueError(f"caption cue count exceeds the bound ({_MAX_CUES})")
        text = _clean_cue(lines[t_idx + 1 :])
        if text and (not cues or cues[-1] != text):
            cues.append(text)
    if span_start is None:
        raise ValueError("no caption cues found")
    return "\n".join(cues), len(cues), span_end - span_start


def _ipynb_extract_text(payload: bytes):
    """Jupyter notebook -> ``(text, n_cells)``: markdown + code cell
    sources in order, form-feed separated; outputs excluded."""
    try:
        nb = json.loads(payload.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise ValueError(f"ipynb is not valid JSON: {exc}")
    if not isinstance(nb, dict):
        raise ValueError("ipynb JSON is not an object")
    if "cells" in nb:
        cells = nb["cells"]
    elif "worksheets" in nb:  # nbformat 3
        cells = [
            c for ws in nb.get("worksheets", []) for c in ws.get("cells", [])
        ]
    else:
        raise ValueError("ipynb has no cells (not a notebook)")
    if not isinstance(cells, list):
        raise ValueError("ipynb cells is not a list")
    parts = []
    n = 0
    for cell in cells:
        if not isinstance(cell, dict):
            continue
        kind = cell.get("cell_type")
        if kind not in ("markdown", "code", "raw", "heading"):
            continue
        src = cell.get("source", cell.get("input", ""))
        if isinstance(src, list):
            src = "".join(str(x) for x in src)
        src = str(src).strip()
        if src:
            parts.append(src)
            n += 1
    if n == 0:
        raise ValueError("ipynb contains no non-empty cells")
    return "\f".join(parts), n
