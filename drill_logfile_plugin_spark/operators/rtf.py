"""RTF text extraction — stdlib only (a real control-word tokenizer).

The fourth office format old dumps carry (legal discovery, government
records, pre-OOXML exports). RTF is a brace-grouped control-word
stream; extraction is a small state machine over the published core:

* control words: ``\\par``/``\\line`` -> newline, ``\\tab`` -> tab,
  ``\\cell``/``\\row`` -> the table linearization (tabs/newlines),
  ``\\emdash``/``\\endash``/quote words -> their characters;
* destinations whose content is NOT document text are skipped with
  their whole group: ``\\fonttbl``, ``\\colortbl``, ``\\stylesheet``,
  ``\\info``, ``\\pict`` (embedded image hex), ``\\object``, plus any
  ``{\\*...}`` starred destination (the spec's forward-compat rule:
  unknown starred groups must be ignored);
* escapes: ``\\'hh`` hex bytes decoded per the document's ``\\ansicpg``
  code page (cp1252 default), ``\\uN`` Unicode with its ``\\ucN``
  fallback-byte skip count honored per group, and the literal
  ``\\\\ \\{ \\}``;
* binary runs (``\\binN``) skipped by their declared byte length —
  untrusted input cannot desynchronize the tokenizer into emitting
  binary as text.

Group state (the ``\\ucN`` skip count) nests with braces per the spec.
Guards: group depth and output size bounded.

Spark lane: ``extract_rtf_text`` -> ``(doc_id, text, n_paragraphs,
n_chars)``; routed by ``documents.sniff_document`` on the
``{\\rtf`` magic.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import re

_MAX_DEPTH = 128
_MAX_OUT = 64 << 20

#: groups whose content is never document text
_SKIP_DESTINATIONS = frozenset(
    {
        "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
        "header", "footer", "headerl", "headerr", "headerf",
        "footerl", "footerr", "footerf", "xmlnstbl", "themedata",
        "colorschememapping", "latentstyles", "datastore", "generator",
    }
)

#: control words that EMIT characters
_EMIT = {
    "par": "\n",
    "line": "\n",
    "tab": "\t",
    "cell": "\t",
    "row": "\n",
    "emdash": "\u2014",
    "endash": "\u2013",
    "lquote": "\u2018",
    "rquote": "\u2019",
    "ldblquote": "\u201c",
    "rdblquote": "\u201d",
    "bullet": "\u2022",
    "~": "\u00a0",
    "_": "-",
}

_CW = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?|\\([^a-zA-Z])")


def _rtf_extract_text(payload: bytes):
    """Extract document text: returns ``(text, n_paragraphs)``."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not an RTF (missing {\\rtf magic)")
    # code page: \ansicpgN in the header
    m = re.search(rb"\\ansicpg(\d+)", payload[:256])
    codec = f"cp{m.group(1).decode()}" if m else "cp1252"
    try:
        b"\x41".decode(codec)
    except LookupError:
        codec = "cp1252"

    out: list[str] = []
    out_len = 0
    pos = 0
    n = len(payload)
    depth = 0
    skip_until_depth = None  # inside a skipped destination group
    uc_stack = [1]  # \ucN fallback-byte counts, per group

    def emit(s: str) -> None:
        nonlocal out_len
        if skip_until_depth is None:
            out.append(s)
            out_len += len(s)
            if out_len > _MAX_OUT:
                raise ValueError("RTF output exceeds the decoder bound")

    while pos < n:
        c = payload[pos]
        if c == 0x7B:  # {
            depth += 1
            if depth > _MAX_DEPTH:
                raise ValueError("RTF group nesting exceeds the bound")
            uc_stack.append(uc_stack[-1])
            pos += 1
            # starred destination: {\* ... } is ignorable by spec
            if skip_until_depth is None and payload[pos : pos + 2] == b"\\*":
                skip_until_depth = depth
            continue
        if c == 0x7D:  # }
            if depth == 0:
                break  # text after the final brace is not document text
            if skip_until_depth is not None and depth == skip_until_depth:
                skip_until_depth = None
            depth -= 1
            if len(uc_stack) > 1:
                uc_stack.pop()
            pos += 1
            continue
        if c == 0x5C:  # backslash
            m = _CW.match(payload, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            if m.group(3) is not None:  # control symbol
                sym = m.group(3).decode("latin-1")
                if sym == "'":
                    hexpair = payload[pos : pos + 2]
                    pos += 2
                    try:
                        ch = bytes.fromhex(hexpair.decode("ascii")).decode(
                            codec, errors="replace"
                        )
                    except (ValueError, UnicodeDecodeError):
                        ch = "\ufffd"
                    emit(ch)
                elif sym in ("\\", "{", "}"):
                    emit(sym)
                elif sym in _EMIT:
                    emit(_EMIT[sym])
                # \<newline> is a \par alias in old writers
                elif sym in ("\n", "\r"):
                    emit("\n")
                continue
            word = m.group(1).decode("ascii")
            param = int(m.group(2)) if m.group(2) else None
            if word == "u" and param is not None:
                # \uN: signed 16-bit code unit, then uc fallback bytes
                emit(chr(param + 0x10000 if param < 0 else param))
                skip = uc_stack[-1]
                while skip > 0 and pos < n:
                    if payload[pos : pos + 2].startswith(b"\\'"):
                        pos += 4
                    else:
                        pos += 1
                    skip -= 1
                continue
            if word == "uc" and param is not None:
                uc_stack[-1] = max(0, param)
                continue
            if word == "bin" and param is not None:
                if param < 0 or pos + param > n:
                    raise ValueError("RTF \\bin run escapes the payload")
                pos += param
                continue
            if word in _SKIP_DESTINATIONS and skip_until_depth is None:
                skip_until_depth = depth
                continue
            if word in _EMIT:
                emit(_EMIT[word])
            # all other control words are formatting: no text
            continue
        # plain text run up to the next special byte
        nxt = n
        for special in (0x5C, 0x7B, 0x7D):
            f = payload.find(special, pos)
            if f != -1 and f < nxt:
                nxt = f
        chunk = payload[pos:nxt]
        pos = nxt
        text = chunk.replace(b"\r", b"").replace(b"\n", b"").decode(
            codec, errors="replace"
        )
        if text:
            emit(text)

    text = "".join(out)
    text = re.sub(r"[ \t]+\n", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text).strip()
    if not text:
        raise ValueError("RTF contains no extractable text")
    n_par = text.count("\n") + 1
    return text, n_par


def extract_rtf_text(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: RTF payloads -> ``(doc_id, text, n_paragraphs,
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
                    text, n_par = _rtf_extract_text(bytes(p))
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
