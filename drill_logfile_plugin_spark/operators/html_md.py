"""HTML → structure-preserving markdown extraction.

``strip_html`` flattens markup and :mod:`.boilerplate` removes
boilerplate, but both DISCARD document structure — headings, list
nesting, tables, code blocks — which modern pipelines keep as a
formatting signal (markdown-shaped training text). This module is the
jusText-composed lane that preserves it: the SAME block segmentation /
context classification as :mod:`.boilerplate` (imported, not
re-derived — one classifier, two renderings), with a structure-aware
parser and a markdown renderer on top.

Structure handling (policy pinned in tests/test_html_md.py):

* headings ``h1..h6`` → ``#``-prefixed lines. A heading is kept iff a
  GOOD block follows within :data:`HEADING_LOOKAHEAD` blocks (the
  jusText heading-promotion idea): a heading over kept prose is
  structure, a heading over a deleted nav rail is boilerplate.
* ``li`` → ``-`` bullets (or ``N.`` for ordered lists) indented two
  spaces per nesting level, classified like any block.
* ``pre`` → fenced code blocks with whitespace PRESERVED (the one
  block kind where the collapse rule would destroy the content).
  Code scores stopword-poor, so ``pre`` blocks are always
  context-undecided: they inherit the nearest decided neighbor —
  code inside an article survives, code inside a nav rail dies.
* table rows → ``| a | b |`` rows; the first header row (``th``)
  appends the ``| --- |`` separator. A row's keep/drop verdict is the
  TABLE's (rows classified jointly on concatenated text): half-kept
  tables are worse than none.
* ``blockquote`` content → ``> `` prefixed.

The Spark lane (:func:`extract_markdown`) is Arrow-batched
``mapInPandas`` under the tier's quarantine contract emitting
``(doc_id, markdown, n_blocks, n_good_blocks, n_chars)`` — the text
tier's input shape, so markdown output composes straight into
clean_corpus / dedup / chunking (composition pinned).

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C), prescribed by the round-9 verdict ("Next round" #7).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .boilerplate import (
    _MAX_BLOCKS,
    _classify_blocks,
    _context_pass,
    _DROP_TAGS,
)

#: a kept heading must be followed by a good block within this many
#: blocks (the promotion window)
HEADING_LOOKAHEAD = 3

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
#: block-terminating tags of the structure parser (the boilerplate
#: set minus the ones given structural roles here)
_FLAT_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "dd", "dt", "figcaption", "br",
        "header", "footer", "nav", "aside", "main", "form", "fieldset",
    }
)


class _Block:
    __slots__ = ("text", "link_chars", "kind", "depth", "index", "cells",
                 "header")

    def __init__(self, text, link_chars, kind, depth=0, index=0,
                 cells=None, header=False):
        self.text = text
        self.link_chars = link_chars
        self.kind = kind
        self.depth = depth
        self.index = index
        self.cells = cells or []
        self.header = header


class _MdParser(HTMLParser):
    """Structure-aware block segmentation: same drop rules and link
    accounting as boilerplate._BlockParser, plus heading levels, list
    nesting/ordering, blockquote depth, raw-whitespace ``pre``, and
    table row cells."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0
        self._pre_depth = 0
        self._quote_depth = 0
        self._heading: int | None = None
        self._lists: list[list] = []  # [ordered, counter]
        self._cells: list[str] | None = None
        self._row_header = False
        self._row_link_chars = 0

    def _text(self) -> str:
        raw = "".join(self._parts)
        if self._pre_depth:
            return raw.strip("\n")
        return re.sub(r"\s+", " ", raw).strip()

    def _flush(self, kind="p") -> None:
        text = self._text()
        if text:
            if len(self.blocks) >= _MAX_BLOCKS:
                raise ValueError(
                    f"HTML block count exceeds the parser bound ({_MAX_BLOCKS})"
                )
            if self._heading is not None:
                kind = f"h{self._heading}"
            elif self._pre_depth:
                kind = "pre"
            elif kind == "p" and self._quote_depth:
                kind = "quote"
            depth = index = 0
            if kind == "li" and self._lists:
                depth = len(self._lists) - 1
                self._lists[-1][1] += 1
                index = self._lists[-1][1] if self._lists[-1][0] else 0
            self.blocks.append(
                _Block(text, self._link_chars, kind, depth, index)
            )
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _HEADINGS:
            self._flush()
            self._heading = _HEADINGS[tag]
        elif tag in ("ul", "ol"):
            self._flush("li" if self._lists else "p")
            self._lists.append([tag == "ol", 0])
        elif tag == "li":
            self._flush("li")
        elif tag == "pre":
            self._flush()
            self._pre_depth += 1
        elif tag == "blockquote":
            self._flush()
            self._quote_depth += 1
        elif tag == "table":
            self._flush()
        elif tag == "tr":
            self._flush()
            self._cells = []
            self._row_header = False
            self._row_link_chars = 0
        elif tag in ("td", "th"):
            if self._cells is not None and self._parts:
                self._cells.append(self._text())
                self._parts = []
                self._row_link_chars += self._link_chars
                self._link_chars = 0
            if tag == "th":
                self._row_header = True
        elif tag in _FLAT_BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _HEADINGS:
            self._flush()
            self._heading = None
        elif tag == "li":
            self._flush("li")
        elif tag in ("ul", "ol"):
            self._flush("li")
            if self._lists:
                self._lists.pop()
        elif tag == "pre":
            self._flush()
            self._pre_depth = max(0, self._pre_depth - 1)
        elif tag == "blockquote":
            self._flush()
            self._quote_depth = max(0, self._quote_depth - 1)
        elif tag in ("td", "th"):
            if self._cells is not None:
                self._cells.append(self._text())
                self._parts = []
                self._row_link_chars += self._link_chars
                self._link_chars = 0
        elif tag == "table":
            self._flush()
        elif tag == "tr":
            cells = [c for c in (self._cells or []) if c]
            if cells:
                if len(self.blocks) >= _MAX_BLOCKS:
                    raise ValueError(
                        "HTML block count exceeds the parser bound "
                        f"({_MAX_BLOCKS})"
                    )
                self.blocks.append(
                    _Block(
                        " ".join(cells),
                        self._row_link_chars + self._link_chars,
                        "tr",
                        cells=cells,
                        header=self._row_header,
                    )
                )
            self._parts = []
            self._link_chars = 0
            self._row_link_chars = 0
            self._cells = None
        elif tag in _FLAT_BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def _render(block: _Block) -> str:
    if block.kind in ("p",):
        return block.text
    if block.kind.startswith("h"):
        return "#" * int(block.kind[1]) + " " + block.text
    if block.kind == "li":
        marker = f"{block.index}." if block.index else "-"
        return "  " * block.depth + f"{marker} {block.text}"
    if block.kind == "pre":
        return f"```\n{block.text}\n```"
    if block.kind == "quote":
        return "> " + block.text.replace("\n", "\n> ")
    if block.kind == "tr":
        row = "| " + " | ".join(block.cells) + " |"
        if block.header:
            row += "\n|" + "|".join(" --- " for _ in block.cells) + "|"
        return row
    return block.text


def html_to_markdown(html: str):
    """(markdown, n_blocks, n_good) for one HTML payload — the jusText
    verdicts applied to structure-aware blocks, rendered as markdown
    (module doc for the per-kind policies)."""
    parser = _MdParser()
    parser.feed(html)
    parser.close()
    blocks = parser.blocks

    # classification input: joint TABLE text so a table keeps or drops
    # whole; pre blocks forced undecided (stopword-poor by nature)
    verdicts = _classify_blocks([(b.text, b.link_chars) for b in blocks])
    table_spans = []
    i = 0
    while i < len(blocks):
        if blocks[i].kind == "tr":
            j = i
            while j < len(blocks) and blocks[j].kind == "tr":
                j += 1
            table_spans.append((i, j))
            joint = _classify_blocks(
                [
                    (
                        " ".join(b.text for b in blocks[i:j]),
                        sum(b.link_chars for b in blocks[i:j]),
                    )
                ]
            )[0]
            for k in range(i, j):
                verdicts[k] = joint
            i = j
        else:
            i += 1
    for i, b in enumerate(blocks):
        if b.kind == "pre":
            verdicts[i] = "short"  # always context-resolved
    verdicts = _context_pass(verdicts)

    # heading promotion: kept iff a good block follows in the window
    for i, b in enumerate(blocks):
        if b.kind.startswith("h") and b.kind in ("h1", "h2", "h3", "h4", "h5", "h6"):
            window = verdicts[i + 1 : i + 1 + HEADING_LOOKAHEAD]
            has_good = any(
                v == "good" and not blocks[i + 1 + k].kind.startswith("h")
                for k, v in enumerate(window)
            )
            verdicts[i] = "good" if has_good else "bad"

    out = []
    for b, v in zip(blocks, verdicts):
        if v == "good":
            out.append(_render(b))
    n_good = len(out)
    return "\n\n".join(out), len(blocks), n_good


def extract_markdown(
    df,
    html_col: str = "html",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: HTML payloads -> ``(doc_id, markdown, n_blocks,
    n_good_blocks, n_chars)`` — structure-preserving main content.
    Arrow-batched mapInPandas under the tier's quarantine contract;
    exchange-free (plan contract in tests/test_html_md.py)."""
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
            StructField("markdown", StringType()),
            StructField("n_blocks", IntegerType()),
            StructField("n_good_blocks", IntegerType()),
            StructField("n_chars", LongType()),
        ]
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(html_col).alias("html")
    ).where(F.col("html").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mds, nbs, ngs, ncs = [], [], [], [], []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                try:
                    md, nb, ng = html_to_markdown(str(html))
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    if on_error == "skip":
                        continue
                    md, nb, ng = None, None, None
                ids.append(doc_id)
                mds.append(md)
                nbs.append(nb)
                ngs.append(ng)
                ncs.append(None if md is None else len(md))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "markdown": pd.Series(mds, dtype="object"),
                    "n_blocks": pd.Series(nbs, dtype="Int32"),
                    "n_good_blocks": pd.Series(ngs, dtype="Int32"),
                    "n_chars": pd.Series(ncs, dtype="Int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
