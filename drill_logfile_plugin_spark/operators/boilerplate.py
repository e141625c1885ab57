"""Main-content extraction from HTML: jusText-style block classification.

:func:`..operators.web.strip_html` removes MARKUP; this module removes
BOILERPLATE — navigation menus, cookie banners, footers, related-links
rails — the step between "crawl HTML" and "training text" in every web
corpus pipeline (jusText powers CommonCrawl-derived corpora; C4 and
RefinedWeb apply the same block-classification family). The published
jusText recipe, simplified to its load-bearing core:

1. **Segment** the DOM into text blocks at block-level tags using a real
   HTML parser (stdlib ``html.parser`` — tolerant of the malformed
   markup crawls actually serve), with ``script``/``style``/``head``/
   ``noscript``/``template`` subtrees dropped wholesale and anchor depth
   tracked so each block knows its LINK character share.
2. **Classify context-free** per block on three published signals —
   word count, link density (chars inside ``<a>`` / chars), stopword
   density (the same tiny stopword marker list the quality tier uses):
   ``bad`` when link-dense or tiny, ``good`` when long and prose-like,
   ``short`` / ``near-good`` in between.
3. **Context pass**: jusText's key insight — short/near-good blocks
   inherit their NEIGHBORS' verdicts (a short paragraph between two good
   paragraphs is content; the same paragraph between two menus is
   boilerplate). One linear sweep assigning each undecided block the
   verdict of the nearest decided neighbor, ties to ``bad``.

The Spark lane (:func:`extract_main_content`) is Arrow-batched
``mapInPandas`` with the multimodal tier's quarantine contract,
emitting ``(doc_id, text, n_blocks, n_good_blocks, n_chars)`` — good
blocks joined by blank lines, the text tier's input shape.

Determinism: pure byte-driven classification, no models, no floats
beyond fixed-threshold ratios — the same payload yields the same text
on any executor, platform, or run.

No reference counterpart (the reference plugin is a log scanner);
LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .text import QUALITY_STOPWORDS

#: tags whose subtree is dropped wholesale (never text)
_DROP_TAGS = frozenset(
    {"script", "style", "head", "noscript", "template", "svg", "iframe"}
)
#: tags that terminate the current block
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
        "blockquote", "pre", "article", "section", "dd", "dt", "figcaption",
        "br", "tr", "table", "ul", "ol", "header", "footer", "nav", "aside",
        "main", "form", "fieldset",
    }
)

#: classification thresholds (the jusText defaults, simplified)
MAX_LINK_DENSITY_GOOD = 0.25
MAX_LINK_DENSITY_ANY = 0.66
MIN_WORDS_GOOD = 12
MIN_STOPWORD_DENSITY_GOOD = 0.08
MIN_WORDS_SHORT = 3

#: parser work bound: a crawl page yielding more blocks than this is a
#: generated-DOM bomb, not an article
_MAX_BLOCKS = 50_000


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, link_chars)
        self._parts: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._parts)).strip()
        if text:
            if len(self.blocks) >= _MAX_BLOCKS:
                raise ValueError(
                    f"HTML block count exceeds the parser bound ({_MAX_BLOCKS})"
                )
            self.blocks.append((text, self._link_chars))
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
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
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


_STOPWORDS = frozenset(QUALITY_STOPWORDS)


def _classify_blocks(blocks):
    """Context-free verdicts per the simplified jusText rules:
    'good' | 'bad' | 'short' (undecided, resolved by context)."""
    out = []
    for text, link_chars in blocks:
        words = text.split()
        n_words = len(words)
        n_chars = max(1, len(text))
        link_density = link_chars / n_chars
        stop_density = (
            sum(1 for w in words if w.lower().strip(".,;:!?") in _STOPWORDS)
            / max(1, n_words)
        )
        if link_density > MAX_LINK_DENSITY_ANY:
            verdict = "bad"
        elif n_words < MIN_WORDS_SHORT:
            verdict = "bad"
        elif n_words >= MIN_WORDS_GOOD and link_density <= MAX_LINK_DENSITY_GOOD:
            # a LONG block is decided either way: prose-like -> good,
            # stopword-free token soup (tag clouds, keyword stuffing)
            # -> bad; only short blocks stay undecided for the
            # context pass
            verdict = (
                "good" if stop_density >= MIN_STOPWORD_DENSITY_GOOD else "bad"
            )
        else:
            verdict = "short"
        out.append(verdict)
    return out


def _context_pass(verdicts):
    """Undecided blocks inherit the nearest decided neighbor's verdict
    (distance ties and no-neighbor cases resolve to 'bad' — boilerplate
    is the safe default for an isolated fragment).

    Two linear sweeps (forward/backward nearest-decided distance), not a
    scan of every decided block per undecided block — the naive version
    is O(short × decided), which a generated DOM at the 50k _MAX_BLOCKS
    bound turns into ~2.5e9 iterations (r9 ADVICE fix)."""
    n = len(verdicts)
    out = list(verdicts)
    # forward sweep: nearest decided at index <= i
    left = [None] * n  # (distance, verdict) or None
    last = None
    for i, v in enumerate(verdicts):
        if v != "short":
            last = i
        elif last is not None:
            left[i] = (i - last, verdicts[last])
    # backward sweep: nearest decided at index >= i
    last = None
    for i in range(n - 1, -1, -1):
        v = verdicts[i]
        if v != "short":
            last = i
            continue
        right = (last - i, verdicts[last]) if last is not None else None
        lv = left[i]
        if lv is None and right is None:
            out[i] = "bad"
        elif lv is None:
            out[i] = right[1]
        elif right is None:
            out[i] = lv[1]
        elif lv[0] < right[0]:
            out[i] = lv[1]
        elif right[0] < lv[0]:
            out[i] = right[1]
        else:  # tie: 'bad' wins if either side is 'bad'
            out[i] = "bad" if "bad" in (lv[1], right[1]) else "good"
    return out


def _extract_main(html: str):
    """(text, n_blocks, n_good) for one HTML payload."""
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    verdicts = _context_pass(_classify_blocks(parser.blocks))
    good = [
        parser.blocks[i][0] for i, v in enumerate(verdicts) if v == "good"
    ]
    return "\n\n".join(good), len(parser.blocks), len(good)


def extract_main_content(
    df,
    html_col: str = "html",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: HTML payloads -> ``(doc_id, text, n_blocks,
    n_good_blocks, n_chars)`` with boilerplate blocks removed.

    Arrow-batched mapInPandas with the tier's quarantine contract; NULL
    html rows are prefiltered. The output is the text tier's input
    shape — compose with clean_corpus / dedup / chunk_docs directly.
    """
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
            ids, texts, nbs, ngs, ncs = [], [], [], [], []
            for doc_id, h in zip(pdf["doc_id"], pdf["html"]):
                try:
                    text, n_blocks, n_good = _extract_main(h)
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    if on_error == "skip":
                        continue
                    text, n_blocks, n_good = None, None, None
                ids.append(doc_id)
                texts.append(text)
                nbs.append(n_blocks)
                ngs.append(n_good)
                ncs.append(None if text is None else len(text))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text": pd.Series(texts, dtype="object"),
                    "n_blocks": pd.Series(nbs, dtype="Int32"),
                    "n_good_blocks": pd.Series(ngs, dtype="Int32"),
                    "n_chars": pd.Series(ncs, dtype="Int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
