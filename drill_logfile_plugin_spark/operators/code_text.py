"""Code-vs-prose detection: fused JVM column expressions, no UDF.

Mixed dumps (notebooks, wikis, scraped repos, documentation) interleave
source code with natural language, and the two want different
downstream treatment — code should not feed the prose quality bands
(its "stopword density" is meaningless) and prose should not feed a
code tokenizer. This operator scores each document on scan-fused
signals the two classes separate on:

* **symbol density** — code is dense in ``{}();=<>[]`` glyphs where
  prose is dense in letters;
* **indent regularity** — the fraction of lines starting with leading
  whitespace (blocks, continuation) — prose paragraphs almost never
  indent line-after-line;
* **keyword hits** — a small cross-language keyword/marker list
  (``def``, ``return``, ``import``, ``function``, ``const``,
  ``#include``, ``public``, ``=>``, ``&&``) counted as WHOLE tokens;
* **line-length shape** — code lines are short and uniform; prose
  wraps long.

Every signal is a ``regexp_count`` / ``split`` / ``size`` expression —
one fused projection over the scan, the clean_corpus discipline — and
the verdict is a threshold vote (>= 2 of 3 class signals), so the
column is cheap enough to compute on 100 TB as a routing key.

This is a HEURISTIC router (like lang_id), not a parser: the pytest
fixture pins clear code and clear prose on both sides plus the
boundary cases (markdown with a fenced block, config files).

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: cross-language keyword/marker list — matched as whole tokens
CODE_KEYWORDS = (
    "def", "return", "import", "class", "function", "const", "var",
    "void", "public", "static", "include", "printf", "lambda", "elif",
    "struct", "impl", "fn", "let",
)

#: thresholds (tuned on the planted fixtures; documented, overridable)
SYMBOL_DENSITY_CODE = 0.045
INDENT_FRACTION_CODE = 0.25
KEYWORDS_PER_LINE_CODE = 0.2


def code_signals(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Append the four signal columns plus ``code_verdict``
    ("code" | "prose") — one fused projection, no shuffle, no Python."""
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    symbol_density = (
        F.regexp_count(t, F.lit(r"[{}();=<>\[\]|&]")).cast("double") / n_chars
    )
    indent_fraction = (
        F.size(F.filter(lines, lambda ln: ln.rlike(r"^[ \t]+\S")))
        .cast("double")
        / n_lines
    )
    kw = "|".join(CODE_KEYWORDS)
    keywords_per_line = (
        F.regexp_count(t, F.lit(rf"(?<![A-Za-z0-9_])(?:{kw})(?![A-Za-z0-9_])"))
        .cast("double")
        / n_lines
    )
    mean_line_len = n_chars.cast("double") / n_lines
    votes = (
        (symbol_density > SYMBOL_DENSITY_CODE).cast("int")
        + (indent_fraction > INDENT_FRACTION_CODE).cast("int")
        + (keywords_per_line > KEYWORDS_PER_LINE_CODE).cast("int")
    )
    return df.select(
        "*",
        symbol_density.alias("symbol_density"),
        indent_fraction.alias("indent_fraction"),
        keywords_per_line.alias("keywords_per_line"),
        mean_line_len.alias("mean_line_len"),
        F.when(votes >= 2, F.lit("code")).otherwise(F.lit("prose")).alias(
            "code_verdict"
        ),
    )


def fenced_code_blocks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split markdown-style documents at ``\\`\\`\\``` fences: one row per
    segment ``(id, seg_idx, kind, segment)`` with ``kind`` "code" for
    odd fence intervals and "prose" for even ones — the routing step
    before per-class processing of documentation corpora. Pure array
    expressions (split + posexplode), scan-speed."""
    parts = F.split(F.col(text_col), "```")
    exploded = df.select(
        F.col(id_col),
        F.posexplode(parts).alias("seg_idx", "segment"),
    )
    return exploded.where(F.trim(F.col("segment")) != "").select(
        id_col,
        "seg_idx",
        F.when(F.col("seg_idx") % 2 == 1, F.lit("code"))
        .otherwise(F.lit("prose"))
        .alias("kind"),
        "segment",
    )
