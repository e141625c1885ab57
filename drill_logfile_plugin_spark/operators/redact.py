"""PII redaction for training-corpus scrubbing.

Extends the q60 IP-anonymization pass (queries_log.py — driver-checked)
into the corpus-scrubbing operator a training pipeline runs before
anything durable is written: emails, IPv4s, US-style SSNs/phones replaced
with stable placeholder tokens. No reference counterpart (SURVEY.md §2
Tier C; the reference is a scan plugin).

Scale posture: the whole pass is a chain of JVM ``regexp_replace``
expressions fused into the scan — scan-speed at any corpus size, no
shuffle, no Python. The report variant adds one partial-agg'd global
aggregate (a handful of counters).

Redaction order is fixed and load-bearing: ``email`` before ``ipv4``
(an address like ``bob@10.0.0.1`` redacts as one email, not an email
stump plus an IP), ``ssn`` before ``phone`` (the looser phone pattern
would otherwise eat the digit shape SSNs match). The pass is idempotent
— placeholders contain no digits or ``@``, so no pattern can re-match
its own output (pinned in tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (java regex, placeholder). Patterns are deliberately of the
#: high-precision/haystack-cheap variety (the conventions public corpus
#: pipelines use), not an NER system — recall on exotic obfuscated PII is
#: out of scope and belongs to a model-based pass.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # Domain labels allow digits (scrubbing favors recall): root@10.0.0.1
    # is one EMAIL, not a username stump left beside a redacted IP.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z0-9-]+", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # Lookbehind, not \b: the match may start at '(' or '+' (non-word
    # chars — a word boundary there never exists and would silently
    # strand the prefix outside the placeholder).
    "phone": (
        r"(?<!\d)(?:\+?1[\s.-]?)?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}\b",
        "<PHONE>",
    ),
}

#: The fixed application order (see module docstring).
DEFAULT_KINDS = ("email", "ipv4", "ssn", "phone")


def redact_text(
    col: str | Column, kinds: tuple[str, ...] = DEFAULT_KINDS
) -> Column:
    """Column expression: ``col`` with each PII kind replaced by its token."""
    out = F.col(col) if isinstance(col, str) else col
    for k in kinds:
        pattern, token = PII_PATTERNS[k]
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_corpus(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = DEFAULT_KINDS,
) -> DataFrame:
    """``df`` with ``text_col`` scrubbed in place — the writer-pipeline
    form (redact, THEN write; nothing durable holds raw PII)."""
    return df.withColumn(text_col, redact_text(text_col, kinds))


def redact_report(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = DEFAULT_KINDS,
) -> DataFrame:
    """One-row audit: total docs + per-kind count of documents in which
    the sequential pass actually replaced that kind.

    Each kind's rlike runs against the PROGRESSIVELY-redacted text (all
    earlier kinds already replaced), mirroring the load-bearing order
    the scrub applies — counting against raw text would report spans an
    earlier pattern consumes (the IP inside ``root@10.0.0.1`` redacts as
    part of one EMAIL; it must not also count as an IP hit, or the
    logged audit disagrees with the emitted placeholders). Still one
    fused scan + one partial-agg'd aggregate: the chained replaces are
    column expressions, not extra passes.
    """
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    staged = F.col(text_col)
    for k in kinds:
        pattern, token = PII_PATTERNS[k]
        aggs.append(
            F.sum(staged.rlike(pattern).cast("long")).alias(f"docs_with_{k}")
        )
        staged = F.regexp_replace(staged, pattern, token)
    return df.agg(*aggs)
