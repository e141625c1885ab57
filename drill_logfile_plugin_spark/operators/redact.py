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

Redaction order is fixed and load-bearing: ``cc`` first (the phone
pattern would nibble pieces of a spaced card number), ``email`` before
``ipv4`` (an address like ``bob@10.0.0.1`` redacts as one email, not an
email stump plus an IP), ``ssn`` before ``phone`` (the looser phone
pattern would otherwise eat the digit shape SSNs match). The pass is
idempotent — placeholders contain no digits or ``@``, so no pattern can
re-match its own output (pinned in tests/test_llm_ops.py).

Payment cards (r10) are the one kind a regex alone cannot do with
precision: 13-19-digit candidates are verified with the Luhn checksum
as a scan-fused JVM fold before replacement — an order id or timestamp
run of the same shape fails the checksum and stays intact. IPv6 (r10)
covers >= 5-group colon-hex plus every ``::``-compressed form; 2-group
full forms are indistinguishable from clock times and stay out of
scope by design.
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
    # IPv6: full/partial colon-hex with >= 5 groups, or a ::-compressed
    # form with at least one hex group on SOME side (the :: anchor keeps
    # timestamps like 12:34:56 out; a bare standalone `::` — Haskell type
    # signatures, spaced C++ scope operators — must NOT match, so the
    # compressed branch is split into head-nonempty and tail-nonempty
    # alternatives instead of allowing both sides empty; r11 per ADVICE.
    # 2-group full forms are indistinguishable from times: out of scope)
    "ipv6": (
        r"(?<![\w:])(?:(?:[0-9A-Fa-f]{1,4}:){4,7}[0-9A-Fa-f]{1,4}"
        r"|[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5}::"
        r"(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5})?"
        r"|::[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5})(?![\w:])",
        "<IP6>",
    ),
}

#: payment-card candidate shape: 13-19 digits with optional single
#: space/dash separators, not embedded in a longer digit run. Candidates
#: are only REDACTED when they pass the Luhn checksum (r10) — the
#: verification regexes cannot express, done as a scan-fused fold.
CC_CANDIDATE = r"(?<![\d-])\d(?:[ -]?\d){12,18}(?![\d-])"
CC_TOKEN = "<CC>"

#: The fixed application order (see module docstring; ``cc`` first —
#: its digit runs would otherwise be nibbled by the phone pattern).
DEFAULT_KINDS = ("cc", "email", "ipv4", "ipv6", "ssn", "phone")


def _luhn_ok(cand: Column) -> Column:
    """Luhn checksum over a candidate's digits (separators ignored) —
    pure JVM fold: reversed digit array, every second digit doubled with
    the 9-subtraction, sum divisible by 10, 13-19 digits."""
    digits = F.filter(
        F.split(cand, ""), lambda ch: (ch >= "0") & (ch <= "9")
    )
    rev = F.reverse(digits)
    n = F.size(rev)

    def step(acc: Column, i: Column) -> Column:
        d = F.element_at(rev, i + 1).cast("int")
        dbl = d * 2
        return acc + F.when(i % 2 == 0, d).otherwise(
            F.when(dbl > 9, dbl - 9).otherwise(dbl)
        )

    total = F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0), step)
    return n.between(13, 19) & (total % 10 == 0)


def _redact_cc(col: Column) -> Column:
    """Replace every Luhn-VALID card candidate with the token: extract
    candidates, verify each with the checksum fold, then replace the
    survivors *by matched span* — one scan-fused expression, no shuffle,
    no Python. A candidate failing Luhn (an order id, a timestamp run)
    is left intact: precision is the point of the checksum.

    Span-anchored, not literal (r11, per ADVICE): each survivor is
    substituted via ``regexp_replace`` with the candidate lookarounds
    re-applied around the (regex-quoted) candidate text, so a verified
    card number that also occurs as a SUBSTRING of a longer digit run
    (e.g. a 20-digit order id containing the 16-digit card) is left
    intact there — only standalone candidate spans redact. The quote
    wrapper is belt-and-braces: candidates contain only digits, spaces
    and dashes, all literal outside a character class."""
    cands = F.array_distinct(
        F.regexp_extract_all(col, F.lit(CC_CANDIDATE), 0)
    )
    verified = F.filter(cands, _luhn_ok)
    return F.aggregate(
        verified,
        col,
        lambda acc, c: F.regexp_replace(
            acc,
            F.concat(
                F.lit(r"(?<![\d-])\Q"), c, F.lit(r"\E(?![\d-])")
            ),
            F.lit(CC_TOKEN),
        ),
    )


def redact_text(
    col: str | Column, kinds: tuple[str, ...] = DEFAULT_KINDS
) -> Column:
    """Column expression: ``col`` with each PII kind replaced by its token."""
    out = F.col(col) if isinstance(col, str) else col
    for k in kinds:
        if k == "cc":
            out = _redact_cc(out)
            continue
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
        if k == "cc":
            # a doc counts only when a candidate VERIFIED (the staged
            # text actually changed) — a raw rlike would count Luhn
            # failures the scrub leaves intact
            redacted = _redact_cc(staged)
            aggs.append(
                F.sum((redacted != staged).cast("long")).alias(
                    f"docs_with_{k}"
                )
            )
            staged = redacted
            continue
        pattern, token = PII_PATTERNS[k]
        aggs.append(
            F.sum(staged.rlike(pattern).cast("long")).alias(f"docs_with_{k}")
        )
        staged = F.regexp_replace(staged, pattern, token)
    return df.agg(*aggs)
