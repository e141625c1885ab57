"""Log template mining — the "patterns" view every log-analytics engine
grows once regex parsing works.

The reference plugin turns a log file into typed columns
(/root/reference/src/main/java/org/apache/drill/exec/store/log/
LogRecordReader.java:224-281) but leaves the free-text payload column
(e.g. the README example's ``query`` field, README.md:9-15) opaque. This
operator mines that payload: variable fragments (numbers, IPs, UUIDs,
hex ids) are masked to stable placeholder tokens, and lines collapsing
to the same *template* are grouped — yielding the message-type histogram
(Drain/Spell-style template extraction, the Splunk "patterns" tab) that
drives triage ("which error shapes spiked?") and downstream anomaly
detection. No reference counterpart (SURVEY.md §2 Tier C).

Scale posture: masking is a fixed chain of JVM ``regexp_replace``
expressions fused into the scan — scan-speed, no Python. The group-by
shuffles the 8-byte ``xxhash64`` of the template, never the template
string as key (the q59 boilerplate pattern); template text and the
bounded example ride as partial-agg'd ``min`` inputs, so map-side
combine reduces each partition to its distinct-template set before the
exchange. Output is template-cardinality-sized — thousands of rows from
any corpus size.

Mask order is fixed and load-bearing: UUID before HEX (a UUID's dashed
groups would otherwise shred into hex stumps), IP before NUM (dotted
quads must not become ``<NUM>.<NUM>.<NUM>.<NUM>``), NUM last (it
subsumes every digit run the earlier masks left). Whitespace runs
normalize first so alignment padding never splits templates. Every
pattern is RE2-expressible (no lookaround), so the DuckDB oracle can
replay the exact chain (q34 templates arm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name -> (regex, placeholder). Order is the application order.
TEMPLATE_MASKS: tuple[tuple[str, str, str], ...] = (
    # Explicit class, not \s: Java's \s includes U+000B, RE2's does not —
    # the oracle must replay the chain byte-identically.
    ("ws", r"[ \t]+", " "),
    (
        "uuid",
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    # 0x-prefixed only: a bare long hex run with no letters is
    # indistinguishable from a decimal id (RE2 has no lookahead to demand
    # a letter), and those should mask as <NUM>.
    ("hex", r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("num", r"\d+", "<NUM>"),
)

#: Placeholder tokens that count as template parameters (order-free).
PARAM_TOKENS: tuple[str, ...] = ("<UUID>", "<HEX>", "<IP>", "<NUM>")


def template_expr(
    col: str | Column,
    masks: tuple[tuple[str, str, str], ...] = TEMPLATE_MASKS,
) -> Column:
    """Column expression: ``col`` collapsed to its template."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in masks:
        out = F.regexp_replace(out, pattern, token)
    return F.trim(out)


def n_params_expr(template_col: str | Column) -> Column:
    """Parameter count of a template: total placeholder occurrences.

    Computed on the aggregated representative (one row per template), as
    sum over tokens of length-delta / token-length — integer-exact and
    replayable in any SQL engine.
    """
    t = (
        F.col(template_col)
        if isinstance(template_col, str)
        else template_col
    )
    total = F.lit(0)
    for tok in PARAM_TOKENS:
        total = total + (
            (F.length(t) - F.length(F.replace(t, F.lit(tok), F.lit(""))))
            / F.lit(len(tok))
        ).cast("long")
    return total


def mine_templates(
    df: DataFrame,
    message_col: str = "message",
    masks: tuple[tuple[str, str, str], ...] = TEMPLATE_MASKS,
    example_len: int = 256,
    min_count: int = 1,
) -> DataFrame:
    """Template histogram over ``message_col``.

    Returns one row per distinct template: ``template``, ``n_lines``
    (lines collapsing to it), ``n_params`` (placeholder count), and
    ``example`` (lexicographic-min raw message, truncated to
    ``example_len`` so unbounded log lines never ride a shuffle).
    NULL messages are skipped (they have no template).

    Grouping key is ``xxhash64(template)``; a 64-bit collision merging
    two templates is ~2^-64 per pair — the q59/q58 posture, documented
    not defended.
    """
    lines = (
        df.where(F.col(message_col).isNotNull())
        .select(
            template_expr(message_col, masks).alias("_tpl"),
            F.substring(F.col(message_col), 1, example_len).alias("_ex"),
        )
    )
    return (
        lines.groupBy(F.xxhash64("_tpl").alias("_th"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("_tpl").alias("template"),
            F.min("_ex").alias("example"),
        )
        .where(F.col("n_lines") >= F.lit(int(min_count)))
        .select(
            "template",
            "n_lines",
            n_params_expr("template").alias("n_params"),
            "example",
        )
    )


def template_masks_sql_duck(
    col: str, masks: tuple[tuple[str, str, str], ...] = TEMPLATE_MASKS
) -> str:
    """DuckDB expression replaying the mask chain (oracle side)."""
    out = col
    for _, pattern, token in masks:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return f"trim({out}, ' ')"


def n_params_sql_duck(template_col: str) -> str:
    """DuckDB expression for the parameter count of a template column."""
    parts = [
        f"(length({template_col}) - length(replace({template_col}, "
        f"'{tok}', ''))) // {len(tok)}"
        for tok in PARAM_TOKENS
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
