"""Crawl-hygiene tier: hand-pinned HTML extraction and URL
canonicalization matrices, the idempotence property, the dedup
composition (tracking variants collapse), and the codegen plan contract
(both operators are projections, no UDF, no exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.web import canonical_url, strip_html


def _apply(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col_fn("v").alias("out")).collect()]


HTML_CASES = [
    # (input, expected)
    (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Header</h1><p>First para.</p><p>Second "
        "<b>bold</b> para.</p></body></html>",
        "T Header\nFirst para.\nSecond bold para.",
    ),
    (
        "a<br>b<br/>c<BR >d",
        "a\nb\nc\nd",
    ),
    (
        "<!-- secret --><p>kept &amp;lt; literal</p>",
        "kept &lt; literal",
    ),
    (
        "x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;y &amp; z",
        'x <tag> "q" \'s\' y & z',
    ),
    (
        "<ul><li>one</li><li>two</li></ul>",
        "one\ntwo",
    ),
    # malformed fragments degrade to keeping text, never dropping it:
    # an unclosed tag has no terminator to strip to, so it stays verbatim
    ("broken <b unclosed text", "broken <b unclosed text"),
    ("no markup at all", "no markup at all"),
    ("", ""),
]


def test_strip_html_matrix(spark):
    got = _apply(spark, strip_html, [c[0] for c in HTML_CASES])
    for (src, want), out in zip(HTML_CASES, got):
        assert out == want, f"{src!r} -> {out!r}, wanted {want!r}"


URL_CASES = [
    (
        "HTTPS://WWW.Example.COM:443//a/b/?utm_source=x&b=2&a=1&gclid=9#f",
        "https://example.com/a/b?a=1&b=2",
    ),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://user:pw@example.com/x", "https://example.com/x"),
    ("https://example.com/a?ref=tw&REF_SRC=x", "https://example.com/a"),
    # a param NAMED like a tracking prefix only strips on the full name
    ("https://example.com/a?reform=1", "https://example.com/a?reform=1"),
    ("https://example.com", "https://example.com"),
    ("not a url", None),
    (None, None),
]


def test_canonical_url_matrix(spark):
    got = _apply(spark, canonical_url, [c[0] for c in URL_CASES])
    for (src, want), out in zip(URL_CASES, got):
        assert out == want, f"{src!r} -> {out!r}, wanted {want!r}"


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) — re-ingested canonical URLs never
    drift (the property that makes URL-keyed standing state safe)."""
    once = _apply(spark, canonical_url, [c[0] for c in URL_CASES])
    twice = _apply(
        spark, canonical_url, [u if u is not None else None for u in once]
    )
    assert twice == once


def test_tracking_variants_collapse_for_dedup(spark):
    """The dedup composition: the same page crawled through three
    tracking links groups to ONE canonical key."""
    urls = [
        "https://www.shop.example/item/42?utm_campaign=mail&utm_source=nl",
        "https://shop.example/item/42/",
        "http://shop.example:8080/item/42",  # different port = different page
        "https://shop.example/item/42?fbclid=abc123",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    groups = (
        df.select(canonical_url("url").alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    by_key = {r["c"]: r["count"] for r in groups}
    assert by_key["https://shop.example/item/42"] == 3
    assert by_key["http://shop.example:8080/item/42"] == 1


def test_hygiene_is_a_projection(spark):
    """Plan contract: both operators are one JVM projection over the
    scan — no exchange, no Python UDF (BatchEvalPython/ArrowEvalPython).
    (parse_url is a CodegenFallback expression, so the stage may run
    interpreted rather than inside a WholeStageCodegen span — still
    JVM-side, still scan-shaped.)"""
    df = spark.range(8).select(
        F.concat(F.lit("<p>row "), F.col("id"), F.lit("</p>")).alias("html"),
        F.concat(
            F.lit("https://a.example/x/"), F.col("id"), F.lit("?utm_source=1")
        ).alias("url"),
    )
    plan = (
        df.select(strip_html("html"), canonical_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert plan.lstrip().startswith("Project "), plan.splitlines()[0]


def test_strip_then_count(spark):
    """Hygiene feeds the existing tier: strip, then the standard token
    count sees the words, not the markup."""
    from drill_logfile_plugin_spark.operators.text import n_tokens

    df = spark.createDataFrame(
        [("<p>three small words</p><script>nope()</script>",)],
        "raw string",
    ).select(strip_html("raw").alias("text"))
    assert df.select(n_tokens("text").alias("n")).first()["n"] == 3


def test_corpus_report(spark):
    """The one-call governance report on a planted fixture: every section
    present, counts hand-verifiable, dup rate exact, top overlap named."""
    from drill_logfile_plugin_spark.operators.profiler import corpus_report

    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today.", "a"),
        (2, "The quick brown fox jumps over the lazy dog near the river bank today.", "b"),
        (3, "Le renard brun rapide saute par dessus le chien paresseux pres de la rive.", "a"),
        (4, None, "b"),
        (5, "Completely different text with its own unique words and nothing shared here at all.", "c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = {
        (r["section"], r["metric"]): r["value"]
        for r in corpus_report(docs).collect()
    }
    assert rep[("volume", "docs")] == "5"
    assert rep[("volume", "texts_nonnull")] == "4"
    assert rep[("sources", "a")] == "2"
    assert rep[("dup", "distinct_texts")] == "3"
    assert rep[("dup", "duplicated_docs")] == "2"
    assert rep[("dup", "dup_rate")] == "0.500000"
    # docs 1 and 2 are byte-identical across sources a|b: the top overlap
    overlap_keys = [k for k in rep if k[0] == "overlap"]
    assert overlap_keys and "a|b" in overlap_keys[0][1]
    # language section exists and covers all four non-null docs
    lang_total = sum(int(rep[k]) for k in rep if k[0] == "lang")
    assert lang_total == 4
