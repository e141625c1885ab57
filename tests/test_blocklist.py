"""Blocklist curation (r11): term lists (whole-token, case-insensitive,
literal + broadcast-join paths pinned equal) and domain lists
(suffix-semantics host matching)."""

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.blocklist import (
    domain_blocklist_filter,
    domain_blocklist_mark,
    term_blocklist_filter,
    term_blocklist_hits,
    term_blocklist_hits_join,
    url_host,
)

DOCS = [
    (0, "clean text about classes and glass"),          # substrings only
    (1, "one BAD word here"),
    (2, "bad bad bad repetition"),
    (3, "Mixed Case BaD and ugly tokens"),
    (4, None),
    (5, ""),
    (6, "ugly"),
]
TERMS = ["bad", "ugly"]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_whole_token_case_insensitive_hits(spark):
    rows = {
        r["doc_id"]: r["blocklist_hits"]
        for r in term_blocklist_hits(_df(spark), TERMS).collect()
    }
    assert rows[0] == 0  # "classes"/"glass" never hit "ass"-style lists
    assert rows[1] == 1
    assert rows[2] == 3  # occurrences, not distinct terms
    assert rows[3] == 2  # BaD + ugly, case-insensitive
    assert rows[4] is None
    assert rows[5] == 0
    assert rows[6] == 1


def test_join_path_matches_literal_path(spark):
    terms_df = spark.createDataFrame(
        [(t,) for t in ("BAD", "Ugly")], "term string"
    )
    lit = term_blocklist_hits(_df(spark), TERMS).collect()
    join = term_blocklist_hits_join(_df(spark), terms_df).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert [
        (r["doc_id"], r["blocklist_hits"]) for r in sorted(lit, key=key)
    ] == [
        (r["doc_id"], r["blocklist_hits"]) for r in sorted(join, key=key)
    ]


def test_filter_policy(spark):
    kept = {
        r["doc_id"]
        for r in term_blocklist_filter(_df(spark), TERMS).collect()
    }
    assert kept == {0, 5}  # zero-hit docs only; NULL text drops
    lax = {
        r["doc_id"]
        for r in term_blocklist_filter(_df(spark), TERMS, max_hits=1).collect()
    }
    assert lax == {0, 1, 5, 6}


def test_empty_and_oversize_lists(spark):
    rows = term_blocklist_hits(_df(spark), []).collect()
    assert {r["blocklist_hits"] for r in rows if r["text"] is not None} == {0}
    with pytest.raises(ValueError, match="literal-plan bound"):
        term_blocklist_hits(_df(spark), [f"t{i}" for i in range(30000)])


def test_literal_path_plan_is_scan_fused(spark):
    out = term_blocklist_hits(_df(spark), TERMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_join_path_plan_broadcasts(spark):
    """The TERM match must be a broadcast equi join — the corpus never
    shuffles on token content. (The count join-back IS keyed by doc_id:
    a row-key shuffle, the honest cost of appending a column.)"""
    import re

    terms_df = spark.createDataFrame([("bad",)], "term string")
    out = term_blocklist_hits_join(_df(spark), terms_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [__tok" in plan  # token match broadcasts
    assert "SortMergeJoin [__tok" not in plan  # corpus never SMJs on token
    # the only __tok exchange allowed is the blocklist-side distinct,
    # which sits UNDER the BroadcastExchange (list-sized, not corpus)
    bx = plan.index("BroadcastExchange")
    for m in re.finditer(r"Exchange hashpartitioning\(__tok", plan):
        assert m.start() > bx


# ----------------------------------------------------------- domain lane

URLS = [
    (0, "https://cdn.example.com/a/b?x=1"),
    (1, "http://example.com/"),
    (2, "https://notexample.com/page"),
    (3, "https://sub.deep.bad-site.org:8443/x"),
    (4, "https://user:pw@Example.COM/auth"),
    (5, "not a url at all"),
    (6, None),
]
BLOCKED = ["example.com", "bad-site.org"]


def _udf_frame(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def _domains(spark):
    return spark.createDataFrame(
        [(d,) for d in BLOCKED], "domain string"
    )


def test_domain_suffix_semantics(spark):
    rows = {
        r["doc_id"]: r["blocked_domain"]
        for r in domain_blocklist_mark(
            _udf_frame(spark), _domains(spark)
        ).collect()
    }
    assert rows[0] == "example.com"      # subdomain blocked
    assert rows[1] == "example.com"      # exact host blocked
    assert rows[2] is None               # notexample.com is NOT a suffix
    assert rows[3] == "bad-site.org"     # deep subdomain + port
    assert rows[4] == "example.com"      # userinfo + case folded
    assert rows[5] is None
    assert rows[6] is None


def test_domain_most_specific_match_wins(spark):
    domains = spark.createDataFrame(
        [("example.com",), ("cdn.example.com",)], "domain string"
    )
    row = domain_blocklist_mark(
        _udf_frame(spark).where("doc_id = 0"), domains
    ).collect()[0]
    assert row["blocked_domain"] == "cdn.example.com"


def test_domain_filter_keeps_unparseable(spark):
    kept = {
        r["doc_id"]
        for r in domain_blocklist_filter(
            _udf_frame(spark), _domains(spark)
        ).collect()
    }
    assert kept == {2, 5, 6}


def test_url_host_extraction(spark):
    df = _udf_frame(spark).select(
        "doc_id", url_host("url").alias("h")
    )
    rows = {r["doc_id"]: r["h"] for r in df.collect()}
    assert rows[0] == "cdn.example.com"
    assert rows[3] == "sub.deep.bad-site.org"
    assert rows[4] == "example.com"


def test_domain_plan_broadcasts(spark):
    out = domain_blocklist_mark(_udf_frame(spark), _domains(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_clean_corpus_blocklist_gate(spark):
    """The one-call cleaner composes the blocklist as a scan-fused
    signal: hits beyond the cap drop; with_reasons surfaces the count;
    the plan stays exchange/Python-free."""
    from drill_logfile_plugin_spark.operators.text import clean_corpus

    df = spark.createDataFrame(
        [
            (0, "A perfectly ordinary paragraph with enough words to "
                "read like real prose and pass the quality bands today."),
            (1, "A perfectly ordinary paragraph with enough words to "
                "read like real prose, plus one BAD token in the middle "
                "of otherwise reasonable text for the gate to count."),
        ],
        "doc_id long, text string",
    )
    bands = ("good", "too_short", "stopword_heavy", "repetitive",
             "long_tokens")  # neutralize the quality gate: isolate ours
    kept = clean_corpus(df, blocklist_terms=["bad"], quality_keep=bands)
    assert [r["doc_id"] for r in kept.collect()] == [0]
    audit = clean_corpus(
        df, blocklist_terms=["bad"], quality_keep=bands, with_reasons=True
    )
    rows = {r["doc_id"]: r for r in audit.collect()}
    assert rows[1]["blocklist_hits"] == 1 and not rows[1]["keep"]
    assert rows[0]["blocklist_hits"] == 0 and rows[0]["keep"]
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    lax = clean_corpus(
        df, blocklist_terms=["bad"], quality_keep=bands,
        blocklist_max_hits=1,
    )
    assert lax.count() == 2
