"""robots.txt parsing + evaluation (r11) pinned against RFC 9309's
own worked examples (§2.2.2 longest-match table, §5.2 group
structure) plus the Spark lane's parity with the pure evaluator."""

import pytest

from drill_logfile_plugin_spark.operators.robots import (
    match_path,
    parse_robots,
    robots_filter,
    robots_filter_mark,
    rules_for_agent,
)

RFC_BODY = """
User-Agent: *
Allow: /publications/
Disallow: /

User-Agent: examplebot
Allow: /
Disallow: /fr/
Sitemap: https://example.com/sitemap.xml
"""


def test_group_selection_specific_else_star():
    parsed = parse_robots(RFC_BODY)
    star = rules_for_agent(parsed, "otherbot")
    assert star == [(True, "/publications/"), (False, "/")]
    ex = rules_for_agent(parsed, "ExampleBot")
    assert (True, "/") in ex and (False, "/fr/") in ex
    assert parsed["sitemaps"] == ["https://example.com/sitemap.xml"]


def test_rfc_longest_match_examples():
    """RFC 9309 §2.2.2's allow/disallow precedence table."""
    cases = [
        # (allow pattern, disallow pattern, path, expected_allowed)
        ("/p", "/", "/page", True),
        ("/folder/", "/folder", "/folder/page", True),
        # equal-length competing rules: the RFC says the allow SHOULD
        # be used for equivalent rules
        ("/page", "/*.ph", "/page.php5", True),
        ("/page", "/*.ph", "/page.htm", True),
        ("/$", "/", "/", True),
        ("/$", "/", "/page.htm", False),
    ]
    for allow_p, dis_p, path, want in cases:
        rules = [(True, allow_p), (False, dis_p)]
        assert match_path(rules, path) is want, (allow_p, dis_p, path)


def test_wildcards_and_anchor():
    rules = [(False, "/private*/data$")]
    assert match_path(rules, "/private1/data") is False
    assert match_path(rules, "/private/x/data") is False
    assert match_path(rules, "/private/data/more") is True  # $ anchored
    assert match_path([], "/anything") is True  # no rules -> allowed


def test_consecutive_agent_lines_share_a_group():
    body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    parsed = parse_robots(body)
    assert rules_for_agent(parsed, "a") == [(False, "/x")]
    assert rules_for_agent(parsed, "b") == [(False, "/x")]


def test_same_agent_groups_merge():
    body = (
        "User-agent: a\nDisallow: /x\n\n"
        "User-agent: a\nDisallow: /y\n"
    )
    assert rules_for_agent(parse_robots(body), "a") == [
        (False, "/x"), (False, "/y"),
    ]


def test_malformed_lines_and_empty_disallow_ignored():
    body = (
        "Disallow: /orphan\n"        # before any group: ignored
        "User-agent: *\n"
        "Disallow:\n"                # empty: allow-all, no rule
        "NotADirective: zzz\n"
        "Disallow: relative-path\n"  # malformed (no leading / or *)
        "Disallow: /real\n"
    )
    assert rules_for_agent(parse_robots(body), "x") == [(False, "/real")]


def test_percent_normalization():
    rules = [(False, "/a%2Fb")]
    assert match_path(rules, "/a%2Fb") is False
    assert match_path(rules, "/a/b") is True  # %2F stays distinct
    rules2 = [(False, parse_robots(
        "User-agent: *\nDisallow: /café\n"
    )["groups"]["*"][0][1])]
    assert match_path(rules2, "/caf%C3%A9") is False


# ---------------------------------------------------------- Spark lane

ROBOTS = [
    ("example.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
    ("open.org", "User-agent: *\nDisallow:\n"),
    ("strict.net", "User-agent: *\nDisallow: /\nAllow: /pub*\n"),
]
URLS = [
    (0, "https://example.com/private/doc.html"),
    (1, "https://example.com/private/ok"),
    (2, "https://example.com/welcome"),
    (3, "https://open.org/anything/goes"),
    (4, "https://strict.net/hidden"),
    (5, "https://strict.net/public/page"),
    (6, "https://norobots.io/x"),   # host without robots: allowed
    (7, "https://strict.net"),       # host-only URL -> path "/"
]


def _frames(spark):
    return (
        spark.createDataFrame(URLS, "doc_id long, url string"),
        spark.createDataFrame(ROBOTS, "host string, robots_txt string"),
    )


def test_spark_lane_matches_pure_evaluator(spark):
    df, rb = _frames(spark)
    got = {
        r["doc_id"]: r["robots_allowed"]
        for r in robots_filter_mark(df, rb).collect()
    }
    parsed = {h: parse_robots(b) for h, b in ROBOTS}
    import re as _re

    for doc_id, url in URLS:
        host = _re.sub(r"^https://", "", url).split("/")[0]
        m = _re.match(r"^[a-z]+://[^/]*(/.*)?$", url)
        path = m.group(1) or "/"
        if host in parsed:
            want = match_path(rules_for_agent(parsed[host], "*"), path)
        else:
            want = True
        assert got[doc_id] is want, url
    kept = {
        r["doc_id"] for r in robots_filter(df, rb).collect()
    }
    assert kept == {d for d, ok in got.items() if ok}
    assert kept == {1, 2, 3, 5, 6}


def test_agent_specific_rules_through_spark(spark):
    rb = spark.createDataFrame(
        [("h.com",
          "User-agent: mybot\nDisallow: /\n\nUser-agent: *\nAllow: /\n")],
        "host string, robots_txt string",
    )
    df = spark.createDataFrame(
        [(0, "https://h.com/a")], "doc_id long, url string"
    )
    assert robots_filter_mark(df, rb).collect()[0]["robots_allowed"]
    row = robots_filter_mark(df, rb, agent="MyBot").collect()[0]
    assert row["robots_allowed"] is False


def test_spark_plan_broadcasts_rules(spark):
    df, rb = _frames(spark)
    plan = (
        robots_filter_mark(df, rb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ----------------------------------------------------------- sitemaps

SM = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "<url><loc>https://e.com/a</loc><lastmod>2024-01-05</lastmod></url>\n"
    "<url><loc>https://e.com/b</loc></url>\n"
    "<url><priority>0.5</priority></url>\n"  # loc-less: dropped
    "</urlset>"
).encode()

SM_INDEX = (
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>https://e.com/sitemap1.xml.gz</loc>"
    "<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>"
).encode()


def test_parse_sitemap_urlset_index_text_and_gzip():
    import gzip

    from drill_logfile_plugin_spark.operators.robots import parse_sitemap

    kind, entries = parse_sitemap(SM)
    assert kind == "urlset"
    assert entries == [
        ("https://e.com/a", "2024-01-05"), ("https://e.com/b", None),
    ]
    kind, entries = parse_sitemap(gzip.compress(SM_INDEX))
    assert kind == "index"
    assert entries == [("https://e.com/sitemap1.xml.gz", "2024-02-01")]
    kind, entries = parse_sitemap(
        b"https://t.com/1\nnot a url\nhttps://t.com/2\n"
    )
    assert kind == "urlset"
    assert entries == [("https://t.com/1", None), ("https://t.com/2", None)]
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(b"<urlset><broken")
    with pytest.raises(ValueError, match="neither"):
        parse_sitemap(b"<rss></rss>")


def test_explode_sitemaps_spark_lane(spark):
    from drill_logfile_plugin_spark.operators.robots import explode_sitemaps

    df = spark.createDataFrame(
        [(0, bytearray(SM)), (1, bytearray(SM_INDEX)),
         (2, bytearray(b"<urlset><broken"))],
        "doc_id long, payload binary",
    )
    rows = explode_sitemaps(df).collect()
    assert len(rows) == 3  # corrupt row quarantined
    kinds = {r["doc_id"]: r["kind"] for r in rows}
    assert kinds == {0: "urlset", 1: "index"}
    with pytest.raises(Exception, match="doc_id=2"):
        explode_sitemaps(df, on_error="strict").collect()
