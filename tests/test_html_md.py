"""HTML → markdown extraction (round 10, VERDICT next-round #7):
hand-pinned extraction matrix, the per-kind policies, composition into
clean_corpus, and the Spark plan contract."""

import pytest

from drill_logfile_plugin_spark.operators.html_md import (
    extract_markdown,
    html_to_markdown,
)

# prose with enough words + stopwords to classify good
P1 = (
    "This is the first paragraph of the article and it carries enough "
    "prose with the usual stopwords to be kept as content."
)
P2 = (
    "The second paragraph continues the story with more of the same "
    "kind of text that a reader would actually want to read."
)
NAV = '<a href="/">Home</a> <a href="/a">News</a> <a href="/b">Shop</a>'


def test_headings_lists_pins():
    html = f"""
    <html><body>
    <nav>{NAV}</nav>
    <h1>Main Title</h1>
    <p>{P1}</p>
    <h2>Subsection</h2>
    <p>{P2}</p>
    <ul><li>{P1}</li><li>{P2}<ul><li>{P1}</li></ul></li></ul>
    <ol><li>{P1}</li><li>{P2}</li></ol>
    <footer>{NAV}</footer>
    </body></html>
    """
    md, n_blocks, n_good = html_to_markdown(html)
    lines = md.split("\n\n")
    assert lines[0] == "# Main Title"
    assert lines[1] == P1
    assert lines[2] == "## Subsection"
    assert lines[3] == P2
    assert f"- {P1}" in lines
    assert f"  - {P1}" in lines  # nested bullet, 2-space indent
    assert f"1. {P1}" in lines and f"2. {P2}" in lines  # ordered
    assert "Home" not in md and "Shop" not in md  # nav rails dropped
    assert n_good == len(lines)


def test_heading_over_boilerplate_is_dropped():
    html = f"""
    <h1>Article</h1><p>{P1}</p>
    <h2>More Links</h2><div>{NAV}</div><div>{NAV}</div><div>{NAV}</div>
    """
    md, _, _ = html_to_markdown(html)
    assert "# Article" in md
    assert "## More Links" not in md  # no good block in its window


def test_table_renders_and_keeps_or_drops_whole():
    rows = (
        "<tr><th>Name</th><th>Description</th></tr>"
        "<tr><td>alpha</td><td>the first of the letters in the list</td></tr>"
        "<tr><td>beta</td><td>the second of the letters in the list</td></tr>"
    )
    html = f"<p>{P1}</p><table>{rows}</table><p>{P2}</p>"
    md, _, _ = html_to_markdown(html)
    assert "| Name | Description |" in md
    assert "| --- | --- |" in md
    assert "| alpha | the first of the letters in the list |" in md
    # a link-farm table (the nav-in-a-table layout) drops WHOLE on its
    # joint link density, prose neighbors notwithstanding
    link_rows = (
        "<tr><td><a href='/1'>alpha</a></td>"
        "<td><a href='/2'>beta</a></td></tr>" * 3
    )
    linky = f"<p>{P1}</p><table>{link_rows}</table><p>{P2}</p>"
    md2, _, _ = html_to_markdown(linky)
    assert "alpha" not in md2
    assert P1 in md2 and P2 in md2


def test_pre_blocks_fenced_whitespace_preserved_and_contextual():
    code = "def f(x):\n    return x + 1"
    html = f"<p>{P1}</p><pre>{code}</pre><p>{P2}</p>"
    md, _, _ = html_to_markdown(html)
    assert f"```\n{code}\n```" in md  # indentation survives
    # the same code between nav rails dies with its context
    md2, _, _ = html_to_markdown(
        f"<div>{NAV}</div><pre>{code}</pre><div>{NAV}</div>"
    )
    assert "def f" not in md2


def test_blockquote_prefix():
    html = f"<p>{P1}</p><blockquote>{P2}</blockquote>"
    md, _, _ = html_to_markdown(html)
    assert f"> {P2}" in md


def test_drop_tags_and_malformed_html():
    html = f"<script>var x=1;</script><p>{P1}<p>{P2}"  # unclosed <p>
    md, _, _ = html_to_markdown(html)
    assert "var x" not in md
    assert P1 in md and P2 in md


def test_spark_lane_and_clean_corpus_composition(spark):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.text import clean_corpus

    html = f"<h1>Title Here</h1><p>{P1}</p><p>{P2}</p>"
    rows = [(0, html), (1, f"<div>{NAV}</div>"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = extract_markdown(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["markdown"].startswith("# Title Here")
    assert got[0]["n_good_blocks"] == 3
    assert got[1]["markdown"] == ""  # all boilerplate
    assert 2 not in got  # NULL html prefiltered

    cleaned = clean_corpus(
        out.where(F.col("markdown").isNotNull()).select(
            "doc_id", F.col("markdown").alias("text")
        )
    ).collect()
    assert [r["doc_id"] for r in cleaned] == [0]


def test_quarantine_contract(spark):
    # a generated-DOM bomb maps to the per-row quarantine, not a crash
    bomb = "<p>word</p>" * 60_000
    df = spark.createDataFrame([(0, bomb)], "doc_id long, html string")
    out = extract_markdown(df).collect()
    assert out[0]["markdown"] is None
    with pytest.raises(Exception, match="block count"):
        extract_markdown(df, on_error="strict").collect()


def test_router_and_crawl_adapter_markdown_option(spark, tmp_path):
    """extract_document_text(html_markdown=True) renders html rows as
    markdown (same schema); warc_extracted_documents threads it, so a
    crawl becomes markdown-shaped training text in one exchange-free
    pass — non-html rows are untouched."""
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )
    from drill_logfile_plugin_spark.sources.warc import (
        read_warc,
        warc_extracted_documents,
    )
    from tests.test_warc import _http, _record

    html = f"<html><body><h1>Title Here</h1><p>{P1}</p></body></html>".encode()
    rows = [(0, bytearray(html)), (1, bytearray(P1.encode()))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_document_text(df, html_markdown=True).collect()
    }
    assert got[0]["text"].startswith("# Title Here")
    assert got[1]["text"] == P1  # txt lane unchanged

    blob = _record(url="https://md.example/a", payload=_http(html))
    (tmp_path / "c.warc").write_bytes(blob)
    out = warc_extracted_documents(
        read_warc(spark, str(tmp_path / "c.warc")), html_markdown=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.first()["text"].startswith("# Title Here")
