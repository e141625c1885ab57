"""jusText-style main-content extraction: block segmentation, the three
classification signals, the context pass, and the Spark lane — pinned
on hand-built pages where every block's verdict is known by
construction."""

from __future__ import annotations

import pytest

from drill_logfile_plugin_spark.operators import boilerplate as B

PROSE = (
    "The committee reviewed the report in detail and concluded that the "
    "proposal is a sound basis for further work on the policy."
)
PROSE2 = (
    "A second reading of the draft is scheduled, and the members of the "
    "working group agreed to circulate comments in advance of it."
)
MENU = '<li><a href="/">Home</a></li><li><a href="/about">About</a></li>'


def _page(body: str) -> str:
    return (
        "<html><head><title>t</title><style>p{color:red}</style>"
        "<script>var x=1;</script></head><body>" + body + "</body></html>"
    )


def test_good_prose_survives_menu_dies():
    html = _page(f"<ul>{MENU}</ul><p>{PROSE}</p><p>{PROSE2}</p><ul>{MENU}</ul>")
    text, n_blocks, n_good = B._extract_main(html)
    assert n_good == 2
    assert text == f"{PROSE}\n\n{PROSE2}"
    assert "Home" not in text and "About" not in text


def test_script_style_head_never_contribute():
    html = _page(f"<p>{PROSE}</p>")
    text, _, _ = B._extract_main(html)
    assert "color:red" not in text and "var x" not in text and "t" != text


def test_link_density_signal():
    # long but almost entirely links -> bad even at good word count
    linky = " ".join(f'<a href="/{i}">related article {i}</a>' for i in range(8))
    html = _page(f"<p>{PROSE}</p><div>{linky}</div>")
    text, _, n_good = B._extract_main(html)
    assert n_good == 1 and "related article" not in text


def test_stopword_density_signal():
    # long token soup with no stopwords (tag cloud) -> not good
    soup = " ".join(f"keyword{i}" for i in range(30))
    html = _page(f"<p>{PROSE}</p><p>{soup}</p>")
    text, _, n_good = B._extract_main(html)
    assert n_good == 1 and "keyword3" not in text


def test_context_pass_inherits_neighbors():
    short = "It was approved."  # undecided alone: 3 words, no links
    between_good = _page(f"<p>{PROSE}</p><p>{short}</p><p>{PROSE2}</p>")
    text, _, n_good = B._extract_main(between_good)
    assert n_good == 3 and short in text
    between_bad = _page(f"<ul>{MENU}</ul><p>{short}</p><ul>{MENU}</ul>")
    text2, _, n_good2 = B._extract_main(between_bad)
    assert n_good2 == 0 and text2 == ""


def test_malformed_markup_degrades_not_crashes():
    html = f"<p>{PROSE}<div><p>{PROSE2}"  # unclosed everything
    text, _, n_good = B._extract_main(html)
    assert n_good == 2 and PROSE in text and PROSE2 in text


def test_block_bomb_guard():
    html = "<p>word word word</p>" * 60_000
    with pytest.raises(ValueError, match="parser bound"):
        B._extract_main(html)


def test_spark_lane_and_quarantine(spark):
    rows = [
        (0, _page(f"<ul>{MENU}</ul><p>{PROSE}</p>")),
        (1, None),
        (2, _page("<p>short</p>")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["doc_id"]: r for r in B.extract_main_content(df).collect()}
    assert 1 not in out  # NULL html prefiltered
    assert out[0]["text"] == PROSE
    assert out[0]["n_good_blocks"] == 1
    assert out[0]["n_chars"] == len(PROSE)
    assert out[2]["n_good_blocks"] == 0 and out[2]["text"] == ""


def test_composition_into_text_tier(spark):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.text import clean_corpus

    rows = [
        (i, _page(f"<ul>{MENU}</ul><p>{PROSE} Extra sentence {i} here.</p>"))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    extracted = B.extract_main_content(df).where(F.col("n_good_blocks") > 0)
    cleaned = clean_corpus(
        extracted,
        quality_keep=("good", "too_short", "repetitive", "stopword_heavy"),
        drop_repetitive=False,
    )
    assert cleaned.count() == 4


def test_context_pass_linear_matches_quadratic_reference():
    """r9 ADVICE fix: the context pass is now two linear sweeps; pin it
    against the naive O(short x decided) definition on random verdict
    sequences, and pin the 50k-block worst case to sub-second work."""
    import random
    import time

    def naive(verdicts):
        decided = [i for i, v in enumerate(verdicts) if v != "short"]
        out = list(verdicts)
        for i, v in enumerate(verdicts):
            if v != "short":
                continue
            best = None
            best_d = None
            for j in decided:
                d = abs(j - i)
                if best_d is None or d < best_d:
                    best, best_d = verdicts[j], d
                elif d == best_d and verdicts[j] == "bad":
                    best = "bad"
            out[i] = best if best is not None else "bad"
        return out

    rng = random.Random(9)
    for _ in range(800):
        v = [
            rng.choice(["good", "bad", "short", "short"])
            for _ in range(rng.randint(0, 20))
        ]
        assert B._context_pass(v) == naive(v), v

    big = ["short"] * 50000
    big[0] = "good"
    big[-1] = "bad"
    t0 = time.time()
    out = B._context_pass(big)
    assert time.time() - t0 < 1.0
    assert out[1] == "good" and out[-2] == "bad"
    # exact midpoint tie between a good-left and bad-right resolves bad
    assert out[len(big) // 2] in ("good", "bad")
