"""Sentence-aware chunking: boundaries land on sentence ends, token
totals are conserved, oversize sentences stay intact, and the spill
bound holds — plus the real-corpus conservation sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.chunking import sentence_chunks
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _chunks(spark, text, max_tokens):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        sentence_chunks(df, max_tokens=max_tokens).collect(),
        key=lambda r: r["chunk_id"],
    )


def test_boundaries_are_sentence_ends(spark):
    """Six 4-token sentences at max_tokens=8: two sentences per chunk,
    every chunk ends with a terminator, text reassembles verbatim."""
    text = (
        "One two three four. Five six seven eight! "
        "Nine ten eleven twelve? Thirteen fourteen fifteen sixteen. "
        "Seventeen eighteen nineteen twenty. A b c d."
    )
    rows = _chunks(spark, text, max_tokens=8)
    assert len(rows) == 3
    for r in rows:
        assert r["n_sentences"] == 2
        assert r["chunk_tokens"] == 8
        assert r["chunk_text"].rstrip()[-1] in ".!?"
    assert " ".join(r["chunk_text"] for r in rows) == text


def test_token_conservation_and_spill_bound(spark):
    """Uneven sentences: chunk totals sum to the document total, and no
    chunk exceeds max_tokens + (its last sentence's length - 1)."""
    text = (
        "Short one. A much longer sentence with quite a few more tokens "
        "in it than the short ones. Tiny. Another medium sentence here "
        "with several tokens. End."
    )
    rows = _chunks(spark, text, max_tokens=10)
    total = sum(r["chunk_tokens"] for r in rows)
    assert total == len(text.split())
    for r in rows:
        # the straddling sentence stays whole: spill < its own length
        longest_sentence = max(
            len(s.split()) for s in r["chunk_text"].split(". ")
        )
        assert r["chunk_tokens"] <= 10 + longest_sentence


def test_giant_sentence_is_never_cut(spark):
    """A sentence longer than the budget is never cut mid-sentence: it
    lands whole in the chunk where its offset starts (the documented
    floor policy), and the NEXT sentence opens a fresh chunk."""
    giant = ("w " * 50).strip()
    text = f"Lead in. {giant}. Tail out."
    rows = _chunks(spark, text, max_tokens=8)
    giant_rows = [r for r in rows if giant in r["chunk_text"]]
    assert len(giant_rows) == 1  # intact, exactly once
    # the trailing sentence is in a LATER chunk, alone
    tail = [r for r in rows if "Tail out." in r["chunk_text"]]
    assert len(tail) == 1 and tail[0]["chunk_id"] > giant_rows[0]["chunk_id"]
    assert tail[0]["n_sentences"] == 1


def test_determinism_and_degenerates(spark):
    df = spark.createDataFrame(
        [(1, "A b. C d."), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    a = sorted(map(str, sentence_chunks(df, max_tokens=4).collect()))
    b = sorted(map(str, sentence_chunks(df, max_tokens=4).collect()))
    assert a == b
    # NULL and whitespace-only docs vanish (no sentences), doc 1 chunks
    ids = {r["doc_id"] for r in sentence_chunks(df, max_tokens=4).collect()}
    assert ids == {1}
    with pytest.raises(ValueError, match=">= 1"):
        sentence_chunks(df, max_tokens=0)


def test_real_corpus_conservation(spark):
    """Over 500 real documents: per-document chunk token totals equal the
    document's own sentence-token total (nothing dropped, nothing
    duplicated), and chunks per doc grow with document length."""
    docs = load_table(spark, SF_DIR, "documents").limit(500)
    chunks = sentence_chunks(docs, max_tokens=64)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(F.sum("chunk_tokens").alias("got"))
    )
    want = docs.select(
        "doc_id",
        F.expr(
            "aggregate(transform(filter(split(text, '(?<=[.!?])\\\\s+'),"
            " s -> trim(s) != ''),"
            " s -> size(split(trim(s), '\\\\s+'))), 0L, (a, x) -> a + x)"
        ).alias("want"),
    )
    joined = per_doc.join(want, "doc_id")
    bad = joined.where(F.col("got") != F.col("want")).count()
    assert bad == 0


def test_dedup_paragraphs(spark):
    """CCNet paragraph dedup on a planted fixture: the shared footer
    vanishes from every doc (normalization catches whitespace variants),
    unique paragraphs keep their order, counts are exact, an
    all-boilerplate doc returns empty, and the knobs behave."""
    from drill_logfile_plugin_spark.operators.text import dedup_paragraphs

    footer = "Accept cookies to continue"
    docs = [
        (1, f"Unique intro one.\n\n{footer}\n\nUnique tail one."),
        (2, f"Second doc body.\n\n{footer}"),
        (3, f"{footer.replace(' ', '  ')}"),  # whitespace variant, all-boiler
        (4, "No shared text at all.\n\nStill unique."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] == "Unique intro one.\n\nUnique tail one."
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 1)
    assert out[2]["text"] == "Second doc body."
    assert out[3]["text"] == "" and out[3]["n_dropped"] == 1
    assert out[4]["text"] == "No shared text at all.\n\nStill unique."
    assert out[4]["n_dropped"] == 0
    # raising max_doc_freq keeps the footer everywhere
    kept = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, max_doc_freq=3).collect()
    }
    assert footer in kept[1] and footer in kept[2]
    # min_chars exempts short repeats from eligibility
    shorts = spark.createDataFrame(
        [(1, "ok\n\nunique a"), (2, "ok\n\nunique b")],
        "doc_id long, text string",
    )
    exempt = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(shorts, min_chars=10).collect()
    }
    assert exempt[1].startswith("ok") and exempt[2].startswith("ok")
    import pytest as _pt

    with _pt.raises(ValueError, match=">= 1"):
        dedup_paragraphs(df, max_doc_freq=0)
