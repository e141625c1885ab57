"""Exact substring dedup (Lee et al. 2022 ExactSubstr stage).

Pins `operators/dedup.py exact_substring_dedup` against an INDEPENDENT
in-test reference implementation (suffix-semantics via brute-force n-gram
multiplicity counting — no shared code with the operator), the DuckDB
mirror, and the semantic boundary vs strip_boilerplate (distinct-doc vs
multiplicity thresholds).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest


def _ref_exact_substring(docs, n, min_count):
    """Independent reference: brute-force covered-position removal.

    For every document, count every n-gram occurrence across the whole
    corpus (WITH multiplicity, including within-document repeats); a
    token position is removed iff it lies inside some n-gram occurring
    >= min_count times — exactly the tokens inside repeated spans of
    length >= n (the suffix-array semantics). Returns per doc:
    (text_clean, n_tokens, n_removed, n_spans).
    """
    toks = {}
    for i, t in docs.items():
        if t is None:
            toks[i] = []
        else:
            toks[i] = re.split(r"[ \t\n\x0b\f\r]+", t.strip(" "))
    cnt = Counter()
    for tk in toks.values():
        for s in range(len(tk) - n + 1):
            cnt[tuple(tk[s : s + n])] += 1
    out = {}
    for i, tk in toks.items():
        covered = [False] * len(tk)
        for s in range(len(tk) - n + 1):
            if cnt[tuple(tk[s : s + n])] >= min_count:
                for j in range(s, s + n):
                    covered[j] = True
        surv = [t for t, c in zip(tk, covered) if not c]
        n_spans = sum(
            1
            for j in range(len(tk))
            if covered[j] and (j == 0 or not covered[j - 1])
        )
        out[i] = (" ".join(surv), len(tk), len(tk) - len(surv), n_spans)
    return out


def _u(lo, hi):
    """Globally-unique filler tokens (never form a repeated gram)."""
    return " ".join(f"u{k:04d}" for k in range(lo, hi))


#: Planted corpus, n=8: P (10 tokens) shared across docs 1/2 at different
#: offsets; Q (9 tokens) pasted TWICE inside doc 3 (within-doc repeat —
#: the case a distinct-doc threshold misses); docs 4/5 identical (whole-
#: doc repeated span); doc 6 unique; doc 7 NULL; doc 8 empty.
_P = " ".join(f"p{k}" for k in range(10))
_Q = " ".join(f"q{k}" for k in range(9))
_CORPUS = {
    1: _u(0, 5) + " " + _P + " " + _u(5, 12),
    2: _u(12, 22) + " " + _P + " " + _u(22, 25),
    3: _u(25, 28) + " " + _Q + " " + _u(28, 31) + " " + _Q + " " + _u(31, 33),
    4: _u(33, 45),
    5: _u(33, 45),
    6: _u(45, 60),
    7: None,
    8: "",
}


@pytest.fixture(scope="module")
def planted(spark):
    df = spark.createDataFrame(
        list(_CORPUS.items()), "doc_id long, text string"
    )
    from drill_logfile_plugin_spark.operators.dedup import (
        exact_substring_dedup,
    )

    rows = {r.doc_id: r for r in exact_substring_dedup(df, n=8).collect()}
    return df, rows


def test_matches_independent_reference_byte_identically(planted):
    """Every doc's rewritten text, token counts, and maximal-extent count
    equal the brute-force reference — injected shared passages (and only
    they) are removed."""
    _, rows = planted
    ref = _ref_exact_substring(_CORPUS, n=8, min_count=2)
    assert set(rows) == set(ref)
    for i in sorted(ref):
        got = (
            rows[i].text_clean,
            rows[i].n_tokens,
            rows[i].n_removed,
            rows[i].n_spans,
        )
        assert got == ref[i], f"doc {i}: {got} != {ref[i]}"


def test_planted_structure_is_what_the_fixture_promises(planted):
    """Sanity on the fixture itself (guards against a silently-inert
    plant): cross-doc passage removed from both hosts, within-doc repeat
    removed twice, identical docs fully removed, unique doc untouched."""
    _, rows = planted
    assert rows[1].n_removed == 10 and rows[1].n_spans == 1
    assert rows[2].n_removed == 10 and rows[2].n_spans == 1
    # doc 3: both copies of the 9-token Q removed, two separate extents
    assert rows[3].n_removed == 18 and rows[3].n_spans == 2
    assert "q0" not in rows[3].text_clean
    # docs 4/5: whole doc is one repeated span
    for i in (4, 5):
        assert rows[i].text_clean == "" and rows[i].n_spans == 1
        assert rows[i].n_removed == rows[i].n_tokens == 12
    assert rows[6].n_removed == 0 and rows[6].n_spans == 0
    assert rows[6].text_clean == _CORPUS[6]
    # NULL -> ('', 0, 0, 0); '' tokenizes to [''] (too short for a gram)
    assert (rows[7].text_clean, rows[7].n_tokens, rows[7].n_removed) == (
        "",
        0,
        0,
    )
    assert rows[8].n_removed == 0


def test_duckdb_mirror_matches_spark(planted, spark):
    """The oracle SQL replays the rewrite byte-for-byte (text included)."""
    import duckdb

    from drill_logfile_plugin_spark.operators.dedup import (
        exact_substring_sql_duck,
    )

    df, rows = planted
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    du = {
        r[0]: r[1:]
        for r in con.execute(exact_substring_sql_duck(n=8)).fetchall()
    }
    for i, r in rows.items():
        assert (r.text_clean, r.n_tokens, r.n_removed, r.n_spans) == du[i], i


def test_multiplicity_vs_distinct_doc_threshold(planted, spark):
    """The semantic boundary vs strip_boilerplate: a passage pasted twice
    into ONE doc is removed by exact_substring_dedup (occurrence count 2)
    but kept by strip_boilerplate(min_docs=2) (1 distinct doc)."""
    from drill_logfile_plugin_spark.operators.text import strip_boilerplate

    df, rows = planted
    sb = {r.doc_id: r for r in strip_boilerplate(df, min_docs=2).collect()}
    assert rows[3].n_removed == 18  # multiplicity: both Q copies cut
    assert "q0" in sb[3].text_clean  # distinct-doc: doc 3's repeat kept
    # while the genuinely cross-doc passage P is cut by both
    assert sb[1].n_removed >= 10 and rows[1].n_removed == 10


def test_shared_positional_stream_path_is_identical(planted, spark):
    """q59's shared-stream form (starts= from positional_ngram_starts)
    returns the same rows as the self-contained form."""
    from drill_logfile_plugin_spark.operators.dedup import (
        exact_substring_dedup,
    )
    from drill_logfile_plugin_spark.operators.text import (
        positional_ngram_starts,
        strip_boilerplate,
    )

    df, rows = planted
    bst = positional_ngram_starts(df, n=8)
    shared = {
        r.doc_id: r
        for r in exact_substring_dedup(df, n=8, starts=bst).collect()
    }
    for i, r in rows.items():
        assert (
            shared[i].text_clean,
            shared[i].n_removed,
            shared[i].n_spans,
        ) == (r.text_clean, r.n_removed, r.n_spans), i
    # and the same stream also feeds the boilerplate rewrite unchanged
    a = strip_boilerplate(df, min_docs=2, starts=bst).collect()
    b = strip_boilerplate(df, min_docs=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_no_python_and_no_text_in_exchange(planted, spark):
    """Plan contract: the rewrite is JVM-only (no Arrow/Python eval) and
    every exchange keys on hashes/doc_id, never the gram string or text."""
    from drill_logfile_plugin_spark.operators.dedup import (
        exact_substring_dedup,
    )

    df, _ = planted
    plan = exact_substring_dedup(df, n=8)._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    for chunk in plan.split("Exchange hashpartitioning(")[1:]:
        key = chunk.split(",")[0]
        assert key.startswith(("gh", "doc_id")), key
