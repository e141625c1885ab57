"""Property-based tests (hypothesis) for the log scan operator.

SURVEY.md §5 item 3: random lines ⊎ random-ish patterns → structural
invariants that must hold for ANY input, independent of the DuckDB oracle:

* conservation: matched rows + unmatched rows = non-blank input lines,
* matched rows never carry unmatched_lines; unmatched rows carry only it,
* VARCHAR fields round-trip the matched substring exactly,
* the type-default rule (wrong-length data_types -> all VARCHAR).

One shared SparkSession; hypothesis drives many small DataFrames through
the same plan shape, so deadline is disabled (Spark job latency dwarfs it).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.config import LogFormatConfig
from drill_logfile_plugin_spark.sources.log_reader import parse_lines

# Lines over a small alphabet so that matches, partial matches, and
# non-matches all occur with useful frequency.
line_st = st.text(
    alphabet=st.sampled_from(list("ab1 \t:")), min_size=0, max_size=24
)

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

#: key=value-ish pattern: one alpha group, one numeric group.
PATTERN = r"([ab]+):?\s*(\d+)"


def _run(spark, lines, cfg):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    return parse_lines(df, cfg).collect()


@given(lines=st.lists(line_st, min_size=0, max_size=30))
@SETTINGS
def test_conservation_and_routing(spark, lines):
    cfg = LogFormatConfig(
        pattern=PATTERN,
        field_names=["k", "v"],
        data_types=["VARCHAR", "INT"],
    )
    rows = _run(spark, lines, cfg)
    non_blank = [ln for ln in lines if ln.strip()]
    assert len(rows) == len(non_blank)
    import re

    rx = re.compile(PATTERN)
    n_match = sum(1 for ln in non_blank if rx.search(ln.strip()))
    matched = [r for r in rows if r.unmatched_lines is None]
    unmatched = [r for r in rows if r.unmatched_lines is not None]
    assert len(matched) == n_match
    assert len(matched) + len(unmatched) == len(non_blank)
    for r in unmatched:
        # unmatched rows carry ONLY the raw (trimmed) line
        assert r.k is None and r.v is None
        assert r.unmatched_lines == r.unmatched_lines.strip() != ""


@given(lines=st.lists(line_st, min_size=1, max_size=30))
@SETTINGS
def test_varchar_roundtrip_first_match(spark, lines):
    """VARCHAR fields equal re.search's groups on the trimmed line —
    Matcher.find() first-match semantics, both engines."""
    import re

    cfg = LogFormatConfig(pattern=PATTERN, field_names=["k", "v"])
    rows = _run(spark, lines, cfg)
    rx = re.compile(PATTERN)
    got = {(r.k, r.v) for r in rows if r.unmatched_lines is None}
    want = set()
    for ln in lines:
        m = rx.search(ln.strip())
        if m:
            want.add((m.group(1), m.group(2)))
    # set-compare (duplicates collapse; order is not part of the contract)
    assert got == want


@given(
    lines=st.lists(line_st, min_size=1, max_size=10),
    types=st.one_of(
        st.none(),
        st.just(["INT"]),  # wrong length for 2 fields
        st.just(["WIDGET", "BLOB"]),  # unknown type strings
    ),
)
@SETTINGS
def test_type_default_rule(spark, lines, types):
    """None / wrong-length / unknown data_types -> every field VARCHAR
    (LogRecordReader.java:185-191 and the :276-281 else-branch)."""
    cfg = LogFormatConfig(pattern=PATTERN, field_names=["k", "v"], data_types=types)
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    out = parse_lines(df, cfg)
    assert [f.dataType.simpleString() for f in out.schema.fields[:2]] == [
        "string",
        "string",
    ]


# --- cross-engine parity: repetition n-gram fragments (q62) ---------------

text_st = st.text(alphabet=st.sampled_from(list("ab \t")), max_size=30)


@given(texts=st.lists(text_st, min_size=1, max_size=12))
@SETTINGS
def test_dup_ngram_counts_cross_engine(spark, texts):
    """The Spark and DuckDB dup-n-gram fragments agree cell-for-cell on
    arbitrary whitespace-mangled inputs (leading tabs, runs of spaces,
    empty strings) — the exact surface where split()/trim() semantics
    could silently diverge between engines and flip a q62 verdict."""
    import duckdb
    import pandas as pd

    from drill_logfile_plugin_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["total2"], r["dist2"], r["total3"], r["dist3"], r["verdict"])
        for r in T.repetition_signals(df).collect()
    }

    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    t2, d2 = T.dup_ngram_counts_sql_duck("toks", 2)
    t3, d3 = T.dup_ngram_counts_sql_duck("toks", 3)
    toks = T.TOKS_DUCK.format(c="text")
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(
            f"""WITH d AS (SELECT doc_id, {toks} AS toks FROM docs)
            SELECT doc_id, {t2}, {d2}, {t3}, {d3},
                   {T.repetition_verdict_case(t2, d2)} FROM d"""
        ).fetchall()
    }
    assert got == want


# --- chunking invariants (q61 operator) -----------------------------------


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("abc ")), max_size=40),
        min_size=1,
        max_size=8,
    ),
    chunk_tokens=st.sampled_from([1, 3, 7]),
)
@SETTINGS
def test_chunking_conserves_tokens(spark, texts, chunk_tokens):
    """For ANY input and chunk size: token counts are conserved across the
    explode, chunk ids are contiguous from 0, every chunk except the last
    is full, and the with_text chunks concatenate back to the original
    token stream."""
    from drill_logfile_plugin_spark.operators.chunking import chunk_docs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_docs(df, chunk_tokens=chunk_tokens, with_text=True).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    for i, t in enumerate(texts):
        toks = __import__("re").split(r"\s+", t.strip())
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert sum(c["n_chunk_tokens"] for c in chunks) == len(toks)
        assert all(
            c["n_chunk_tokens"] == chunk_tokens for c in chunks[:-1]
        )
        assert 1 <= chunks[-1]["n_chunk_tokens"] <= chunk_tokens
        rejoined = " ".join(c["chunk_text"] for c in chunks).split(" ")
        assert rejoined == toks


# --- BM25 retrieval vs from-scratch reference on random corpora ------------

word_st = st.sampled_from(["hash", "join", "scan", "agg", "row", "zz"])
doc_st = st.lists(word_st, min_size=1, max_size=8).map(" ".join)


@given(
    texts=st.lists(doc_st, min_size=1, max_size=10),
    qwords=st.lists(word_st, min_size=1, max_size=3, unique=True),
)
@SETTINGS
def test_bm25_matches_reference_on_random_corpora(spark, texts, qwords):
    """For ANY corpus and query over the small vocabulary, the DataFrame
    BM25 produces exactly the reference's integer-scaled scores (union of
    matched (query, doc) pairs and their values) — the engine-vs-Python
    parity complement to the fixed-corpus unit test."""
    from tests.test_retrieval import bm25_reference
    from drill_logfile_plugin_spark.operators.retrieval import bm25_topk, query_set

    docs_rows = list(enumerate(texts))
    queries = {"q": " ".join(qwords)}
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["score_scaled"]
        for r in bm25_topk(docs, query_set(spark, queries), k=len(texts)).collect()
    }
    assert got == bm25_reference(docs_rows, queries)


# --- funnel / cohort vs from-scratch references on random event streams ----

ts_st = st.integers(min_value=0, max_value=50)
etype_st = st.sampled_from(["view", "click", "purchase"])
event_st = st.tuples(st.integers(min_value=0, max_value=4), etype_st, ts_st)


def _funnel_reference(events, stages, within=None):
    """Brute-force first-touch funnel over (user, type, t) tuples."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, t in events:
        by_user[u].append((e, t))
    counts = [0] * len(stages)
    for u, evs in by_user.items():
        prev_t = None
        for i, stage in enumerate(stages):
            cands = [
                t
                for e, t in evs
                if e == stage
                and (i == 0 or (t > prev_t and (within is None or t <= prev_t + within)))
            ]
            if not cands:
                break
            prev_t = min(cands)
            counts[i] += 1
    return counts


@given(events=st.lists(event_st, min_size=1, max_size=30))
@SETTINGS
def test_funnel_matches_reference_on_random_streams(spark, events):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.behavior import funnel

    stages = ["view", "click", "purchase"]
    ev = spark.createDataFrame(
        events, "user_id long, event_type string, t long"
    ).select(
        "user_id", "event_type", F.timestamp_seconds(F.col("t")).alias("ts")
    )
    got = {
        r["stage_idx"]: r["n_users"]
        for r in funnel(ev, stages, within_seconds=10).collect()
    }
    want = _funnel_reference(events, stages, within=10)
    assert [got.get(i, 0) for i in range(3)] == want


@given(events=st.lists(st.tuples(st.integers(0, 4), ts_st), min_size=1, max_size=30))
@SETTINGS
def test_cohort_retention_matches_reference(spark, events):
    """Random (user, day-offset) activity vs a brute-force cohort triangle
    (granularity=day keeps the reference arithmetic trivial)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.behavior import cohort_retention

    ev = spark.createDataFrame(events, "user_id long, d long").select(
        "user_id",
        F.timestamp_seconds(F.col("d") * 86400 + 3600).alias("ts"),
    )
    got = {
        (r["cohort"].toordinal(), r["period_offset"]): r["n_active"]
        for r in cohort_retention(ev, granularity="day").collect()
    }
    days = defaultdict(set)
    for u, d in events:
        days[u].add(d)
    want = defaultdict(int)
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    for u, ds in days.items():
        first = min(ds)
        for d in ds:
            want[(epoch + first, d - first)] += 1
    assert got == dict(want)


@given(
    counts=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=24),
    trailing=st.sampled_from([2, 4, 6]),
    k=st.sampled_from([1, 2, 3]),
)
@SETTINGS
def test_spike_flags_matches_reference_on_any_series(spark, counts, trailing, k):
    """For ANY dense hourly count series and (trailing, k): the integer
    z-test verdicts equal an independent Python reference computed from
    the float definition's algebra — including warmup rows and all-zero
    windows (variance 0: any positive deviation is a spike)."""
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags

    rows = [
        ("g", f"2024-01-0{1 + h // 24} {h % 24:02d}:{m:02d}:00")
        for h, c in enumerate(counts)
        for m in range(c)
    ]
    if not rows:  # all-zero series has no events to bucket
        return
    df = spark.createDataFrame(
        rows, "event_type string, s string"
    ).select("event_type", F.col("s").cast("timestamp").alias("ts"))
    got = {
        r["bucket"]: (r["cnt"], r["n_trail"], r["spike"])
        for r in spike_flags(
            df, trailing=trailing, k=k, min_trailing=2
        ).collect()
    }
    # the observed axis spans min..max event hour; gapfill completes it
    hours = [h for h, c in enumerate(counts) if c > 0]
    lo, hi = min(hours), max(hours)
    dense = counts[lo : hi + 1]
    assert len(got) == len(dense)
    by_hour = sorted(got)
    for i, b in enumerate(by_hour):
        c = dense[i]
        w = dense[max(0, i - trailing) : i]
        n, s, ss = len(w), sum(w), sum(x * x for x in w)
        z_num, z_den2 = n * c - s, n * ss - s * s
        expect = n >= 2 and z_num > 0 and z_num * z_num > k * k * z_den2
        assert got[b] == (c, n, expect), (i, b, dense)


@given(
    n_bytes=st.integers(min_value=0, max_value=3000),
    avg=st.sampled_from([64, 128, 256]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@SETTINGS
def test_cdc_chunks_tile_exactly_for_any_input(spark, n_bytes, avg, seed):
    """For ANY content and average size: chunks tile the byte range
    exactly in order, sizes respect [min, max] (except a possibly-short
    final chunk), and the split is a pure function of the bytes."""
    import random

    from drill_logfile_plugin_spark.operators.chunking import cdc_chunks

    rng = random.Random(seed)
    text = "".join(chr(32 + rng.randrange(95)) for _ in range(n_bytes))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        cdc_chunks(df, avg_size=avg).collect(), key=lambda r: r["chunk_idx"]
    )
    if n_bytes == 0:
        assert rows == []
        return
    assert rows[0]["start"] == 0
    for x, y in zip(rows, rows[1:]):
        assert y["start"] == x["start"] + x["length"]
    assert sum(r["length"] for r in rows) == len(text.encode())
    hi = avg * 4
    assert all(r["length"] <= hi for r in rows)
    lo = max(avg // 4, 48)
    assert all(r["length"] >= lo for r in rows[:-1]) or len(rows) == 1


# --- BPE induction parity (operators/bpe.py) -------------------------------

word_st = st.text(alphabet=st.sampled_from(list("abc")), min_size=1, max_size=6)


@given(words=st.lists(word_st, min_size=1, max_size=25))
@settings(
    max_examples=8,  # each example is ~6 sequential Spark jobs
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_bpe_trajectory_matches_reference_on_random_corpora(spark, words):
    """For ANY corpus over a tiny alphabet — where ties, overlapping runs
    ('aaaa'), and single-char words are all common — the distributed
    trainer's merge trajectory and final word segmentation must equal the
    from-scratch Python reference. This is the adversarial surface for
    the greedy fold: a delimited string *replace* would pass easy
    corpora and diverge exactly here."""
    from collections import Counter

    from drill_logfile_plugin_spark.operators.bpe import bpe_train
    from tests.test_llm_ops import _bpe_reference

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    merges, final_words = bpe_train(df, n_merges=5, barrier_every=2)
    ref_merges, ref_words = _bpe_reference(Counter(words), 5)
    assert merges == ref_merges
    got = {
        tuple(r["s"].split()): r["freq"]
        for r in final_words.select("s", "freq").collect()
    }
    assert got == {tuple(k): f for k, f in ref_words.items()}


#: Texts mixing multi-char words, repeats, and odd whitespace so shingle
#: windows, duplicate grams, and short-doc guards all fire.
_shingle_text_st = st.text(
    alphabet=st.sampled_from(list("ab c d\t")), min_size=0, max_size=40
)


@given(texts=st.lists(_shingle_text_st, min_size=1, max_size=12))
@SETTINGS
def test_bind_once_shingles_equal_inline_form(spark, texts):
    """The r5 bind-once rewrite of shingles_sql_spark is semantically
    IDENTICAL to the pre-r5 inline form (which re-evaluated the split per
    shingle position) on arbitrary text — whitespace runs, short docs,
    duplicate grams, empty strings included."""
    from drill_logfile_plugin_spark.operators.dedup import shingles_sql_spark
    from drill_logfile_plugin_spark.operators.text import TOKS_SPARK

    n = 2
    toks = TOKS_SPARK.format(c="text")
    inline = (
        f"IF(size({toks}) >= {n}, "
        f"array_distinct(transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' '))), array())"
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = df.selectExpr(
        "i",
        f"{shingles_sql_spark('text', n)} AS bound",
        f"{inline} AS old",
    ).collect()
    for r in rows:
        assert r.bound == r.old, (texts[r.i], r.bound, r.old)


@given(texts=st.lists(_shingle_text_st, min_size=1, max_size=8))
@SETTINGS
def test_simhash64_duck_mirror_on_random_texts(spark, texts):
    """The 64-bit DuckDB signature mirror (q28's oracle since r5) equals
    the engine's pandas-UDF signatures on arbitrary text, including the
    NULL/whitespace-only exclusion both sides apply."""
    import duckdb
    import pandas as pd

    from drill_logfile_plugin_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = F.expr(D.TOKS_SPARK.format(c="text"))
    eng = {
        r.doc_id: r.sig
        for r in df.select("doc_id", toks.alias("tk"))
        .where(F.col("tk").isNotNull() & (F.array_join("tk", "") != ""))
        .select("doc_id", D._simhash_udf(64)(F.col("tk")).alias("sig"))
        .collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    duck = dict(con.execute(D.simhash64_sigs_sql_duck()).fetchall())
    assert eng == duck


@given(
    lines=st.lists(line_st, min_size=0, max_size=20),
    split_size=st.one_of(st.none(), st.integers(min_value=1, max_value=64)),
)
@SETTINGS
def test_format_log_shim_matches_read_log_on_random_lines(
    spark, lines, split_size
):
    """The format('log') Python DataSource shim is row-for-row identical
    to the JVM-expression path (read_log) on arbitrary line soup —
    matches, mismatches routed to unmatched_lines, Java-trim skips, and
    INT capture groups beyond int32 (which the '1'-runs in the alphabet
    produce naturally: both sides must NULL them, not abort) — AND under
    arbitrary byte-range splitting (split_size drawn down to 1 byte, so
    boundaries land inside lines, on newlines, and inside multi-byte
    UTF-8 sequences)."""
    import tempfile

    from drill_logfile_plugin_spark import (
        read_log,
        register_log_datasource,
    )

    register_log_datasource(spark)
    cfg = LogFormatConfig(
        pattern=PATTERN,
        field_names=["k", "v"],
        data_types=["VARCHAR", "INT"],
    )
    with tempfile.NamedTemporaryFile(
        "w", suffix=".log", delete=False
    ) as fh:
        fh.write("".join(ln.replace("\n", " ") + "\n" for ln in lines))
        path = fh.name
    ref = read_log(spark, path, cfg)
    reader = (
        spark.read.format("log")
        .option("pattern", PATTERN)
        .option("fieldNames", "k,v")
        .option("dataTypes", "VARCHAR,INT")
    )
    if split_size is not None:
        reader = reader.option("splitSize", str(split_size))
    shim = reader.load(path)
    assert shim.schema == ref.schema
    key = lambda r: tuple(str(x) for x in r)  # noqa: E731
    assert sorted(map(key, shim.collect())) == sorted(
        map(key, ref.collect())
    )


# --- cross-engine parity: the tokenizer itself (every text operator) ------

#: Arbitrary unicode text — control chars, separators, emoji, combining
#: marks — EXCLUDING U+0000 (DuckDB's VARCHAR sort/compare is internally
#: inconsistent on embedded NUL; documented in test_adversarial_text.py).
unicode_text_st = st.text(max_size=40).filter(lambda s: "\x00" not in s)


@given(texts=st.lists(unicode_text_st, min_size=1, max_size=16))
@SETTINGS
def test_tokenizer_cross_engine_on_arbitrary_unicode(spark, texts):
    """TOKS_SPARK and TOKS_DUCK produce IDENTICAL token arrays on
    arbitrary unicode — the generalization of the adversarial-corpus
    findings (Java \\s containing U+000B where RE2's does not; Unicode
    line separators inside tokens). Every text operator and its oracle
    mirror stand on this agreement."""
    import duckdb
    import pandas as pd

    from drill_logfile_plugin_spark.operators.text import (
        TOKS_DUCK,
        TOKS_SPARK,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", F.expr(TOKS_SPARK.format(c="text")).alias("toks")
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {TOKS_DUCK.format(c='text')} FROM docs"
        ).fetchall()
    )
    assert got == want


#: TOKEN-domain strings: _spaced's inputs come from the \s+ split, so
#: they can never contain the whitespace class (nor NUL, excluded for
#: the DuckDB sort quirk). On raw '\n' the engines genuinely differ
#: ((?s) lets Java '.' match it, RE2's never does) — but no token can
#: carry one, which is exactly why (?s) closes the gap on the
#: characters that CAN appear (U+2028/U+2029/U+0085).
token_text_st = st.text(max_size=24).filter(
    lambda s: not set(s) & set(" \t\n\x0b\f\r\x00")
)


@given(texts=st.lists(token_text_st, min_size=1, max_size=12))
@SETTINGS
def test_bpe_spacing_cross_engine_on_arbitrary_unicode(spark, texts):
    """The BPE character segmentation (_spaced / _SPACED_DUCK) agrees
    per TOKEN on arbitrary unicode — pins the (?s) fix: without DOTALL
    Java's '.' skips U+2028/U+2029/U+0085 inside tokens, fusing a
    2-char symbol Spark-side only and diverging the trained merge
    trajectory."""
    import duckdb
    import pandas as pd

    from drill_logfile_plugin_spark.operators.bpe import (
        _SPACED_DUCK,
        _spaced,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", _spaced(F.col("text")).alias("s")).collect()
    }
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {_SPACED_DUCK.format(t='text')} FROM docs"
        ).fetchall()
    )
    assert got == want


@given(texts=st.lists(_shingle_text_st, min_size=2, max_size=10))
@settings(max_examples=8, deadline=None)  # two LSH runs per example
def test_incremental_lsh_equivalence_property(spark, texts):
    """incremental_lsh_pairs(increment, standing) == the corpus-wide
    lsh_candidate_pairs restricted to increment-touching pairs, for
    ARBITRARY small-alphabet corpora (heavy shingle overlap, so both
    cross and self pairs occur organically) with a planted exact twin
    straddling the increment boundary."""
    from drill_logfile_plugin_spark.operators import dedup as D

    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((len(texts), texts[0]))  # twin straddles the boundary
    df = spark.createDataFrame(rows, "doc_id long, text string")
    standing = df.where(F.col("doc_id") % 3 != 0)
    increment = df.where(F.col("doc_id") % 3 == 0)

    inc_ids = {r["doc_id"] for r in increment.select("doc_id").collect()}
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))  # noqa: E731
    expected = sorted(
        key(r)
        for r in D.lsh_candidate_pairs(df, jaccard_threshold=0.3).collect()
        if r["doc_a"] in inc_ids or r["doc_b"] in inc_ids
    )
    got = sorted(
        map(
            key,
            D.incremental_lsh_pairs(
                increment, standing, jaccard_threshold=0.3
            ).collect(),
        )
    )
    assert got == expected
