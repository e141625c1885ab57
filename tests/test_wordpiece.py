"""WordPiece induction + MaxMatch encoding (r11), pinned against an
INDEPENDENT pure-Python reference written here from the published
formulation (Schuster & Nakajima 2012 / the HF tokenizers training
doc): likelihood-gain-scored merges over ##-marked word types, greedy
longest-match-first encoding with whole-word [UNK]."""

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.wordpiece import (
    UNK_PIECE,
    WordPieceModel,
    merged_symbol,
    wordpiece_encode,
    wordpiece_encode_ids,
    wordpiece_model,
    wordpiece_train,
    wordpiece_vocab_ids,
)

# ----------------------------------------------- independent reference

def _ref_word_types(docs):
    freqs = {}
    for d in docs:
        for w in d.split():
            freqs[w] = freqs.get(w, 0) + 1
    return {
        tuple([w[0]] + ["##" + c for c in w[1:]]): f
        for w, f in freqs.items()
    }


def _ref_train(docs, n_merges, min_freq=1):
    """Reference trainer: dict-of-tuples state, score =
    freq(pair)/(freq(a)*freq(b)) as the same double expression,
    tie-break (score DESC, a ASC, b ASC)."""
    words = _ref_word_types(docs)
    merges = []
    for _ in range(n_merges):
        pair_f = {}
        sym_f = {}
        for syms, f in words.items():
            for s in syms:
                sym_f[s] = sym_f.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pair_f[(a, b)] = pair_f.get((a, b), 0) + f
        scored = [
            (pf / (sym_f[a] * sym_f[b]), a, b)
            for (a, b), pf in pair_f.items()
            if pf >= min_freq
        ]
        if not scored:
            break
        # deterministic tie-break: score DESC then a ASC then b ASC
        best = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[0]
        score, a, b = best
        merges.append((a, b, score))
        merged = a + (b[2:] if b.startswith("##") else b)
        new_words = {}
        for syms, f in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + f
        words = new_words
    return merges, words


def _ref_encode_word(w, vocab, max_len):
    out = []
    pos = 0
    while pos < len(w):
        ln = min(max_len, len(w) - pos)
        while ln > 0:
            piece = w[pos : pos + ln] if pos == 0 else "##" + w[pos : pos + ln]
            if piece in vocab:
                out.append(piece)
                pos += ln
                break
            ln -= 1
        else:
            return [UNK_PIECE]
    return out


CORPUS = [
    "the unhappy hunter hunted the unlikely hound",
    "the unhappy hound hounded the hunter",
    "hunting unhappy hounds is unlikely",
    "the the the hunter hunter hound",
]


# ------------------------------------------------------------- training

def test_merged_symbol_absorbs_marker():
    assert merged_symbol("un", "##able") == "unable"
    assert merged_symbol("##ab", "##le") == "##able"


def test_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got, words = wordpiece_train(df, n_merges=10)
    want, ref_words = _ref_train(CORPUS, 10)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, s_got), (_, _, s_want) in zip(got, want):
        assert s_got == pytest.approx(s_want, rel=1e-12)
    # post-merge word states agree too
    state = {
        tuple(r["s"].split()): r["freq"]
        for r in words.select(F.trim("s").alias("s"), "freq").collect()
    }
    assert state == ref_words


def test_score_beats_raw_frequency(spark):
    """The likelihood-gain score must NOT pick BPE's most-frequent
    pair when that pair's parts are themselves frequent: (a,##a)
    appears 4x from very common parts (score 4/36); (q,##z) appears
    3x from parts that ONLY occur together (score 3/9)."""
    docs = ["aa aa aa aa ab ab ba ba qz qz qz"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    merges, _ = wordpiece_train(df, n_merges=1)
    a, b, _ = merges[0]
    assert (a, b) == ("q", "##z")


def test_min_freq_floors_the_pair(spark):
    df = spark.createDataFrame([("solo",)], "text string")
    merges, _ = wordpiece_train(df, n_merges=5, min_freq=2)
    assert merges == []


# ------------------------------------------------------------- encoding

def test_encode_greedy_longest_match(spark):
    model = WordPieceModel(
        ["un", "##able", "##avoid", "##abl", "##e", "a", "##b", "b"]
    )
    df = spark.createDataFrame(
        [(0, "unavoidable"), (1, "ab"), (2, "zzz"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["pieces"]
        for r in wordpiece_encode(df, model).collect()
    }
    assert rows[0] == ["un", "##avoid", "##able"]
    assert rows[1] == ["a", "##b"]
    assert rows[2] == [UNK_PIECE]  # whole-word UNK
    assert rows[3] == []


def test_encode_matches_reference_after_training(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, words = wordpiece_train(df, n_merges=12)
    model = wordpiece_model(words, merges)
    vocab = set(model.pieces)
    test_docs = CORPUS + ["the unhappiest hunter", "zebra hound"]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(test_docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pieces"]
        for r in wordpiece_encode(tdf, model).collect()
    }
    for i, t in enumerate(test_docs):
        want = []
        for w in t.split():
            want += _ref_encode_word(w, vocab, model.max_content_len)
        assert got[i] == want, t


def test_encode_reconstructs_known_words(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, words = wordpiece_train(df, n_merges=8)
    model = wordpiece_model(words, merges)
    out = wordpiece_encode(df, model).collect()
    for r, t in zip(sorted(out, key=lambda r: r["text"]), sorted(CORPUS)):
        rebuilt = "".join(p[2:] if p.startswith("##") else " " + p
                          for p in r["pieces"]).strip()
        assert rebuilt == " ".join(t.split()).strip() == t


def test_null_text_encodes_null(spark):
    model = WordPieceModel(["a"])
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    assert wordpiece_encode(df, model).collect()[0]["pieces"] is None


def test_model_recovers_consumed_alphabet(spark):
    """A symbol consumed by merges in EVERY word type must still reach
    the vocabulary via the merge operands."""
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    merges, words = wordpiece_train(df, n_merges=1)
    model = wordpiece_model(words, merges)
    assert {"a", "##b", "ab"} <= set(model.pieces)
    # the consumed alphabet makes partially-novel words encodable
    tdf = spark.createDataFrame([(0, "abb")], "doc_id long, text string")
    assert wordpiece_encode(tdf, model).collect()[0]["pieces"] == [
        "ab", "##b",
    ]


# ------------------------------------------------------------------ ids

def test_vocab_ids_deterministic_and_unk_zero():
    model = WordPieceModel(["b", "a", "##c"])
    ids = wordpiece_vocab_ids(model)
    assert ids[0] == (UNK_PIECE, 0)
    assert [p for p, _ in ids] == [UNK_PIECE, "##c", "a", "b"]
    assert [i for _, i in ids] == [0, 1, 2, 3]


def test_encode_ids_roundtrip(spark):
    model = WordPieceModel(["ab", "##c", "z"])
    df = spark.createDataFrame(
        [(0, "abc z nope")], "doc_id long, text string"
    )
    ids = dict(wordpiece_vocab_ids(model))
    row = wordpiece_encode_ids(df, model).collect()[0]
    assert row["piece_ids"] == [ids["ab"], ids["##c"], ids["z"], 0]


# ------------------------------------------------------- plan contracts

def test_encode_plan_is_scan_fused(spark):
    model = WordPieceModel(["th", "##e", "a", "##b", "e", "t", "##h"])
    df = spark.createDataFrame([(0, "the ab")], "doc_id long, text string")
    out = wordpiece_encode_ids(
        wordpiece_encode(df, model), model
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_encode_layout_invariant(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, words = wordpiece_train(df, n_merges=6)
    model = wordpiece_model(words, merges)
    one = wordpiece_encode(df.repartition(1), model).collect()
    many = wordpiece_encode(df.repartition(7), model).collect()
    key = lambda r: r["text"]  # noqa: E731
    assert sorted(
        [r["pieces"] for r in sorted(one, key=key)]
    ) == sorted([r["pieces"] for r in sorted(many, key=key)])


def test_duckdb_mirror_matches_reference():
    """The q64 oracle's chained-CTE induction reproduces the reference
    trainer's trajectory and post-merge symbol total on its own."""
    import duckdb

    from drill_logfile_plugin_spark.operators.wordpiece import (
        wordpiece_merges_sql_duck,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for t in CORPUS)
        + ") AS t(text)"
    )
    rows = con.sql(wordpiece_merges_sql_duck(6)).fetchall()
    merges = sorted((r for r in rows if r[0] > 0), key=lambda r: r[0])
    want, ref_words = _ref_train(CORPUS, 6)
    assert [(a, b) for _, a, b, _ in merges] == [
        (a, b) for a, b, _ in want
    ]
    for (_, _, _, s_got), (_, _, s_want) in zip(merges, want):
        assert s_got == pytest.approx(s_want, rel=1e-12)
    total = next(r[3] for r in rows if r[0] == 0)
    assert total == sum(len(k) * f for k, f in ref_words.items())


def test_token_counts_surface(spark):
    model = WordPieceModel(["ab", "##c", "z"])
    df = spark.createDataFrame(
        [(0, "abc z"), (1, "nope"), (2, None)],
        "doc_id long, text string",
    )
    from drill_logfile_plugin_spark.operators.wordpiece import (
        wordpiece_token_counts,
    )

    rows = {
        r["doc_id"]: r["n_pieces"]
        for r in wordpiece_token_counts(df, model).collect()
    }
    assert rows == {0: 3, 1: 1, 2: None}  # [UNK] counts as one piece


def test_model_artifact_roundtrip(spark, tmp_path):
    """Train-once/apply-many: the persisted vocabulary reproduces
    identical encodes after a reload."""
    from drill_logfile_plugin_spark.artifacts import (
        load_wordpiece_model,
        save_wordpiece_model,
    )

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, words = wordpiece_train(df, n_merges=8)
    model = wordpiece_model(words, merges)
    p = str(tmp_path / "wp.json")
    save_wordpiece_model(p, model)
    loaded = load_wordpiece_model(p)
    assert loaded.pieces == model.pieces and loaded.unk == model.unk
    a = wordpiece_encode(df, model).collect()
    b = wordpiece_encode(df, loaded).collect()
    key = lambda r: r["text"]  # noqa: E731
    assert [r["pieces"] for r in sorted(a, key=key)] == [
        r["pieces"] for r in sorted(b, key=key)
    ]
