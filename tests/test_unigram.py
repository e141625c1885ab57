"""Unigram-LM tokenizer induction (round 10, VERDICT next-round #6).

The reference implementation below is an INDEPENDENT pure-Python
Viterbi-EM over the same integer-scaled likelihood definition — seeded
identically, stepped identically — so the distributed trainer's full
trajectory (piece sets AND scaled log-probs after every round) must
match it exactly, integer for integer. Plus: encode/train consistency,
the scan-fused encode plan contract, layout bit-identity, UNK
handling, and the artifact roundtrip."""

import math
from collections import Counter

import pytest

import drill_logfile_plugin_spark.operators.unigram as U
from drill_logfile_plugin_spark.artifacts import (
    load_unigram_model,
    save_unigram_model,
)
from drill_logfile_plugin_spark.operators.unigram import (
    LOGP_SCALE,
    UNK_LOGP_SCALED,
    UnigramModel,
    unigram_encode,
    unigram_token_counts,
    unigram_train,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog and a log",
    "the the the cat cat dog",
    "mats and logs and cats and dogs",
    "dogma dogmatic catalog cataract",
]


# --- independent reference implementation ----------------------------------------


def ref_word_freqs(corpus):
    c = Counter()
    for line in corpus:
        for w in line.split():
            c[w] += 1
    return dict(c)


def ref_viterbi(word, logp, max_len):
    NEG = U._NEG_INF
    n = len(word)
    best = [NEG] * (n + 1)
    best[0] = 0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for pl in range(1, min(max_len, i) + 1):
            j = i - pl
            if best[j] == NEG:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                lp = UNK_LOGP_SCALED if pl == 1 else None
            if lp is None:
                continue
            cand = best[j] + lp
            if cand >= best[i]:
                best[i] = cand
                back[i] = j
    pieces = []
    i = n
    while i > 0:
        pieces.append(word[back[i] : i])
        i = back[i]
    return list(reversed(pieces))


def ref_mstep(counts, pieces):
    total = sum(counts.get(p, 0) for p in pieces)
    out = []
    for p in pieces:
        c = counts.get(p, 0)
        out.append(
            round(math.log(c / total) * LOGP_SCALE) if c > 0 else None
        )
    floor = min(x for x in out if x is not None) - LOGP_SCALE
    return [x if x is not None else floor for x in out]


def ref_train(corpus, vocab_size, seed_size, max_len, em_iters, prune_frac):
    freqs = ref_word_freqs(corpus)
    sub_counts = Counter()
    for w, f in freqs.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                sub_counts[w[i:j]] += f
    top = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    seed = dict(top[:seed_size])
    for p, c in sub_counts.items():
        if len(p) == 1:
            seed.setdefault(p, c)
    pieces = sorted(seed)
    logp = ref_mstep(seed, pieces)

    def estep(pieces, logp):
        table = dict(zip(pieces, logp))
        counts = Counter()
        for w, f in freqs.items():
            for piece in ref_viterbi(w, table, max_len):
                counts[piece] += f
        return counts

    while True:
        for _ in range(em_iters):
            logp = ref_mstep(estep(pieces, logp), pieces)
        if len(pieces) <= vocab_size:
            break
        counts = estep(pieces, logp)
        multi = [p for p in pieces if len(p) > 1]
        n_single = len(pieces) - len(multi)
        target_multi = max(vocab_size - n_single, 0)
        n_drop = max(
            min(
                int(len(multi) * prune_frac) or 1,
                len(multi) - target_multi,
            ),
            0,
        )
        if n_drop == 0:
            break
        multi.sort(key=lambda p: (counts.get(p, 0), U._desc_key(p)))
        dropped = set(multi[:n_drop])
        kept_logp = [
            lp for p, lp in zip(pieces, logp) if p not in dropped
        ]
        pieces = [p for p in pieces if p not in dropped]
        logp = kept_logp
    logp = ref_mstep(estep(pieces, logp), pieces)
    return pieces, logp


PARAMS = dict(
    vocab_size=40, seed_size=120, max_piece_len=5,
    em_iters=2, prune_fraction=0.25,
)


@pytest.fixture(scope="module")
def fitted(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    return unigram_train(
        df,
        vocab_size=PARAMS["vocab_size"],
        seed_size=PARAMS["seed_size"],
        max_piece_len=PARAMS["max_piece_len"],
        em_iters=PARAMS["em_iters"],
        prune_fraction=PARAMS["prune_fraction"],
    )


def test_matches_independent_reference_exactly(fitted):
    ref_pieces, ref_logp = ref_train(
        CORPUS, PARAMS["vocab_size"], PARAMS["seed_size"],
        PARAMS["max_piece_len"], PARAMS["em_iters"],
        PARAMS["prune_fraction"],
    )
    assert fitted.pieces == ref_pieces
    assert fitted.logp_scaled == ref_logp  # integer-exact trajectory


def test_layout_bit_identity(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    m1 = unigram_train(
        df.repartition(1), vocab_size=30, seed_size=80,
        max_piece_len=4, em_iters=1,
    )
    m2 = unigram_train(
        df.repartition(7), vocab_size=30, seed_size=80,
        max_piece_len=4, em_iters=1,
    )
    assert m1.pieces == m2.pieces
    assert m1.logp_scaled == m2.logp_scaled


def test_encode_matches_reference_viterbi(spark, fitted):
    table = dict(zip(fitted.pieces, fitted.logp_scaled))
    docs = [
        "the cat catalog",
        "dogmatic mats",
        "unseen zebra",  # chars outside the corpus -> UNK singles
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "id long, text string")
    got = {
        r["id"]: r["pieces"]
        for r in unigram_encode(df, fitted).collect()
    }
    for i, doc in enumerate(docs):
        want = []
        for w in doc.split():
            want += ref_viterbi(w, table, fitted.max_piece_len)
        assert got[i] == want, doc
    assert "".join(got[2]) == "unseenzebra"  # lossless even under UNK


def test_encode_plan_is_scan_fused(spark, fitted):
    df = spark.createDataFrame([("text here",)], "text string")
    out = unigram_encode(df, fitted)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_token_counts_and_nulls(spark, fitted):
    df = spark.createDataFrame(
        [(0, "the cat"), (1, None), (2, "   ")], "id long, text string"
    )
    got = {
        r["id"]: (r["n_pieces"], )
        for r in unigram_token_counts(df, fitted).collect()
    }
    assert got[0][0] >= 2
    enc = {
        r["id"]: r["pieces"] for r in unigram_encode(df, fitted).collect()
    }
    assert enc[1] is None
    assert enc[2] == []


def test_artifact_roundtrip(tmp_path, spark, fitted):
    path = str(tmp_path / "unigram.json")
    save_unigram_model(path, fitted)
    loaded = load_unigram_model(path)
    assert loaded.pieces == fitted.pieces
    assert loaded.logp_scaled == fitted.logp_scaled
    assert loaded.max_piece_len == fitted.max_piece_len
    df = spark.createDataFrame([("cats and dogs",)], "text string")
    a = unigram_encode(df, fitted).first()["pieces"]
    b = unigram_encode(df, loaded).first()["pieces"]
    assert a == b


def test_validation():
    with pytest.raises(ValueError, match="pieces/logp"):
        UnigramModel(["a"], [1, 2], 4)
    with pytest.raises(ValueError, match="max_piece_len"):
        UnigramModel(["a"], [1], 0)


def test_train_rejects_bad_params(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="seed_size"):
        unigram_train(df, vocab_size=100, seed_size=10)
    with pytest.raises(ValueError, match="prune_fraction"):
        unigram_train(df, vocab_size=5, seed_size=10, prune_fraction=2.0)
    empty = spark.createDataFrame([(" ",)], "text string")
    with pytest.raises(ValueError, match="no tokens"):
        unigram_train(empty, vocab_size=2, seed_size=4)


def test_vocab_ids_and_encode_ids(spark, fitted):
    from drill_logfile_plugin_spark.operators.unigram import (
        unigram_encode_ids,
        unigram_vocab_ids,
    )

    ids = unigram_vocab_ids(fitted)
    assert ids["<unk>"] == 0
    assert sorted(ids.values()) == list(range(len(fitted.pieces) + 1))
    # deterministic total order: highest-likelihood piece gets id 1
    best = max(
        zip(fitted.pieces, fitted.logp_scaled),
        key=lambda t: (t[1], [-ord(c) for c in t[0]]),
    )[0]
    assert ids[best] == 1

    df = spark.createDataFrame(
        [(0, "the cat"), (1, "zebra!?"), (2, None)], "id long, text string"
    )
    out = unigram_encode_ids(df, fitted)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    got = {r["id"]: r["token_ids"] for r in out.collect()}
    # ids reconstruct the segmentation through the same map
    enc = {
        r["id"]: r["pieces"]
        for r in __import__(
            "drill_logfile_plugin_spark.operators.unigram",
            fromlist=["unigram_encode"],
        ).unigram_encode(df, fitted).collect()
    }
    inv = {v: k for k, v in ids.items()}
    assert [inv[i] if i else p for i, p in zip(got[0], enc[0])] == enc[0]
    # unknown chars in 'zebra!?' hit unk_id 0
    assert 0 in got[1]
    assert got[2] is None


def test_token_counts_null_text_counts_null(spark):
    """size(NULL) is -1 under non-ANSI semantics; a NULL document must
    count NULL, never -1 (which would shrink token-budget SUMs)."""
    from drill_logfile_plugin_spark.operators.unigram import (
        UnigramModel,
        unigram_token_counts,
    )

    m = UnigramModel(["a"], [0], 1)
    df = spark.createDataFrame(
        [(0, None), (1, "a")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram_token_counts(df, m).collect()
    }
    assert rows == {0: None, 1: 1}
