"""Shared word-type scan (r11 optimization): ``bpe_train`` and
``wordpiece_train`` accept a pre-aggregated ``(w, freq)`` table
(``bpe.word_type_freqs``) so one corpus tokenize+explode+aggregate pass
feeds both trainers (the q50 shape). The contract: merges, scores and
final word states are IDENTICAL to the self-scan path — only where the
corpus pass runs differs."""

from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.bpe import (
    bpe_train,
    word_type_freqs,
)
from drill_logfile_plugin_spark.operators.dedup import _barrier
from drill_logfile_plugin_spark.operators.wordpiece import wordpiece_train

CORPUS = [
    "the hunter hunted the hound",
    "the unhappy hound hounded the hunter",
    "hunting unhappy hounds is unlikely",
    "low lower lowest newer newest   ",
    "",
    "the the the hunter hunter hound",
]


def _corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_word_type_freqs_counts_types(spark):
    df = _corpus_df(spark)
    got = {r["w"]: r["freq"] for r in word_type_freqs(df).collect()}
    want = {}
    for t in CORPUS:
        for w in t.split():
            want[w] = want.get(w, 0) + 1
    assert got == want  # empty/blank docs dropped, no '' token


def test_bpe_shared_scan_identical_to_self_scan(spark):
    df = _corpus_df(spark)
    wf = _barrier(word_type_freqs(df).repartition(4))
    solo_m, solo_w = bpe_train(df, n_merges=6)
    shared_m, shared_w = bpe_train(df, n_merges=6, word_freqs=wf)
    assert shared_m == solo_m
    state = lambda w: {  # noqa: E731
        tuple(r["s"].split()): r["freq"]
        for r in w.select(F.trim("s").alias("s"), "freq").collect()
    }
    assert state(shared_w) == state(solo_w)
    wf.unpersist()


def test_wordpiece_shared_scan_identical_to_self_scan(spark):
    df = _corpus_df(spark)
    wf = _barrier(word_type_freqs(df).repartition(4))
    solo_m, solo_w = wordpiece_train(df, n_merges=5)
    shared_m, shared_w = wordpiece_train(df, n_merges=5, word_freqs=wf)
    assert [(a, b) for a, b, _ in shared_m] == [
        (a, b) for a, b, _ in solo_m
    ]
    for (_, _, s1), (_, _, s2) in zip(shared_m, solo_m):
        assert s1 == s2
    state = lambda w: {  # noqa: E731
        tuple(r["s"].split()): r["freq"]
        for r in w.select(F.trim("s").alias("s"), "freq").collect()
    }
    assert state(shared_w) == state(solo_w)
    wf.unpersist()
