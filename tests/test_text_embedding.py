"""Hashed-TF embeddings + ranking metrics: hand-verified bucket counts,
normalization, orthogonality of disjoint-token texts, composition with
the ANN tier, and exact-by-hand retrieval metrics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.retrieval import ranking_metrics
from drill_logfile_plugin_spark.operators.similarity import cosine_topk
from drill_logfile_plugin_spark.operators.text import hashed_tf_embedding


def _buckets(spark, tokens, dim):
    """The tokens' xxhash64 buckets, computed through Spark itself so the
    test pins the OPERATOR's arithmetic, not a reimplementation."""
    df = spark.createDataFrame([(t,) for t in tokens], "t string")
    return {
        r["t"]: r["b"]
        for r in df.select(
            "t", F.pmod(F.xxhash64("t"), F.lit(dim)).cast("int").alias("b")
        ).collect()
    }


def test_counts_and_normalization(spark):
    """'a a b' places 2 in a's bucket and 1 in b's, then L2-normalizes:
    [2,1]/sqrt(5) — verified at the exact bucket positions."""
    dim = 512
    b = _buckets(spark, ["alpha", "beta"], dim)
    assert b["alpha"] != b["beta"], "pick a dim without this collision"
    df = spark.createDataFrame(
        [(1, "alpha alpha beta")], "doc_id long, text string"
    )
    raw = hashed_tf_embedding(df, dim=dim, normalize=False).first()["embedding"]
    assert raw[b["alpha"]] == 2.0 and raw[b["beta"]] == 1.0
    assert sum(raw) == 3.0
    unit = hashed_tf_embedding(df, dim=dim).first()["embedding"]
    assert unit[b["alpha"]] == pytest.approx(2 / math.sqrt(5))
    norm = math.sqrt(sum(x * x for x in unit))
    assert norm == pytest.approx(1.0)


def test_disjoint_texts_are_orthogonal(spark):
    """The honest lexical boundary: no shared tokens (and no bucket
    collisions at this dim) => cosine exactly 0."""
    dim = 2048
    t1, t2 = "red green blue", "vier funf sechs"
    b = _buckets(spark, t1.split() + t2.split(), dim)
    assert len(set(b.values())) == 6, "pick a dim without collisions"
    df = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    vecs = {
        r["doc_id"]: r["embedding"]
        for r in hashed_tf_embedding(df, dim=dim).collect()
    }
    dot = sum(a * b_ for a, b_ in zip(vecs[1], vecs[2]))
    assert dot == 0.0


def test_null_and_blank_yield_no_row(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in hashed_tf_embedding(df, dim=32).collect()}
    assert ids == {1}
    with pytest.raises(ValueError, match="positive"):
        hashed_tf_embedding(df, dim=0)


def test_composes_with_ann_tier(spark):
    """The day-one similarity workflow: hashed-TF vectors through
    cosine_topk rank the token-overlapping document first."""
    docs = [
        (1, "spark shuffles the big join on its keys"),
        (2, "spark shuffles the large join on its keys"),  # near-dup of 1
        (3, "an entirely different sentence about gardening tulips"),
        (4, "gardening tulips needs patience and entirely different soil"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    emb = hashed_tf_embedding(df, dim=256)
    q = emb.where(F.col("doc_id") == 1)
    top = cosine_topk(q, emb, k=3, id_col="doc_id").collect()
    assert top[0]["neighbor_id"] == 2 and top[0]["rank"] == 1
    assert top[0]["sim"] > 0.8


def test_ranking_metrics_by_hand(spark):
    """Two queries, hand-computed: q1's two relevant docs at ranks 1 and
    3 (recall 1, precision 2/3, rr 1); q2's one relevant doc missed
    entirely (all zeros). Averages follow exactly."""
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            (2, 20, 1), (2, 21, 2), (2, 22, 3),
        ],
        "q_id long, neighbor_id long, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 99)], "q_id long, neighbor_id long"
    )
    m = ranking_metrics(results, truth, k=3).first()
    assert m["n_queries"] == 2
    assert m["recall_at_k"] == pytest.approx((1.0 + 0.0) / 2)
    assert m["precision_at_k"] == pytest.approx((2 / 3 + 0.0) / 2)
    assert m["mrr_at_k"] == pytest.approx((1.0 + 0.0) / 2)
    assert m["hit_at_1"] == pytest.approx(0.5)
    # a query absent from truth is not scored; one absent from results
    # scores zero (the denominators are truth-driven)
    with pytest.raises(ValueError, match="positive"):
        ranking_metrics(results, truth, k=0)


def test_metrics_close_the_loop_on_ann(spark):
    """End to end: hashed-TF corpus, exact lane as truth, ANN lane
    evaluated — recall@5 equals the recall the ANN tests pin, computed
    through the metrics operator this time."""
    from drill_logfile_plugin_spark.operators.similarity import ann_lsh_topk

    texts = [
        (i, " ".join(f"tok{j}grp{i % 8}" for j in range(20)))
        for i in range(200)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    emb = hashed_tf_embedding(df, dim=256)
    q = emb.where(F.col("doc_id") < 8)
    truth = cosine_topk(q, emb, k=5, id_col="doc_id").select(
        "q_id", "neighbor_id"
    )
    ann = ann_lsh_topk(q, emb, k=5, id_col="doc_id", dim=256)
    m = ranking_metrics(ann, truth, k=5).first()
    assert m["n_queries"] == 8
    assert m["recall_at_k"] >= 0.8
