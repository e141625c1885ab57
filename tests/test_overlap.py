"""Corpus-overlap (bottom-k / KMV) tier: exactness below geometry,
estimator accuracy within the 1/√k band on planted overlaps, sketch
mergeability, the governance matrix checked against exact pairwise
Jaccard on the real sf0.01 corpus, and the certified form's in-band
flag."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import overlap as O
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _keys(spark, lo, hi, name="key"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k-"), F.col("id")).alias(name)
    )


def test_exact_below_geometry(spark):
    """Union smaller than k: the sketch IS the hash set and the estimate
    is exact. A=0..100, B=50..150 → J = 50/150."""
    a, b = _keys(spark, 0, 100), _keys(spark, 50, 150)
    row = O.corpus_jaccard_certified(a, b, "key", k=1024).first()
    assert row["jaccard_est"] == row["jaccard_exact"] == pytest.approx(1 / 3)
    assert row["in_band"]


def test_estimate_within_band_on_planted_overlap(spark):
    """A=0..30000, B=15000..45000 → J = 1/3; at k=256 the estimate must
    land within 3/√k = 0.1875 of truth (measured well inside), and the
    certified flag agrees."""
    a, b = _keys(spark, 0, 30_000), _keys(spark, 15_000, 45_000)
    row = O.corpus_jaccard_certified(a, b, "key", k=256).first()
    assert row["jaccard_exact"] == pytest.approx(1 / 3, abs=1e-9)
    assert abs(row["jaccard_est"] - 1 / 3) <= 3 / np.sqrt(256)
    assert row["in_band"]


def test_sketch_mergeable(spark):
    """bottomk(A ∪ B) == bottomk(sketch(A) ∪ sketch(B)) — the mergeable
    property that lets per-shard sketches fold into a corpus sketch."""
    a, b = _keys(spark, 0, 5_000), _keys(spark, 2_500, 7_500)
    k = 128
    direct = [
        r["h"] for r in O.corpus_sketch(a.union(b), "key", k).collect()
    ]
    merged = [
        r["h"]
        for r in O.corpus_sketch(a, "key", k)
        .union(O.corpus_sketch(b, "key", k))
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    ]
    assert sorted(direct) == sorted(merged)


def test_overlap_matrix_vs_exact_pairwise(spark):
    """The governance view on the real corpus: every pair's KMV estimate
    within 3/√k of the exact distinct-join Jaccard, grouped by source."""
    docs = load_table(spark, SF_DIR, "documents")
    k = 256
    mat = {
        (r["g_a"], r["g_b"]): r["jaccard_est"]
        for r in O.overlap_matrix(docs, "source", "text", k).collect()
    }
    assert len(mat) >= 3, "fixture needs several sources"
    hashes = (
        docs.where(F.col("text").isNotNull())
        .select("source", F.xxhash64("text").alias("h"))
        .distinct()
    )
    sets: dict = {}
    for r in hashes.collect():
        sets.setdefault(r["source"], set()).add(r["h"])
    for (ga, gb), est in mat.items():
        inter = len(sets[ga] & sets[gb])
        union = len(sets[ga] | sets[gb])
        exact = inter / union if union else 1.0
        assert abs(est - exact) <= 3 / np.sqrt(k), (ga, gb, est, exact)


def test_containment_directional(spark):
    """A strictly inside B: containment(A in B) is 1.0 exactly when the
    union fits the geometry (the vendor-drop-already-have-it check)."""
    a, b = _keys(spark, 0, 200), _keys(spark, 0, 800)
    rows = O.overlap_matrix(
        a.select(F.lit("a").alias("g"), F.col("key"))
        .union(b.select(F.lit("b").alias("g"), F.col("key"))),
        "g",
        "key",
        k=2048,
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["containment_a_in_b"] == 1.0
    assert r["jaccard_est"] == pytest.approx(200 / 800)
    assert r["containment_b_in_a"] == pytest.approx(200 / 800)


def test_degenerates(spark):
    with pytest.raises(ValueError, match="positive"):
        O.corpus_sketch(_keys(spark, 0, 5), "key", k=0)
    # single group -> no pairs, empty matrix with the contract schema
    one = _keys(spark, 0, 5).select(F.lit("only").alias("g"), F.col("key"))
    out = O.overlap_matrix(one, "g", "key", k=16)
    assert out.count() == 0
    assert out.columns == [
        "g_a",
        "g_b",
        "jaccard_est",
        "containment_a_in_b",
        "containment_b_in_a",
    ]
    # NULL keys are absent values: ignored, not hashed
    with_null = one.union(
        one.sparkSession.createDataFrame([("only", None)], "g string, key string")
    )
    assert (
        O.grouped_sketches(with_null, "g", "key", k=16).count()
        == O.grouped_sketches(one, "g", "key", k=16).count()
    )


def test_sketch_plan_is_partial_topk(spark):
    """The scale contract: the global sort is a TakeOrderedAndProject
    (partial per-partition top-k, ≤ k rows over the exchange), never a
    full corpus sort."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        O.corpus_sketch(docs, "text", 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan
