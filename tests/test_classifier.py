"""Learned-quality-filter tier: the distributed fit pinned against an
independent numpy gradient-descent reference (same fixed-point grid),
separable-data accuracy, bit-reproducibility across partitionings (the
integer-gradient claim), the scan-speed scoring plan contract, artifact
roundtrip, and the end-to-end composition over real documents."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts
from drill_logfile_plugin_spark.operators import classifier as L
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _planted(spark, n=2000, n_parts=4, seed=3):
    """Two Gaussian classes, separable along (x0 + x1)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + X[:, 1] + 0.3 * rng.normal(size=n) > 0).astype(int)
    rows = [
        (i, float(X[i, 0]), float(X[i, 1]), int(y[i])) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, x0 double, x1 double, y int"
    ).repartition(n_parts)
    return df, X, y


def _numpy_reference(X, y, iters, lr, scale=L.GRAD_SCALE):
    """Independent GD on the SAME fixed-point grid the operator uses —
    a loop-by-definition implementation sharing no code."""
    mean, std = X.mean(axis=0), X.std(axis=0)
    Xs = (X - mean) / std
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(X)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        resid = p - y
        # python-level rounding matches Spark ROUND (half up on .5, but
        # gradient values never land exactly on the grid midpoints here)
        gw = np.array(
            [np.sum(np.round(resid * Xs[:, j] * scale)) for j in range(len(w))]
        )
        gb = np.sum(np.round(resid * scale))
        w -= lr * (gw / scale / n)
        b -= lr * (gb / scale / n)
    return w, b, mean, std


def test_fit_matches_numpy_reference(spark):
    df, X, y = _planted(spark)
    model = L.logreg_fit(df, ["x0", "x1"], "y", iters=20, lr=0.5)
    w, b, mean, std = _numpy_reference(X, y, iters=20, lr=0.5)
    assert np.allclose(model.weights, w, atol=1e-9), (model.weights, w)
    assert abs(model.bias - b) < 1e-9
    assert np.allclose(model.means, mean, atol=1e-9)
    assert np.allclose(model.stds, std, atol=1e-9)


def test_separable_accuracy(spark):
    df, _, _ = _planted(spark)
    model = L.logreg_fit(df, ["x0", "x1"], "y", iters=40, lr=0.5)
    scored = L.logreg_score(df, model, "p")
    acc = (
        scored.select(
            ((F.col("p") > 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.9, f"accuracy = {acc}"


def test_fit_is_layout_proof(spark):
    """The integer-gradient claim: the same data in 2 vs 13 partitions
    fits the BIT-identical model (float sums would differ in the last
    ulp and compound across iterations)."""
    df, _, _ = _planted(spark, n_parts=2)
    a = L.logreg_fit(df, ["x0", "x1"], "y", iters=15, lr=0.5)
    b = L.logreg_fit(
        df.repartition(13), ["x0", "x1"], "y", iters=15, lr=0.5
    )
    assert np.array_equal(a.weights, b.weights)
    assert a.bias == b.bias


def test_score_plan_is_scan_speed(spark):
    """Plan contract: scoring adds NO exchange and NO Python eval — a
    learned filter must cost what a rule filter costs."""
    df, _, _ = _planted(spark, n=100)
    model = L.logreg_fit(df, ["x0", "x1"], "y", iters=2, lr=0.5)
    # a scan-shaped input (the planted fixture carries its own
    # repartition Exchange, which is the fixture's, not the scorer's)
    scan = spark.range(100).select(
        (F.col("id") % 7).cast("double").alias("x0"),
        (F.col("id") % 3).cast("double").alias("x1"),
    )
    plan = (
        L.logreg_score(scan, model, "p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_null_features_score_null(spark):
    df, _, _ = _planted(spark, n=50)
    model = L.logreg_fit(df, ["x0", "x1"], "y", iters=2, lr=0.5)
    holey = df.withColumn(
        "x0", F.when(F.col("id") % 2 == 0, F.col("x0"))
    )
    rows = L.logreg_score(holey, model, "p").collect()
    for r in rows:
        assert (r["p"] is None) == (r["id"] % 2 == 1)


def test_artifact_roundtrip(spark, tmp_path):
    df, _, _ = _planted(spark, n=200)
    model = L.logreg_fit(df, ["x0", "x1"], "y", iters=5, lr=0.5)
    path = str(tmp_path / "quality.json")
    artifacts.save_logreg_model(path, model)
    loaded = artifacts.load_logreg_model(path)
    assert np.array_equal(loaded.weights, model.weights)
    assert loaded.bias == model.bias
    assert loaded.feature_names == model.feature_names
    a = sorted(map(str, L.logreg_score(df, model, "p").collect()))
    b = sorted(map(str, L.logreg_score(df, loaded, "p").collect()))
    assert a == b
    with pytest.raises(ValueError, match="kind mismatch"):
        artifacts.load_pca_model(path)


def test_degenerates(spark):
    df, _, _ = _planted(spark, n=50)
    with pytest.raises(ValueError, match="at least one feature"):
        L.logreg_fit(df, [], "y")
    with pytest.raises(ValueError, match="positive"):
        L.logreg_fit(df, ["x0"], "y", iters=0)
    with pytest.raises(ValueError, match="no rows"):
        L.logreg_fit(df.where(F.lit(False)), ["x0"], "y")
    # constant feature: std->1 guard, weight stays finite
    cdf = df.withColumn("x1", F.lit(5.0))
    m = L.logreg_fit(cdf, ["x0", "x1"], "y", iters=5, lr=0.5)
    assert np.isfinite(m.weights).all()


def test_end_to_end_quality_filter_on_documents(spark):
    """The WebText composition on real data: features from the scan,
    labels from a source heuristic, fit, score the corpus, and the
    classifier must actually separate the label it was trained on
    (train-set AUC > 0.7 — features are informative for source style)."""
    docs = load_table(spark, SF_DIR, "documents").limit(3000)
    feats = L.doc_quality_features(docs)
    labeled = feats.withColumn(
        "label", (F.xxhash64("doc_id") % 2 == 0).cast("int")
    )
    fcols = [c for c in feats.columns if c.startswith("f_")]
    # a random label is UNLEARNABLE: sanity-check the harness by
    # asserting near-chance accuracy there...
    rand_model = L.logreg_fit(labeled, fcols, "label", iters=10, lr=0.5)
    rand_acc = (
        L.logreg_score(labeled, rand_model, "p")
        .select(
            ((F.col("p") > 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert 0.4 <= rand_acc <= 0.6, rand_acc
    # ...then a REAL signal: long-vs-short style (a stand-in for the
    # curated-vs-crawl seed labeling) must be learnable from the features
    styled = feats.withColumn(
        "label", (F.col("f_tokens") > 80).cast("int")
    )
    model = L.logreg_fit(styled, fcols, "label", iters=30, lr=0.5)
    acc = (
        L.logreg_score(styled, model, "p")
        .select(
            ((F.col("p") > 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.9, acc


def test_quality_model_gates_the_pipeline(spark):
    """The composition: ingest_increment(quality_model=) drops documents
    the learned filter scores below threshold, keeps the rest, and with
    no model the pipeline output is unchanged."""
    from drill_logfile_plugin_spark.pipeline import ingest_increment

    # 30 docs: even ids carry a varied 24-word text ('good' bucket), odd
    # ids a 3-word one ('too_short' bucket — kept by quality_keep so the
    # LEARNED gate, not the rules, does the separating); f_len is the
    # precomputed feature column the model is fit on
    rows = []
    for i in range(30):
        # unique text per doc (stage 2's exact dedup would otherwise
        # collapse identical fixtures to one representative per class)
        if i % 2 == 0:
            text = " ".join(f"word{j}x{i} item{j}y{i}" for j in range(12))
        else:
            text = f"tiny text n{i}"
        rows.append((i, text, "s0", float(len(text.split())), int(i % 2 == 0)))
    inc = spark.createDataFrame(
        rows, "doc_id long, text string, source string, f_len double, label int"
    )
    model = L.logreg_fit(inc, ["f_len"], "label", iters=30, lr=1.0)
    keep = ("good", "too_short")

    gated = ingest_increment(
        None, inc.drop("label"), langs=None, quality_keep=keep,
        drop_repetitive=False, quality_model=model,
    )
    kept_ids = {r["doc_id"] for r in gated.select("doc_id").distinct().collect()}
    assert kept_ids == {i for i in range(30) if i % 2 == 0}

    ungated = ingest_increment(
        None, inc.drop("label"), langs=None, quality_keep=keep,
        drop_repetitive=False,
    )
    all_ids = {r["doc_id"] for r in ungated.select("doc_id").distinct().collect()}
    assert all_ids == set(range(30))
