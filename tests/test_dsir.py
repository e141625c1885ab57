"""DSIR importance resampling: fit/score/select pinned against an
independent reference.

Independence discipline: the xxhash64 bucket assignment is engine-
defined, so the reference takes the (doc, bucket) pair stream from ONE
collected Spark pass and then recomputes EVERYTHING downstream —
smoothed totals, log-ratios, per-document log-weights, the md5-Gumbel
keys (via hashlib, independent of Spark's md5), and the top-k
membership — in plain numpy/python, to 1e-9. Plus the semantic
property the operator exists for: target-like documents are enriched;
and the production contracts: determinism, salt sensitivity, artifact
roundtrip, broadcast plan shape, degenerate inputs."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts as A
from drill_logfile_plugin_spark.operators import dsir as D


@pytest.fixture(scope="module")
def corpora(spark):
    """A source corpus of web-ish noise with 10 planted science-like
    docs, and a target corpus that is purely science-like."""
    rng = np.random.default_rng(7)
    science = ["quantum", "entanglement", "boson", "lattice", "spectra"]
    webby = ["click", "buy", "sale", "login", "cookie", "offer", "free"]

    def doc(words, n):
        return " ".join(rng.choice(words, size=n))

    target_rows = [(i, doc(science, 30)) for i in range(20)]
    source_rows = [(100 + i, doc(webby, 30)) for i in range(90)]
    source_rows += [(500 + i, doc(science, 30)) for i in range(10)]  # planted
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    source = spark.createDataFrame(source_rows, "doc_id long, text string")
    return target, source


def _ref_pairs(sdf, model_dim, n):
    """Collect the (doc, bucket) stream once; reference everything after."""
    return [
        (r["doc_id"], r["__b"])
        for r in D._bucket_stream(sdf, "doc_id", "text", model_dim, n).collect()
    ]


def _ref_totals(pairs, dim):
    out = np.zeros(dim, dtype=np.int64)
    for _, b in pairs:
        out[b] += 1
    return out


def _ref_gumbel(doc_id, salt=""):
    h = hashlib.md5(f"dsir:{salt}:{doc_id}".encode()).hexdigest()
    bucket = int(h[:8], 16) % 1_000_000
    u = (bucket + 0.5) / 1_000_000.0
    return -math.log(-math.log(u))


def test_fit_matches_reference(spark, corpora):
    target, source = corpora
    dim, n = 512, 2
    model = D.dsir_fit(target, source, dim=dim, n=n)
    t = _ref_totals(_ref_pairs(target, dim, n), dim)
    s = _ref_totals(_ref_pairs(source, dim, n), dim)
    ref = (np.log(t + 1.0) - np.log(float(t.sum() + dim))) - (
        np.log(s + 1.0) - np.log(float(s.sum() + dim))
    )
    assert np.allclose(model.log_ratio, ref, atol=1e-12)


def test_score_matches_reference(spark, corpora):
    target, source = corpora
    model = D.dsir_fit(target, source, dim=512)
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in D.dsir_score(source, model).collect()
    }
    pairs = _ref_pairs(source, model.dim, model.n)
    ref = {}
    for doc_id, b in pairs:
        ref[doc_id] = ref.get(doc_id, 0.0) + float(model.log_ratio[b])
    assert set(got) == set(ref)
    for doc_id in ref:
        assert got[doc_id] == pytest.approx(ref[doc_id], abs=1e-9)


def test_select_matches_reference_and_enriches(spark, corpora):
    target, source = corpora
    model = D.dsir_fit(target, source, dim=512)
    k = 10
    sel = D.dsir_select(source, model, k=k, salt="s1")
    got = sorted(r["doc_id"] for r in sel.collect())
    # reference: logw + md5-gumbel, top-k, id tiebreak
    pairs = _ref_pairs(source, model.dim, model.n)
    logw = {}
    for doc_id, b in pairs:
        logw[doc_id] = logw.get(doc_id, 0.0) + float(model.log_ratio[b])
    keyed = sorted(
        ((lw + _ref_gumbel(d, "s1"), d) for d, lw in logw.items()),
        key=lambda t: (-t[0], t[1]),
    )
    ref = sorted(d for _k, d in keyed[:k])
    assert got == ref
    # the semantic point: planted science docs dominate the selection
    planted = sum(1 for d in got if d >= 500)
    assert planted >= 8


def test_select_plain_topk_and_determinism(spark, corpora):
    target, source = corpora
    model = D.dsir_fit(target, source, dim=512)
    plain = sorted(
        r["doc_id"] for r in D.dsir_select(source, model, k=10, gumbel=False).collect()
    )
    # without noise the 10 planted docs win outright
    assert plain == sorted(range(500, 510))
    a = sorted(r["doc_id"] for r in D.dsir_select(source, model, 15, salt="x").collect())
    b = sorted(r["doc_id"] for r in D.dsir_select(source, model, 15, salt="x").collect())
    c = sorted(r["doc_id"] for r in D.dsir_select(source, model, 15, salt="y").collect())
    assert a == b
    assert a != c  # a different salt redraws the Gumbel field


def test_artifact_roundtrip_and_kind_guard(spark, corpora, tmp_path):
    target, source = corpora
    model = D.dsir_fit(target, source, dim=256, n=1)
    path = str(tmp_path / "dsir.json")
    A.save_dsir_model(path, model)
    loaded = A.load_dsir_model(path)
    assert (loaded.dim, loaded.n) == (256, 1)
    assert np.array_equal(loaded.log_ratio, model.log_ratio)
    # scoring from the loaded artifact is bit-identical
    live = {r["doc_id"]: r["dsir_logw"] for r in D.dsir_score(source, model).collect()}
    cold = {r["doc_id"]: r["dsir_logw"] for r in D.dsir_score(source, loaded).collect()}
    assert live == cold
    A.save_ivf_model(str(tmp_path / "ivf.json"), np.zeros((2, 3)))
    with pytest.raises(ValueError, match="kind mismatch"):
        A.load_dsir_model(str(tmp_path / "ivf.json"))


def test_score_plan_broadcasts_ratio_table(spark, corpora):
    target, source = corpora
    model = D.dsir_fit(target, source, dim=128)
    plan = D.dsir_score(source, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dim-row ratio table never shuffles the stream


def test_degenerate_inputs(spark, corpora):
    target, source = corpora
    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty target: pure add-one prior against the source distribution
    model = D.dsir_fit(empty, source, dim=64)
    assert np.isfinite(model.log_ratio).all()
    # NULL / whitespace docs yield no score row
    weird = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "quantum boson")], "doc_id long, text string"
    )
    got = D.dsir_score(weird, model).collect()
    assert [r["doc_id"] for r in got] == [3]
    with pytest.raises(ValueError, match="dim"):
        D.dsir_fit(target, source, dim=0)
    with pytest.raises(ValueError, match="n must be"):
        D.dsir_fit(target, source, dim=64, n=3)
    with pytest.raises(ValueError, match="k must be positive"):
        D.dsir_select(source, model, k=0)


def test_unigram_only_mode(spark, corpora):
    """n=1 features exactly the token stream — pinned by recomputing
    totals from the unigram pair stream alone."""
    target, source = corpora
    dim = 128
    model = D.dsir_fit(target, source, dim=dim, n=1)
    t = _ref_totals(_ref_pairs(target, dim, 1), dim)
    s = _ref_totals(_ref_pairs(source, dim, 1), dim)
    ref = (np.log(t + 1.0) - np.log(float(t.sum() + dim))) - (
        np.log(s + 1.0) - np.log(float(s.sum() + dim))
    )
    assert np.allclose(model.log_ratio, ref, atol=1e-12)
    # and a doc's gram count under n=1 is exactly its token count
    n_tokens = source.select(
        F.size(F.expr("split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+')"))
    ).collect()
    pairs = _ref_pairs(source, dim, 1)
    assert len(pairs) == sum(r[0] for r in n_tokens)


def test_dsir_model_gates_the_pipeline(spark):
    """The composition: ingest_increment(dsir_model=) drops documents
    whose log importance weight falls below the threshold (stage 4c),
    keeps the rest, and with no model the output is unchanged."""
    from drill_logfile_plugin_spark.pipeline import ingest_increment

    rng = np.random.default_rng(31)
    science = ["quantum", "entanglement", "boson", "lattice", "spectra"]
    webby = ["click", "buy", "sale", "login", "cookie", "offer", "free"]

    def doc(words, n, i):
        return " ".join(rng.choice(words, size=n)) + f" uniq{i}"

    # even ids science-like, odd ids web-like; all pass the rule filter
    rows = [
        (i, doc(science if i % 2 == 0 else webby, 24, i), "s0")
        for i in range(30)
    ]
    inc = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = spark.createDataFrame(
        [(1000 + i, doc(science, 24, 1000 + i), "t") for i in range(10)],
        "doc_id long, text string, source string",
    )
    model = D.dsir_fit(target, inc, dim=512)

    keep_bands = ("good", "too_short", "repetitive")  # rules stand aside:
    # the DSIR gate, not the band filter, must do the separating here
    gated = ingest_increment(
        None, inc, langs=None, quality_keep=keep_bands,
        drop_repetitive=False, dsir_model=model, dsir_threshold=0.0,
    )
    kept = {r["doc_id"] for r in gated.select("doc_id").distinct().collect()}
    assert kept == {i for i in range(30) if i % 2 == 0}

    ungated = ingest_increment(
        None, inc, langs=None, quality_keep=keep_bands,
        drop_repetitive=False,
    )
    assert {
        r["doc_id"] for r in ungated.select("doc_id").distinct().collect()
    } == set(range(30))
