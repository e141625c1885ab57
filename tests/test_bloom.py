"""Bloom-filter tier: the structural zero-false-negative guarantee, the
measured FP band against the textbook estimate, table-lane ≡ bitmap-lane
identity, mergeability, artifact roundtrip, and the two-phase
decontamination pinned EXACTLY equal to the single-phase exact join
(DuckDB has no xxhash64, so this is the pytest-by-design certification —
the q58 driver oracle stays the exact lane)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts
from drill_logfile_plugin_spark.operators import bloom as B
from drill_logfile_plugin_spark.operators.dedup import shingles_sql_spark
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
GEO = dict(n_bits=1 << 14, k=4)


@pytest.fixture(scope="module")
def member_keys(spark):
    return spark.range(0, 500).select(
        F.concat(F.lit("member-"), F.col("id")).alias("key")
    )


@pytest.fixture(scope="module")
def fresh_keys(spark):
    return spark.range(0, 4000).select(
        F.concat(F.lit("fresh-"), F.col("id")).alias("key")
    )


def test_zero_false_negatives_both_lanes(spark, member_keys):
    """Every inserted key must probe True — Bloom's structural guarantee,
    through the join lane and the bitmap lane."""
    table = B.bloom_table(member_keys, "key", **GEO)
    bits = B.bloom_bits(table, GEO["n_bits"])
    for probed in (
        B.bloom_probe(member_keys, table, "key", **GEO),
        B.bloom_probe_bits(member_keys, bits, "key", **GEO),
    ):
        rows = probed.collect()
        assert len(rows) == 500
        assert all(r["maybe_member"] for r in rows)


def test_fp_rate_in_theory_band(spark, member_keys, fresh_keys):
    """Fresh keys false-positive at ~the textbook (1-e^{-kn/m})^k rate:
    measured within [theory/3, theory*3] (n=500 into 16384 bits, k=4
    => theory ~0.00024·... recomputed exactly below; the band is wide
    because 4000 probes of a small rate is a noisy binomial)."""
    table = B.bloom_table(member_keys, "key", **GEO)
    bits = B.bloom_bits(table, GEO["n_bits"])
    rows = B.bloom_probe_bits(fresh_keys, bits, "key", **GEO).collect()
    fp = sum(r["maybe_member"] for r in rows) / len(rows)
    theory = B.bloom_fp_theory(500, GEO["n_bits"], GEO["k"])
    assert fp <= theory * 3 + 0.002, (fp, theory)


def test_table_and_bitmap_lanes_agree(spark, member_keys, fresh_keys):
    """Both probe lanes compute the same function — mixed member/fresh
    keys, flag-for-flag."""
    mixed = member_keys.union(fresh_keys.limit(500))
    table = B.bloom_table(member_keys, "key", **GEO)
    bits = B.bloom_bits(table, GEO["n_bits"])
    via_table = {
        r["key"]: r["maybe_member"]
        for r in B.bloom_probe(mixed, table, "key", **GEO).collect()
    }
    via_bits = {
        r["key"]: r["maybe_member"]
        for r in B.bloom_probe_bits(mixed, bits, "key", **GEO).collect()
    }
    assert via_table == via_bits


def test_mergeable(spark, member_keys):
    """filter(A ∪ B) == distinct-union of the position tables — the
    mergeable-sketch property, structural."""
    a = member_keys.where(F.col("key") < "member-3")
    b = member_keys.where(F.col("key") >= "member-3")
    whole = {r["pos"] for r in B.bloom_table(member_keys, "key", **GEO).collect()}
    merged = {
        r["pos"]
        for r in B.bloom_table(a, "key", **GEO)
        .union(B.bloom_table(b, "key", **GEO))
        .distinct()
        .collect()
    }
    assert whole == merged


def test_bloom_artifact_roundtrip(spark, member_keys, tmp_path):
    bits = B.bloom_bits(B.bloom_table(member_keys, "key", **GEO), GEO["n_bits"])
    path = str(tmp_path / "bloom.json")
    artifacts.save_bloom_model(path, bits, GEO["n_bits"], GEO["k"])
    loaded, n_bits, k = artifacts.load_bloom_model(path)
    assert (n_bits, k) == (GEO["n_bits"], GEO["k"])
    assert np.array_equal(loaded, bits)
    with pytest.raises(ValueError, match="kind mismatch"):
        artifacts.load_pq_model(path)
    with pytest.raises(ValueError, match="bitmap is"):
        artifacts.save_bloom_model(path, bits[:-1], GEO["n_bits"], GEO["k"])


def test_geometry_guards(spark, member_keys):
    """Wrong-geometry probes fail at setup, not as silent misses."""
    bits = B.bloom_bits(B.bloom_table(member_keys, "key", **GEO), GEO["n_bits"])
    with pytest.raises(ValueError, match="wrong model"):
        B.bloom_probe_bits(member_keys, bits, "key", n_bits=1 << 15, k=4)
    table = B.bloom_table(member_keys, "key", **GEO)
    with pytest.raises(ValueError, match="outside geometry"):
        B.bloom_bits(table, GEO["n_bits"] // 2)
    with pytest.raises(ValueError, match="n_bits>0"):
        B.bloom_table(member_keys, "key", n_bits=0)


def test_bloom_params_sizing(spark):
    """The sizing rule yields a geometry whose theoretical FP meets the
    target (within rounding)."""
    m, k = B.bloom_params(10_000, fp_rate=0.01)
    assert B.bloom_fp_theory(10_000, m, k) <= 0.012
    assert m % 8 == 0
    with pytest.raises(ValueError):
        B.bloom_params(0)
    with pytest.raises(ValueError):
        B.bloom_params(10, fp_rate=1.5)


def test_two_phase_decontamination_equals_exact(spark):
    """The headline contract: Bloom prefilter + exact join on survivors
    == the single-phase exact join, value-for-value, on the real sf0.01
    documents split exactly as q58 splits them (benchmark = doc_id%97==0).
    One-sided error makes this an identity, not an approximation."""
    docs = load_table(spark, SF_DIR, "documents")
    gram = shingles_sql_spark("text", 5)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    two_phase = {
        (r["doc_id"], r["n_shared_grams"])
        for r in B.decontaminate_two_phase(
            corpus, bench, gram, n_bits=1 << 18, k=4
        ).collect()
    }
    bench_grams = bench.select(F.explode(F.expr(gram)).alias("g")).distinct()
    exact = {
        (r["doc_id"], r["n_shared_grams"])
        for r in corpus.select(
            "doc_id", F.explode(F.expr(gram)).alias("g")
        )
        .join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared_grams"))
        .collect()
    }
    assert two_phase == exact
    assert exact, "fixture must actually contain contamination"


def test_two_phase_accepts_persisted_bitmap(spark, tmp_path):
    """The deployment shape: build the benchmark filter once, persist,
    probe from a later run — same verdicts."""
    docs = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 3000)
    gram = shingles_sql_spark("text", 5)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    n_bits, k = 1 << 18, 4
    bench_grams = bench.select(F.explode(F.expr(gram)).alias("g")).distinct()
    bits = B.bloom_bits(B.bloom_table(bench_grams, "g", n_bits, k), n_bits)
    path = str(tmp_path / "bench-bloom.json")
    artifacts.save_bloom_model(path, bits, n_bits, k)
    loaded, ln, lk = artifacts.load_bloom_model(path)
    fresh = B.decontaminate_two_phase(
        corpus, bench, gram, n_bits=ln, k=lk
    ).collect()
    reused = B.decontaminate_two_phase(
        corpus, bench, gram, n_bits=ln, k=lk, bits=loaded
    ).collect()
    assert sorted(map(str, fresh)) == sorted(map(str, reused))


def test_probe_bits_plan_has_no_shuffle(spark, member_keys):
    """The production-lane contract: bitmap probing adds NO exchange —
    membership rides the scan."""
    bits = B.bloom_bits(B.bloom_table(member_keys, "key", **GEO), GEO["n_bits"])
    plan = (
        B.bloom_probe_bits(member_keys, bits, "key", **GEO)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
