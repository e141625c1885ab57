"""cert_fraction: certification-lane sampling for the sketch tier.

The exact lanes (rolling exact, segment exact, CMS certified top-k,
profiler exact-distinct) certify the sketches; at scale they are the
cost. cert_fraction < 1 runs the certification on a deterministic
xxhash64 key/value slice. Contracts pinned here:

* determinism — the same slice every run (no RNG, no partition-order),
* default 1.0 — byte-identical to the pre-knob behavior (the driver
  oracle surface),
* the certification still PASSES on the slice (in_band / never_under /
  within_eps hold — both lanes see the same sliced population),
* the slice is a real subset (counts bounded by the full run).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.functions.exprs import cert_slice_cond
from drill_logfile_plugin_spark.operators.freqsketch import (
    heavy_hitters_certified,
)
from drill_logfile_plugin_spark.operators.profiler import profile_columns
from drill_logfile_plugin_spark.operators.rolling import rolling_distinct
from drill_logfile_plugin_spark.operators.segments import segment_overlap
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def _rows(df):
    return sorted(map(str, df.collect()))


def test_cert_slice_cond_rejects_degenerate_fractions(spark):
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            cert_slice_cond(F.lit("x"), bad)
    with pytest.raises(ValueError, match="zero of"):
        cert_slice_cond(F.lit("x"), 1e-9)


def test_rolling_cert_slice_deterministic_and_in_band(events):
    a = rolling_distinct(events, trailing=4, cert_fraction=0.3)
    b = rolling_distinct(events, trailing=4, cert_fraction=0.3)
    ra, rb = _rows(a), _rows(b)
    assert ra == rb  # same slice, same counts, every run
    collected = a.collect()
    assert collected, "slice produced no windows"
    assert all(r["in_band"] for r in collected)
    # slice counts are bounded by the full run's (subset population)
    full = {
        (str(r["event_type"]), str(r["bucket"])): r["n_exact"]
        for r in rolling_distinct(events, trailing=4).collect()
    }
    for r in collected:
        key = (str(r["event_type"]), str(r["bucket"]))
        assert r["n_exact"] <= full[key]


def test_rolling_default_is_unchanged(events):
    assert _rows(rolling_distinct(events, trailing=3)) == _rows(
        rolling_distinct(events, trailing=3, cert_fraction=1.0)
    )


def test_segment_overlap_cert_slice(events):
    sliced = segment_overlap(events, cert_fraction=0.4)
    rows = sliced.collect()
    assert rows, "slice produced no pairs"
    assert all(r["in_band"] for r in rows)
    assert _rows(sliced) == _rows(segment_overlap(events, cert_fraction=0.4))
    full = {
        (r["seg_a"], r["seg_b"]): r["exact_inter"]
        for r in segment_overlap(events).collect()
    }
    for r in rows:
        assert r["exact_inter"] <= full[(r["seg_a"], r["seg_b"])]


def test_heavy_hitters_cert_slice(events):
    sliced = heavy_hitters_certified(
        events, "event_type", k=5, cert_fraction=0.5
    )
    rows = sliced.collect()
    assert rows
    assert all(r["never_under"] and r["within_eps"] for r in rows)
    full = {r["key"]: r["exact"] for r in
            heavy_hitters_certified(events, "event_type", k=50).collect()}
    for r in rows:
        assert r["key"] in full and r["exact"] <= full[r["key"]]
    assert _rows(sliced) == _rows(
        heavy_hitters_certified(events, "event_type", k=5, cert_fraction=0.5)
    )


def test_profiler_cert_slice(events):
    cols = ["event_type", "user_id"]
    full = {r["col_name"]: r for r in profile_columns(events, cols).collect()}
    sliced = profile_columns(events, cols, cert_fraction=0.5)
    got = {r["col_name"]: r for r in sliced.collect()}
    assert set(got) == set(full)
    for c in cols:
        # distinct shrinks to the slice; everything row-level stays full
        assert 0 < got[c]["n_distinct"] <= full[c]["n_distinct"]
        assert got[c]["n_rows"] == full[c]["n_rows"]
        assert got[c]["n_nulls"] == full[c]["n_nulls"]
        assert got[c]["d_min"] == full[c]["d_min"]
    assert _rows(sliced) == _rows(
        profile_columns(events, cols, cert_fraction=0.5)
    )


# --- ANN certification lanes (q31/q41's operator form) ----------------------


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_ann_cert_fraction_default_is_exact_serving(spark, embeddings):
    """cert_fraction=1.0 serves the exact rows + flag — byte-identical
    to the driver q31 surface (exact lane certified over EVERY query)."""
    from drill_logfile_plugin_spark.operators import similarity as S

    q = embeddings.where(F.col("vec_id") % 100 == 0)
    out = S.ann_certified_topk(
        q,
        embeddings,
        lambda qq, ee: S.ann_lsh_topk(qq, ee, k=5),
        min_recall=0.75,
        flag_name="lsh_recall_ok",
        cert_fraction=1.0,
    )
    exact = S.cosine_topk(q, embeddings, k=5)
    got = _rows(out.drop("lsh_recall_ok"))
    assert got == _rows(exact)
    assert all(r["lsh_recall_ok"] for r in out.collect())


def test_ann_cert_fraction_sliced_serves_ann_and_certifies_slice(
    spark, embeddings
):
    """cert_fraction<1: the OUTPUT is the ANN lane for every query (the
    production serving shape), the flag is recall measured over the
    deterministic query slice only — equal to recomputing it by hand
    from cosine_topk over the sliced queries; two runs are identical."""
    from drill_logfile_plugin_spark.functions.exprs import cert_slice_cond
    from drill_logfile_plugin_spark.operators import similarity as S

    frac = 0.3
    q = embeddings.where(F.col("vec_id") % 100 == 0)
    ann = lambda qq, ee: S.ann_lsh_topk(qq, ee, k=5)
    out = S.ann_certified_topk(
        q, embeddings, ann, min_recall=0.75,
        flag_name="lsh_recall_ok", cert_fraction=frac,
    )
    rows = out.collect()
    again = S.ann_certified_topk(
        q, embeddings, ann, min_recall=0.75,
        flag_name="lsh_recall_ok", cert_fraction=frac,
    ).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))

    # output rows == the ANN lane (all queries served)
    ann_rows = ann(q, embeddings)
    assert _rows(out.drop("lsh_recall_ok")) == _rows(ann_rows)

    # the flag equals a hand recomputation over the sliced queries
    sliced_q = q.where(cert_slice_cond(F.col("vec_id"), frac))
    n_sliced = sliced_q.count()
    assert 0 < n_sliced < q.count(), "fixture must slice non-trivially"
    exact = {
        (r["q_id"], r["neighbor_id"])
        for r in S.cosine_topk(sliced_q, embeddings, k=5).collect()
    }
    hits = {
        (r["q_id"], r["neighbor_id"]) for r in ann_rows.collect()
    } & exact
    want_flag = len(hits) >= 0.75 * len(exact)
    assert all(r["lsh_recall_ok"] == want_flag for r in rows)


def test_ann_cert_fraction_bounds(spark, embeddings):
    from drill_logfile_plugin_spark.operators import similarity as S

    q = embeddings.limit(5)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="cert_fraction"):
            S.ann_certified_topk(
                q, embeddings,
                lambda qq, ee: S.ann_lsh_topk(qq, ee, k=5),
                cert_fraction=bad,
            )


def test_ann_cert_fraction_ivf_lane(spark, embeddings):
    """The IVF lane takes the same dial (q41's operator form)."""
    from drill_logfile_plugin_spark.operators import similarity as S

    q = embeddings.where(F.col("vec_id") % 100 == 0)
    out = S.ann_certified_topk(
        q, embeddings,
        lambda qq, ee: S.ivf_topk(qq, ee, k=5),
        min_recall=0.65, flag_name="ivf_recall_ok", cert_fraction=0.3,
    )
    rows = out.collect()
    assert rows and all(r["ivf_recall_ok"] for r in rows)
