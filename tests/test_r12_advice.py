"""Round-12 advice + optimization-mechanism tests.

Covers the r11-advice items fixed this round and the new r12 latency
mechanisms:

* ``_ambient_plan_window``: a plan frozen by a NON-holder thread while an
  ``_iteration_latency_mode`` guard is active must freeze under the
  session's AMBIENT confs (the r11-advice hazard was a corpus-scale frame
  silently pinned to ladder geometry), while holder-thread freezes keep
  the guard confs.
* ``_iteration_latency_mode(shuffle_partitions=...)``: explicit width
  override for hand-sized ladders (the LSH small-corpus gate).
* ``edges_hint`` on ``dup_clusters`` / ``pagerank``: a pure perf hint —
  results must be identical with and without it, at any value.
* ``pagerank`` empty-graph gate: no conf flip for an empty ladder
  (parity with ``dup_clusters``' ``n_edges and ...`` gate).
* ``_est_scan_splits``: metadata-only split estimate fueling the gates.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

import drill_logfile_plugin_spark.operators.dedup as D
from drill_logfile_plugin_spark.operators.graphrank import pagerank


def _guarded(spark, entered: threading.Event, release: threading.Event):
    with D._iteration_latency_mode(spark):
        entered.set()
        release.wait(30)


def test_ambient_plan_window_restores_confs_for_non_holder(spark):
    ambient_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    ambient_width = spark.conf.get("spark.sql.shuffle.partitions", "200")
    entered, release = threading.Event(), threading.Event()
    t = threading.Thread(target=_guarded, args=(spark, entered, release))
    t.start()
    try:
        assert entered.wait(30)
        # guard active: session confs are flipped
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        # non-holder thread (this one): the window restores ambient...
        with D._ambient_plan_window(spark):
            assert (
                spark.conf.get("spark.sql.adaptive.enabled") == ambient_aqe
            )
            assert (
                spark.conf.get("spark.sql.shuffle.partitions")
                == ambient_width
            )
        # ...and re-applies the guard confs on exit
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    finally:
        release.set()
        t.join(30)
    # guard exited: ambient restored
    assert spark.conf.get("spark.sql.adaptive.enabled") == ambient_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == ambient_width


def test_ambient_plan_window_noop_for_holder_and_unguarded(spark):
    # unguarded session: fast-path no-op
    with D._ambient_plan_window(spark):
        pass
    # holder thread: confs stay at guard values inside the window
    with D._iteration_latency_mode(spark):
        with D._ambient_plan_window(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"


def test_lazy_barrier_freezes_under_ambient_aqe_for_non_holder(spark):
    """The end-to-end r11-advice hazard: a non-holder thread's lazy
    barrier must freeze under AMBIENT confs, not the guard's. The
    deterministic observable: freezing an adaptive plan (ambient, AQE
    on) runs its stage-materialization jobs at ``toRdd`` time, while a
    guard-frozen plan (AQE off) runs none — so the job counter moving
    during the freeze proves the plan saw ambient AQE."""
    if spark.conf.get("spark.sql.adaptive.enabled", "true") == "false":
        pytest.skip("ambient session has AQE off; no contrast to test")
    tracker = spark.sparkContext.statusTracker()

    def _njobs():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    entered, release = threading.Event(), threading.Event()
    t = threading.Thread(target=_guarded, args=(spark, entered, release))
    t.start()
    try:
        assert entered.wait(30)
        shuffled = (
            spark.range(0, 1000, 1, 8)
            .groupBy((F.col("id") % 97).alias("k"))
            .count()
        )
        j0 = _njobs()
        D._lazy_barrier(shuffled)
        assert _njobs() > j0, (
            "non-holder freeze ran no AQE stage job — it was planned "
            "under the guard's AQE-off confs"
        )
    finally:
        release.set()
        t.join(30)


def test_iteration_latency_mode_width_override(spark):
    ambient = spark.conf.get("spark.sql.shuffle.partitions", "200")
    with D._iteration_latency_mode(spark, shuffle_partitions=17):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
        # nested entry (any width) must not re-flip — first entry wins
        with D._iteration_latency_mode(spark, shuffle_partitions=3):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
    assert spark.conf.get("spark.sql.shuffle.partitions") == ambient


def test_edges_hint_is_results_neutral_dup_clusters(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    base = sorted(
        tuple(r) for r in D.dup_clusters(pairs).collect()
    )
    for hint in (0, 3, 6, 10**9):
        got = sorted(
            tuple(r)
            for r in D.dup_clusters(pairs, edges_hint=hint).collect()
        )
        assert got == base, f"edges_hint={hint} changed results"


def test_edges_hint_is_results_neutral_pagerank(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "doc_a long, doc_b long"
    )
    base = sorted(tuple(r) for r in pagerank(pairs, 3).collect())
    for hint in (0, 4, 10**9):
        got = sorted(
            tuple(r) for r in pagerank(pairs, 3, edges_hint=hint).collect()
        )
        assert got == base, f"edges_hint={hint} changed results"


def test_pagerank_empty_graph_skips_guard_and_returns_empty(spark):
    ambient_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = pagerank(empty, 3, edges_hint=0)
    assert out.count() == 0
    # no conf flip leaked, no guard state left behind
    assert (
        spark.conf.get("spark.sql.adaptive.enabled", "true") == ambient_aqe
    )
    assert id(spark) not in D._LATENCY_STATE


def test_est_scan_splits_metadata_only(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).write.parquet(p)
    scan = spark.read.parquet(p)
    est = D._est_scan_splits(scan)
    assert est >= 1
    # non-file source: unknown, reported as 0 (callers treat as unknown)
    assert D._est_scan_splits(spark.range(5)) == 0


def test_shortcut_single_round_fixpoint_long_chain(spark):
    """The r12 last-hop convergence probe must still fully collapse
    pointer chains (a 40-step map needs several multi-hop rounds)."""
    m = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 41)], "doc_a long, doc_b long"
    )
    out = {r["node"]: r["cluster_id"] for r in D.dup_clusters(m).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 41
