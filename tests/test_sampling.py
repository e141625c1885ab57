"""Deterministic mixing operators: epoch_mix (upsampling temperature
mix) pinned against independent rate computation and the md5 reference
hash set."""

from __future__ import annotations

def _mix_corpus(spark):
    """Planted mix fixture: three sources with 1600/400/100 docs."""
    rows = []
    for src, n, base in (("web", 1600, 0), ("books", 400, 10_000), ("code", 100, 20_000)):
        rows += [(base + i, src) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_epoch_mix_rates_and_exact_replication(spark):
    """The mix table realizes n^alpha proportions: full epochs replicate
    EXACTLY (count per epoch < floor(rate) == n_s), the fractional epoch
    lands within hash tolerance of its target, and the achieved totals
    match the independent rate computation."""
    import hashlib

    from drill_logfile_plugin_spark.operators.sampling import (
        MIX_BUCKETS,
        epoch_mix,
    )

    df = _mix_corpus(spark)
    out = epoch_mix(df, alpha=0.5, target_docs=2100).collect()
    # independent rate table
    ns = {"web": 1600, "books": 400, "code": 100}
    wsum = sum(n ** 0.5 for n in ns.values())
    rates = {s: min(4.0, (n ** 0.5 / wsum) * 2100 / n) for s, n in ns.items()}
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r)
    for s, rows in by.items():
        rate = rates[s]
        assert abs(rows[0]["mix_rate"] - rate) < 1e-12
        full = int(rate)
        from collections import Counter

        per_epoch = Counter(r["epoch"] for r in rows)
        for e in range(full):
            assert per_epoch[e] == ns[s], (s, e)  # full epochs exact
        frac = rate - full
        if frac > 0:
            # the fractional epoch is the INDEPENDENT reference hash set
            want = sum(
                1
                for i in range(ns[s])
                if int(
                    hashlib.md5(
                        f"{_base(s) + i}:epoch:{full}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                % MIX_BUCKETS
                < frac * MIX_BUCKETS
            )
            assert per_epoch[full] == want, s
    # (id, epoch) unique
    keys = [(r["doc_id"], r["epoch"]) for r in out]
    assert len(keys) == len(set(keys))


def _base(src):
    return {"web": 0, "books": 10_000, "code": 20_000}[src]


def test_epoch_mix_identity_cap_and_edges(spark):
    import pytest
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.sampling import epoch_mix

    df = _mix_corpus(spark)
    # alpha=1, target=total -> every rate is exactly 1: output == input
    out = epoch_mix(df, alpha=1.0).collect()
    assert len(out) == 2100
    assert all(r["epoch"] == 0 and abs(r["mix_rate"] - 1.0) < 1e-12 for r in out)
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in df.collect()}
    # the max_epochs cap binds for a tiny source under a huge target
    capped = epoch_mix(df, alpha=0.0, target_docs=60_000, max_epochs=3)
    rows = capped.where(F.col("source") == "code").collect()
    assert {r["epoch"] for r in rows} == {0, 1, 2}
    assert len(rows) == 300  # exactly 3 full epochs, no fractional
    # determinism
    a = sorted(map(str, epoch_mix(df, alpha=0.5, target_docs=1000).collect()))
    b = sorted(map(str, epoch_mix(df, alpha=0.5, target_docs=1000).collect()))
    assert a == b
    # NULL sources drop; empty input returns the empty contract
    withnull = df.unionByName(
        spark.createDataFrame([(99_999, None)], "doc_id long, source string")
    )
    assert (
        epoch_mix(withnull, alpha=1.0).where(F.col("doc_id") == 99_999).count()
        == 0
    )
    empty = epoch_mix(df.where(F.lit(False)))
    assert empty.count() == 0 and "epoch" in empty.columns
    with pytest.raises(ValueError, match="max_epochs"):
        epoch_mix(df, max_epochs=0)
    with pytest.raises(ValueError, match="target_docs"):
        epoch_mix(df, target_docs=-5)
