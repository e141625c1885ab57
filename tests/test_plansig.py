"""Plan-identity floors (FLOORS.json v2): signature stability and the
fold_floor merge matrix (VERDICT r7 item 4 — floors reset when a query's
plan changes instead of poisoning regression calls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from drill_logfile_plugin_spark.plansig import (
    floor_value,
    fold_floor,
    plan_row,
    plan_signature,
)


def test_fold_floor_merge_matrix():
    # fresh entries, with and without a signature
    assert fold_floor(None, 1.5, "abc") == {"floor": 1.5, "plan": "abc"}
    assert fold_floor(None, 1.5, None) == {"floor": 1.5, "plan": None}
    # matching signature folds the minimum (both directions)
    rec = {"floor": 1.5, "plan": "abc"}
    assert fold_floor(rec, 1.2, "abc")["floor"] == 1.2
    assert fold_floor(rec, 9.0, "abc")["floor"] == 1.5
    # signature mismatch RESETS, keeping the displaced floor as prior
    out = fold_floor({"floor": 0.35, "plan": "old"}, 3.3, "new")
    assert out == {"floor": 3.3, "plan": "new", "prior": 0.35}
    # legacy bare float + signed observation: the q50 trap — reset
    out = fold_floor(0.35, 3.3, "new")
    assert out == {"floor": 3.3, "plan": "new", "prior": 0.35}
    # legacy + unsigned observation: pre-r8 behavior (min), unversioned
    assert fold_floor(0.35, 0.2, None) == {"floor": 0.2, "plan": None}
    assert fold_floor(0.35, 0.9, None) == {"floor": 0.35, "plan": None}
    # unsigned observation never validates against a versioned floor
    rec = {"floor": 1.5, "plan": "abc"}
    assert fold_floor(rec, 0.1, None) is rec
    # unversioned v2 entries fold with unsigned, reset with signed
    assert fold_floor({"floor": 1.5, "plan": None}, 1.0, None)["floor"] == 1.0
    out = fold_floor({"floor": 1.5, "plan": None}, 2.0, "s")
    assert out == {"floor": 2.0, "plan": "s", "prior": 1.5}
    # prior survives a subsequent matching fold
    out = fold_floor({"floor": 3.3, "plan": "new", "prior": 0.35}, 3.0, "new")
    assert out == {"floor": 3.0, "plan": "new", "prior": 0.35}
    # floor_value reads both formats
    assert floor_value(0.35) == 0.35
    assert floor_value({"floor": 1.2, "plan": "x"}) == 1.2


def _q(spark, arms):
    a = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    out = a.groupBy("k").agg(F.sum("v").alias("s"))
    if arms > 1:
        b = a.groupBy("k").agg(F.count("v").alias("s"))
        out = out.unionByName(b)
    return out


def test_signature_stable_and_plan_sensitive(spark):
    """Two builds of the same query -> one signature; absorbing an arm
    (the q50/q59 history) -> a different one; executing the frame first
    (bench.py reuses the timed DataFrame) does not change it."""
    s1 = plan_signature(_q(spark, 1))
    s2 = plan_signature(_q(spark, 1))
    assert s1 == s2 and len(s1) == 12
    assert plan_signature(_q(spark, 2)) != s1
    df = _q(spark, 1)
    pre = plan_signature(df)
    df.write.format("noop").mode("overwrite").save()
    assert plan_signature(df) == pre == s1
    row = plan_row(df)
    assert row["hash_ex"] >= 1 and row["python"] == "JVM-only"
