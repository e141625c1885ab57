"""Unit tests for the bucketed range join (operators/rangejoin.py).

The driver query q45 certifies it against DuckDB's plain inequality join
on real tables; these pin boundary semantics on handcrafted fixtures,
including bucket widths chosen adversarially against the intervals.
"""

from __future__ import annotations

import pytest

from drill_logfile_plugin_spark.operators.rangejoin import range_join


@pytest.fixture()
def points_intervals(spark):
    points = spark.createDataFrame(
        [(1, 0.0, "p0"), (1, 5.0, "p5"), (1, 10.0, "p10"), (1, 15.0, "p15"),
         (2, 5.0, "q5")],
        ["k", "v", "tag"],
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0, "A"),    # [0,10): p0, p5 — NOT p10 (half-open)
         (1, 10.0, 10.0, "E"),   # empty interval: matches nothing
         (1, 14.0, 100.0, "B"),  # p15
         (2, 0.0, 6.0, "C")],    # q5
        ["k", "lo", "hi", "iv"],
    )
    return points, intervals


def brute(points, intervals):
    out = set()
    for p in points.collect():
        for i in intervals.collect():
            if p.k == i.k and i.lo <= p.v < i.hi:
                out.add((p.tag, i.iv))
    return out


@pytest.mark.parametrize("width", [1.0, 3.0, 10.0, 1000.0])
def test_range_join_matches_brute_force_at_any_width(
    spark, points_intervals, width
):
    """Bucket width is a performance dial, never a correctness one."""
    points, intervals = points_intervals
    got = {
        (r.tag, r.iv)
        for r in range_join(
            points, intervals, on=["k"], left_val="v",
            right_lo="lo", right_hi="hi", bucket_width=width,
        ).collect()
    }
    assert got == brute(points, intervals)


def test_range_join_is_duplicate_free(spark, points_intervals):
    points, intervals = points_intervals
    rows = range_join(
        points, intervals, on=["k"], left_val="v",
        right_lo="lo", right_hi="hi", bucket_width=2.0,
    ).collect()
    pairs = [(r.tag, r.iv) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_range_join_validates_inputs(spark, points_intervals):
    points, intervals = points_intervals
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(points, intervals, on=["k"], left_val="v",
                   right_lo="lo", right_hi="hi", bucket_width=0)
    with pytest.raises(ValueError, match="collide"):
        range_join(points, intervals.withColumnRenamed("iv", "tag"),
                   on=["k"], left_val="v",
                   right_lo="lo", right_hi="hi", bucket_width=1.0)
