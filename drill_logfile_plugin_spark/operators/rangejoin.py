"""Range (interval) join: left point value in [right_lo, right_hi).

Spark plans a plain ``l.join(r, (v >= lo) & (v < hi))`` as a broadcast
nested loop — O(|L|·|R|) compares, the classic scale cliff. This operator
is the bucketed equi-join formulation:

1. each right interval explodes into the fixed-width buckets it covers
   (``sequence(floor(lo/w), floor((hi-ε)/w))``) — interval length / width
   replicas, chosen by the caller to be O(1),
2. each left point computes its single bucket,
3. equi join on (keys…, bucket) — hash join, shuffles prune everything
   except co-bucketed candidates,
4. the exact ``lo <= v < hi`` residual filters bucket-mates outside the
   interval.

Each (left, right) pair meets exactly once — the left row lives in ONE
bucket — so no distinct pass is needed and the result is duplicate-free
by construction.

``bucket_width`` tunes replication vs selectivity exactly like LSH band
width: pick ~ the typical interval length, so each interval spans ≤ 2
buckets and each point's bucket holds few intervals. Degenerate widths
only cost performance, never correctness.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of left points to right half-open intervals
    ``[right_lo, right_hi)`` sharing the equi keys ``on``.

    Values must be numeric (cast dates/timestamps to epoch days/seconds
    first). Output = left columns + right's non-key columns.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = (set(right.columns) - set(on)) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right columns collide with left: {sorted(overlap)}"
        )
    w = float(bucket_width)
    lb = F.floor(F.col(left_val) / w)
    # half-open: an interval ending exactly on a bucket boundary does not
    # cover that bucket. ceil(hi/w) - 1 computes the last covered bucket
    # EXACTLY for boundary and non-boundary values alike; the earlier
    # floor((hi - 1e-9)/w) form used an absolute epsilon that float64
    # absorbs at large magnitudes (epoch seconds ~1e9), silently dropping
    # the boundary bucket — and with it true matches — for a hi lying
    # within 1e-9 above a boundary. Over-coverage is corrected by the
    # exact residual filter below; under-coverage never is.
    rb_lo = F.floor(F.col(right_lo) / w)
    rb_hi = F.ceil(F.col(right_hi) / w) - F.lit(1)
    l_b = left.withColumn(_BUCKET, lb.cast("long"))
    r_b = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                rb_lo.cast("long"),
                F.greatest(rb_hi.cast("long"), rb_lo.cast("long")),
            )
        ),
    )
    return (
        l_b.join(r_b, [*on, _BUCKET])
        .where(
            (F.col(left_val) >= F.col(right_lo))
            & (F.col(left_val) < F.col(right_hi))
        )
        .drop(_BUCKET)
    )
