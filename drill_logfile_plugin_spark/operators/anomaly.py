"""Rolling-window anomaly detection over event-time counts.

The observability companion to the scan operator: once logs parse into
typed rows (reference surface, /root/reference/.../LogRecordReader.java)
and bucket into time-series counts, the next question every log
analytics engine answers is "did this rate spike?". This operator flags
buckets whose count exceeds the trailing-window mean by ``k`` trailing
standard deviations — the classic z-score burst detector — computed in
*integer* arithmetic so the verdict is bit-identical cross-engine.
No reference counterpart (SURVEY.md §2 Tier C).

Integer-exact z-test: for bucket count ``c`` with trailing-window count
``n``, sum ``S`` and sum-of-squares ``SS`` (all BIGINT), the float form

    (c - S/n) > k * sqrt((n*SS - S*S)/n^2)  [i.e. z > k]

multiplies through by ``n`` (positive) and squares (both sides
non-negative once ``z_num > 0`` is required) into

    spike := n >= min_trailing AND z_num > 0
             AND z_num * z_num > k*k * z_den2
    where z_num = n*c - S,  z_den2 = n*SS - S*S  (= n^2 * variance)

— no division, no sqrt, no float: every engine agrees exactly.
Headroom: all terms are BIGINT; ``z_num^2`` bounds the domain to
per-bucket counts < ~3e8 (83k events/sec/group at hour grain) before
int64 overflow — past that, bucket at a finer grain. Documented, not
defended; DuckDB errors (not wraps) on overflow, so drift is loud.

Scale posture: one partial-agg'd count per (group, bucket) — the only
scan-sized step; the optional :func:`~..operators.rollup.gapfill`
composition and the trailing window run on the bucket spine, which is
output-sized (span/grain rows per group). The window partitions by the
group columns — no global sort, no single-task bottleneck when groups
are plural; a single global series is inherently one partition of
span/grain rows, which at hour grain is ~9k rows/year — driver-trivial.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import gapfill


def spike_flags(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    grain: str = "hour",
    trailing: int = 6,
    k: int = 2,
    min_trailing: int = 3,
    fill_gaps: bool = True,
    max_buckets: int | None = 2_000_000,
) -> DataFrame:
    """Per-bucket spike verdicts over event counts.

    Returns one row per (group, bucket): the group columns, ``bucket``
    (event-time truncated to ``grain``), ``cnt``, ``n_trail`` (trailing
    buckets observed, < ``trailing`` during warmup), ``z_num`` /
    ``z_den2`` (the integer z-test terms, see module docstring) and
    ``spike`` (boolean verdict; always false during warmup).

    ``fill_gaps=True`` composes :func:`gapfill` first so empty buckets
    count as 0 — without it a quiet hour vanishes from the trailing
    window instead of dragging the mean down, and the window frame
    becomes "trailing observed buckets" rather than "trailing hours".
    """
    gcols = list(group_cols)
    counts = df.groupBy(
        *gcols, F.date_trunc(grain, F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    if fill_gaps:
        counts = gapfill(
            counts, grain=grain, bucket_col="bucket",
            group_cols=gcols, fill={"cnt": 0}, max_buckets=max_buckets,
        )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    c = F.col("cnt")
    n = F.count("cnt").over(w)
    s = F.sum("cnt").over(w)
    ss = F.sum(c * c).over(w)
    stats = counts.select(
        *gcols, "bucket", "cnt",
        n.alias("n_trail"),
        (n * c - s).alias("z_num"),
        (n * ss - s * s).alias("z_den2"),
    )
    return stats.withColumn(
        "spike",
        (F.col("n_trail") >= F.lit(int(min_trailing)))
        & (F.col("z_num") > F.lit(0))
        & (
            F.col("z_num") * F.col("z_num")
            > F.lit(int(k) * int(k)) * F.col("z_den2")
        ),
    )


def spike_sql_duck(
    source_sql: str,
    ts_col: str = "ts",
    group_col: str = "event_type",
    grain: str = "hour",
    trailing: int = 6,
    k: int = 2,
    min_trailing: int = 3,
) -> str:
    """DuckDB replay of :func:`spike_flags` (gap-filled, single group
    column) for oracle checks. Window SUMs are cast back to BIGINT —
    DuckDB widens windowed integer sums to HUGEINT, which the driver's
    pandas canonicalizer would float-ify (round-2 lesson)."""
    return f"""
    SELECT {group_col}, bucket, cnt, n_trail, z_num, z_den2,
           (n_trail >= {int(min_trailing)} AND z_num > 0
            AND z_num * z_num > {int(k) * int(k)} * z_den2) AS spike
    FROM (
      SELECT {group_col}, bucket, cnt,
             CAST(COUNT(cnt) OVER w AS BIGINT) AS n_trail,
             CAST(COUNT(cnt) OVER w * cnt - SUM(cnt) OVER w AS BIGINT)
               AS z_num,
             CAST(COUNT(cnt) OVER w * SUM(cnt * cnt) OVER w
                  - SUM(cnt) OVER w * SUM(cnt) OVER w AS BIGINT)
               AS z_den2
      FROM (
        SELECT s.{group_col}, s.bucket,
               COALESCE(g.cnt, CAST(0 AS BIGINT)) AS cnt
        FROM (
          SELECT {group_col},
                 unnest(generate_series(lo, hi, INTERVAL 1 {grain.upper()}))
                   AS bucket
          FROM (
            SELECT {group_col},
                   MIN(date_trunc('{grain}', {ts_col})) AS lo,
                   MAX(date_trunc('{grain}', {ts_col})) AS hi
            FROM ({source_sql}) GROUP BY {group_col}
          )
        ) s LEFT JOIN (
          SELECT {group_col}, date_trunc('{grain}', {ts_col}) AS bucket,
                 COUNT(*) AS cnt
          FROM ({source_sql}) GROUP BY {group_col}, bucket
        ) g ON s.{group_col} IS NOT DISTINCT FROM g.{group_col}
           AND s.bucket = g.bucket
      )
      WINDOW w AS (PARTITION BY {group_col} ORDER BY bucket
                   ROWS BETWEEN {int(trailing)} PRECEDING
                            AND 1 PRECEDING)
    )
    """
