"""Hypertable-style rollup cascade: multi-grain time aggregates, one scan.

The pattern behind continuous aggregates / materialized rollups in
time-series stores: keep the finest grain (hour), and derive every coarser
grain (day, month, ...) by RE-AGGREGATING the next-finer level instead of
rescanning the fact table — legal because the aggregates carried are
reaggregable (counts, exact decimal sums; never averages or distincts).

Plan shape: the three levels share the hour-aggregation subtree, and
Spark's exchange reuse (``spark.sql.exchange.reuse``, on by default)
collapses the identical shuffles — the physical plan scans the fact table
ONCE and shows ``ReusedExchange`` for the repeated subplans (pinned by
tests/test_plans.py). At 100 TB the cascade aggregates ~n rows once, then
~n/3600, ~n/86400 rows — the coarser levels are free.

Exactness: the cascade keeps the determinism-policy decimal sums
(functions/exprs.py) through every level and casts to double only on
output, so re-aggregated coarse sums are bit-identical to direct
aggregation — which is exactly what the DuckDB oracle (q46) computes each
level as, certifying the reaggregation property end to end.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import money, nullsafe_group_cond


def rollup_cascade(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    grains: Sequence[str] = ("hour", "day", "month"),
) -> DataFrame:
    """Union of per-grain aggregates; coarser grains derive from finer.

    Output: grain, bucket (truncated timestamp), ``group_cols``…,
    n_events, sum_value. ``grains`` must be ordered finest → coarsest.
    """
    if not grains:
        raise ValueError("need at least one grain")
    level = df.groupBy(
        F.date_trunc(grains[0], F.col(ts_col)).alias("bucket"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(money(F.col(value_col))).alias("_dec_sum"),
    )
    levels = [(grains[0], level)]
    for g in grains[1:]:
        level = level.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), *group_cols
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_dec_sum").alias("_dec_sum"),
        )
        levels.append((g, level))
    outs = [
        lvl.select(
            F.lit(g).alias("grain"),
            "bucket",
            *group_cols,
            "n_events",
            F.col("_dec_sum").cast("double").alias("sum_value"),
        )
        for g, lvl in levels
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def gapfill(
    agg: DataFrame,
    grain: str = "hour",
    bucket_col: str = "bucket",
    group_cols: Sequence[str] = ("event_type",),
    fill: dict[str, object] | None = None,
    max_buckets: int | None = 2_000_000,
) -> DataFrame:
    """Fill missing time buckets per group — the hypertable
    ``time_bucket_gapfill`` shape.

    ``agg`` is an already-bucketed frame (e.g. one level of
    :func:`rollup_cascade`); for every group the operator generates the
    COMPLETE bucket sequence between that group's min and max bucket and
    left-joins the data onto it, so downstream chart/window consumers see
    an unbroken time axis. ``fill`` maps column -> constant for gap rows
    (unmapped columns stay NULL — locf/interpolation are window functions
    the caller can layer on the filled frame).

    Exactness: bucket generation is ``sequence(min, max, interval 1
    <grain>)`` over timestamps — pure integer microsecond arithmetic,
    identical in DuckDB's ``generate_series``; fills are literals. The
    driver hash-checks the filled frame (q46 gapfill arm).

    Scale posture: bounds are one partial-agg'd aggregate per group
    (group-cardinality rows); the explode generates (span/grain) rows per
    group — output-sized, not scan-sized — and the join back is an equi
    join on (group, bucket). A group spanning years at second grain
    would explode ~3e7 rows; choose the grain to match the span, same as
    any gapfill implementation.

    ``max_buckets`` guards the spine per group: ONE epoch-zero or
    far-future outlier timestamp (ubiquitous in real ingests) stretches
    min..max to centuries and the dense spine to millions of rows per
    group — at hour grain, 1900..2262 is ~3.2M buckets, which at r5
    measured an executor OOM, the worst possible failure mode. The
    guard raises a loud, actionable error (group bounds in the message)
    BEFORE generating the sequence; fix the data (filter outliers),
    widen the grain, or raise/disable the cap (``None``). The check is
    one integer comparison per group row — free.
    """
    if grain not in ("hour", "day", "minute", "second", "week", "month"):
        raise ValueError(f"unsupported grain: {grain}")
    gcols = list(group_cols)
    bounds = agg.groupBy(*gcols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    seq = F.sequence(
        F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL 1 {grain.upper()}")
    )
    if max_buckets is not None:
        n_buckets = (
            F.expr(f"timestampdiff({grain}, _lo, _hi)").cast("long") + 1
        )
        # NULL-tolerate: a group whose every bucket is NULL has NULL
        # bounds — the pre-guard behavior (sequence(NULL, NULL) → NULL →
        # explode drops the group) must survive, and assert_true treats
        # a NULL condition as failure (with a NULL, non-actionable
        # message, since the concat of NULL bounds is NULL).
        guard = F.assert_true(
            F.coalesce(
                n_buckets <= F.lit(int(max_buckets)), F.lit(True)
            ),
            F.concat(
                F.lit(
                    f"gapfill: a group's bucket spine exceeds "
                    f"max_buckets={int(max_buckets)} at grain '{grain}' ("
                ),
                F.col("_lo").cast("string"),
                F.lit(" .. "),
                F.col("_hi").cast("string"),
                F.lit(
                    "); filter outlier timestamps, widen the grain, or "
                    "raise max_buckets"
                ),
            ),
        )
        # assert_true returns NULL on pass — the when() forces it to
        # evaluate per group row before the sequence materializes.
        seq = F.when(guard.isNull(), seq)
    spine = bounds.select(*gcols, F.explode(seq).alias(bucket_col))
    # Null-SAFE group equality: a NULL group key is a real group (e.g.
    # events with no event_type); a plain equi join would never match the
    # spine back onto it and silently zero-fill the whole group.
    sp, ag = spine.alias("sp"), agg.alias("ag")
    cond = nullsafe_group_cond(
        "sp",
        "ag",
        gcols,
        [F.col(f"sp.{bucket_col}") == F.col(f"ag.{bucket_col}")],
    )
    value_cols = [
        c for c in agg.columns if c not in gcols and c != bucket_col
    ]
    out = sp.join(ag, cond, "left").select(
        *[F.col(f"sp.{c}") for c in gcols],
        F.col(f"sp.{bucket_col}").alias(bucket_col),
        *[F.col(f"ag.{c}").alias(c) for c in value_cols],
    )
    for col, v in (fill or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(v)))
    return out


def locf(
    df: DataFrame,
    value_cols: Sequence[str],
    bucket_col: str = "bucket",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Last-observation-carried-forward over a (gap-filled) time axis —
    the hypertable ``locf()`` companion to :func:`gapfill`: gap rows
    inherit the most recent non-NULL value per group; leading gaps (no
    prior observation) stay NULL, the standard locf contract.

    One window per call, partitioned on the group columns and ordered by
    bucket — the same exchange the gapfill join already produced, so on
    a filled frame Catalyst adds a sort but no extra shuffle. Values are
    carried verbatim (``last(ignorenulls)``), never interpolated —
    interpolation is a different statement about the data and a caller
    choice.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
