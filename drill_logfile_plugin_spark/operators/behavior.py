"""Event-behavior analytics: ordered funnels and cohort retention.

The events side of a data platform asks two canonical questions the
relational tier doesn't directly express:

* **Funnel** — of the users who did stage 1, how many went on to do
  stage 2 *afterwards*, then stage 3 after that? (Strictly ordered: a
  purchase before the first view does not count as a converted view.)
* **Cohort retention** — of the users whose first activity fell in
  period P, what fraction were still active in P+1, P+2, …?

Both reduce to per-user timestamp aggregates + small re-aggregations,
so they run at scan speed on any event volume; and both use only
COUNT/MIN/date-trunc/one final division, so results are bit-identical
across engines (the driver hash-checks them as q46 arms).

Scale posture (10^12 events, 1000 executors)
--------------------------------------------
* ``funnel`` filters to the stage types at the scan (predicate
  pushdown), then per-stage per-user MIN-timestamp aggregates —
  map-side partial, shuffle carries one row per (user, stage). The
  stage chaining is k-1 equi joins on user_id between per-user frames
  (each already one row per user); stage counts are 1-row aggregates
  unioned at the end. Nothing is ever ordered globally.
* ``cohort_retention`` is two aggregates over one scan subtree — first
  activity per user, then distinct (user, period) — joined on user_id
  and re-aggregated to (cohort, offset). At any scale the join carries
  one row per user per active period.
* Neither uses a window function: per-user ROW_NUMBER-style
  sessionization would sort within user partitions for no benefit —
  MIN/GROUP BY express the same thing shuffle-cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Strictly-ordered funnel over ``stages`` (first-touch semantics).

    A user converts stage i when they have a ``stages[i]`` event strictly
    AFTER their stage-(i-1) conversion time (and, when ``within_seconds``
    is set, no later than that many seconds after it — the conversion-
    window form product analytics uses); the conversion time is the
    earliest such event (first-touch — deterministic, engine-exact).

    Returns one row per stage:
    (stage_idx, stage, n_users, conversion) where ``conversion`` is
    n_users / n_users(stage 0) as a double (1.0 for stage 0; the single
    int/int division keeps it bit-exact cross-engine). Stage counts are
    monotonically non-increasing by construction.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
    )
    reached = [
        base.filter(F.col("etype") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    ]
    for stage in stages[1:]:
        prev = reached[-1]
        cond = F.col("ts") > F.col("t_prev")
        if within_seconds is not None:
            cond = cond & (
                F.col("ts")
                <= F.col("t_prev") + F.expr(f"INTERVAL {within_seconds} SECOND")
            )
        reached.append(
            base.filter(F.col("etype") == stage)
            .join(prev.select("user_id", F.col("t").alias("t_prev")), "user_id")
            .filter(cond)
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
    counts = None
    for i, (stage, r) in enumerate(zip(stages, reached)):
        c = r.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    first = counts.filter(F.col("stage_idx") == 0).select(
        F.col("n_users").alias("n_first")
    )
    return counts.crossJoin(F.broadcast(first)).select(
        "stage_idx",
        "stage",
        "n_users",
        (F.col("n_users").cast("double") / F.col("n_first").cast("double")).alias(
            "conversion"
        ),
    )


def funnel_sql_duck(
    stages: list[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> str:
    """DuckDB mirror of :func:`funnel` (same chaining, same division)."""
    ctes = [
        f"""r0 AS (
      SELECT {user_col} AS user_id, MIN({ts_col}) AS t FROM {table}
      WHERE {type_col} = '{stages[0]}' GROUP BY {user_col}
    )"""
    ]
    win = (
        f" AND e.{ts_col} <= p.t + INTERVAL '{within_seconds} seconds'"
        if within_seconds is not None
        else ""
    )
    for i, stage in enumerate(stages[1:], start=1):
        ctes.append(
            f"""r{i} AS (
      SELECT e.{user_col} AS user_id, MIN(e.{ts_col}) AS t
      FROM {table} e JOIN r{i - 1} p ON e.{user_col} = p.user_id
      WHERE e.{type_col} = '{stage}' AND e.{ts_col} > p.t{win}
      GROUP BY e.{user_col}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS stage_idx, '{s}' AS stage, COUNT(*) AS n_users FROM r{i}"
        for i, s in enumerate(stages)
    )
    return f"""
    WITH {", ".join(ctes)},
    counts AS ({selects})
    SELECT stage_idx, stage, n_users,
           CAST(n_users AS DOUBLE) /
             CAST((SELECT n_users FROM counts WHERE stage_idx = 0) AS DOUBLE)
             AS conversion
    FROM counts
    """


def cohort_retention(
    events: DataFrame,
    granularity: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle at ``granularity`` ('week' or 'day').

    A user's cohort is the truncated period of their FIRST event; they
    are retained at offset k if they have any event in cohort-period + k.
    Returns (cohort, period_offset, n_active, cohort_size, retention):
    ``period_offset`` in whole periods, ``retention = n_active / cohort_size``
    (single int/int division — engine-exact). Offset 0 always has
    ``n_active == cohort_size`` (their first event is activity).
    """
    if granularity not in ("week", "day"):
        raise ValueError("granularity must be 'week' or 'day'")
    days = 7 if granularity == "week" else 1
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc(granularity, F.col(ts_col)).cast("date").alias("period"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("period").alias("cohort"))
    active = ev.distinct()
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    grid = (
        active.join(firsts, "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("period"), F.col("cohort")) / days)
            .cast("long")
            .alias("period_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return grid.join(sizes, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )


def cohort_retention_sql_duck(
    granularity: str = "week",
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB mirror of :func:`cohort_retention`."""
    days = 7 if granularity == "week" else 1
    return f"""
    WITH ev AS (
      SELECT {user_col} AS user_id,
             CAST(date_trunc('{granularity}', {ts_col}) AS DATE) AS period
      FROM {table}
    ), firsts AS (
      SELECT user_id, MIN(period) AS cohort FROM ev GROUP BY user_id
    ), sizes AS (
      SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort
    ), grid AS (
      SELECT cohort, period_offset, COUNT(*) AS n_active FROM (
        SELECT DISTINCT f.cohort,
               CAST((e.period - f.cohort) / {days} AS BIGINT) AS period_offset,
               e.user_id
        FROM (SELECT DISTINCT user_id, period FROM ev) e
        JOIN firsts f USING (user_id)
      ) GROUP BY cohort, period_offset
    )
    SELECT g.cohort, g.period_offset, g.n_active, s.cohort_size,
           CAST(g.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             AS retention
    FROM grid g JOIN sizes s USING (cohort)
    """
