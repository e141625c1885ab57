"""Batch-equivalent driver surface for the streaming window operators.

Each query runs the *same transformation function* the streaming tier uses
(streaming/windows.py) on a batch read of the events table; the DuckDB
oracle recomputes the window semantics from first principles (epoch
arithmetic for tumbling/sliding alignment, gaps-and-islands for sessions).
A MATCH certifies the window logic itself; tests/test_streaming.py then
proves the identical functions produce the identical result when executed
incrementally over ``readStream`` with watermarks — together they close
SURVEY.md §7 Phase 4 (the reference has no streaming surface at all; this
tier is the Structured Streaming extension).

Window-alignment note: Spark aligns windows to the epoch (start =
floor(t/slide)*slide); the oracles implement exactly that with integer
microsecond arithmetic rather than relying on any engine's time-bucket
origin conventions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.exprs import dsum_sql
from .operators.rollup import rollup_cascade
from .registry import _t, query
from .streaming.windows import (
    event_followups,
    session_event_windows,
    sliding_event_counts,
    tumbling_event_counts,
)

_US_HOUR = 3_600_000_000
_US_10MIN = 600_000_000


@query(
    "q37_stream_windows",
    f"""
    SELECT 'tumbling' AS kind, event_type AS grp,
           make_timestamp((epoch_us(ts) // {_US_HOUR}) * {_US_HOUR}) AS win_start,
           make_timestamp((epoch_us(ts) // {_US_HOUR}) * {_US_HOUR})
             + INTERVAL 1 HOUR AS win_end,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY grp, win_start, win_end

    UNION ALL

    SELECT 'sliding' AS kind, CAST(NULL AS VARCHAR) AS grp,
           win_start,
           win_start + INTERVAL 30 MINUTE AS win_end,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM (
      SELECT make_timestamp(((epoch_us(ts) // {_US_10MIN}) - k) * {_US_10MIN})
               AS win_start,
             value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    )
    GROUP BY win_start

    UNION ALL

    SELECT 'session' AS kind, CAST(user_id AS VARCHAR) AS grp,
           MIN(ts) AS win_start,
           MAX(ts) + INTERVAL 15 MINUTE AS win_end,
           COUNT(*) AS n_events,
           CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 15 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      )
    )
    GROUP BY user_id, session_id

    UNION ALL

    SELECT 'followup' AS kind, CAST(user_id AS VARCHAR) AS grp,
           MIN(first_ts) AS win_start, MAX(then_ts) AS win_end,
           COUNT(*) AS n_events, CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      SELECT a.user_id, a.ts AS first_ts, b.ts AS then_ts
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'view' AND b.event_type = 'purchase'
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    ) GROUP BY user_id
    """,
    doc="The four streaming shapes, union-tagged over one batch read "
    "(merged q37+q38+q39 + the stream-stream interval join, for the "
    "driver's correctness budget): "
    "tumbling 1-hour windows per event_type (exact-decimal value sums per "
    "the determinism policy); sliding 30-min/10-min windows where every "
    "event lands in exactly 3 overlapping epoch-aligned windows (matching "
    "Spark's window origin); and per-user session windows (15-min gap) "
    "via session_window, where the oracle derives the same sessions with "
    "gaps-and-islands — end = last event + gap, [start, end), so an event "
    "exactly gap later opens a new session. Each arm runs the SAME "
    "transformation function the streaming tier executes over readStream "
    "(streaming/windows.py; stream==batch proven in tests/test_streaming).",
)
def q37(spark, sf):
    e = _t(spark, sf, "events")
    tumbling = tumbling_event_counts(e).select(
        F.lit("tumbling").alias("kind"),
        F.col("event_type").alias("grp"),
        "win_start",
        "win_end",
        "n_events",
        "sum_value",
    )
    sliding = sliding_event_counts(e).select(
        F.lit("sliding").alias("kind"),
        F.lit(None).cast("string").alias("grp"),
        "win_start",
        "win_end",
        "n_events",
        "sum_value",
    )
    session = session_event_windows(e).select(
        F.lit("session").alias("kind"),
        F.col("user_id").cast("string").alias("grp"),
        F.col("session_start").alias("win_start"),
        F.col("session_end").alias("win_end"),
        "n_events",
        F.lit(None).cast("double").alias("sum_value"),
    )
    followup = (
        event_followups(e)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("first_ts").alias("win_start"),
            F.max("then_ts").alias("win_end"),
        )
        .select(
            F.lit("followup").alias("kind"),
            F.col("user_id").cast("string").alias("grp"),
            "win_start",
            "win_end",
            "n_events",
            F.lit(None).cast("double").alias("sum_value"),
        )
    )
    return (
        tumbling.unionByName(sliding)
        .unionByName(session)
        .unionByName(followup)
    )


def _grain_select(grain: str) -> str:
    return f"""
    SELECT '{grain}' AS grain,
           date_trunc('{grain}', ts) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events GROUP BY bucket, event_type
    """


#: Funnel stage sequence + conversion window for q46's behavior arms.
_FUNNEL_STAGES = ["view", "click", "purchase"]
_FUNNEL_WITHIN_S = 86_400


#: Sparse slice for q46's gapfill arm: rare high-value purchases leave
#: empty hours at every SF, so the zero-fill path is really exercised.
_GAPFILL_FILTER = "event_type = 'purchase' AND value > 150"


def _behavior_arms_sql() -> str:
    from .operators.behavior import cohort_retention_sql_duck, funnel_sql_duck

    f = funnel_sql_duck(_FUNNEL_STAGES, within_seconds=_FUNNEL_WITHIN_S)
    c = cohort_retention_sql_duck(granularity="week")
    return f"""
    SELECT 'funnel' AS grain, CAST(NULL AS TIMESTAMP) AS bucket,
           stage AS event_type, n_users AS n_events, conversion AS sum_value
    FROM ({f}) f
    UNION ALL
    SELECT 'cohort' AS grain, CAST(cohort AS TIMESTAMP) AS bucket,
           CAST(period_offset AS VARCHAR) AS event_type,
           n_active AS n_events, retention AS sum_value
    FROM ({c}) c
    UNION ALL
    SELECT 'gapfill' AS grain, bucket, event_type, n_events, sum_value
    FROM ({_gapfill_subquery()}) gfd
    UNION ALL
    SELECT 'locf' AS grain, bucket, event_type, n_events,
           last_value(sum_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_value
    FROM ({_gapfill_subquery()}) lfd
    """


def _gapfill_subquery() -> str:
    return f"""
      SELECT s.bucket, s.event_type,
             COALESCE(g.n_events, 0) AS n_events, g.sum_value
      FROM (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM (
          SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM (
            SELECT date_trunc('hour', ts) AS bucket, event_type
            FROM events WHERE {_GAPFILL_FILTER}
          ) GROUP BY event_type
        )
      ) s LEFT JOIN (
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
        FROM events WHERE {_GAPFILL_FILTER}
        GROUP BY bucket, event_type
      ) g ON s.event_type = g.event_type AND s.bucket = g.bucket
    """


@query(
    "q46_rollup_cascade",
    " UNION ALL ".join(_grain_select(g) for g in ("hour", "day", "month"))
    + " UNION ALL "
    + _behavior_arms_sql(),
    doc="Event-time analytics, union-merged (driver query-budget policy). "
    "Rollup arms: hypertable-style hour/day/month cascade where each "
    "coarser grain RE-AGGREGATES the finer one (reaggregable stats only: "
    "counts + exact decimal sums); Spark's exchange reuse collapses the "
    "shared subtrees to ONE fact scan (plan-pinned), while the oracle "
    "computes every grain from raw events — a MATCH certifies the "
    "reaggregation property. Behavior arms (operators/behavior.py): "
    "strictly-ordered view->click->purchase funnel with a 1-day "
    "conversion window (first-touch MIN chaining — per-user aggregates "
    "+ equi joins, no window sort) and weekly cohort retention (first-"
    "activity cohorts x period offsets; two aggregates + one join). All "
    "arithmetic is COUNT/MIN/date-trunc + single int/int divisions — "
    "bit-exact cross-engine. Gapfill arm (operators/rollup.py gapfill): "
    "time_bucket_gapfill over a sparse high-value-purchase slice — "
    "per-group sequence() spine between min/max bucket, left join + "
    "zero-fill, so chart/window consumers see an unbroken hourly axis; "
    "spine generation is integer microsecond arithmetic, output-sized. "
    "Locf arm (operators/rollup.py locf): last-observation-carried-"
    "forward layered on the filled axis — values carried verbatim "
    "(last ignorenulls window, one sort on the gapfill exchange, no "
    "extra shuffle), leading gaps stay NULL; the hypertable locf() "
    "companion, hash-pinned because carried values are bit-copies.",
)
def q46(spark, sf):
    from .operators.behavior import cohort_retention, funnel

    e = _t(spark, sf, "events")
    roll = rollup_cascade(e)
    fun = funnel(e, _FUNNEL_STAGES, within_seconds=_FUNNEL_WITHIN_S).select(
        F.lit("funnel").alias("grain"),
        F.lit(None).cast("timestamp").alias("bucket"),
        F.col("stage").alias("event_type"),
        F.col("n_users").alias("n_events"),
        F.col("conversion").alias("sum_value"),
    )
    coh = cohort_retention(e, granularity="week").select(
        F.lit("cohort").alias("grain"),
        F.col("cohort").cast("timestamp").alias("bucket"),
        F.col("period_offset").cast("string").alias("event_type"),
        F.col("n_active").alias("n_events"),
        F.col("retention").alias("sum_value"),
    )
    from .functions.exprs import dsum
    from .operators.rollup import gapfill

    sparse = (
        e.filter(F.expr(_GAPFILL_FILTER))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )
    from .operators.rollup import locf

    filled = gapfill(sparse, grain="hour", fill={"n_events": 0})
    gf = filled.select(
        F.lit("gapfill").alias("grain"),
        "bucket",
        "event_type",
        "n_events",
        "sum_value",
    )
    lf = locf(filled, ["sum_value"]).select(
        F.lit("locf").alias("grain"),
        "bucket",
        "event_type",
        "n_events",
        "sum_value",
    )
    return roll.unionByName(fun).unionByName(coh).unionByName(gf).unionByName(lf)
