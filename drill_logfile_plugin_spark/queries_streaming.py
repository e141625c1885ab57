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

from .functions.exprs import dsum_sql
from .operators.rollup import rollup_cascade
from .registry import _t, query
from .streaming.windows import (
    session_event_windows,
    sliding_event_counts,
    tumbling_event_counts,
)

_US_HOUR = 3_600_000_000
_US_10MIN = 600_000_000


@query(
    "q37_window_tumbling",
    f"""
    SELECT make_timestamp((epoch_us(ts) // {_US_HOUR}) * {_US_HOUR}) AS win_start,
           make_timestamp((epoch_us(ts) // {_US_HOUR}) * {_US_HOUR})
             + INTERVAL 1 HOUR AS win_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY win_start, win_end, event_type
    """,
    doc="Tumbling 1-hour windows per event_type (the shared batch/streaming "
    "transformation); exact-decimal value sums per the determinism policy.",
)
def q37(spark, sf):
    return tumbling_event_counts(_t(spark, sf, "events"))


@query(
    "q38_window_sliding",
    f"""
    WITH slid AS (
      SELECT make_timestamp(((epoch_us(ts) // {_US_10MIN}) - k) * {_US_10MIN})
               AS win_start,
             value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    )
    SELECT win_start,
           win_start + INTERVAL 30 MINUTE AS win_end,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM slid
    GROUP BY win_start
    """,
    doc="Sliding 30-min/10-min windows: every event lands in exactly 3 "
    "overlapping windows (epoch-aligned, matching Spark's window origin).",
)
def q38(spark, sf):
    return sliding_event_counts(_t(spark, sf, "events"))


@query(
    "q39_window_session",
    """
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 15 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marks
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 15 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Per-user session windows (15-min gap) via session_window; oracle "
    "derives the same sessions with gaps-and-islands. End = last event + "
    "gap, [start, end) — an event exactly gap later opens a new session.",
)
def q39(spark, sf):
    return session_event_windows(_t(spark, sf, "events"))


def _grain_select(grain: str) -> str:
    return f"""
    SELECT '{grain}' AS grain,
           date_trunc('{grain}', ts) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events GROUP BY bucket, event_type
    """


@query(
    "q46_rollup_cascade",
    " UNION ALL ".join(_grain_select(g) for g in ("hour", "day", "month")),
    doc="Hypertable-style rollup cascade: hour/day/month aggregates where "
    "each coarser grain RE-AGGREGATES the finer one (reaggregable stats "
    "only: counts + exact decimal sums). Spark's exchange reuse collapses "
    "the shared subtrees to ONE fact scan (plan-pinned); the oracle "
    "computes every grain directly from the raw events, so a MATCH "
    "certifies the reaggregation property, not just the plumbing.",
)
def q46(spark, sf):
    return rollup_cascade(_t(spark, sf, "events"))
