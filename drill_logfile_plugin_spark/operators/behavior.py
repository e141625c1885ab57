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

The module also carries the window-shaped behavior operators — batch
:func:`sessionize` (+ :func:`session_stats`), where the per-user sort IS
the semantics (gap detection needs adjacent-event order), and
:func:`rolling_time_sum` (trailing time-RANGE aggregates). Both cost
exactly one shuffle on their partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    # NULL conversion when nobody reached stage 0: a bare division would
    # crash under Spark's default ANSI mode (DIVIDE_BY_ZERO) for library
    # consumers outside this repo's configure_session; the oracle mirrors
    # the same CASE, so both engines emit NULL.
    return counts.crossJoin(F.broadcast(first)).select(
        "stage_idx",
        "stage",
        "n_users",
        F.when(
            F.col("n_first") > 0,
            F.col("n_users").cast("double") / F.col("n_first").cast("double"),
        ).alias("conversion"),
    )


def funnel_sql_duck(
    stages: list[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> str:
    """DuckDB mirror of :func:`funnel` (same chaining, same guarded
    division). Stage names are escaped into the SQL literals (an
    apostrophe in an event-type name must not truncate the string —
    the template_masks_sql_duck escape convention)."""
    esc = [s.replace("'", "''") for s in stages]
    ctes = [
        f"""r0 AS (
      SELECT {user_col} AS user_id, MIN({ts_col}) AS t FROM {table}
      WHERE {type_col} = '{esc[0]}' GROUP BY {user_col}
    )"""
    ]
    win = (
        f" AND e.{ts_col} <= p.t + INTERVAL '{within_seconds} seconds'"
        if within_seconds is not None
        else ""
    )
    for i, stage in enumerate(esc[1:], start=1):
        ctes.append(
            f"""r{i} AS (
      SELECT e.{user_col} AS user_id, MIN(e.{ts_col}) AS t
      FROM {table} e JOIN r{i - 1} p ON e.{user_col} = p.user_id
      WHERE e.{type_col} = '{stage}' AND e.{ts_col} > p.t{win}
      GROUP BY e.{user_col}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS stage_idx, '{es}' AS stage, COUNT(*) AS n_users FROM r{i}"
        for i, es in enumerate(esc)
    )
    return f"""
    WITH {", ".join(ctes)},
    counts AS ({selects})
    SELECT stage_idx, stage, n_users,
           CASE WHEN (SELECT n_users FROM counts WHERE stage_idx = 0) > 0
                THEN CAST(n_users AS DOUBLE) /
                     CAST((SELECT n_users FROM counts WHERE stage_idx = 0)
                          AS DOUBLE)
           END AS conversion
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


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: assign a per-user session index to every event.

    The batch complement of ``streaming/windows.py sessionize_stateful``:
    a new session starts at a user's first event and whenever the gap to
    the previous event exceeds ``gap_seconds``. Output = input columns +
    ``session_idx`` (1-based per user) — the event-level assignment that
    session_window/stateful streaming cannot give you retroactively over
    historical data.

    Two classic window steps over ONE partitioning: (1) ``lag`` of the
    event time marks session starts (integer microsecond comparison —
    engine-exact); (2) a running SUM of the start flags numbers the
    sessions. Both windows share (user, ts, id) partitioning+ordering, so
    Spark plans one exchange and one sort; ``id_col`` tiebreaks equal
    timestamps for a total, engine-stable order.

    Scale posture (10^12 events): one shuffle on user_id; per-user event
    counts bound the sort. No driver collects, no Python. State is nothing
    — unlike the streaming path there is no watermark horizon, the whole
    history is visible.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # cast: unix_micros requires TIMESTAMP; parquet NTZ timestamps
    # reinterpret exactly under the engine's pinned UTC session zone.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    # gap in Python-int microseconds: a Spark-side INT*INT product would
    # silently wrap past 2^31 (86400s * 1e6 us does).
    gap_us = int(gap_seconds) * 1_000_000
    is_new = (
        F.when(prev.isNull() | (us - prev > F.lit(gap_us)), 1)
        .otherwise(0)
        .alias("is_new")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_is_new", is_new)
        .withColumn("session_idx", F.sum("_is_new").over(run))
        .drop("_is_new")
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup of a :func:`sessionize` output.

    Returns (user_id, session_idx, n_events, start_ts, end_ts,
    duration_s). Duration is an integer microsecond difference divided by
    1e6 — both steps correctly-rounded IEEE ops, so the double is
    bit-identical cross-engine.

    The groupBy keys (user, session_idx) are a superset of sessionize's
    window partitioning (user), so the aggregation reuses the existing
    hash partitioning — no second exchange (plan-pinned in
    tests/test_plans.py).
    """
    return (
        sessions.groupBy(
            F.col(user_col).alias("user_id"), F.col("session_idx")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .withColumn(
            "duration_s",
            (
                F.unix_micros(F.col("end_ts").cast("timestamp"))
                - F.unix_micros(F.col("start_ts").cast("timestamp"))
            ).cast("double")
            / F.lit(1000000.0),
        )
    )


def session_stats_sql_duck(
    gap_seconds: int = 1800,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror of ``session_stats(sessionize(...))``."""
    gap_us = gap_seconds * 1_000_000
    return f"""
    WITH tagged AS (
      SELECT {user_col} AS user_id, {id_col} AS event_id, {ts_col} AS ts,
             CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
                       OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w
                          > {gap_us}
                  THEN 1 ELSE 0 END AS is_new
      FROM {table}
      WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
               AS session_idx
      FROM tagged
    )
    SELECT user_id, session_idx, COUNT(*) AS n_events,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1000000.0
             AS duration_s
    FROM sess GROUP BY user_id, session_idx
    """


def session_journeys(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Mine per-session event-type journeys and their frequencies.

    The "common paths" view every product-analytics stack publishes —
    and, for an LLM pipeline, the step that turns raw interaction logs
    into ordered training traces: each session becomes its ordered
    event-type string (``view>view>purchase``), then identical journeys
    aggregate. Returns (journey, n_sessions, n_users, min_user).

    Ordering is engine-exact: events sort by (ts, id) INSIDE the
    aggregation via ``array_sort`` over (ts, id, type) structs (collect
    order is nondeterministic in a distributed engine — sorting the
    collected array is the portable idiom; the DuckDB mirror's
    ``string_agg(... ORDER BY ts, id)`` is the same total order). NULL
    event types map to a sentinel ('∅') BEFORE joining — both engines'
    aggregators would otherwise silently skip the element, which is a
    data bug masquerading as a shorter journey.

    Scale posture: composes :func:`sessionize` (one user_id shuffle);
    the per-session collect reuses that partitioning (grouping keys ⊇
    window partition key — no second exchange); the journey count then
    shuffles one bounded string per SESSION (length ≤ events-per-session
    × type width), partial-agg'd map-side. At truly web-scale journey
    cardinality, shuffle 2×xxhash64(journey) keys and carry
    ``min(journey)`` as the representative — the strip_boilerplate key
    discipline; at this corpus's cardinality the plain string key is the
    honest, simpler plan.
    """
    s = sessionize(
        events, gap_seconds=gap_seconds, user_col=user_col,
        ts_col=ts_col, id_col=id_col,
    )
    per_session = s.groupBy(
        F.col(user_col).alias("user_id"), F.col("session_idx")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("ts"),
                            F.col(id_col).alias("eid"),
                            F.coalesce(
                                F.col(type_col), F.lit("∅")
                            ).alias("t"),
                        )
                    )
                ),
                lambda x: x["t"],
            ),
            ">",
        ).alias("journey")
    )
    return per_session.groupBy("journey").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("user_id").alias("min_user"),
    )


def session_journeys_sql_duck(
    gap_seconds: int = 1800,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB mirror of :func:`session_journeys`."""
    gap_us = gap_seconds * 1_000_000
    return f"""
    WITH tagged AS (
      SELECT {user_col} AS user_id, {id_col} AS event_id, {ts_col} AS ts,
             COALESCE({type_col}, '∅') AS etype,
             CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
                       OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w
                          > {gap_us}
                  THEN 1 ELSE 0 END AS is_new
      FROM {table}
      WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})
    ), sess AS (
      SELECT user_id, event_id, ts, etype,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
               AS session_idx
      FROM tagged
    ), j AS (
      SELECT user_id, session_idx,
             string_agg(etype, '>' ORDER BY ts, event_id) AS journey
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT journey, COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(user_id) AS min_user
    FROM j GROUP BY journey
    """


def rolling_time_sum(
    df: DataFrame,
    part_col: str,
    date_col: str,
    value_col: str,
    days: int = 30,
    out_col: str = "rolling_sum",
) -> DataFrame:
    """Rolling time-RANGE sum: per-key trailing-``days`` window aggregate.

    The moving-aggregate shape ROWS frames cannot express: "spend over
    the last 30 days" must include every row whose date falls in the
    interval, however many rows that is, and rows sharing the current
    date are peers (all included). Implemented as a RANGE frame over the
    integer day number (``unix_date``), bounds [-days, 0] — identical
    semantics to SQL's ``RANGE BETWEEN INTERVAL n DAYS PRECEDING AND
    CURRENT ROW``.

    The sum accumulates in DECIMAL(18,2) (order-independent — stable
    under any partial ordering) and lands as a double.

    Scale posture: one shuffle on ``part_col``, one sort per partition;
    Spark evaluates RANGE frames with a sliding two-pointer pass, O(rows)
    per key, state bounded by the widest in-window peer set.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.unix_date(F.col(date_col).cast("date")))
        .rangeBetween(-days, 0)
    )
    return df.withColumn(
        out_col,
        F.sum(F.col(value_col).cast("decimal(18,2)")).over(w).cast("double"),
    )
