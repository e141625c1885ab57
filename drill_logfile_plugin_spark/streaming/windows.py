"""Event-time windowing operators, valid in both batch and streaming mode.

The reference is batch-only (its two classes contain no watermark/window/
state code — SURVEY.md §2 streaming row); this module is the Structured
Streaming extension tier. Every transformation here is a *pure function of
a DataFrame*, so the identical code path runs

* in **batch** (the driver's CORRECTNESS entries, queries_streaming.py,
  where the DuckDB oracle recomputes the window semantics independently),
* in **streaming** (``spark.readStream`` inputs; tests/test_streaming.py
  proves stream output == batch output on the same data).

Watermarks are applied only when the input actually streams: on a batch
DataFrame ``withWatermark`` is legal but meaningless, and skipping it keeps
batch plans trivially optimal.

Scale notes (100 TB posture): all three window shapes are single-shuffle
hash aggregations keyed on (window, group): partial aggregation happens
map-side, and sliding windows multiply input by exactly
``window/slide`` (3× here) *before* the partial agg, not in state. Session
windows shuffle on the session key (user_id) so state for one user never
spans executors.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from ..functions.exprs import dsum


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        # Watermarks require TIMESTAMP (LTZ); parquet written without
        # isAdjustedToUTC infers TIMESTAMP_NTZ under Spark 4's default
        # inferTimestampNTZ. configure_session pins the session timezone to
        # UTC, so this cast relabels the same instant rather than shifting it.
        # Batch inputs are left untouched — the driver's oracle comparisons
        # see the type the scan produced.
        if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
            df = df.withColumn(ts_col, F.col(ts_col).cast(TimestampType()))
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_event_counts(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-(hour, event_type) counts and exact-decimal value sums.

    Output: win_start, win_end, event_type, n_events, sum_value.
    """
    g = _with_watermark(df, ts_col, watermark).groupBy(
        F.window(ts_col, window).alias("w"), "event_type"
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    ).select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sliding_event_counts(
    df: DataFrame,
    window: str = "30 minutes",
    slide: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Overlapping-window activity: each event lands in window/slide buckets.

    Output: win_start, win_end, n_events, sum_value.

    Note on distinct counts: exact ``countDistinct`` is illegal on a
    streaming DataFrame (unbounded per-window distinct state); the
    streaming-native answers are ``approx_count_distinct`` (HLL state) or a
    ``dropDuplicates`` stage feeding a second windowed count. This operator
    sticks to fully-streamable exact aggregates so batch == stream holds
    bit-for-bit.
    """
    g = _with_watermark(df, ts_col, watermark).groupBy(
        F.window(ts_col, window, slide).alias("w")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    ).select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "n_events",
        "sum_value",
    )


def session_event_windows(
    df: DataFrame,
    gap: str = "15 minutes",
    ts_col: str = "ts",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Per-user sessions: events closer than ``gap`` merge into one session.

    Session end = last event + gap (Spark ``session_window`` semantics;
    the window is [start, end), so an event exactly ``gap`` later starts a
    new session).

    Output: user_id, session_start, session_end, n_events.
    """
    g = _with_watermark(df, ts_col, watermark).groupBy(
        F.session_window(ts_col, gap).alias("w"), "user_id"
    )
    return g.agg(F.count(F.lit(1)).alias("n_events")).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def dedup_events(
    df: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type", "value"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup valid in both modes — the streaming face of the dedup
    tier (operators/dedup.py holds the batch corpus operators).

    Batch: plain ``dropDuplicates(keys)``. Streaming:
    ``dropDuplicatesWithinWatermark`` after a watermark, so the dedup
    state is bounded by the watermark horizon instead of growing one
    entry per key forever — the difference between a stream that runs
    for a day and one that runs for a year. Duplicates arriving later
    than the watermark are consciously admitted (the same late-data
    contract as every windowed aggregate here).

    At 100 TB-scale ingest the keys should be a content hash (the exact
    dedup policy from the batch tier: hash first, shuffle 32 bytes),
    which this accepts as ``keys=("content_hash",)``.
    """
    if df.isStreaming:
        return _with_watermark(df, ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


# --- custom stateful operator (streaming-only) -----------------------------

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
    ]
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, exact value sum).

    ``applyInPandasWithState`` over a streaming DataFrame grouped by
    user_id; each micro-batch folds its rows into the per-key state and
    emits the updated totals. The value sum is kept in integer cents so the
    state is exact regardless of arrival order — same determinism policy as
    the batch tier (functions/exprs.py).

    Batch equivalence (tested): after processing all input, the last emitted
    row per user equals ``groupBy(user_id).agg(count, sum(cents))``.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            # round() matches decimal(12,2) semantics for 2-decimal doubles.
            cents += int(sum(round(v * 100) for v in pdf["value"]))
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value_cents": [cents],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
    ]
)

#: (session_start_ns, last_event_ns, n_events, sum_value_cents)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    gap: str = "15 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful sessionization with event-time timeout.

    The declarative ``session_window`` (session_event_windows) covers plain
    per-session aggregates; this operator is the shape you need when the
    session close itself must run custom logic (here: emitting an exact
    integer-cents value sum alongside the window — in production: conversion
    attribution, session labeling, funnel state machines).

    Mechanics: grouped by user_id; each micro-batch's rows are folded into
    the per-key open session (vectorized — session boundaries via a numpy
    diff-threshold cumsum, not a Python row loop). A session closes either
    when a later event for the same key arrives past the gap (emitted
    immediately) or when the watermark passes ``last_event + gap``
    (``GroupStateTimeout.EventTimeTimeout`` fires with no new rows and the
    state is evicted). Session end is ``last event + gap`` — identical to
    ``session_window`` semantics, which is what the stream==batch test pins.

    Scale posture: state per key = 4 longs regardless of session length;
    keys shuffle once on user_id so a key's state never spans executors;
    eviction is watermark-driven so state size tracks *active* users, not
    all users ever seen.

    Late-data contract (narrower than ``session_window``, by design): a
    micro-batch's events are merged with the OPEN session by the full
    interval-overlap rule — out-of-order arrivals within a batch, events
    earlier than the open session's start, and a state session bridging
    two batch sessions all merge with the correct (minimum) start. What
    does NOT merge: a session already *emitted* (closed by a later event
    in a previous batch) cannot absorb a still-within-watermark straggler
    from a later batch — that straggler starts a new session. Reopening
    emitted sessions would require buffering every closed session until
    the watermark passes (unbounded state) or retraction support;
    keeping per-key state at 4 longs is the point of this operator. Use
    the declarative ``session_window`` path when exact late-data merging
    across micro-batches matters more than custom close logic.
    """
    gap_ns = int(pd.Timedelta(gap).value)

    def _frame(user_id, start_ns, last_ns, n, cents) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ns)],
                "session_end": [pd.Timestamp(last_ns + gap_ns)],
                "n_events": [n],
                "sum_value_cents": [cents],
            }
        )

    def update(key, pdfs, state) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        if state.hasTimedOut:
            start_ns, last_ns, n, cents = state.get
            state.remove()
            yield _frame(user_id, start_ns, last_ns, n, cents)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        t = rows[ts_col].astype("int64").to_numpy()
        c = rows["value"].to_numpy() * 100
        c = np.rint(c).astype("int64")

        # Vectorized session split: a gap >= gap_ns starts a new session.
        is_new = np.ones(len(t), dtype=bool)
        is_new[1:] = (t[1:] - t[:-1]) >= gap_ns
        idx = np.flatnonzero(is_new)
        starts = t[idx]
        ends = t[np.append(idx[1:] - 1, len(t) - 1)]
        counts = np.diff(np.append(idx, len(t)))
        sums = np.add.reduceat(c, idx)

        # Merge the open state session into the batch's session list as one
        # more interval, then sweep-merge by the gap rule (two sessions
        # merge iff next.start - prev.end < gap, i.e. [start, end+gap)
        # overlap — session_window's rule). This handles a batch whose
        # events land BEFORE the open session's start (the merged start is
        # the true minimum, not the state's start) and a state session that
        # bridges two batch sessions. The loop is over sessions, not
        # events — a handful of iterations per key per micro-batch.
        sess = list(
            zip(starts.tolist(), ends.tolist(), counts.tolist(), sums.tolist())
        )
        if state.exists:
            sess.append(state.get)
            sess.sort(key=lambda s: s[0])
        merged: list[tuple] = []
        for s in sess:
            if merged and s[0] - merged[-1][1] < gap_ns:
                p = merged[-1]
                merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                merged.append(s)

        for s in merged[:-1]:  # all but the last are closed
            yield _frame(user_id, s[0], s[1], int(s[2]), int(s[3]))
        last = merged[-1]
        state.update((int(last[0]), int(last[1]), int(last[2]), int(last[3])))
        state.setTimeoutTimestamp((int(last[1]) + gap_ns) // 1_000_000)

    return (
        _with_watermark(events, ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
        StructField("version_n", LongType()),
    ]
)

#: (attr, attr_is_null, open_from_ns, last_ns, last_eid, version_n)
SCD2_STATE_SCHEMA = StructType(
    [
        StructField("attr", StringType()),
        StructField("attr_is_null", BooleanType()),
        StructField("open_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("last_eid", LongType()),
        StructField("version_n", LongType()),
    ]
)


def scd2_stateful(
    changes: DataFrame,
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
    watermark: str | None = None,
) -> DataFrame:
    """Incremental SCD type-2: the streaming lane of
    ``operators/versioning.py scd2_history``.

    Grouped by user_id with ``applyInPandasWithState``; per-key state is
    the ONE open version (attr + a NULL flag, its open timestamp, the
    last processed (ts, event_id), version counter — six scalars
    regardless of history length). Each micro-batch's rows fold in
    (ts, event_id) order with the batch operator's exact change rule:
    null-safe attr comparison, unchanged observations compressed away, a
    change closing the open version. CLOSED versions are emitted
    (append mode); the open version stays in state, exactly as the batch
    history's ``valid_to IS NULL`` row — so after draining any prefix of
    the log, emitted rows == ``scd2_history(prefix).where(valid_to IS
    NOT NULL)`` (the stream==batch pytest contract).

    Late-data contract: a row at or before the per-key high-water mark
    (ts, event_id) is DROPPED — an SCD2 history is an ordered fold, and
    retro-inserting a version would mean retracting already-emitted
    rows, which append-mode streaming cannot do. Feed late-tolerant
    rebuilds through the batch operator instead; the state keeps the
    high-water mark per key precisely so the drop is deterministic, not
    racy. Within a micro-batch, arrival order is irrelevant (rows are
    sorted before folding).

    Scale posture: one shuffle on user_id; state size tracks keys, not
    observations; no timeout — a dimension key's open version must
    outlive any watermark horizon (pass ``watermark`` only to bound
    OTHER stateful ops composed downstream; it does not evict here).
    """

    def update(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            attr, attr_null, open_ns, last_ns, last_eid, ver = state.get
        else:
            attr, attr_null, open_ns, last_ns, last_eid, ver = (
                None, True, None, None, None, 0,
            )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, tiebreak_col])
        out_attr, out_from, out_to, out_ver = [], [], [], []
        for ts, eid, a in zip(
            rows[ts_col].astype("int64").to_numpy(),
            rows[tiebreak_col].to_numpy(),
            rows[attr_col],
        ):
            ts, eid = int(ts), int(eid)
            if last_ns is not None and (ts, eid) <= (last_ns, last_eid):
                continue  # late or duplicate: the fold is append-only
            a_null = a is None or (isinstance(a, float) and pd.isna(a))
            a_val = None if a_null else str(a)
            if ver == 0:
                open_ns, ver = ts, 1
                attr, attr_null = a_val, a_null
            elif (a_null != attr_null) or (not a_null and a_val != attr):
                out_attr.append(attr)
                out_from.append(pd.Timestamp(open_ns))
                out_to.append(pd.Timestamp(ts))
                out_ver.append(ver)
                open_ns, ver = ts, ver + 1
                attr, attr_null = a_val, a_null
            last_ns, last_eid = ts, eid
        state.update((attr, attr_null, open_ns, last_ns, last_eid, ver))
        if out_ver:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ver),
                    "event_type": out_attr,
                    "valid_from": out_from,
                    "valid_to": out_to,
                    "version_n": out_ver,
                }
            )

    src = _with_watermark(changes, ts_col, watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def event_followups(
    df: DataFrame,
    first_type: str = "view",
    then_type: str = "purchase",
    within: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval self-join: per-user followup correlation.

    Pairs every ``first_type`` event with the same user's ``then_type``
    events that happen within ``within`` afterwards — the funnel /
    attribution query (view→purchase, error→retry). Output:
    (user_id, first_id, then_id, first_ts, then_ts, lag_us) — lag in
    MICROSECONDS (``unix_micros`` difference; divide by 1e6 for seconds).

    Batch: a plain equi join on user plus the time-range predicate.
    Streaming: the SAME function is a Spark stream-stream inner join —
    both sides get watermarks and the join condition carries the
    event-time bound, so each side's buffered state is evicted once the
    watermark passes ``ts + within`` (bounded state; an unbounded
    stream-stream join would grow forever). Inner joins emit matches
    immediately; the watermark only governs state cleanup, so
    stream==batch on complete input (proven in tests/test_streaming.py).

    Scale posture: one shuffle on user_id for each side; the range
    predicate is evaluated post-join within user groups, and per-user
    event counts bound the pair fan-out.
    """
    a = df.where(F.col("event_type") == first_type).select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("first_id"),
        F.col(ts_col).alias("first_ts"),
    )
    b = df.where(F.col("event_type") == then_type).select(
        F.col(user_col).alias("u2"),
        F.col("event_id").alias("then_id"),
        F.col(ts_col).alias("then_ts"),
    )
    if df.isStreaming:
        a = _with_watermark(a, "first_ts", watermark)
        b = _with_watermark(b, "then_ts", watermark)
    joined = a.join(
        b,
        (F.col("user_id") == F.col("u2"))
        & (F.col("then_ts") > F.col("first_ts"))
        & (F.col("then_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        "user_id",
        "first_id",
        "then_id",
        "first_ts",
        "then_ts",
        (
            # cast: unix_micros requires TIMESTAMP; NTZ batch inputs
            # relabel to the same instant under the pinned UTC session tz.
            F.unix_micros(F.col("then_ts").cast(TimestampType()))
            - F.unix_micros(F.col("first_ts").cast(TimestampType()))
        ).alias("lag_us"),
    )


# --- streaming burst detection (stateful spike_flags) ---------------------

SPIKE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", TimestampType()),
        StructField("cnt", LongType()),
        StructField("n_trail", LongType()),
        StructField("z_num", LongType()),
        StructField("z_den2", LongType()),
        StructField("spike", BooleanType()),
    ]
)

#: last_closed = epoch-grain index of the newest finalized bucket
#: (LAST_CLOSED_NONE before any); trail = counts of the most recent
#: closed buckets, oldest -> newest, len <= trailing; open_b/open_c =
#: parallel arrays of still-open bucket indices and their running counts.
SPIKE_STATE_SCHEMA = StructType(
    [
        StructField("last_closed", LongType()),
        StructField("trail", ArrayType(LongType())),
        StructField("open_b", ArrayType(LongType())),
        StructField("open_c", ArrayType(LongType())),
    ]
)

LAST_CLOSED_NONE = -(1 << 62)


def spike_flags_stateful(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    grain: str = "hour",
    trailing: int = 6,
    k: int = 2,
    min_trailing: int = 3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming counterpart of :func:`~..operators.anomaly.spike_flags`:
    trailing-window integer z-score burst verdicts, emitted as the
    watermark FINALIZES each bucket — the alerting shape, where batch
    recomputation would mean the page arrives a day late.

    Mechanics (the sessionize_stateful pattern): keyed by ``group_col``
    via ``applyInPandasWithState`` + EventTimeTimeout. State per key is
    the trailing verdict context (≤ ``trailing`` closed counts), the
    newest finalized bucket index, and the open buckets still inside the
    watermark horizon — O(trailing + horizon/grain) longs per group
    regardless of event volume. A bucket finalizes when the watermark
    passes its end (via a later event for the key or the event-time
    timeout); interior empty buckets finalize as zero-count rows, so the
    verdict math sees the same gap-filled axis as the batch operator —
    which is exactly what the stream==batch test pins (identical
    z_num/z_den2/spike per finalized bucket).

    Late-data contract: an event later than the watermark horizon for an
    already-finalized bucket is dropped by the watermark (standard
    append-mode semantics); verdicts are never retracted.
    """
    # Fixed-length grains only: bucket identity is integer division of
    # the epoch, so variable-length months (and pandas-rejected weeks,
    # which also misalign with date_trunc's Monday start) cannot be
    # expressed — the batch operator covers those via date_trunc/gapfill.
    fixed_ns = {
        "second": 1_000_000_000,
        "minute": 60 * 1_000_000_000,
        "hour": 3_600 * 1_000_000_000,
        "day": 86_400 * 1_000_000_000,
    }
    if grain not in fixed_ns:
        raise ValueError(
            f"spike_flags_stateful supports fixed-length grains "
            f"{sorted(fixed_ns)}; got {grain!r} (use the batch operator "
            "for week/month)"
        )
    grain_ns = fixed_ns[grain]
    grain_ms = grain_ns // 1_000_000
    k2 = int(k) * int(k)
    trailing = int(trailing)

    def _verdict(trail: list, cnt: int):
        n = len(trail)
        if n == 0:
            return 0, None, None, False
        s = sum(trail)
        ss = sum(x * x for x in trail)
        z_num = n * cnt - s
        z_den2 = n * ss - s * s
        spike = (
            n >= int(min_trailing) and z_num > 0 and z_num * z_num > k2 * z_den2
        )
        return n, z_num, z_den2, spike

    def _close(gname, last_closed, trail, to_close):
        """Finalize buckets (ascending), zero-filling interior gaps."""
        out_rows = []
        for b, cnt in to_close:
            fill_from = (
                b if last_closed == LAST_CLOSED_NONE else last_closed + 1
            )
            for g in range(fill_from, b + 1):
                c = cnt if g == b else 0
                n, z_num, z_den2, spike = _verdict(trail, c)
                out_rows.append((gname, pd.Timestamp(g * grain_ns), c, n,
                                 z_num, z_den2, spike))
                trail.append(c)
                del trail[:-trailing]
            last_closed = b
        return last_closed, trail, out_rows

    def update(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (gname,) = key
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            last_closed, trail, open_b, open_c = state.get
            trail = list(trail)
            opens = dict(zip(open_b, open_c))
        else:
            last_closed, trail, opens = LAST_CLOSED_NONE, [], {}

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            b = (
                rows[ts_col].astype("datetime64[ns]").astype("int64")
                // grain_ns
            ).to_numpy()
            import numpy as np

            uniq, counts = np.unique(b, return_counts=True)
            for bi, ci in zip(uniq.tolist(), counts.tolist()):
                if bi > last_closed:  # late-beyond-horizon rows drop
                    opens[bi] = opens.get(bi, 0) + ci

        to_close = sorted(
            (b, c) for b, c in opens.items() if (b + 1) * grain_ms <= wm_ms
        )
        for b, _ in to_close:
            del opens[b]
        last_closed, trail, out_rows = _close(
            gname, last_closed, trail, to_close
        )
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "event_type", "bucket", "cnt", "n_trail",
                    "z_num", "z_den2", "spike",
                ],
            )
        state.update((
            last_closed,
            trail,
            sorted(opens),
            [opens[b] for b in sorted(opens)],
        ))
        if opens:
            state.setTimeoutTimestamp((min(opens) + 1) * grain_ms)

    return (
        _with_watermark(events, ts_col, watermark)
        .select(F.col(group_col).alias("event_type"), ts_col)
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=SPIKE_OUTPUT_SCHEMA,
            stateStructType=SPIKE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def sliding_unique_users(
    df: DataFrame,
    window: str = "24 hours",
    slide: str = "1 hour",
    key_col: str = "user_id",
    group_col: str = "event_type",
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Streaming-native sliding-window distinct cardinality: the live
    counterpart of operators/rolling.rolling_distinct's sketch lane,
    expressed declaratively — each event lands in window/slide
    overlapping buckets and ``approx_count_distinct`` keeps fixed-size
    HLL state per (window, group) that the watermark evicts. Exact
    countDistinct is illegal on streams (unbounded per-window distinct
    state — the same asymmetry the batch operator's two lanes measure);
    the sketch IS the streamable answer, and the batch-mode run of this
    very function is what a certification pass compares against.

    Output: group_col, win_start, win_end, n_approx.
    """
    g = _with_watermark(df, ts_col, watermark).groupBy(
        F.window(ts_col, window, slide).alias("w"), group_col
    )
    return g.agg(
        F.approx_count_distinct(key_col).alias("n_approx")
    ).select(
        group_col,
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "n_approx",
    )
