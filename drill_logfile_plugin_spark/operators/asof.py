"""As-of join: attach the most recent right-side row to each left row.

Spark has no native as-of join (the reference's host engine doesn't
either); this is the canonical custom-operator composition the build spec
calls for — expressed entirely with built-ins so Catalyst owns the
physical plan:

1. tag both inputs and ``unionByName`` them (right rows carry the payload
   columns, left rows carry null there),
2. one window per key, ordered by (event time, side), running
   ``last(payload, ignorenulls=True)`` — each left row sees the latest
   right payload with ``right_ts <= left_ts`` (right sorts before left on
   ties, giving <= semantics),
3. keep the left rows.

Scale shape: ONE shuffle (the window partitionBy key) over left+right
concatenated — the same cost class as a sort-merge join, no per-key
driver loops, no range explosion. Skewed keys behave exactly like a
skewed window (hot key → one partition), mitigated upstream by salting
the key if needed (functions/skew.py).

Determinism contract: callers must make ``right_ts`` unique per key
(pre-aggregate the right side to one row per (key, ts)) — with duplicate
timestamps "the most recent row" is ambiguous in ANY engine (DuckDB's
ASOF JOIN picks an arbitrary one), and the driver-checked query q44
pre-aggregates for exactly this reason.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_RTS = "__asof_right_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``right_ts <= left_ts`` for the same key.

    Output = all left columns + the right side's non-key, non-ts payload
    columns (nullable). ``how='inner'`` drops left rows with no prior
    right row; ``how='left'`` keeps them with null payload.

    ``tolerance`` (optional, a SQL interval string like ``'30 minutes'``)
    is the max staleness pandas ``merge_asof``/kdb ``wj`` users expect: a
    prior right row older than ``left_ts - tolerance`` is treated as NO
    match (null payload / dropped under inner), not a stale one — a
    quote from last week should not price today's trade. Implemented as
    a post-window predicate on the matched right timestamp, so it adds
    zero exchanges. DuckDB's ASOF JOIN has no tolerance clause, so the
    knob is pytest-pinned rather than oracle-checked (q44 runs the
    default tolerance=None, which IS the DuckDB semantics).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner or left, not {how!r}")
    payload_cols = [
        c for c in right.columns if c not in on and c != right_ts
    ]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left: {sorted(overlap)}"
        )
    matched = "__asof_matched"
    l_tagged = left.withColumn(
        _TS, F.col(left_ts).cast("timestamp")
    ).withColumn(_SIDE, F.lit(1))
    r_tagged = (
        right.select(
            *on, F.col(right_ts).cast("timestamp").alias(_TS), *payload_cols
        )
        .withColumn(_SIDE, F.lit(0))
        # non-null marker rides along so `inner` can distinguish "no prior
        # right row" from "prior right row whose payload is all null"
        .withColumn(matched, F.lit(True))
        .withColumn(_RTS, F.col(_TS))
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [*payload_cols, matched, _RTS]
    filled = u.select(
        *[c for c in u.columns if c not in fill_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
    )
    out = filled.where(F.col(_SIDE) == 1)
    if tolerance is not None:
        ok = F.col(matched) & (
            F.col(_RTS) >= F.col(_TS) - F.expr(f"INTERVAL {tolerance}")
        )
        out = out.select(
            *[c for c in out.columns if c not in (*payload_cols, matched)],
            *[
                F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in payload_cols
            ],
            ok.alias(matched),
        )
    if how == "inner":
        out = out.where(F.col(matched))
    return out.drop(_SIDE, _TS, matched, _RTS)
