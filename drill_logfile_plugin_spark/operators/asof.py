"""As-of join: attach the most recent right-side row to each left row.

Spark has no native as-of join (the reference's host engine doesn't
either); this is the canonical custom-operator composition the build spec
calls for — expressed entirely with built-ins so Catalyst owns the
physical plan:

1. tag both inputs and ``unionByName`` them (right rows carry the payload
   columns, left rows carry null there),
2. one window per key, ordered by (event time, side, payload), running
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
_PAY = "__asof_payload"


def _orderable(dt) -> bool:
    """Whether a window can ORDER BY a column of this type. Maps are the
    one unorderable family (AnalysisException at plan time); arrays and
    structs are orderable iff their element/field types are."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


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
    l_tagged = left.withColumn(
        _TS, F.col(left_ts).cast("timestamp")
    ).withColumn(_SIDE, F.lit(1))
    # The right side's payload rides as ONE struct, so the fill picks the
    # whole latest right ROW atomically. Filling each column separately
    # (last(c, ignorenulls) per column) would compose the match from
    # DIFFERENT right rows whenever the true as-of row has a NULL field —
    # fabricating a row that never existed and letting a stale field slip
    # past the tolerance check (the tolerance predicate sees the newer
    # row's timestamp). The struct itself is non-null for every right row
    # (even all-NULL payloads), which is also the matched marker.
    #
    # Right rows with a NULL (or uncastable) right_ts are dropped: they
    # have no position on the as-of axis, but NULLS-FIRST window order
    # would make one a universal "oldest" match for every left row with
    # no real prior row (pandas merge_asof raises on null keys; dropping
    # is the declarative equivalent).
    r_tagged = (
        right.select(
            *on, F.col(right_ts).cast("timestamp").alias(_TS), *payload_cols
        )
        .where(F.col(_TS).isNotNull())
        .withColumn(_SIDE, F.lit(0))
        .withColumn(
            _PAY,
            F.struct(
                F.col(_TS).alias(_RTS),
                *[F.col(c) for c in payload_cols],
            ),
        )
        # the bare payload columns now live inside the struct only — a
        # duplicate top-level name would shadow the extracted fields
        .drop(*payload_cols)
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # _PAY as the final sort key makes duplicate (key, right_ts) right rows
    # resolve DETERMINISTICALLY: last() picks the struct-largest payload
    # (field-lexicographic), stable across runs and partitionings instead
    # of whichever row the sort happened to emit last. Left rows order NULL
    # there (NULLS FIRST), which is irrelevant — they contribute no payload.
    # The unique-right_ts contract above remains the portable semantics
    # (DuckDB ASOF/pandas merge_asof break ties their own ways); this pin
    # is about run-to-run reproducibility, and requires payload columns to
    # be orderable types (true of every Spark atomic/array/struct type but
    # NOT maps) — an unorderable payload falls back to the (_TS, _SIDE)
    # ordering, keeping such joins working at the cost of the tie pin.
    order_keys = [F.col(_TS), F.col(_SIDE)]
    if all(_orderable(right.schema[c].dataType) for c in payload_cols):
        order_keys.append(F.col(_PAY))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c != _PAY],
        F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
    ).where(F.col(_SIDE) == 1)
    ok = F.col(_PAY).isNotNull()
    if tolerance is not None:
        ok = ok & (
            F.col(_PAY)[_RTS]
            >= F.col(_TS) - F.expr(f"INTERVAL {tolerance}")
        )
    out = filled.select(
        *[c for c in filled.columns if c not in (_SIDE, _TS, _PAY)],
        *[
            F.when(ok, F.col(_PAY)[c]).alias(c)
            for c in payload_cols
        ],
        ok.alias("__asof_ok"),
    )
    if how == "inner":
        out = out.where(F.col("__asof_ok"))
    return out.drop("__asof_ok")
