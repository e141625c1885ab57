"""Sliding-window distinct cardinality via mergeable HLL sketches.

"Distinct users in the trailing 24 h, every hour" is the observability
query exact methods cannot survive at scale: windows overlap, so an
exact rolling COUNT(DISTINCT) re-shuffles every key once *per window it
participates in*. Sketches fix the asymptotics because HyperLogLog
state is MERGEABLE: each (group, bucket) reduces to a fixed-size sketch
once, and a window is the union of its buckets' sketches — kilobytes
through the shuffle per window, regardless of key volume. This is the
same partial-aggregate property q52's sketch lanes certify, lifted from
"one global number" to "one number per sliding window". No reference
counterpart (SURVEY.md §2 Tier C).

Shape: the approx lane is an offset-explode — each bucket's sketch is
replicated once per window-end it belongs to (``trailing`` fixed-size
copies) and union-aggregated on (group, window_end); no window-function
state, no sort. The exact certification lane uses CONTRIBUTION
INTERVALS instead of a windowed count-distinct: a key's appearance in
bucket b is "the" occurrence for every window end up to its next
appearance (capped at ``trailing``), so exploding that range and
COUNTING rows yields the exact distinct count as a plain map-side-
combined sum — no Expand, no per-window key re-shuffle. The DuckDB
oracle recomputes the exact lane by the *other* algorithm
(offset-explode + COUNT(DISTINCT)), so a MATCH certifies two
independent formulations agree. Window ends are restricted to observed
buckets via one last equi join onto the bucket spine.

In-band contract (the q52 pattern): the emitted ``in_band`` boolean
asserts |approx − exact| ≤ max(abs_tol, rel_tol · exact) per window;
the DuckDB oracle recomputes the exact lane and asserts TRUE, so a
sketch drifting out of tolerance is a driver hash MISMATCH, not a
silent pass. Default tolerance 5% mirrors HLL++'s ~2.5% standard error
at lgConfigK=12 with slack for small-range windows (near-exact sparse
mode plus integer rounding).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import cert_slice_cond, nullsafe_group_cond


def rolling_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    group_cols: Sequence[str] = ("event_type",),
    grain: str = "hour",
    trailing: int = 24,
    rel_tol: float = 0.05,
    abs_tol: int = 2,
    exact_lane: bool = True,
    cert_fraction: float = 1.0,
) -> DataFrame:
    """Per (group, window-end-bucket) trailing-``trailing``-bucket
    distinct-``key_col`` counts.

    Returns the group columns plus ``bucket`` (window end, inclusive),
    ``n_approx`` (HLL union estimate) and — when ``exact_lane=True`` —
    ``n_exact`` and ``in_band``. Production at scale runs
    ``exact_lane=False`` (sketch lane only); the exact lane is the
    oracle-checkable certification (module docstring).

    ``cert_fraction`` < 1 restricts the whole certification run (both
    lanes — they must see the same population for ``in_band`` to mean
    anything) to a deterministic xxhash64 key-slice
    (functions/exprs.cert_slice_cond): at 100 TB the exact lane's
    appearance-level shuffles are the certification's cost, and a 1%
    slice certifies the sketch machinery at 1% of it. Default 1.0 =
    full exactness — the driver-oracle surface, byte-identical.
    """
    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    if cert_fraction != 1.0:
        df = df.where(cert_slice_cond(F.col(key_col), cert_fraction))
    gcols = list(group_cols)
    bucket = F.date_trunc(grain, F.col(ts_col)).alias("bucket")
    offs = F.explode(
        F.sequence(F.lit(0), F.lit(int(trailing) - 1))
    ).alias("_off")
    wend = F.expr(f"timestampadd({grain}, _off, bucket)").alias("wend")

    # Both lanes reduce over per-(group, bucket, key) DISTINCT
    # appearances: the HLL registers are insert-idempotent, so sketches
    # built over the deduped frame are bit-identical to sketches over
    # raw rows. Deduping ONCE here (map-side partial dedup, then one
    # appearance-keyed exchange) and deriving both lanes from it reads
    # and shuffles the raw events once instead of once per lane — the
    # two consumers are byte-identical subplans, so ReuseExchange
    # computes the dedup exchange once. NULL keys stay in the frame (a
    # bucket whose every key is NULL must still appear in the spine);
    # hll_sketch_agg skips them exactly like the raw-row form did, and
    # the exact lane filters them below.
    app = df.select(*gcols, bucket, F.col(key_col).alias("_k")).distinct()
    per_bucket = (
        app.groupBy(*gcols, "bucket")
        .agg(F.hll_sketch_agg("_k").alias("_sk"))
    )
    spine = per_bucket.select(*gcols, "bucket")
    approx = (
        per_bucket.select(*gcols, "bucket", "_sk", offs)
        .select(*gcols, wend, "_sk")
        .groupBy(*gcols, "wend")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("n_approx"))
    )
    # Only window ends that are themselves observed buckets (offsets past
    # a group's last bucket otherwise invent trailing ghost windows).
    # Shared-lineage frames need the aliased null-safe condition helper
    # (see functions/exprs.py nullsafe_group_cond for both whys).
    ap0, sp = approx.alias("ap0"), spine.alias("sp")
    approx = (
        ap0.join(
            sp,
            nullsafe_group_cond(
                "ap0",
                "sp",
                gcols,
                [F.col("ap0.wend") == F.col("sp.bucket")],
            ),
            "left_semi",
        )
        .withColumnRenamed("wend", "bucket")
    )
    if not exact_lane:
        return approx

    # Exact lane via CONTRIBUTION INTERVALS, not a windowed
    # count-distinct: a key appearing in bucket b is "the" occurrence for
    # every window end in [b, min(next_appearance - 1, b + trailing - 1)]
    # — so exploding that (≤ trailing-long) range and COUNTING rows gives
    # the distinct count per window with a plain partial-agg'd sum: no
    # Expand, no distinct-key re-shuffle per window. Shuffles:
    # appearance-dedup, one (group, key) window, one map-side-combined
    # count — each O(appearances), never O(appearances × trailing).
    from pyspark.sql import Window

    w_next = Window.partitionBy(*gcols, "_k").orderBy("bucket")
    span = F.least(
        F.lit(int(trailing) - 1),
        F.coalesce(
            F.expr(
                f"timestampdiff({grain}, bucket, _next) - 1"
            ).cast("int"),
            F.lit(int(trailing) - 1),
        ),
    )
    exact = (
        # NULL keys are not values under COUNT(DISTINCT) semantics (the
        # HLL lane and the DuckDB oracle both skip them) — but a WHERE
        # here would be pushed below the shared dedup into the scan,
        # giving this lane a different dedup subtree than the HLL lane's
        # and defeating the exchange reuse the sharing exists for
        # (verified in the executed plan: the pushed IsNotNull split the
        # one dedup into two full scans+shuffles). Let NULL-key rows
        # flow and count them OUT instead: COUNT(_k) skips NULLs, so
        # n_exact is identical while both lanes read ONE byte-identical
        # dedup exchange (ReusedExchange in the final plan). `app` is
        # already appearance-distinct (shared with the HLL lane above).
        app.withColumn("_next", F.lead("bucket").over(w_next))
        .select(
            *gcols, "bucket", "_k",
            F.explode(F.sequence(F.lit(0), span)).alias("_off"),
        )
        .select(*gcols, wend, "_k")
        .groupBy(*gcols, "wend")
        .agg(F.count(F.col("_k")).alias("n_exact"))
        .withColumnRenamed("wend", "bucket")
    )
    # LEFT join from the approx lane: a group whose every key is NULL
    # has windows with no exact rows at all — those windows keep
    # n_exact = 0 rather than vanishing.
    ap, ex = approx.alias("ap"), exact.alias("ex")
    cond = nullsafe_group_cond(
        "ap", "ex", gcols, [F.col("ap.bucket") == F.col("ex.bucket")]
    )
    out = ap.join(ex, cond, "left").select(
        *[F.col(f"ap.{c}") for c in gcols],
        F.col("ap.bucket").alias("bucket"),
        F.col("ap.n_approx").alias("n_approx"),
        F.coalesce(F.col("ex.n_exact"), F.lit(0)).alias("n_exact"),
    )
    return out.withColumn(
        "in_band",
        F.abs(F.col("n_approx") - F.col("n_exact"))
        <= F.greatest(
            F.lit(int(abs_tol)).cast("double"),
            F.lit(float(rel_tol)) * F.col("n_exact"),
        ),
    )


def rolling_exact_sql_duck(
    source_sql: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    group_col: str = "event_type",
    grain: str = "hour",
    trailing: int = 24,
) -> str:
    """DuckDB replay of the exact lane (single group column), for oracle
    checks — the identical offset-explode, so window semantics (trailing
    N observed-end buckets, inclusive) match by construction."""
    return f"""
    SELECT d.{group_col}, d.wend AS bucket,
           COUNT(DISTINCT d.k) AS n_exact
    FROM (
      SELECT b.{group_col}, b.k,
             b.bucket + o.off * INTERVAL 1 {grain.upper()} AS wend
      FROM (
        SELECT DISTINCT {group_col},
               date_trunc('{grain}', {ts_col}) AS bucket,
               {key_col} AS k
        FROM ({source_sql})
      ) b CROSS JOIN (
        SELECT unnest(range({int(trailing)})) AS off
      ) o
    ) d
    JOIN (
      SELECT DISTINCT {group_col}, date_trunc('{grain}', {ts_col}) AS bucket
      FROM ({source_sql})
    ) s ON d.{group_col} IS NOT DISTINCT FROM s.{group_col}
       AND d.wend = s.bucket
    GROUP BY d.{group_col}, d.wend
    """
