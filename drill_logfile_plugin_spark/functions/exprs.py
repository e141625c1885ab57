"""Expression helpers shared by the query surface.

Determinism policy for floating-point aggregates
------------------------------------------------
A distributed SUM over doubles is order-dependent: Spark's partial
aggregation tree and a single-node engine (the DuckDB oracle, or a 10×
bigger cluster) accumulate in different orders and can disagree in the last
ulps. Worse, ``CAST(double AS DECIMAL)`` itself is only cross-engine
deterministic when the target scale is far from the double's binary noise:
a 2-decimal money value carries ~1e-13 relative error, so casting at scale
10 rounds *inside* the noise band (engines disagree), while casting at the
data's true scale 2 has a 0.005 margin (always identical).

Policy, used by every money aggregate and mirrored verbatim in the DuckDB
oracle SQL:

  * cast each raw 2-decimal column to DECIMAL(12,2) — unambiguous,
  * do multiplications in decimal (exact; widths sized so a 3-factor
    product stays within precision 38 in both engines),
  * SUM the decimals (exact, order-independent — stable under any
    partial-agg tree, AQE re-plan, shuffle layout, or cluster size),
  * cast the final aggregate back to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Scale-2 money type; precision 12 keeps 3-factor products within 38.
MONEY = "decimal(12,2)"


def money(col: Column) -> Column:
    """Cast a 2-decimal double column/expression to exact decimal."""
    return col.cast(MONEY)


def dsum(col: Column) -> Column:
    """Order-independent SUM of a 2-decimal double column.

    Domain contract: values must fit DECIMAL(12,2) (|v| < 1e10). Outside
    it the engines diverge in failure MODE, not in in-domain results:
    Spark under this engine's non-ANSI session casts the stray value to
    NULL (it silently leaves the sum), DuckDB raises a conversion error.
    Money columns satisfy the domain by construction; do not reach for
    this policy on unbounded measurements without a range check."""
    return F.sum(money(col)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(12,2))) AS DOUBLE)"


def dsum_dec(dec_col: Column) -> Column:
    """Order-independent SUM of an already-decimal expression."""
    return F.sum(dec_col).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    return F.sum(money(col)).cast("double") / F.count(col)


def davg_sql(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(12,2))) AS DOUBLE) / COUNT({expr})"
    )


def revenue_dec() -> Column:
    """lineitem revenue ``price * (1 - discount)`` in exact decimal."""
    return money(F.col("l_extendedprice")) * money(1 - F.col("l_discount"))


#: SQL mirror of revenue_dec().
REVENUE_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"
)


def charge_dec() -> Column:
    """lineitem charge ``revenue * (1 + tax)`` in exact decimal."""
    return revenue_dec() * money(1 + F.col("l_tax"))


CHARGE_DEC_SQL = f"({REVENUE_DEC_SQL}) * CAST(1 + l_tax AS DECIMAL(12,2))"


def nullsafe_group_cond(
    left_alias: str,
    right_alias: str,
    gcols: list[str] | tuple[str, ...],
    extra: list[Column] | tuple[Column, ...] = (),
) -> list[Column]:
    """Null-safe group-equality join conditions between two ALIASED frames.

    The one definition of a subtle pattern needed by every grouped
    spine/lane join (rolling.py, rollup.py):

    * ``eqNullSafe``, not ``==`` — a NULL group key is a REAL group
      (e.g. events with no event_type); plain SQL equality would never
      match it back and silently drop or zero-fill the whole group.
    * ALIASED column refs, not ``df[c]`` — when both frames share a
      lineage (spine derived from the aggregate's own subtree), unaliased
      refs resolve to the SAME attribute and the predicate folds to
      trivially-true, leaking rows across groups. Callers must
      ``df.alias(...)`` both sides with the names passed here.

    ``extra`` appends further conditions (e.g. the bucket equality).
    """
    return [
        F.col(f"{left_alias}.{c}").eqNullSafe(F.col(f"{right_alias}.{c}"))
        for c in gcols
    ] + list(extra)


#: Bucket resolution for cert_slice_cond — 1e6 buckets keeps fraction
#: granularity at one part per million while the modulus stays exact in
#: int64 arithmetic.
CERT_BUCKETS = 1_000_000


def cert_slice_cond(key: Column, cert_fraction: float) -> Column:
    """Deterministic key-slice predicate for certification-lane sampling.

    The sketch tier's exact lanes (rolling exact, segment exact, CMS
    certified, profiler exact-distinct) exist to CERTIFY the sketch, not
    to serve queries — and at 100 TB they are the cost: each pays a
    distinct-key-sized shuffle the production sketch lane never pays.
    ``cert_fraction`` bounds that cost: certify on the keys whose
    ``xxhash64`` lands in the first ``cert_fraction`` of 1e6 buckets — a
    deterministic, engine-stable, unbiased-by-construction slice (xxhash64
    is a fixed published function of the value, so the same keys are
    sliced on every run, every cluster layout, every corpus growth step).

    Contract: ``cert_fraction=1.0`` must be handled by the CALLER as
    "no filter" (the driver-oracle surface stays byte-identical); this
    helper only builds the predicate for fractions < 1.
    """
    if not 0.0 < cert_fraction < 1.0:
        raise ValueError(
            f"cert_slice_cond is for 0 < fraction < 1, got {cert_fraction}"
        )
    thr = int(cert_fraction * CERT_BUCKETS)
    if thr < 1:
        raise ValueError(
            f"cert_fraction={cert_fraction} selects zero of {CERT_BUCKETS} "
            "buckets; raise it or skip certification outright"
        )
    return F.pmod(F.xxhash64(key), F.lit(CERT_BUCKETS)) < F.lit(thr)
