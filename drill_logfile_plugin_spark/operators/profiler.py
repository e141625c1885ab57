"""Table profiler: per-column null / distinct / range statistics in one pass.

Every ingestion step of a large pipeline wants the same pre-flight check:
did this snapshot's columns suddenly go null-heavy, lose cardinality, or
shift range? (A upstream schema drift usually shows up here first, long
before a query fails.) The profiler computes, per column:

* ``n_rows``      — table row count (repeated per row for self-containment),
* ``n_nulls``     — NULL count,
* ``n_distinct``  — exact distinct count (see the scale note),
* ``d_min/d_max`` — numeric/timestamp range (doubles; timestamps profile
  as epoch microseconds — exact in a double far beyond any real date),
* ``s_min/s_max`` — string range (varchar columns only).

Ranges deliberately stay in their own type lanes instead of casting
everything to varchar: float-to-string formatting differs between
engines (1.0 vs 1, exponent styles), which would break the engine's
cross-engine-exact contract; int/timestamp-to-double conversion and
string min/max are exact everywhere.

Scale posture: with ``approx=True`` the whole profile is ONE fused
aggregation pass — approx_count_distinct is HLL++ (fixed mergeable
state, no input expansion, map-side combine), and drift *detection*
tolerates 2% error; that is the production default at 100 TB. The exact
form (registered because the driver hash-checks it, q52's profile arm)
deliberately does NOT fuse the distinct counts into one aggregate:
Spark plans K DISTINCT aggregates in one pass as an Expand of the
*input* — every row duplicated K times, all columns riding the shuffle —
measured 5x slower than the layout used here, which runs the
non-distinct metrics (counts, nulls, ranges) as one fused pass plus one
column-pruned single-distinct branch per column (each branch's scan
reads exactly one column, so the K branches together read about one
full-width table; each shuffles only its own column's distinct partials)
and assembles the 1-row results via broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
    cert_fraction: float = 1.0,
) -> DataFrame:
    """Profile ``cols`` (default: all supported columns) of ``df``.

    Returns one row per column:
    (col_name, n_rows, n_nulls, n_distinct, d_min, d_max, s_min, s_max).
    Unsupported types (arrays, structs, binary) raise ValueError — name
    the columns explicitly to skip them.

    ``cert_fraction`` < 1 (exact mode only) bounds the exact-distinct
    branches — the profiler's only distinct-key shuffles — to a
    deterministic xxhash64 VALUE-slice per column
    (functions/exprs.cert_slice_cond): ``n_distinct`` then counts the
    slice's distinct values exactly. Because the slice is a fixed
    function of the value, the number is reproducible run-over-run and
    comparable snapshot-over-snapshot — which is all drift detection
    (profile_drift's ratio test) needs — at ``cert_fraction`` of the
    shuffle. Row-level metrics (n_rows, n_nulls, ranges) stay full-table.
    Default 1.0 = full exact counts (the q52 profile arm, unchanged);
    with ``approx=True`` the knob is ignored (HLL++ is already bounded).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            n
            for n, t in fields.items()
            if isinstance(
                t, _NUMERIC + (StringType, TimestampType, TimestampNTZType, DateType)
            )
        ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    distinct_branches = []
    for c in cols:
        t = fields.get(c)
        if t is None:
            raise ValueError(f"no such column: {c}")
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        else:
            # exact mode: one single-distinct branch per column (see the
            # module docstring for why this beats the fused-Expand form);
            # the branches are UNIONED into one (col_name, n_distinct)
            # side table so they evaluate as parallel stages of a single
            # broadcast build, not K sequential jobs
            branch = df
            if cert_fraction != 1.0:
                from ..functions.exprs import cert_slice_cond

                branch = df.where(cert_slice_cond(F.col(c), cert_fraction))
            distinct_branches.append(
                branch.agg(
                    F.count_distinct(F.col(c)).alias("n_distinct")
                ).select(F.lit(c).alias("col_name"), "n_distinct")
            )
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")
        )
        if isinstance(t, _NUMERIC):
            lo = F.min(F.col(c)).cast("double")
            hi = F.max(F.col(c)).cast("double")
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # NTZ casts to TimestampType in the session zone; the engine
            # pins spark.sql.session.timeZone=UTC (sources/tables.py:44),
            # matching DuckDB's naive epoch_us.
            lo = F.unix_micros(F.min(F.col(c)).cast("timestamp")).cast("double")
            hi = F.unix_micros(F.max(F.col(c)).cast("timestamp")).cast("double")
        elif isinstance(t, DateType):
            lo = F.datediff(F.min(F.col(c)), F.lit("1970-01-01")).cast("double")
            hi = F.datediff(F.max(F.col(c)), F.lit("1970-01-01")).cast("double")
        elif isinstance(t, StringType):
            lo = hi = None
        else:
            raise ValueError(f"unsupported column type for profile: {c}: {t}")
        if lo is None:
            aggs.append(F.lit(None).cast("double").alias(f"__dmin_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__dmax_{c}"))
            aggs.append(F.min(F.col(c)).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__smax_{c}"))
        else:
            aggs.append(lo.alias(f"__dmin_{c}"))
            aggs.append(hi.alias(f"__dmax_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__smin_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__smax_{c}"))
    one = df.agg(*aggs)

    # The stack() expr is the one SQL-string surface in the profiler, and
    # schema-on-read log data routinely has non-identifier column names
    # ("event-id", "user name"): backtick-quote every generated alias
    # (else `__nn_event-id` parses as a subtraction) and escape the label
    # literal.
    def _ident(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    def _slit(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    keys = (
        ("nn", "nd", "dmin", "dmax", "smin", "smax")
        if approx
        else ("nn", "dmin", "dmax", "smin", "smax")
    )
    names = (
        "(col_name, n_nulls, n_distinct, d_min, d_max, s_min, s_max)"
        if approx
        else "(col_name, n_nulls, d_min, d_max, s_min, s_max)"
    )
    stack_args = ", ".join(
        f"{_slit(c)}, " + ", ".join(_ident(f"__{k}_{c}") for k in keys)
        for c in cols
    )
    stacked = one.select(
        "n_rows",
        F.expr(f"stack({len(cols)}, {stack_args}) AS {names}"),
    )
    if not approx:
        nd_tbl = distinct_branches[0]
        for b in distinct_branches[1:]:
            nd_tbl = nd_tbl.unionByName(b)
        stacked = stacked.join(F.broadcast(nd_tbl), "col_name")
    return stacked.select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "d_min", "d_max", "s_min", "s_max"
    )


def profile_sql_duck(table: str, col_types: dict[str, str]) -> str:
    """DuckDB mirror: ``col_types`` maps column -> one of
    'num' | 'ts' | 'date' | 'str' (the caller states the lane, keeping
    this helper engine-schema-agnostic)."""
    parts = []
    for c, kind in col_types.items():
        if kind == "num":
            dmin, dmax = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            smin = smax = "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            dmin = f"CAST(epoch_us(MIN({c})) AS DOUBLE)"
            dmax = f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
            smin = smax = "CAST(NULL AS VARCHAR)"
        elif kind == "date":
            dmin = f"CAST(MIN({c}) - DATE '1970-01-01' AS DOUBLE)"
            dmax = f"CAST(MAX({c}) - DATE '1970-01-01' AS DOUBLE)"
            smin = smax = "CAST(NULL AS VARCHAR)"
        elif kind == "str":
            dmin = dmax = "CAST(NULL AS DOUBLE)"
            smin, smax = f"MIN({c})", f"MAX({c})"
        else:
            raise ValueError(f"unknown kind {kind!r} for column {c}")
        parts.append(
            f"""
      SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             COUNT(DISTINCT {c}) AS n_distinct,
             {dmin} AS d_min, {dmax} AS d_max,
             {smin} AS s_min, {smax} AS s_max
      FROM {table}"""
        )
    return " UNION ALL ".join(parts)


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_rate_jump: float = 0.05,
    distinct_swing: float = 0.5,
) -> DataFrame:
    """Drift report between two :func:`profile_columns` outputs — the
    second half of the ingestion pre-flight: yesterday's profile is the
    contract, today's batch either honors it or this report says where
    it broke before anything lands in the lake.

    One row per column in either profile, with the verdict columns a
    gating job switches on:

    * ``status`` — ``added`` / ``removed`` / ``present``;
    * ``null_rate_drifted`` — |null-rate delta| > ``null_rate_jump``
      (a silent upstream outage usually shows up here first);
    * ``distinct_drifted`` — distinct-count ratio outside
      [1-s, 1/(1-s)] for s = ``distinct_swing`` (key-space collapse or
      explosion — a join-key deduplication bug or an id-format change);
    * ``range_expanded`` — new [min, max] escapes the old envelope on
      either laned representation (numeric/epoch doubles or varchar) —
      out-of-domain values, clock skew, schema-on-read type drift.

    Scale posture: inputs are column-cardinality-sized (one row per
    column), so this is driver-trivial arithmetic expressed as one
    full-outer equi join — it composes with profiles computed on any
    corpus size; the expensive pass is profile_columns itself, already
    one fused aggregation.
    """
    o = old.select(
        F.col("col_name"),
        *[F.col(c).alias(f"o_{c}") for c in old.columns if c != "col_name"],
    )
    n = new.select(
        F.col("col_name"),
        *[F.col(c).alias(f"n_{c}") for c in new.columns if c != "col_name"],
    )
    j = o.join(n, "col_name", "full_outer")
    in_old = F.col("o_n_rows").isNotNull()
    in_new = F.col("n_n_rows").isNotNull()
    o_nullrate = F.col("o_n_nulls") / F.col("o_n_rows")
    n_nullrate = F.col("n_n_nulls") / F.col("n_n_rows")
    ratio = F.col("n_n_distinct") / F.col("o_n_distinct")
    lo_s = 1.0 - float(distinct_swing)
    hi_s = 1.0 / lo_s if lo_s > 0 else float("inf")
    range_expanded = (
        (F.col("n_d_min") < F.col("o_d_min"))
        | (F.col("n_d_max") > F.col("o_d_max"))
        | (F.col("n_s_min") < F.col("o_s_min"))
        | (F.col("n_s_max") > F.col("o_s_max"))
    )
    return j.select(
        "col_name",
        F.when(in_old & in_new, "present")
        .when(in_new, "added")
        .otherwise("removed")
        .alias("status"),
        # Verdicts must be non-NULL booleans: an EMPTY snapshot makes the
        # null-rate division NULL, and true AND NULL = NULL would make
        # the gating flag silently vanish for the most catastrophic
        # drift there is (a truncated batch). One side empty, other not
        # -> drifted; both empty -> not drifted; else the rate test.
        (
            in_old & in_new
            & F.when(
                (F.col("o_n_rows") == 0) | (F.col("n_n_rows") == 0),
                (F.col("o_n_rows") == 0) != (F.col("n_n_rows") == 0),
            ).otherwise(
                F.abs(n_nullrate - o_nullrate) > F.lit(float(null_rate_jump))
            )
        ).alias("null_rate_drifted"),
        (
            in_old & in_new & (F.col("o_n_distinct") > 0)
            & ((ratio < F.lit(lo_s)) | (ratio > F.lit(hi_s)))
        ).alias("distinct_drifted"),
        (in_old & in_new & F.coalesce(range_expanded, F.lit(False))).alias(
            "range_expanded"
        ),
    )


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    overlap_k: int = 256,
) -> DataFrame:
    """One-call corpus health report — the governance view a dataset card
    starts from, as a tall (section, metric, value) DataFrame.

    Composes the certified tiers into bounded aggregates (nothing here is
    ever corpus-sized on the driver: each section is a dim-sized or
    1-row aggregate, and the overlap section rides the KMV sketches'
    geometry bound):

    * ``volume``  — docs, non-null texts, total chars, total whitespace
      tokens (one fused pass);
    * ``lang``    — document count per detected language (``lang_id``);
    * ``quality`` — document count per quality bucket
      (``quality_bucket``);
    * ``sources`` — document count per ``group_col`` value;
    * ``dup``     — exact-content duplicate stats: distinct texts,
      duplicated docs, duplication rate (the md5 group-by lane);
    * ``overlap`` — the top cross-source Jaccard estimate from
      ``overlap.overlap_matrix`` (who is feeding us the same documents).

    Values are formatted as strings (counts as integers, rates with 6
    decimals) so the report is one homogeneous frame a dashboard or a
    diff can consume; the underlying operators stay available for exact
    typed access.
    """
    from .overlap import overlap_matrix
    from .text import lang_id, quality_bucket

    spark = docs.sparkSession
    t = F.col(text_col)
    vol = docs.agg(
        F.count(F.lit(1)).alias("docs"),
        F.count(t).alias("texts"),
        F.sum(F.length(t)).alias("chars"),
        F.sum(F.size(F.split(F.trim(t), r"\s+"))).alias("tokens"),
    ).first()
    rows = [
        ("volume", "docs", str(vol["docs"])),
        ("volume", "texts_nonnull", str(vol["texts"])),
        ("volume", "chars", str(vol["chars"] or 0)),
        ("volume", "tokens", str(vol["tokens"] or 0)),
    ]
    for r in sorted(
        docs.where(t.isNotNull())
        .groupBy(lang_id(text_col).alias("k"))
        .count()
        .collect()
    ):
        rows.append(("lang", str(r["k"]), str(r["count"])))
    for r in sorted(
        docs.where(t.isNotNull())
        .groupBy(quality_bucket(text_col).alias("k"))
        .count()
        .collect()
    ):
        rows.append(("quality", str(r["k"]), str(r["count"])))
    for r in sorted(
        docs.groupBy(F.col(group_col).alias("k")).count().collect()
    ):
        rows.append(("sources", str(r["k"]), str(r["count"])))
    dup = (
        docs.where(t.isNotNull())
        .groupBy(F.md5(t).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("distinct_texts"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias(
                "dup_docs"
            ),
            F.sum("n").alias("total"),
        )
        .first()
    )
    rows.append(("dup", "distinct_texts", str(dup["distinct_texts"])))
    rows.append(("dup", "duplicated_docs", str(dup["dup_docs"])))
    rate = (dup["dup_docs"] or 0) / dup["total"] if dup["total"] else 0.0
    rows.append(("dup", "dup_rate", f"{rate:.6f}"))
    top = (
        overlap_matrix(docs, group_col, text_col, k=overlap_k)
        .orderBy(F.desc("jaccard_est"), "g_a", "g_b")
        .limit(1)
        .collect()
    )
    if top:
        r = top[0]
        rows.append(
            ("overlap", f"top_pair {r['g_a']}|{r['g_b']}",
             f"{r['jaccard_est']:.6f}")
        )
    return spark.createDataFrame(
        rows, "section string, metric string, value string"
    )
