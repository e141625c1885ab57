"""The engine's query surface: named queries + DuckDB oracle SQL.

One entry per operator category of SURVEY.md §2 (Tier B — the query surface
the reference plugin serves through its host engine) plus the LLM-pipeline
extension operators. Each ``QuerySpec`` pairs a Spark implementation with an
equivalent ANSI-SQL oracle string the driver runs on DuckDB; column names and
value determinism are aligned so the order-insensitive value hash matches
(see functions/exprs.py for the float-determinism policy).

Scale posture: every query is a declarative DataFrame/SQL plan — Catalyst
does pruning/pushdown, small dimension tables are explicitly broadcast, aggs
use partial (map-side) combine automatically, and nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.exprs import (
    CHARGE_DEC_SQL,
    REVENUE_DEC_SQL,
    charge_dec,
    davg,
    davg_sql,
    dsum,
    dsum_dec,
    dsum_sql,
    revenue_dec,
)
from .operators import behavior as B
from .operators.anomaly import spike_sql_duck
from .operators.profiler import profile_sql_duck
from .operators.rolling import rolling_exact_sql_duck
from .operators.segments import segment_overlap_exact_sql_duck
from .operators.text import TOKS_DUCK
from .registry import _t, query

#: DuckDB token stream for q52's cms arm (documents.text occurrences).
_TOKS_DUCK_TEXT = TOKS_DUCK.format(c="text")

REV_SUM_SQL = f"CAST(SUM({REVENUE_DEC_SQL}) AS DOUBLE)"

#: Column lanes for q52's profile arm over the events table.
_EVENTS_PROFILE_COLS = {
    "event_id": "num",
    "ts": "ts",
    "user_id": "num",
    "event_type": "str",
    "value": "num",
    "props": "str",
}


# =========================================================================
# Aggregation (GROUP BY, HAVING-equivalents, multiple aggregates)
# =========================================================================


@query(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {REV_SUM_SQL} AS sum_disc_price,
           CAST(SUM({CHARGE_DEC_SQL}) AS DOUBLE) AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filtered scan + hash agg "
    "(map-side partial agg; 6 aggregates in one pass).",
)
def q01(spark, sf):
    l = _t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    rev = revenue_dec()
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum_dec(rev).alias("sum_disc_price"),
        dsum_dec(charge_dec()).alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q08_distinct_agg",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="COUNT(DISTINCT) — expand+two-phase agg in Spark; scales via shuffle on (grp,key).",
)
def q08(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q09_rollup_cube",
    f"""
    SELECT 'rollup' AS shape, r_name AS k1, n_name AS k2,
           COUNT(*) AS n_rows, {dsum_sql('c_acctbal')} AS metric
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'cube' AS shape, l_returnflag AS k1, l_linestatus AS k2,
           COUNT(*) AS n_rows, {dsum_sql('l_quantity')} AS metric
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (customer-geography, dims broadcast) and "
    "CUBE over two low-cardinality lineitem dims, union-tagged. Each arm "
    "is one Expand + single hash agg with map-side partials. (Merged "
    "q09+q10 for the driver's correctness budget.)",
)
def q09(spark, sf):
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    rollup = (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("c_acctbal")).alias("metric"),
        )
        .select(
            F.lit("rollup").alias("shape"),
            F.col("r_name").alias("k1"),
            F.col("n_name").alias("k2"),
            "n_rows",
            "metric",
        )
    )
    cube = (
        _t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_quantity")).alias("metric"),
        )
        .select(
            F.lit("cube").alias("shape"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "n_rows",
            "metric",
        )
    )
    return rollup.unionByName(cube)


# =========================================================================
# Joins (broadcast, shuffle, semi/anti, outer, non-equi)
# =========================================================================


@query(
    "q02_top_revenue_orders",
    f"""
    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
           {REV_SUM_SQL} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: selective dim filter broadcast into "
    "fact join, agg, deterministic top-k.",
)
def q02(spark, sf):
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") < "1998-01-01")
    l = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    # customer grows with scale factor — no broadcast hint; AQE picks the
    # join strategy (broadcast at small SF, shuffle hash/sort-merge at 100 TB).
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_dec(revenue_dec()).alias("revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q03_region_revenue",
    f"""
    SELECT n_name, {REV_SUM_SQL} AS revenue, COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style 6-way star join; small dims broadcast, facts shuffle "
    "on join keys; flagship entry() query.",
)
def q03(spark, sf):
    r = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    dims = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    # Only fixed-cardinality dims (region, nation) are broadcast; customer,
    # supplier, orders, lineitem all grow with SF, so their joins are left to
    # AQE — a forced broadcast there would OOM executors at the 100 TB target.
    cust = c.join(dims, c.c_nationkey == dims.n_nationkey)
    ord_cust = o.join(cust, o.o_custkey == cust.c_custkey)
    joined = l.join(ord_cust, l.l_orderkey == ord_cust.o_orderkey).join(
        s,
        (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
    )
    return joined.groupBy("n_name").agg(
        dsum_dec(revenue_dec()).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


@query(
    "q04_semi_anti_join",
    """
    SELECT 'semi' AS side, c_mktsegment AS grp, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti' AS side, CAST(c_nationkey AS VARCHAR) AS grp,
           COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) joins in one "
    "union-tagged result: Spark plans BroadcastHashJoin(LeftSemi/LeftAnti) "
    "or shuffled variants at scale — no row duplication either way. "
    "(Merged q04+q05 so the full suite fits the driver's correctness "
    "budget; both join types keep their own plan shape.)",
)
def q04(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.lit("semi").alias("side"),
            F.col("c_mktsegment").alias("grp"),
            "n_customers",
        )
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.lit("anti").alias("side"),
            F.col("c_nationkey").cast("string").alias("grp"),
            "n_customers",
        )
    )
    return semi.unionByName(anti)


@query(
    "q06_nonequi_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n_late_items
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
    doc="Equi key + non-equi (range) residual condition: Spark keeps the hash "
    "join on the equi key and applies the range as a join residual — no BNL.",
)
def q06(spark, sf):
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        l.join(o, cond)
        .groupBy("o_orderpriority")
        .count()
        .withColumnRenamed("count", "n_late_items")
    )


@query(
    "q07_outer_join_histogram",
    """
    WITH per_order AS (
      SELECT o_orderkey, COUNT(l_orderkey) AS n_items
      FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey
    ), ca AS (
      SELECT o_orderkey AS key, COUNT(*) AS n FROM orders
      WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey
    ), cb AS (
      SELECT l_orderkey AS key, COUNT(*) AS n FROM lineitem
      WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey
    ), per AS (
      SELECT ca.key, ca.n * cb.n AS n_out
      FROM ca JOIN cb ON ca.key = cb.key
    )
    SELECT 'histogram' AS part, n_items AS key, COUNT(*) AS n_out,
           CAST(NULL AS BIGINT) AS extra
    FROM per_order GROUP BY n_items
    UNION ALL
    SELECT 'total' AS part, CAST(NULL AS BIGINT) AS key,
           CAST(COALESCE(SUM(n_out), 0) AS BIGINT) AS n_out,
           COUNT(*) AS extra
    FROM per
    UNION ALL
    SELECT 'skew' AS part, key, n_out, CAST(rnk AS BIGINT) AS extra
    FROM (
      SELECT key, n_out,
             ROW_NUMBER() OVER (ORDER BY n_out DESC, key) AS rnk
      FROM per
    ) WHERE rnk <= 5
    """,
    doc="Join analytics, union-merged (driver query-budget policy). "
    "Histogram arm: left-outer join preserving empty orders, then "
    "re-aggregation (order-size histogram). Preflight arm (operators/"
    "joinstats.py join_preflight_report): EXACT equi-join output "
    "cardinality + top skew keys computed BEFORE the join from per-key "
    "counts (|A join B| = sum over k of cntA*cntB) — distinct-key-sized "
    "work that catches multiplying-key join explosions before they run, "
    "and hands salted_join its hot-key list. A MATCH certifies the "
    "identity against the oracle's independent formulation.",
)
def q07(spark, sf):
    from .operators.joinstats import join_preflight_report

    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    per_order = (
        o.join(l, l.l_orderkey == o.o_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )
    hist = per_order.groupBy("n_items").agg(
        F.count(F.lit(1)).alias("n_orders")
    ).select(
        F.lit("histogram").alias("part"),
        F.col("n_items").alias("key"),
        F.col("n_orders").alias("n_out"),
        F.lit(None).cast("long").alias("extra"),
    )
    pre = join_preflight_report(o, l, "o_orderkey", "l_orderkey", top=5)
    return hist.unionByName(pre)


# =========================================================================
# Window functions
# =========================================================================


@query(
    "q11_window_rank_topk",
    """
    SELECT c_nationkey, c_custkey, rn, rnk, pct_rnk, quartile FROM (
      SELECT c_nationkey, c_custkey,
             ROW_NUMBER() OVER w AS rn,
             DENSE_RANK() OVER w AS rnk,
             PERCENT_RANK() OVER w AS pct_rnk,
             NTILE(4) OVER w AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rn <= 10
    """,
    doc="Top-k per group plus the full ranking-function family over ONE "
    "window spec: row_number (top-k filter — Spark inserts WindowGroupLimit "
    "to keep k rows per key before the sort), dense_rank, percent_rank "
    "((rank-1)/(n-1) — bit-identical int/int division cross-engine), and "
    "ntile quartiles. One shuffle on the partition key serves all four "
    "(single Window node); the c_custkey tie-break makes every rank "
    "deterministic. (Merged q11+q56 for the driver's correctness budget.)",
)
def q11(spark, sf):
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("rnk"),
            F.percent_rank().over(w).alias("pct_rnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rn") <= 10)
    )


#: Session gap for q12's session arm. The synthetic events table spreads
#: ~67 events/user over 30 days, so a web-style 30-minute gap degenerates
#: to singleton sessions; 1 day gives ~8-event sessions — a meaningful
#: fixture. Real clickstreams dial this to 30 minutes.
_SESSION_GAP_S = 86400


@query(
    "q12_window_running_lag",
    f"""
    SELECT 'orders' AS part, o_custkey AS k1, o_orderkey AS k2,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS v1,
           o_totalprice - LAG(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS v2,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS v3
    FROM orders
    UNION ALL
    SELECT 'session' AS part, user_id AS k1, session_idx AS k2,
           CAST(n_events AS DOUBLE) AS v1, duration_s AS v2,
           CAST(NULL AS DOUBLE) AS v3
    FROM ({B.session_stats_sql_duck(gap_seconds=_SESSION_GAP_S)})
    UNION ALL
    SELECT 'anomaly_' || event_type AS part,
           epoch_us(bucket) // 3600000000 AS k1,
           cnt AS k2,
           CAST(z_num AS DOUBLE) AS v1,
           CAST(z_den2 AS DOUBLE) AS v2,
           CASE WHEN spike THEN CAST(1 AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS v3
    FROM ({spike_sql_duck("SELECT ts, event_type FROM events")}) an
    UNION ALL
    SELECT 'journey:' || journey AS part,
           n_sessions AS k1, n_users AS k2,
           CAST(min_user AS DOUBLE) AS v1,
           CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3
    FROM ({B.session_journeys_sql_duck(gap_seconds=_SESSION_GAP_S)}) jn
    """,
    doc="Ordered-window analytics, union-merged (driver query-budget "
    "policy). Orders arm: running total (frame-bounded SUM, decimal "
    "accumulate for cross-engine bit-stability), LAG delta (per-row "
    "double arithmetic — order-independent), and a trailing-30-day "
    "time-RANGE sum (operators/behavior.py rolling_time_sum — the "
    "moving-aggregate frame ROWS cannot express; integer day-number "
    "ordering makes Spark's rangeBetween and SQL's RANGE INTERVAL "
    "identical); all three windows share one o_custkey exchange. Session "
    "arm (operators/behavior.py sessionize + session_stats semantics): "
    "gap-based "
    "batch sessionization — lag marks session starts, a running sum "
    "numbers them, then per-session stats reuse the window's hash "
    "partitioning (no second exchange; plan-pinned). Integer microsecond "
    "arithmetic end-to-end. Anomaly arm (operators/anomaly.py "
    "spike_flags): trailing-window z-score burst detection over gap-"
    "filled hourly event counts — the integer-exact form n*c-S vs "
    "k^2*(n*SS-S^2) needs no division/sqrt/float, so the spike verdicts "
    "hash bit-identically cross-engine; composes the gapfill operator "
    "so quiet hours drag the mean down instead of vanishing. Journey "
    "arm (operators/behavior.py session_journeys): per-session ordered "
    "event-type paths mined into (journey, n_sessions, n_users) — "
    "array_sort over (ts, id, type) structs makes the collect order "
    "engine-exact, NULL types map to a sentinel before joining, and the "
    "per-session collect reuses sessionize's user partitioning (no "
    "second exchange). The session and journey arms share ONE "
    "sessionize + per-session aggregate, barriered so divergent column "
    "pruning cannot defeat exchange reuse and shuffle events twice — "
    "the materialized frame is the session-count-sized 'sessions "
    "table' a production pipeline persists anyway. (Merged q12+q13 for "
    "the driver's correctness budget.)",
)
def q12(spark, sf):
    from .operators.behavior import rolling_time_sum, sessionize

    order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders_arm = rolling_time_sum(
        _t(spark, sf, "orders"),
        part_col="o_custkey",
        date_col="o_orderdate",
        value_col="o_totalprice",
        days=30,
        out_col="_roll",
    ).select(
        F.lit("orders").alias("part"),
        F.col("o_custkey").alias("k1"),
        F.col("o_orderkey").alias("k2"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_run)
        .cast("double")
        .alias("v1"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(order)).alias("v2"),
        F.col("_roll").alias("v3"),
    )
    # The session and journey arms share ONE sessionize + ONE per-session
    # aggregate (stats and the ordered journey computed in the same pass),
    # barriered because the two arms' divergent column pruning would
    # otherwise defeat ReuseExchange and shuffle events twice. The
    # barrier is LAZY (one checkpoint-marked RDD, scheduler-level stage
    # dedup): nothing at construction reads the rows, so the eager form
    # only serialized a build-time job in front of the same computation;
    # materialization now rides the consuming action, overlapped with
    # the independent orders/anomaly arms. The materialized frame is
    # session-count-sized — the "sessions table" a production pipeline
    # would persist anyway.
    from .operators.dedup import _lazy_barrier

    s = sessionize(_t(spark, sf, "events"), gap_seconds=_SESSION_GAP_S)
    per_session = _lazy_barrier(
        s.groupBy(F.col("user_id"), F.col("session_idx")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"),
                                F.col("event_id").alias("eid"),
                                F.coalesce(
                                    F.col("event_type"), F.lit("∅")
                                ).alias("t"),
                            )
                        )
                    ),
                    lambda x: x["t"],
                ),
                ">",
            ).alias("journey"),
        )
    )
    sess = per_session.select(
        F.lit("session").alias("part"),
        F.col("user_id").alias("k1"),
        F.col("session_idx").alias("k2"),
        F.col("n_events").cast("double").alias("v1"),
        (
            (
                F.unix_micros(F.col("end_ts").cast("timestamp"))
                - F.unix_micros(F.col("start_ts").cast("timestamp"))
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    from .operators.anomaly import spike_flags

    anom = spike_flags(
        _t(spark, sf, "events").select("ts", "event_type"),
        ts_col="ts",
        group_cols=("event_type",),
        grain="hour",
    ).select(
        F.concat(F.lit("anomaly_"), F.col("event_type")).alias("part"),
        F.expr("unix_micros(bucket) div 3600000000").alias("k1"),
        F.col("cnt").alias("k2"),
        F.col("z_num").cast("double").alias("v1"),
        F.col("z_den2").cast("double").alias("v2"),
        F.when(F.col("spike"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("v3"),
    )
    journeys = (
        per_session.groupBy("journey")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("user_id").alias("min_user"),
        )
        .select(
            F.concat(F.lit("journey:"), F.col("journey")).alias("part"),
            F.col("n_sessions").alias("k1"),
            F.col("n_users").alias("k2"),
            F.col("min_user").cast("double").alias("v1"),
            F.lit(None).cast("double").alias("v2"),
            F.lit(None).cast("double").alias("v3"),
        )
    )
    return (
        orders_arm.unionByName(sess).unionByName(anom).unionByName(journeys)
    )


# =========================================================================
# Sort / limit / set ops
# =========================================================================


@query(
    "q14_topk_setops",
    """
    SELECT * FROM (
      SELECT 'topk' AS part, o_orderkey AS k, o_totalprice AS val
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    )
    UNION ALL
    SELECT 'setops' AS part, k, CAST(NULL AS DOUBLE) AS val FROM (
      SELECT c_custkey AS k FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      )
      INTERSECT
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
    doc="Global deterministic top-k (Spark TakeOrderedAndProject: "
    "per-partition heap + driver merge, no full sort) union-tagged with "
    "UNION / INTERSECT / EXCEPT distinct set semantics. (Merged q14+q15 "
    "for the driver's correctness budget; each arm keeps its plan shape.)",
)
def q14(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    topk = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select(
            F.lit("topk").alias("part"),
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("val"),
        )
    )
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 9000).select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    setops = (
        building.union(rich)
        .distinct()
        .intersect(with_orders)
        .subtract(urgent)
        .select(
            F.lit("setops").alias("part"),
            F.col("c_custkey").alias("k"),
            F.lit(None).cast("double").alias("val"),
        )
    )
    return topk.unionByName(setops)


# =========================================================================
# Scalar functions (string / JSON / datetime / conditional)
# =========================================================================


@query(
    "q16_string_funcs",
    f"""
    SELECT regexp_extract(p_type, '(\\S+)$', 1) AS type_suffix,
           COUNT(*) AS n_parts,
           {davg_sql('p_retailprice')} AS avg_price,
           MAX(UPPER(SUBSTRING(p_name, 1, 10))) AS max_prefix,
           MIN(LENGTH(p_name)) AS min_name_len
    FROM part
    GROUP BY regexp_extract(p_type, '(\\S+)$', 1)
    """,
    doc="String functions (regexp_extract, substring, upper, length) — all "
    "JVM-side, whole-stage-codegen'd.",
)
def q16(spark, sf):
    p = _t(spark, sf, "part")
    suffix = F.regexp_extract(F.col("p_type"), r"(\S+)$", 1).alias("type_suffix")
    return p.groupBy(suffix).agg(
        F.count(F.lit(1)).alias("n_parts"),
        davg(F.col("p_retailprice")).alias("avg_price"),
        F.max(F.upper(F.substring("p_name", 1, 10))).alias("max_prefix"),
        F.min(F.length("p_name")).alias("min_name_len"),
    )


@query(
    "q18_date_case_buckets",
    f"""
    SELECT 'month' AS tag,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
             AS bucket,
           COUNT(*) AS n_rows,
           {dsum_sql('o_totalprice')} AS metric
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'balance' AS tag,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n_rows,
           {davg_sql('c_acctbal')} AS metric
    FROM customer GROUP BY 2
    """,
    doc="Datetime bucketing with date_trunc (the pre-aggregation pattern "
    "for time-partitioned data) and CASE WHEN bucketing + aggregation, "
    "union-tagged. (Merged q18+q19 for the driver's correctness budget.)",
)
def q18(spark, sf):
    o = _t(spark, sf, "orders")
    months = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice")).alias("metric"),
        )
        .select(F.lit("month").alias("tag"), "bucket", "n_rows", "metric")
    )
    c = _t(spark, sf, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    balances = (
        c.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            davg(F.col("c_acctbal")).alias("metric"),
        )
        .select(F.lit("balance").alias("tag"), "bucket", "n_rows", "metric")
    )
    return months.unionByName(balances)


@query(
    "q20_correlated_subquery",
    """
    SELECT c_nationkey, COUNT(*) AS n_big_spenders
    FROM customer
    WHERE (SELECT COUNT(*) FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 400000) >= 2
    GROUP BY c_nationkey
    """,
    doc="Correlated scalar subquery — Catalyst decorrelates into an aggregate "
    "+ join (no per-row subquery execution).",
)
def q20(spark, sf):
    # DataFrames are passed as template args (Spark 3.5+ parameterized SQL),
    # not temp views — no session-catalog side effects for the caller.
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_big_spenders
        FROM {customer} AS customer
        WHERE (SELECT COUNT(*) FROM {orders} AS orders
               WHERE o_custkey = c_custkey AND o_totalprice > 400000) >= 2
        GROUP BY c_nationkey
        """,
        customer=_t(spark, sf, "customer"),
        orders=_t(spark, sf, "orders"),
    )


@query(
    "q47_percentiles_json",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           quantile_cont(value, 0.95) AS p95,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated quantiles (p25/p50/p75/p95) per event type "
    "plus semi-structured JSON column access (get_json_object on "
    "events.props; exact integer aggregates) in one hash agg. Spark's "
    "percentile() and DuckDB's quantile_cont use the same (1-f)*lo + f*hi "
    "interpolation over the sorted values, so the doubles are "
    "bit-identical cross-engine. Quantiles are emitted as four SCALAR "
    "columns, not an array — the driver's canonicalizer cannot hash "
    "array cells (round-2 q47 lesson). At scale, swap percentile() for "
    "approx_percentile (mergeable sketch, map-side) when single-pass "
    "memory matters more than exactness; the exact form is the "
    "correctness baseline for it. (Merged q47+q17 for the driver's "
    "correctness budget.)",
)
def q47(spark, sf):
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))").alias("q"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )
    return agg.select(
        "event_type",
        "n_events",
        F.col("q")[0].alias("p25"),
        F.col("q")[1].alias("p50"),
        F.col("q")[2].alias("p75"),
        F.col("q")[3].alias("p95"),
        "min_value",
        "max_value",
        "sum_k",
        "min_k",
        "max_k",
    )


@query(
    "q48_sets_pivot",
    f"""
    SELECT 'sets' AS part, l_returnflag AS key1, l_linestatus AS key2,
           {dsum_sql('l_quantity')} AS v1,
           CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    UNION ALL
    SELECT 'pivot' AS part, o_orderpriority AS key1,
           CAST(NULL AS VARCHAR) AS key2,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")}
               AS v1,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")}
               AS v2,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")}
               AS v3,
           CAST(NULL AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="GROUPING SETS + explicit-values PIVOT, union-merged (driver "
    "query-budget policy, SURVEY.md §2 note) — each branch keeps its own "
    "plan shape. Sets branch: the non-hierarchical shape neither ROLLUP "
    "(q09) nor CUBE can express — (flag,status) detail, status-only "
    "margins, grand total, NO flag-only margin; one Expand feeding one "
    "partial-agg'd shuffle. Pivot branch (long→wide conditional "
    "aggregation): one hash agg computes all three status columns in a "
    "single pass over orders. Expressed as conditional aggregation rather "
    "than the .pivot() API: .pivot() plans TWO aggregations (partial on "
    "(key, pivot-col), then pivotfirst on key — two exchanges) and, "
    "without explicit values, adds a distinct-values job (a full scan + "
    "collect at 100 TB); the conditional-agg form is one partial-agg'd "
    "exchange, same result. Decimal-exact sums keep the doubles "
    "order-independent across the partial-agg tree.",
)
def q48(spark, sf):
    sets = (
        _t(spark, sf, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("sets").alias("part"),
            F.col("l_returnflag").alias("key1"),
            F.col("l_linestatus").alias("key2"),
            F.col("sum_qty").alias("v1"),
            F.lit(None).cast("double").alias("v2"),
            F.lit(None).cast("double").alias("v3"),
            F.col("n"),
        )
    )
    def _status_sum(s: str):
        return dsum(
            F.when(F.col("o_orderstatus") == s, F.col("o_totalprice"))
        )

    piv = (
        _t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            _status_sum("F").alias("v1"),
            _status_sum("O").alias("v2"),
            _status_sum("P").alias("v3"),
        )
        .select(
            F.lit("pivot").alias("part"),
            F.col("o_orderpriority").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "v1",
            "v2",
            "v3",
            F.lit(None).cast("long").alias("n"),
        )
    )
    return sets.unionByName(piv)


# =========================================================================
# Sketch tier — approximate aggregates for the 100 TB scale path
# =========================================================================


def sketch_arm_agg(e):
    """q52's sketch arm: per-event_type sketch aggregates next to the
    exact lanes, with the exact COUNT(DISTINCT) on its own two-level
    aggregation (group+key partial-agg, then a count per group)
    broadcast-joined back instead of fused into the main agg — a fused
    count_distinct beside other aggregates plans an Expand (input ×2)
    and funnels every value through the distinct path; measured 2.4 s
    vs 0.4 s for this shape at sf0.1. Both levels partial-agg map-side;
    the join side is one row per event_type (broadcast).

    COUNT(DISTINCT) semantics at the seams (the NULL-free fixture can't
    catch either): NULL keys are not values (filter, or the two-level
    count tallies the NULL group as one "user"), and a NULL event_type
    group must survive the join (null-safe equality + left/coalesce —
    plain equi-join keys drop NULL, losing the group the fused form
    kept). Module-level so the scale smoke measures THIS plan, not a
    re-implementation (tools/scale_smoke.py sketch_exact_distinct_arm).
    """
    main = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
        (F.max("value") - F.min("value")).alias("rng"),
    )
    exact_d = (
        e.where(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy(F.col("event_type").alias("_et"))
        .agg(F.count(F.lit(1)).alias("n_users_exact"))
    )
    return (
        main.join(
            F.broadcast(exact_d),
            F.col("event_type").eqNullSafe(F.col("_et")),
            "left",
        )
        .drop("_et")
        .withColumn(
            "n_users_exact", F.coalesce("n_users_exact", F.lit(0).cast("long"))
        )
    )



#: q52's blocklist certification arm (r11) — fixed lowercase term
#: list (the C4-convention shape): corpus-vocabulary terms plus one
#: zero-hit term so the absent-term path is certified too.
_BLOCKLIST_TERMS = ["slow", "dup", "vector", "contraband"]


@query(
    "q52_sketch_checks",
    """
    SELECT 'sketch' AS part, event_type AS key,
           COUNT(DISTINCT user_id) AS n_a,
           CAST(NULL AS BIGINT) AS n_b, CAST(NULL AS BIGINT) AS n_c,
           TRUE AS flag_a, TRUE AS flag_b,
           quantile_cont(value, 0.5) AS d_min,
           CAST(NULL AS DOUBLE) AS d_max,
           CAST(NULL AS VARCHAR) AS s_min, CAST(NULL AS VARCHAR) AS s_max
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'profile' AS part, col_name AS key,
           n_distinct AS n_a, n_nulls AS n_b, n_rows AS n_c,
           CAST(NULL AS BOOLEAN) AS flag_a, CAST(NULL AS BOOLEAN) AS flag_b,
           d_min, d_max, s_min, s_max
    FROM ({profile}) p
    UNION ALL
    SELECT 'rolling' AS part, event_type AS key,
           n_exact AS n_a,
           epoch_us(bucket) // 3600000000 AS n_b,
           CAST(NULL AS BIGINT) AS n_c,
           TRUE AS flag_a, CAST(NULL AS BOOLEAN) AS flag_b,
           CAST(NULL AS DOUBLE) AS d_min, CAST(NULL AS DOUBLE) AS d_max,
           CAST(NULL AS VARCHAR) AS s_min, CAST(NULL AS VARCHAR) AS s_max
    FROM ({rolling}) r
    UNION ALL
    SELECT 'overlap' AS part, seg_a || '|' || seg_b AS key,
           exact_inter AS n_a, n_a AS n_b, n_b AS n_c,
           TRUE AS flag_a, CAST(NULL AS BOOLEAN) AS flag_b,
           CAST(NULL AS DOUBLE) AS d_min, CAST(NULL AS DOUBLE) AS d_max,
           CAST(NULL AS VARCHAR) AS s_min, CAST(NULL AS VARCHAR) AS s_max
    FROM ({overlap}) ov
    UNION ALL
    SELECT 'cms' AS part, term AS key,
           cnt AS n_a, rk AS n_b, CAST(NULL AS BIGINT) AS n_c,
           TRUE AS flag_a, TRUE AS flag_b,
           CAST(NULL AS DOUBLE) AS d_min, CAST(NULL AS DOUBLE) AS d_max,
           CAST(NULL AS VARCHAR) AS s_min, CAST(NULL AS VARCHAR) AS s_max
    FROM (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rk
      FROM (SELECT unnest({cms_toks}) AS term FROM documents)
      GROUP BY term
    ) hh WHERE rk <= 20
    UNION ALL
    SELECT 'blocklist' AS part, source AS key,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN hits = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(hits) AS BIGINT) AS n_c,
           CAST(NULL AS BOOLEAN) AS flag_a, CAST(NULL AS BOOLEAN) AS flag_b,
           CAST(NULL AS DOUBLE) AS d_min, CAST(NULL AS DOUBLE) AS d_max,
           CAST(NULL AS VARCHAR) AS s_min, CAST(NULL AS VARCHAR) AS s_max
    FROM (
      SELECT source,
             len(list_filter(
                   string_split_regex(trim(lower(text), ' '),
                                      '[ \t\n\x0B\f\r]+'),
                   x -> list_contains({blocklist_terms}, x))) AS hits
      FROM documents
    ) bl GROUP BY source
    """.format(
        profile=profile_sql_duck("events", _EVENTS_PROFILE_COLS),
        rolling=rolling_exact_sql_duck(
            "SELECT ts, event_type, user_id FROM events"
        ),
        overlap=segment_overlap_exact_sql_duck(
            "SELECT event_type, user_id FROM events"
        ),
        cms_toks=_TOKS_DUCK_TEXT,
        blocklist_terms=repr(_BLOCKLIST_TERMS),
    ),
    doc="Sketch tier, in-band-checked: the Spark side computes BOTH exact "
    "lanes (count_distinct — full shuffle of distinct keys; exact "
    "interpolated median) AND the sketch lanes (approx_count_distinct — "
    "HLL++ fixed-size mergeable state, map-side combine, no distinct-key "
    "shuffle; approx_percentile — Greenwald-Khanna bounded mergeable "
    "summary, single pass) and emits booleans asserting each sketch "
    "landed within its error budget (5% for HLL, 2% of the per-group "
    "value range for GK at accuracy=10000). The oracle recomputes the "
    "exact lanes and asserts TRUE, so a sketch drifting out of tolerance "
    "is a hash MISMATCH, not a silent pass — the same invariant-check "
    "pattern as the ANN recall tests, but driver-visible. At 100 TB the "
    "sketch lane is the only viable one; this query certifies its error "
    "stays in band. (Merged q52+q53 for the driver's correctness budget.) "
    "Profile arm (operators/profiler.py): the ingestion pre-flight — "
    "per-column null/distinct/range stats over events in one fused "
    "aggregation pass, type-laned ranges (doubles for numerics/epoch-"
    "micros timestamps, varchar min/max for strings) so no float-to-"
    "string formatting enters the hash. Registered exact; approx=True "
    "(HLL++, no input Expand) is the production default at scale. "
    "Rolling arm (operators/rolling.py rolling_distinct): trailing-24h "
    "distinct users per hour via MERGEABLE HLL sketches — each bucket "
    "reduces to fixed-size state once, windows union sketches (bytes "
    "through the shuffle) instead of re-shuffling keys per overlapping "
    "window; the exact offset-explode lane + in_band flag certify the "
    "estimate per window (oracle asserts TRUE). Cms arm (operators/"
    "freqsketch.py): FREQUENCY completes the mergeable-sketch trio — a "
    "DataFrame-native count-min grid (d x w counters, partial-agg'd to "
    "fixed size before the shuffle) point-queried for the exact top-20 "
    "document tokens; flags assert the two CMS guarantees (never under-"
    "counts; within eps*N over-count), oracle asserts TRUE. Blocklist arm (r11, operators/blocklist.py): term-blocklist curation certification — whole-token case-insensitive hits per source (n_a blocked docs, n_b clean docs, n_c total occurrences) with the list riding the plan as a create_map literal (scan-fused, zero extra exchange); the oracle re-tokenizes and recounts over the identical whitespace split.",
)
def q52(spark, sf):
    from .operators.profiler import profile_columns

    e = _t(spark, sf, "events")
    # The six arms are independent subtrees; build them on a thread
    # pool — plan construction is py4j round-trips plus JVM analysis,
    # and pinned py4j threads run those concurrently (the q63/q50
    # overlap pattern applied to CONSTRUCTION; the arms share only
    # the immutable base readers and touch no session state).
    def _arm_sketch():
        agg = sketch_arm_agg(e)
        within_d = (
            F.abs(F.col("n_approx") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        )
        within_p = (
            F.abs(F.col("p50_approx") - F.col("p50_exact"))
            <= 0.02 * F.col("rng") + F.lit(1e-9)
        )
        sketch = agg.select(
            F.lit("sketch").alias("part"),
            F.col("event_type").alias("key"),
            F.col("n_users_exact").alias("n_a"),
            F.lit(None).cast("long").alias("n_b"),
            F.lit(None).cast("long").alias("n_c"),
            within_d.alias("flag_a"),
            within_p.alias("flag_b"),
            F.col("p50_exact").alias("d_min"),
            F.lit(None).cast("double").alias("d_max"),
            F.lit(None).cast("string").alias("s_min"),
            F.lit(None).cast("string").alias("s_max"),
        )
        return sketch

    def _arm_profile():
        profile = profile_columns(e, list(_EVENTS_PROFILE_COLS)).select(
            F.lit("profile").alias("part"),
            F.col("col_name").alias("key"),
            F.col("n_distinct").alias("n_a"),
            F.col("n_nulls").alias("n_b"),
            F.col("n_rows").alias("n_c"),
            F.lit(None).cast("boolean").alias("flag_a"),
            F.lit(None).cast("boolean").alias("flag_b"),
            "d_min",
            "d_max",
            "s_min",
            "s_max",
        )
        return profile

    def _arm_rolling():
        from .operators.rolling import rolling_distinct

        rolling = rolling_distinct(
            e.select("event_type", "ts", "user_id")
        ).select(
            F.lit("rolling").alias("part"),
            F.col("event_type").alias("key"),
            F.col("n_exact").alias("n_a"),
            F.expr("unix_micros(bucket) div 3600000000").alias("n_b"),
            F.lit(None).cast("long").alias("n_c"),
            F.col("in_band").alias("flag_a"),
            F.lit(None).cast("boolean").alias("flag_b"),
            F.lit(None).cast("double").alias("d_min"),
            F.lit(None).cast("double").alias("d_max"),
            F.lit(None).cast("string").alias("s_min"),
            F.lit(None).cast("string").alias("s_max"),
        )
        return rolling

    def _arm_overlap():
        from .operators.segments import segment_overlap

        overlap = segment_overlap(e.select("event_type", "user_id")).select(
            F.lit("overlap").alias("part"),
            F.concat_ws("|", "seg_a", "seg_b").alias("key"),
            F.col("exact_inter").alias("_na"),
            F.col("n_a").alias("_nb"),
            F.col("n_b").alias("_nc"),
            F.col("in_band").alias("_fa"),
        ).select(
            "part",
            "key",
            F.col("_na").alias("n_a"),
            F.col("_nb").alias("n_b"),
            F.col("_nc").alias("n_c"),
            F.col("_fa").alias("flag_a"),
            F.lit(None).cast("boolean").alias("flag_b"),
            F.lit(None).cast("double").alias("d_min"),
            F.lit(None).cast("double").alias("d_max"),
            F.lit(None).cast("string").alias("s_min"),
            F.lit(None).cast("string").alias("s_max"),
        )
        return overlap

    def _arm_cms():
        from .operators.freqsketch import heavy_hitters_certified
        from .operators.text import TOKS_SPARK

        occ = _t(spark, sf, "documents").select(
            F.explode(F.expr(TOKS_SPARK.format(c="text"))).alias("term")
        )
        cms = heavy_hitters_certified(occ, "term", k=20).select(
            F.lit("cms").alias("part"),
            F.col("key"),
            F.col("exact").alias("n_a"),
            F.col("rk").alias("n_b"),
            F.lit(None).cast("long").alias("n_c"),
            F.col("never_under").alias("flag_a"),
            F.col("within_eps").alias("flag_b"),
            F.lit(None).cast("double").alias("d_min"),
            F.lit(None).cast("double").alias("d_max"),
            F.lit(None).cast("string").alias("s_min"),
            F.lit(None).cast("string").alias("s_max"),
        )
        return cms

    def _arm_bl():
        from .operators.blocklist import term_blocklist_hits

        d = _t(spark, sf, "documents").select("source", "text")
        bl = (
            term_blocklist_hits(d, _BLOCKLIST_TERMS, out_col="hits")
            .groupBy("source")
            .agg(
                F.sum((F.col("hits") > 0).cast("long")).alias("n_a"),
                F.sum((F.col("hits") == 0).cast("long")).alias("n_b"),
                F.sum("hits").alias("n_c"),
            )
            .select(
                F.lit("blocklist").alias("part"),
                F.col("source").alias("key"),
                "n_a",
                "n_b",
                "n_c",
                F.lit(None).cast("boolean").alias("flag_a"),
                F.lit(None).cast("boolean").alias("flag_b"),
                F.lit(None).cast("double").alias("d_min"),
                F.lit(None).cast("double").alias("d_max"),
                F.lit(None).cast("string").alias("s_min"),
                F.lit(None).cast("string").alias("s_max"),
            )
        )
        return bl

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(6) as _ex:
        _fs = [
            _ex.submit(f)
            for f in (_arm_sketch, _arm_profile, _arm_rolling,
                      _arm_overlap, _arm_cms, _arm_bl)
        ]
    sketch, profile, rolling, overlap, cms, bl = [
        f.result() for f in _fs
    ]
    return (
        sketch.unionByName(profile)
        .unionByName(rolling)
        .unionByName(overlap)
        .unionByName(cms)
        .unionByName(bl)
    )
