#!/usr/bin/env python
"""Min-of-N isolation bench for individual queries.

The driver bench (bench.py) takes one-to-three readings per query inside a
shared session under whatever ambient load the host has that minute; this
host's documented hypervisor stalls (BASELINE.md noise caveat) can freeze a
bad reading into the round record. This tool is the adjudication protocol
the round-5/6 verdicts asked for: run the named queries N times each in a
single fresh session (bench warmup applied first), print every reading and
the minimum — the minimum is the reproducible cost of the plan.

Usage:
    python tools/isolate_bench.py q27_minhash_lsh q48_sets_pivot [--runs 5]

Prints one JSON line:
    {"runs": {"q27_minhash_lsh": [..5 readings..]}, "mins": {...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    argv = sys.argv[1:]
    args = []
    runs_n = 5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--runs":
            runs_n = int(argv[i + 1])
            i += 2
        elif a.startswith("--runs="):
            runs_n = int(a.split("=", 1)[1])
            i += 1
        else:
            args.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-isolate")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.sources.tables import configure_session

    configure_session(spark)

    # Same warmup battery as bench.py: parquet reader + shuffle + codegen,
    # the full Python worker pool, and decimal agg JIT.
    _warm = F.pandas_udf(lambda s: s, "long")
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag")
        .count()
        .select(_warm(F.col("count")))
        .write.format("noop").mode("overwrite").save()
    )

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
    (
        spark.range(1000)
        .select(
            (F.col("id") % 7).alias("k"),
            (F.col("id") / 100).cast("decimal(12,2)").alias("d"),
        )
        .groupBy("k")
        .agg(F.sum("d"), F.avg("d"), F.count("d"))
        .write.format("noop").mode("overwrite").save()
    )

    all_runs: dict[str, list[float]] = {}
    plan_sigs: dict[str, str] = {}
    for name in args:
        readings = []
        for _ in range(runs_n):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            readings.append(round(time.perf_counter() - t0, 4))
        all_runs[name] = readings
        try:
            from drill_logfile_plugin_spark.plansig import plan_signature

            plan_sigs[name] = plan_signature(df)
        except Exception:
            pass
        print(f"# {name}: {readings} min={min(readings)}", file=sys.stderr)

    print(
        json.dumps(
            {
                "runs": all_runs,
                "mins": {k: min(v) for k, v in all_runs.items()},
                "sf": sf,
                "plan_sigs": plan_sigs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
