#!/usr/bin/env python
"""Deterministic job/stage counter for one or more queries.

The sandbox host exhibits multi-second hypervisor stalls that make
wall-clock A/B comparisons of small plan changes unreadable; the number
of Spark jobs (and their stages/tasks) a query triggers is deterministic
for a fixed plan and data, so driver-loop optimizations (fewer barrier
jobs, fused probes) can be adjudicated exactly.

Usage: python tools/job_count.py q63_dup_clusters [...]
Prints one JSON line: {"jobs": {q: {"build": n, "exec": n, "tasks": n}}}
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-jobcount")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from drill_logfile_plugin_spark.sources.tables import configure_session

    configure_session(spark)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    out = {}
    for name in names:
        j0 = njobs()
        df = qs[name](spark, sf_dir)
        j1 = njobs()
        df.write.format("noop").mode("overwrite").save()
        j2 = njobs()
        out[name] = {"build": j1 - j0, "exec": j2 - j1}
        print(f"# {name}: build_jobs={j1-j0} exec_jobs={j2-j1}", file=sys.stderr)
    print(json.dumps({"jobs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
