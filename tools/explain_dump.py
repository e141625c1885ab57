#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage:
    python tools/explain_dump.py --tag r11 --suffix before [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default: all).
Runs under the bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cpus, AQE on) so the captured plans match what the bench
executes, modulo AQE runtime re-optimization.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    tag = "r11"
    suffix = "before"
    names = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--tag":
            tag = argv[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-explain")
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

    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = sorted(qs)

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            plan = f"ERROR: {ex}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)

    spark.stop()


if __name__ == "__main__":
    main()
