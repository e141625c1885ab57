#!/usr/bin/env python
"""Per-query phase probe: split wall time into build (queries()[name] call,
which runs any construction-time jobs/collects) vs execute (noop write).

Usage: python tools/probe_phases.py [--runs 2] [query ...]
Prints one JSON line: {"phases": {q: {"build": s, "exec": s}}, "sf": ...}
Same session shape as bench.py (warmup included) so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    runs = 2
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-phase-probe")
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
    if not names:
        names = sorted(qs)

    # bench-equivalent warmup
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag")
        .count()
        .select(_warm(_F.col("count")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    def _warm_pool(it):
        import numpy as np

        for pdf_ in it:
            pdf_["id"] = np.asarray(pdf_["id"]) * 0
            yield pdf_

    (
        spark.range(0, cpus * 10, 1, cpus)
        .mapInPandas(_warm_pool, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    (
        spark.range(1000)
        .select(
            (_F.col("id") % 7).alias("k"),
            (_F.col("id") / 100).cast("decimal(12,2)").alias("d"),
        )
        .groupBy("k")
        .agg(_F.sum("d"), _F.avg("d"), _F.count("d"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    phases: dict[str, dict] = {}
    for name in names:
        builds, execs = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 4))
            execs.append(round(t2 - t1, 4))
        phases[name] = {
            "build": min(builds),
            "exec": min(execs),
            "builds": builds,
            "execs": execs,
        }
        print(
            f"{name}: build={min(builds):.2f}s exec={min(execs):.2f}s",
            file=sys.stderr,
        )

    spark.stop()
    print(json.dumps({"phases": phases, "sf": sf}))


if __name__ == "__main__":
    main()
