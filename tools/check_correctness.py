#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
and an order-insensitive exact value comparison (stricter than a hash —
reports the first differing cell). All MATCH here should imply MATCH in
CORRECTNESS_r{N}.json.

Usage: python tools/check_correctness.py [--sf DIR] [query_name ...]
"""

from __future__ import annotations

import argparse
import datetime
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

# The one table list lives in the package (sources/tables.py); importing
# it means an 11th table cannot land Spark-side while the oracle views
# silently lag behind.
from drill_logfile_plugin_spark.sources.tables import TABLES  # noqa: E402


def normalize(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return normalize(v.item())
    return v


def row_key(row):
    return repr(row)


def driver_divergence_lints(spark_df, rel):
    """Traps where this checker's fetchall()-based compare is *weaker* than
    the driver's pandas-based canonicalizer (round-2 lessons):

    - DuckDB HUGEINT (uncast SUM of ints) fetches as a Python int here and
      compares equal, but ``.df()`` converts it to float64 and the driver's
      type-sensitive hash mismatches.  Oracles must CAST(... AS BIGINT).
    - Array-typed output columns hash fine here (we tuple-ize), but the
      driver's pandas sort_values dies with 'unhashable type: list' (q47).
    """
    problems = []
    for c, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if "HUGEINT" in ts or "INT128" in ts:
            problems.append(
                f"oracle column '{c}' is {ts} (uncast integer SUM?) — the "
                "driver's pandas fetch turns this into float64 and the hash "
                "MISMATCHes; CAST(... AS BIGINT) in the oracle SQL"
            )
        if ts.endswith("[]") or "STRUCT" in ts or "MAP" in ts:
            problems.append(
                f"oracle column '{c}' is {ts} — driver canonicalizer cannot "
                "hash nested values; flatten to scalar columns"
            )
    for f in spark_df.schema.fields:
        kind = f.dataType.typeName()
        if kind in ("array", "map", "struct"):
            problems.append(
                f"spark column '{f.name}' is {kind}-typed — driver "
                "canonicalizer dies on unhashable values; flatten to scalars"
            )
    return problems


def _num_tag(v):
    """bool/int/float class of a normalized cell (None for non-numeric)."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return None


def compare(name, spark_df, con, sql):
    cols_s = list(spark_df.columns)
    t0 = time.time()
    rows_s = [tuple(normalize(v) for v in r) for r in spark_df.collect()]
    t_spark = time.time() - t0
    rel = con.sql(sql)
    cols_o = list(rel.columns)
    rows_o = [tuple(normalize(v) for v in r) for r in rel.fetchall()]

    problems = driver_divergence_lints(spark_df, rel)
    if sorted(cols_s) != sorted(cols_o):
        problems.append(f"schema: spark={sorted(cols_s)} oracle={sorted(cols_o)}")
    if len(rows_s) != len(rows_o):
        problems.append(f"rowcount: spark={len(rows_s)} oracle={len(rows_o)}")
    if not problems:
        # align column order by sorted name
        perm_s = [cols_s.index(c) for c in sorted(cols_s)]
        perm_o = [cols_o.index(c) for c in sorted(cols_o)]
        rs = sorted((tuple(r[i] for i in perm_s) for r in rows_s), key=row_key)
        ro = sorted((tuple(r[i] for i in perm_o) for r in rows_o), key=row_key)
        # Numeric-dtype lint: Python compares 5 == 5.0, but the driver's
        # pandas canonicalizer is type-sensitive (int64 vs float64 hash
        # differently) — an int-vs-float column divergence must MISMATCH
        # here too, or this mirror passes what the driver fails.
        for ci, cname in enumerate(sorted(cols_s)):
            ts = next((_num_tag(r[ci]) for r in rs if r[ci] is not None), None)
            to = next((_num_tag(r[ci]) for r in ro if r[ci] is not None), None)
            if ts != to:
                problems.append(
                    f"dtype: column {cname!r} spark={ts} oracle={to} "
                    "(driver pandas hash is type-sensitive)"
                )
        for i, (a, b) in enumerate(zip(rs, ro)):
            if a != b:
                # float-tolerant diagnosis
                close = all(
                    (
                        x == y
                        or (
                            isinstance(x, float)
                            and isinstance(y, float)
                            and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                        )
                    )
                    for x, y in zip(a, b)
                )
                tag = "FLOAT-CLOSE" if close else "VALUE"
                problems.append(f"{tag} diff at sorted row {i}:\n  spark : {a}\n  oracle: {b}")
                break
    status = "MATCH" if not problems else "MISMATCH"
    print(f"[{status}] {name}  rows={len(rows_s)} spark_time={t_spark:.2f}s")
    for p in problems:
        print(f"    {p}")
    return not problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    ok = fail = weak = 0
    for name in names:
        if name not in qs:
            print(f"[SKIP] {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, args.sf)
        except Exception as e:
            print(f"[ERROR] {name}: spark query raised: {e}")
            fail += 1
            continue
        if name not in oracles:
            try:
                n = df.count()
                print(f"[ROWS-ONLY] {name} rows={n} (no oracle)")
                weak += 1
            except Exception as e:
                print(f"[ERROR] {name}: rows-only count raised: {e}")
                fail += 1
            continue
        try:
            if compare(name, df, con, oracles[name]):
                ok += 1
            else:
                fail += 1
        except Exception as e:
            print(f"[ERROR] {name}: {e}")
            fail += 1
    print(f"\n{ok} MATCH, {fail} MISMATCH/ERROR, {weak} rows-only")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
