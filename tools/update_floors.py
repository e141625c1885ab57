#!/usr/bin/env python
"""Rebuild FLOORS.json from every recorded bench artifact.

Scans BENCH_r*.json (driver round records, chronological by round number)
and any isolation-run JSON files passed as arguments (the
``tools/isolate_bench.py`` output format), and merges per-query minima
into FLOORS.json keyed by scale factor. v2 format (round-8): every floor
carries the plan-identity signature of the query that produced it —

    {"0.1": {"q01_pricing_summary": {"floor": 0.91, "plan": "a1b2c3..."}}}

— and a record whose signature differs from the stored one RESETS the
floor (keeping the displaced value under ``"prior"``) instead of folding:
a floor is the reproducible cost of ONE plan, and q50's pre-absorption
0.35 s floor poisoning round-over-round calls is exactly the failure this
versioning exists to stop (VERDICT r7 protocol nit #1). Merge semantics
live in ``drill_logfile_plugin_spark/plansig.py::fold_floor`` (pure,
pytest-pinned).

History records without ``plan_sigs`` (pre-r8 benches) can only seed or
fold into UNVERSIONED entries — they never validate against a versioned
floor. bench.py also merges its own readings (with signatures) on every
run; this tool exists to backfill history and fold in isolation tables.

Usage:
    python tools/update_floors.py [isolation1.json ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from drill_logfile_plugin_spark.plansig import fold_floor

    floors_path = os.path.join(ROOT, "FLOORS.json")
    floors: dict = {}
    if os.path.exists(floors_path):
        with open(floors_path) as fh:
            floors = json.load(fh)

    def fold(sf: float, queries: dict, sigs: dict | None) -> None:
        cur = floors.setdefault(str(sf), {})
        sigs = sigs or {}
        for q, t in queries.items():
            if isinstance(t, (int, float)) and t >= 0:
                cur[q] = fold_floor(cur.get(q), float(t), sigs.get(q))

    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        with open(path) as fh:
            rec = json.load(fh)
        parsed = rec.get("parsed") or {}
        if parsed.get("queries"):
            fold(
                parsed.get("sf", -1.0),
                parsed["queries"],
                parsed.get("plan_sigs"),
            )

    for path in sys.argv[1:]:
        with open(path) as fh:
            rec = json.load(fh)
        if "mins" in rec:  # isolate_bench.py format
            fold(rec.get("sf", -1.0), rec["mins"], rec.get("plan_sigs"))
        elif "queries" in rec:  # bare bench line
            fold(rec.get("sf", -1.0), rec["queries"], rec.get("plan_sigs"))

    with open(floors_path, "w") as fh:
        json.dump(floors, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {floors_path}: "
          + ", ".join(f"sf{k}×{len(v)}" for k, v in sorted(floors.items())))


if __name__ == "__main__":
    main()
