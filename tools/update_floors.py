#!/usr/bin/env python
"""Rebuild FLOORS.json from every recorded bench artifact.

Scans BENCH_r*.json (driver round records) and any isolation-run JSON files
passed as arguments (the ``tools/isolate_bench.py`` output format), and
merges per-query minima into FLOORS.json keyed by scale factor:

    {"0.1": {"q01_pricing_summary": 0.91, ...}}

The floor is the minimum wall time EVER observed for that (sf, query) —
the reproducible cost of the plan under this host's documented ambient
noise (BASELINE.md). bench.py also merges its own readings on every run;
this tool exists to backfill history and fold in isolation tables.

Usage:
    python tools/update_floors.py [isolation1.json ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    floors_path = os.path.join(ROOT, "FLOORS.json")
    floors: dict = {}
    if os.path.exists(floors_path):
        with open(floors_path) as fh:
            floors = json.load(fh)

    def fold(sf: float, queries: dict) -> None:
        cur = floors.setdefault(str(sf), {})
        for q, t in queries.items():
            if isinstance(t, (int, float)) and t >= 0:
                cur[q] = min(cur.get(q, t), float(t))

    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        with open(path) as fh:
            rec = json.load(fh)
        parsed = rec.get("parsed") or {}
        if parsed.get("queries"):
            fold(parsed.get("sf", -1.0), parsed["queries"])

    for path in sys.argv[1:]:
        with open(path) as fh:
            rec = json.load(fh)
        if "mins" in rec:  # isolate_bench.py format
            fold(rec.get("sf", -1.0), rec["mins"])
        elif "queries" in rec:  # bare bench line
            fold(rec.get("sf", -1.0), rec["queries"])

    with open(floors_path, "w") as fh:
        json.dump(floors, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {floors_path}: "
          + ", ".join(f"sf{k}×{len(v)}" for k, v in sorted(floors.items())))


if __name__ == "__main__":
    main()
