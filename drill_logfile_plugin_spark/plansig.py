"""Plan-identity signatures: version performance floors by what a query IS.

FLOORS.json records the minimum wall time ever observed per (sf, query) —
but a floor is only meaningful for the PLAN that produced it. When a
query's definition changes (q50 absorbed three arms in r6; q59 grew the
exactsub arm in r8), its old floor describes a different computation, and
regression adjudication made from it false-positives (VERDICT r7 protocol
nit #1). The fix: every floor carries a signature of the query's physical
plan, and a floor whose signature no longer matches the current plan is
RESET instead of compared against.

The signature hashes the same scale-relevant plan properties PLANS.md
tabulates (exchange counts, join strategies, Python-eval nodes, partial
aggregation) — NOT the raw ``executedPlan`` string, which embeds
expression ids (``#123``) and codegen ids that vary run-to-run. Coarse by
design: a plan edit that changes none of these properties leaves floors
comparable (it IS the same shape at scale), while any arm absorption or
operator change moves an exchange/join/python count and resets.

Consumers: ``bench.py`` (stamps sigs into its JSON line and merges
FLOORS.json v2), ``tools/audit_plans.py`` (adds the plan-sig column to
PLANS.md), ``tools/update_floors.py`` (history rebuilds with
reset-on-mismatch).
"""

from __future__ import annotations

import hashlib

_JOIN_NODES = (
    ("BroadcastHashJoin", "BHJ"),
    ("SortMergeJoin", "SMJ"),
    ("ShuffledHashJoin", "SHJ"),
    ("BroadcastNestedLoopJoin", "BNL"),
    ("CartesianProduct", "CART"),
)

_PYTHON_NODES = (
    ("BatchEvalPython", "row-python!"),
    ("ArrowEvalPython", "pandas-udf"),
    ("MapInPandas", "mapInPandas"),
    ("FlatMapGroupsInPandas", "applyInPandas"),
)


def plan_row(df) -> dict:
    """The PLANS.md row fields for a DataFrame's initial physical plan
    (pre-AQE — deterministic at plan time, no execution)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = []
    for node, tag in _JOIN_NODES:
        n = plan.count(node)
        if n:
            joins.append(f"{n}×{tag}")
    python = [tag for node, tag in _PYTHON_NODES if node in plan]
    return {
        "hash_ex": plan.count("Exchange hashpartitioning"),
        "range_ex": plan.count("Exchange rangepartitioning"),
        "joins": " ".join(joins) or "—",
        "python": " ".join(python) or "JVM-only",
        "partial": "yes" if "partial_" in plan else "—",
    }


def row_signature(row: dict) -> str:
    """12-hex digest of a plan row (the FLOORS.json / PLANS.md key)."""
    blob = "|".join(
        str(row[k]) for k in ("hash_ex", "range_ex", "joins", "python", "partial")
    )
    return hashlib.md5(blob.encode()).hexdigest()[:12]


def plan_signature(df) -> str:
    """Signature of a DataFrame's plan: ``row_signature(plan_row(df))``."""
    return row_signature(plan_row(df))


def fold_floor(rec, t: float, sig: str | None):
    """Merge one observation into a FLOORS.json v2 entry.

    ``rec`` is the existing entry (a v2 dict ``{"floor", "plan", ...}``,
    a legacy bare float, or None), ``t`` the observed seconds, ``sig``
    the observation's plan signature (None when the source recorded no
    sigs — pre-r8 bench history).

    Rules (pure function — pinned in tests/test_plansig.py):

    * no existing entry → new v2 entry (sig may be None: recorded as
      unversioned until a sig-carrying run stamps it),
    * matching sigs (or both None) → fold the minimum,
    * sig mismatch → RESET to the observation, keeping the displaced
      floor under ``"prior"`` for archaeology (never silently destroyed),
    * legacy float entry + sig-carrying observation → reset likewise
      (the legacy floor's plan is unknowable — exactly the q50 trap),
    * sig-less observation + v2 entry → ignored (can't validate against
      a versioned floor; pre-r8 history only seeds pre-r8-style entries).
    """
    if rec is None:
        return {"floor": t, "plan": sig}
    if isinstance(rec, dict):
        if rec.get("plan") == sig:
            out = dict(rec)
            out["floor"] = min(float(rec["floor"]), t)
            return out
        if sig is None:
            return rec  # can't validate: keep the versioned entry
        return {"floor": t, "plan": sig, "prior": rec["floor"]}
    # legacy bare float
    old = float(rec)
    if sig is None:
        return {"floor": min(old, t), "plan": None}
    return {"floor": t, "plan": sig, "prior": old}


def floor_value(rec) -> float:
    """The floor seconds from a v2 dict or legacy float entry."""
    return float(rec["floor"]) if isinstance(rec, dict) else float(rec)
