"""Code-vs-prose routing: planted fixtures on both sides of every
signal, the fenced-block splitter, and the plan contract (fused
projection — no exchange, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import code_text as C

PY_CODE = """import os
def walk(root):
    out = []
    for name in os.listdir(root):
        if name.endswith(".py"):
            out.append(name)
    return sorted(out)
"""

C_CODE = """#include <stdio.h>
int main(void) {
    int total = 0;
    for (int i = 0; i < 10; i++) {
        total += i;
    }
    printf("%d\\n", total);
    return 0;
}
"""

JS_CODE = """const items = load();
function render(list) {
    return list.map((x) => x.name).join(", ");
}
"""

PROSE = (
    "The committee met on Thursday to review the draft proposal. After a "
    "long discussion of the budget implications, the members agreed that "
    "the schedule should be extended by two weeks and that a revised "
    "version would be circulated before the next session."
)

PROSE2 = (
    "Rivers shape the landscape slowly. Over thousands of years the water "
    "cuts into rock, carries sediment to the plains below, and builds the "
    "soils that farming later depends on."
)


def test_verdicts_separate_code_and_prose(spark):
    rows = [
        (0, PY_CODE), (1, C_CODE), (2, JS_CODE),
        (10, PROSE), (11, PROSE2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.code_signals(df).collect()}
    for i in (0, 1, 2):
        assert out[i]["code_verdict"] == "code", (i, dict(out[i].asDict()))
    for i in (10, 11):
        assert out[i]["code_verdict"] == "prose", (i, dict(out[i].asDict()))


def test_signals_are_the_documented_quantities(spark):
    df = spark.createDataFrame([(0, "a = 1;\n  b(2);")], "doc_id long, text string")
    r = C.code_signals(df).collect()[0]
    # 14 chars; symbols: = ( ) ; ; -> 5
    assert r["symbol_density"] == pytest.approx(5 / 14)
    assert r["indent_fraction"] == pytest.approx(1 / 2)  # one indented line
    assert r["mean_line_len"] == pytest.approx(14 / 2)


def test_fenced_block_splitter(spark):
    md = f"{PROSE}\n```\n{PY_CODE}```\n{PROSE2}\n```\nx = 1\n```"
    df = spark.createDataFrame([(7, md)], "doc_id long, text string")
    segs = sorted(
        C.fenced_code_blocks(df).collect(), key=lambda r: r["seg_idx"]
    )
    kinds = [r["kind"] for r in segs]
    assert kinds == ["prose", "code", "prose", "code"]
    assert PROSE in segs[0]["segment"]
    assert "def walk" in segs[1]["segment"]
    assert "x = 1" in segs[3]["segment"]
    # composition: per-segment verdicts agree with the fence labels for
    # every substantial segment (a one-line `x = 1` snippet is honestly
    # ambiguous to a content classifier — the FENCE is its evidence,
    # which is exactly why the splitter emits the kind column)
    verdicts = C.code_signals(
        C.fenced_code_blocks(df).withColumnRenamed("segment", "text"),
    ).collect()
    for r in verdicts:
        if len(r["text"]) > 40:
            assert r["code_verdict"] == ("code" if r["kind"] == "code" else "prose"), (
                r["kind"], r["text"][:40]
            )


def test_plan_is_fused_scan(spark):
    df = spark.createDataFrame([(0, PROSE)], "doc_id long, text string")
    plan = C.code_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
