"""Physical-plan introspection: the audit surface behind the engine's
scale guarantees (pushdown, broadcast dims, bounded shuffles).

The reference has no optimizer to inspect (SURVEY §4) — on Spark the plan
IS the contract, so ``plan_audit`` turns ``explain`` output into a
machine-checkable summary used by ``tests/test_plans.py`` and available
to users tuning their own pipelines."""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text Spark prints for ``df.explain(mode)``, as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def plan_audit(df: DataFrame) -> dict:
    """Summarize the physical plan into the properties that matter at
    scale. Node counts come from the simple plan (one line per node);
    scan details from the formatted plan."""
    simple = explain_string(df, "simple")
    formatted = explain_string(df, "formatted")
    def _split_filters(s: str) -> List[str]:
        # top-level commas only — filter exprs contain commas in parens,
        # e.g. EqualTo(r_name,ASIA)
        out, depth, cur = [], 0, []
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur).strip())
        return [p for p in out if p]

    pushed: List[str] = []
    for line in formatted.splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1):
            pushed.extend(_split_filters(m.group(1)))
    read_schemas = re.findall(r"ReadSchema: (\S+)", formatted)
    return {
        "broadcast_hash_joins": simple.count("BroadcastHashJoin"),
        "sort_merge_joins": simple.count("SortMergeJoin"),
        "shuffled_hash_joins": simple.count("ShuffledHashJoin"),
        # shuffle exchanges only: BroadcastExchange moves a small relation
        # to every executor, not a repartition of the data — counting it as
        # a shuffle would penalize exactly the plans we want
        "exchanges": len(re.findall(r"(?<!Broadcast)Exchange", simple)),
        "broadcast_exchanges": simple.count("BroadcastExchange"),
        "parquet_scans": simple.count("Scan parquet"),
        "in_memory_scans": simple.count("InMemoryTableScan"),
        "wholestage_codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))
        ),
        "pushed_filters": pushed,
        "read_schemas": read_schemas,
        "left_semi": "LeftSemi" in simple,
        "left_anti": "LeftAnti" in simple,
    }
