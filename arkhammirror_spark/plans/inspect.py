"""Physical-plan hygiene inspection.

The north rule forbids per-row Python in the hot path and expects pushdown /
pruning to reach the scans; these helpers make those properties assertable
in tests and quickly checkable at a REPL (`.explain` grep, structured).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_row_python(df: DataFrame) -> bool:
    """True when the plan contains row-at-a-time Python (BatchEvalPython).
    Arrow-batched nodes (ArrowEvalPython / MapInPandas / PythonMapInArrow)
    are the allowed kind."""
    return "BatchEvalPython" in executed_plan(df)


def python_node_count(df: DataFrame) -> int:
    plan = executed_plan(df)
    return len(re.findall(r"MapInPandas|ArrowEvalPython|PythonMapInArrow|FlatMapGroupsInPandas", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema(df: DataFrame) -> list[str]:
    plan = executed_plan(df)
    return re.findall(r"ReadSchema: ([^\n]*)", plan)
