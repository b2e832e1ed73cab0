"""Inspect physical plans for the properties that matter at 100 TB.

"The first plan that passes" is not the goal — these helpers make plan
quality assertable in tests (tests/test_plans.py):

- filters reached the parquet scan (PushedFilters)
- scans read only the projected columns (ReadSchema)
- small dims broadcast instead of shuffling the fact table
- relational operators stay JVM-side (no Python eval nodes)
- global top-k compiles to TakeOrderedAndProject, not a full sort
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = explain_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists read by each scan (column-pruning check)."""
    plan = explain_string(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df)


def uses_python_eval(df: DataFrame) -> bool:
    """True if any Python-side evaluation node is in the plan (the slow
    path — only sanctioned for the explicitly-Python operators)."""
    plan = explain_string(df)
    return bool(re.search(
        r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
        r"|MapInPandas|AggregateInPandas|ArrowAggregatePython"
        r"|FlatMapCoGroupsInPandas|CoGroupsInPandas)",
        plan,
    ))
