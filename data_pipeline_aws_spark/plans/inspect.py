"""Physical-plan inspection helpers.

The engine writes ZERO custom Catalyst rules or strategies (SURVEY §4): every
optimization below is asserted, not implemented — these helpers exist so
tests (and operators during development) can verify that Catalyst actually
produced the plan the scale design assumes: filters pushed to parquet
(`PushedFilters`), schemas pruned (`ReadSchema`), small sides broadcast,
top-k compiled to ordered-limit operators, codegen spans present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Execute THIS DataFrame and return its finalized physical plan string.

    A `.write` executes a *copy* of the plan, leaving the original
    AdaptiveSparkPlan un-finalized — so this collects the DataFrame itself,
    then reads `executedPlan` (shows `isFinalPlan=true`, AQE-chosen joins,
    and `*(n)` whole-stage-codegen markers).
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def plan_has(df: DataFrame, *fragments: str) -> bool:
    """True if the finalized plan contains every fragment (e.g.
    "BroadcastHashJoin", "PushedFilters: [IsNotNull(l_shipdate)")."""
    plan = executed_plan(df)
    return all(f in plan for f in fragments)


def read_schema(df: DataFrame) -> str:
    """The column set the scan actually reads (first ReadSchema line) —
    a 2-column projection reading 16 columns is a pruning failure."""
    plan = executed_plan(df)
    return plan.split("ReadSchema: ")[1].splitlines()[0] if "ReadSchema: " in plan else ""
