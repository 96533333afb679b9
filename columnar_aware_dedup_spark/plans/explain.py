"""Physical-plan inspection helpers.

The engine's scale story is enforced, not hoped for: tests assert that
filters reach the parquet scan (PushedFilters), projections prune the read
schema, dimension joins broadcast, top-k plans as TakeOrderedAndProject, and
the dedup dataflow doesn't grow extra shuffles. SURVEY §4 records that no
custom Catalyst rule is needed — these checks are how that decision stays
true.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The executed plan as text (same output as ``df.explain(mode)``)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(jmode)


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges excluded).

    Formatted mode prints shuffle nodes as ``(N) Exchange`` and broadcast
    nodes as ``(N) BroadcastExchange``.
    """
    plan = plan_string(df, "formatted")
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if ANY scan in the plan pushed a filter mentioning ``fragment``
    (multi-table plans list one PushedFilters per scan)."""
    plan = plan_string(df, "formatted")
    return any(
        fragment in m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the (first) parquet scan."""
    plan = plan_string(df, "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return set()
    return {f.split(":")[0] for f in m.group(1).split(",") if f}


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "formatted")


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_string(df, "formatted")


def has_global_sort(df: DataFrame) -> bool:
    """True if the plan contains a GLOBAL Sort (a full-exchange total
    order). SIMPLE mode prints sort nodes inline as ``Sort [...], true, 0``
    where the boolean is the global flag (formatted mode splits the node
    header from its ``Arguments:`` line, so a one-line regex there is
    vacuous — it never matched); TakeOrderedAndProject (the heap top-k) is
    a different node and does not match. Positive/negative self-tested in
    tests/test_plans.py::test_has_global_sort_detects_orderby."""
    plan = plan_string(df, "simple")
    return bool(re.search(r"\bSort \[[^\]]*\], true\b", plan))
