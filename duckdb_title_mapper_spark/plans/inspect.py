"""Physical-plan inspection: programmatic access to the facts that decide
whether a plan survives a 100× scale-up — are filters pushed to the scan,
is the scan column-pruned, did the small side broadcast, how many
shuffles, how wide are the codegen spans.

Used by tests (``tests/test_plans.py``) to LOCK these properties in — a
regression that silently un-pushes a filter or flips a broadcast join to
sort-merge fails the suite, not just the benchmark.
"""

from __future__ import annotations

import re
from contextlib import contextmanager


@contextmanager
def without_aqe(spark):
    """Disable AQE while *planning* a DataFrame for codegen inspection —
    under AQE the pre-execution plan is an un-finalized AdaptiveSparkPlan
    and the codegen explain reports zero subtrees.  (Execution should
    keep AQE on; this is an audit-only toggle.)"""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def explain_str(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df) -> list[str]:
    """PushedFilters entries across every scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schema_columns(df) -> list[list[str]]:
    """Column lists of each scan's ReadSchema — the pruning check."""
    text = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        schemas.append(cols)
    return schemas


def broadcast_join_count(df) -> int:
    """Count in ``simple`` mode: the formatted mode repeats each node in
    its details section, double-counting."""
    return explain_str(df, "simple").count("BroadcastHashJoin")


def shuffle_count(df) -> int:
    """Count in ``simple`` mode: formatted mode prints ``Exchange`` and
    its ``hashpartitioning(...)`` argument on separate lines, so matching
    the combined token there always yields 0."""
    text = explain_str(df, "simple")
    return text.count("Exchange hashpartitioning") + text.count(
        "Exchange rangepartitioning"
    )


def codegen_stage_count(df) -> int:
    """Number of WholeStageCodegen subtrees (explain mode ``codegen`` —
    the formatted plan hides them under AdaptiveSparkPlan pre-execution)."""
    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen")
    )
    return int(m.group(1)) if m else 0


def has_partial_aggregation(df) -> bool:
    """True when the agg runs map-side partials before the exchange."""
    return "partial_" in explain_str(df)
