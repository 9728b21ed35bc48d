r"""Batch (historical) sessionization: gap-based session assignment over
an event log with plain window functions — the offline twin of the
streaming ``applyInPandasWithState`` sessionizer
(``streaming/stateful.py:70``).

The reference delegates all relational work to host DuckDB
(``src/lib.rs:72-86``); sessionization is the canonical event-log
enrichment a training-data pipeline runs over interaction logs before
per-session aggregation.  Semantics: events of one user, ordered by
``(ts, event_id)``, start a new session whenever the gap to the previous
event exceeds ``gap_seconds``; ``session_seq`` numbers a user's sessions
from 1 in time order.

Scale notes (100 TB): the whole computation is two window functions over
ONE hash-partitioning on ``user_id`` — Catalyst reuses the exchange for
both windows and for any subsequent per-session ``groupBy(user_id,
session_seq)`` (the grouping keys are a prefix-superset of the window
partition), so the operator costs exactly one shuffle regardless of the
aggregations stacked on top.  No Python, no state store — pure
whole-stage-codegen windows.
"""

from __future__ import annotations


def sessionize_batch(events, gap_seconds: int, user_col: str = "user_id",
                     ts_col: str = "ts", tiebreak_col: str = "event_id"):
    """Add ``us`` (event-time epoch micros), ``session_seq`` (1-based
    BIGINT per-user session number) to an event DataFrame.

    Deterministic for duplicate timestamps via the ``tiebreak_col``
    ordering — the same total order the streaming sessionizer uses.
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_us = int(gap_seconds) * 1_000_000
    with_us = events.withColumn("us", F.unix_micros(ts_col))
    prev = F.lag("us").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("us") - prev) > F.lit(gap_us)), 1
    ).otherwise(0)
    return with_us.withColumn(
        "session_seq",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )


def session_stats(events, gap_seconds: int, user_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value"):
    """Per-session rollup: bounds, event count, decimal-exact value sum.

    The ``groupBy`` reuses the window's hash partitioning on
    ``user_col`` (no second shuffle); the value sum casts operands to
    DECIMAL first so cross-engine summation order cannot drift.
    """
    from pyspark.sql import functions as F

    s = sessionize_batch(events, gap_seconds, user_col, ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("total_value"),
        )
    )
