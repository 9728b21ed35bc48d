"""Pluggable materialization for iterative / multi-consumer plans.

Operators that consume an intermediate relation many times (connected
components each round, the fuzzy matcher's shared token relation, the
standardizer's distinct-title set) must cut lineage and materialize once.
The *mechanism* is a deployment choice, not an algorithm choice:

* ``local`` — ``localCheckpoint(eager=True)``: blocks live on executors
  with NO lineage fallback.  Fastest on local[N] (measured round 1: the
  checkpoint write is in-memory), but on a real cluster an executor loss
  makes the blocks unrecoverable and kills the job.
* ``reliable`` — ``persist(StorageLevel.MEMORY_AND_DISK)`` + an eager
  ``count()``: keeps lineage, so lost blocks are recomputed; the right
  default on a 1000-executor cluster.  (A reliable ``checkpoint()`` to
  HDFS is the heavier third option; persist-with-lineage covers the
  fault-tolerance need without requiring a checkpoint dir.)

The mode is process-wide: ``SPARK_GRAFT_MATERIALIZE`` env var (``local``
| ``reliable``), overridable per call.  local[N] runs — tests, bench, the
driver — default to ``local``; cluster deployments set ``reliable``.
"""

from __future__ import annotations

import os

_VALID = ("local", "reliable")


def materialize_mode() -> str:
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local")
    if mode not in _VALID:
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE must be one of {_VALID}, got {mode!r}"
        )
    return mode


def materialize(df, mode: str | None = None):
    """Eagerly materialize ``df`` and return a DataFrame that re-reads the
    materialized blocks instead of recomputing lineage."""
    mode = mode or materialize_mode()
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        from pyspark import StorageLevel

        persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.count()  # force materialization now, like eager=True
        return persisted
    raise ValueError(f"unknown materialize mode {mode!r}")


def release(df, mode: str | None = None):
    """Free a no-longer-needed :func:`materialize` result (iterative
    operators retire each round's intermediate).  Only meaningful in
    ``reliable`` mode — unpersisting a ``localCheckpoint`` would delete
    its only copy of the data, so ``local`` is a deliberate no-op."""
    if (mode or materialize_mode()) == "reliable":
        df.unpersist()


def materialize_adaptive(df):
    """Adaptive-then-checkpoint materialization for SMALL multi-join
    relations (r15, x_boruvka_msf): plain ``materialize`` in ``local``
    mode executes the plan down the NON-adaptive ``.rdd`` path, where
    a component-domain plan of several joins pays seconds in static
    SortMergeJoin stages even on a handful of rows; plain persist
    keeps lineage and iterative self-join lineage explodes the
    optimizer within two rounds.  So: persist -> count (the real work
    runs under AQE with exact stats and broadcast conversions), then
    ``materialize`` of the now-trivial cached-scan plan (cuts
    lineage), then unpersist.  In ``reliable`` mode this degrades
    gracefully to persist+count (lineage kept, as that mode wants).

    r16 (guide §1.2/§2.4): when the just-counted relation is TINY
    (<= SPARK_GRAFT_VALUES_MAX rows, default 1024, and exactly
    representable — integral/boolean/plain-string columns), re-emit it
    as a SQL ``VALUES`` literal instead of checkpointing: consumers
    then read a LocalRelation — no checkpoint job, no scan stage, a
    known-tiny size so every downstream join broadcasts without hints,
    and zero risk of the checkpointed-UNION constraint crash.  The
    gate is the MEASURED row count, so it is scale-adaptive by
    construction (a billion-row round never takes this path), and the
    driver-side collect is bounded by the same constant.  Values are
    rendered exactly (integers verbatim, strings only from a safe
    alphabet — anything else falls back to the checkpoint path)."""
    if materialize_mode() == "reliable":
        return materialize(df)
    df.persist()
    n = df.count()
    out = None
    if n <= _values_max_rows():
        out = _values_relation(df)
    if out is None:
        out = materialize(df)
    df.unpersist()
    return out


_VALUES_TYPES = {
    "bigint": "BIGINT", "int": "INT", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "string": "STRING", "boolean": "BOOLEAN",
}
_SAFE_IDENT = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_SAFE_STR = __import__("re").compile(r"^[A-Za-z0-9_ .,:;|/@#+-]*$")


def _values_max_rows() -> int:
    return int(os.environ.get("SPARK_GRAFT_VALUES_MAX", "1024"))


def _values_relation(df):
    """``df`` (already persisted and counted) as a ``VALUES``-literal
    DataFrame with identical column names/types, or ``None`` when any
    column type/value falls outside the exactly-renderable subset."""
    dts = df.dtypes
    if not dts or any(t not in _VALUES_TYPES for _, t in dts) or any(
            not _SAFE_IDENT.match(c) for c, _ in dts):
        return None
    spark = df.sparkSession
    casts = ", ".join(
        f"CAST(c{i} AS {_VALUES_TYPES[t]}) AS {name}"
        for i, (name, t) in enumerate(dts))
    rows = df.collect()
    if not rows:
        nulls = ", ".join(
            f"CAST(NULL AS {_VALUES_TYPES[t]}) AS {name}"
            for name, t in dts)
        return spark.sql(f"SELECT {nulls} WHERE 1 = 0")
    lits = []
    for row in rows:
        cells = []
        for v, (_, t) in zip(row, dts):
            if v is None:
                cells.append("NULL")
            elif t == "string":
                if not _SAFE_STR.match(v):
                    return None
                cells.append(f"'{v}'")
            elif t == "boolean":
                cells.append("true" if v else "false")
            else:
                cells.append(str(int(v)))
        lits.append("(" + ", ".join(cells) + ")")
    inner = ", ".join(f"c{i}" for i in range(len(dts)))
    return spark.sql(
        f"SELECT {casts} FROM (VALUES {', '.join(lits)})"
        f" AS t({inner})")
