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

    r16 note: a VALUES-literal fast path for tiny counted relations
    (collect + re-emit as a LocalRelation instead of checkpointing)
    was implemented and A/B'd here, then REVERTED: the per-mat
    driver-side collect + parse is additive latency that no execution
    saving reliably offsets — the adaptive count already gives AQE
    exact stats, so tiny sides broadcast either way.  Two independent
    env-toggle interleaved A/Bs: x_boruvka_msf 1.08x then 0.97x
    (noise-flat), x_luby_mis 0.985x then 0.884x (consistently WORSE,
    means 4.25 vs 5.02 s).  Kept the checkpoint path."""
    if materialize_mode() == "reliable":
        return materialize(df)
    df.persist()
    df.count()
    out = materialize(df)
    df.unpersist()
    return out
