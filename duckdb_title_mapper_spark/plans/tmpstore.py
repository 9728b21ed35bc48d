"""Deferred GC for versioned /tmp parquet stores.

The gram census (operators/grams.py) and the media-meta census
(operators/multimodal.py) persist cross-query shared state as
versioned parquet dirs under /tmp.  A force-rebuild supersedes the
previous version — but Spark DataFrames re-resolve parquet paths at
ACTION time, so a still-live DataFrame or temp view captured from the
superseded version (e.g. a consumer's lazily-executed plan, or a view
like ``_r9_av_video`` registered by an earlier query) would fail with
FileNotFound if the dir were rmtree'd immediately.  Superseded dirs
are therefore queued here and deleted only at interpreter exit; the
payloads are small parsed-metadata columns (KB-MB at test SFs), so
holding a handful of generations until exit is the right trade.
"""

from __future__ import annotations

import atexit
import os
import shutil

_SUPERSEDED: list[str] = []


def store_root(family: str) -> str:
    """Root directory for a versioned cross-query parquet store.

    Defaults to ``/tmp/duckdb_title_mapper_spark_<family>`` — correct on
    ``local[N]`` where driver and executors share one filesystem.  On a
    real cluster a driver-local ``/tmp`` is not executor-reachable, so
    ``SPARK_GRAFT_STORE_ROOT`` must point at a shared filesystem (HDFS /
    NFS / object-store mount) and every store family resolves beneath it
    (r15 VERDICT #3 / r16 item 8).  Local behavior is unchanged when the
    env var is unset."""
    root = os.environ.get("SPARK_GRAFT_STORE_ROOT")
    if root:
        return f"{root.rstrip('/')}/duckdb_title_mapper_spark_{family}"
    return f"/tmp/duckdb_title_mapper_spark_{family}"


def defer_rmtree(path: str) -> None:
    """Queue ``path`` for removal at interpreter exit instead of now."""
    _SUPERSEDED.append(path)


@atexit.register
def _gc_superseded() -> None:
    for p in _SUPERSEDED:
        shutil.rmtree(p, ignore_errors=True)
    _SUPERSEDED.clear()
