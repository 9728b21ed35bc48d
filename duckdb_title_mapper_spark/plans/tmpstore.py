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
import shutil

_SUPERSEDED: list[str] = []


def defer_rmtree(path: str) -> None:
    """Queue ``path`` for removal at interpreter exit instead of now."""
    _SUPERSEDED.append(path)


@atexit.register
def _gc_superseded() -> None:
    for p in _SUPERSEDED:
        shutil.rmtree(p, ignore_errors=True)
    _SUPERSEDED.clear()
