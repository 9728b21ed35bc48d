"""Structured Streaming surface.

The reference has no streaming (its whole surface is one scalar function,
SURVEY.md §2.3 note) — this package supplies the streaming capabilities
the task checklist mandates, Spark-first: file-source ``readStream`` over
the events table, watermarked tumbling/session windows, and a custom
stateful sessionizer on ``applyInPandasWithState``.
"""

from .windows import (  # noqa: F401
    click_purchase_join,
    content_dedup_stream,
    left_outer_view_purchase,
    left_outer_view_purchase_result,
    ohlc_windows,
    run_to_memory,
    run_to_memory_rocksdb,
    session_window_counts,
    sliding_counts,
    standardize_stream,
    stream_events,
    stream_static_enrich,
    tumbling_counts,
)
from .sinks import file_sink_roundtrip, foreach_batch_upsert  # noqa: F401
from .stateful import sessionize, user_stats_tws  # noqa: F401
