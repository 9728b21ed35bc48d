"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

This is the shape Spark's built-in operators can't express: arbitrary
per-key state (the open session) mutated by each micro-batch, emitting a
row whenever a session *closes* (a later event for the same user arrives
``gap`` or more after the previous one).  The open session survives in the
state store across batches; at scale the state is O(active users).

Emission contract: a session is emitted only when a successor event
proves it closed.  Each user's final (still-open) session is therefore
never emitted — with a single availableNow batch this makes the output an
exact, deterministic function of the input, which is what gives the
declared query a DuckDB oracle (gaps-and-islands minus each user's last
island).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

SESSION_SCHEMA = (
    "user_id BIGINT, session_start BIGINT, session_end BIGINT, n_events BIGINT"
)
_STATE_SCHEMA = "start BIGINT, last_ts BIGINT, n BIGINT"


def _sessionize_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last_ts, n = state.get
        else:
            start = last_ts = None
            n = 0
        closed = []
        # Spark may deliver one group as SEVERAL Arrow chunks; sorting each
        # chunk independently would interleave out-of-order timestamps, so
        # gather the whole batch's group before the single sort.  Per-group
        # per-batch volume is what the watermark already bounds.
        all_ts: list[int] = []
        for pdf in pdf_iter:
            all_ts.extend(int(t) for t in pdf["ts_us"])
        for ts in sorted(all_ts):
            if last_ts is None:
                start, last_ts, n = ts, ts, 1
            elif ts - last_ts >= gap_us:
                closed.append((user_id, start, last_ts, n))
                start, last_ts, n = ts, ts, 1
            else:
                last_ts = ts
                n += 1
        if last_ts is not None:
            state.update((start, last_ts, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def sessionize(events_sdf, gap_minutes: int = 30):
    """Streaming (user_id, session_start, session_end, n_events) for every
    CLOSED session.  ``events_sdf`` needs ``user_id`` and a ``ts``
    timestamp column."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events_sdf.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_minutes * 60_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
