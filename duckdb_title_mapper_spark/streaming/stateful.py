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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's arbitrary-state API)
# ---------------------------------------------------------------------------

USER_STATS_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, max_value DOUBLE, "
    "first_ts_us BIGINT, last_ts_us BIGINT"
)
_USER_STATS_STATE_SCHEMA = "n BIGINT, mx DOUBLE, f BIGINT, l BIGINT"


class _UserStatsProcessor:
    """Per-user running stats on Spark 4's ``transformWithStateInPandas``
    (the successor API to ``applyInPandasWithState``: named state
    variables on a ``StatefulProcessorHandle``, RocksDB-backed).

    Emission contract: one row of RUNNING totals per user per micro-batch
    the user appears in.  The staged source is a single file, so an
    ``availableNow`` run is one batch and the output is exactly the
    per-user batch aggregate — which is what gives the declared query a
    DuckDB oracle.  Every accumulator (count, max, min/max ts) is
    order-independent, so emitted values never depend on Arrow chunking.
    State is O(users); on an unbounded deployment you'd attach a TTL
    (``getValueState(..., ttlDurationMs=...)``) to bound it.
    """

    def init(self, handle):
        self._state = handle.getValueState("stats", _USER_STATS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        (user_id,) = key
        st = self._state.get() if self._state.exists() else None
        n, mx, f, l = st if st is not None else (0, None, None, None)
        for pdf in rows:
            if pdf.empty:
                continue
            n += len(pdf)
            bmx = float(pdf["value"].max())
            bf = int(pdf["ts_us"].min())
            bl = int(pdf["ts_us"].max())
            mx = bmx if mx is None else max(mx, bmx)
            f = bf if f is None else min(f, bf)
            l = bl if l is None else max(l, bl)
        self._state.update((n, mx, f, l))
        yield pd.DataFrame(
            [(user_id, n, mx, f, l)],
            columns=["user_id", "n_events", "max_value",
                     "first_ts_us", "last_ts_us"],
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def handleInitialState(self, key, initial_state, timer_values):
        pass

    def close(self):
        pass


def user_stats_tws(events_sdf):
    """Streaming per-user running stats via ``transformWithStateInPandas``.

    Requires the RocksDB state store provider (the API rejects the
    default HDFS-backed one); the caller pins it per-run — see
    ``run_to_memory_rocksdb``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so module import works even on a Spark without
    # the API (the class body above is plain Python)
    proc = type("UserStatsProcessor", (_UserStatsProcessor, StatefulProcessor), {})()

    prepared = events_sdf.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=USER_STATS_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
