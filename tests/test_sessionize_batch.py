"""Batch sessionizer semantics: gap boundary (strict >), timestamp
tie-break on event_id, per-user session numbering, and agreement with
a pure-Python oracle on real data."""

import pytest


def _mk_events(spark, rows):
    vals = ",".join(
        f"({eid}, timestamp'{ts}', {uid}, CAST({val} AS DOUBLE))"
        for eid, ts, uid, val in rows
    )
    return spark.sql(
        f"SELECT event_id, ts, user_id, value FROM (VALUES {vals})"
        " AS t(event_id, ts, user_id, value)"
    )


def test_gap_boundary_strict(spark):
    """A gap of exactly gap_seconds does NOT split; one micro more does."""
    from duckdb_title_mapper_spark.operators.sessionize import sessionize_batch

    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, 1.0),
            (2, "2024-01-01 00:10:00", 1, 1.0),        # exactly 600 s
            (3, "2024-01-01 00:20:00.000001", 1, 1.0),  # 600 s + 1 us
        ],
    )
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize_batch(ev, gap_seconds=600).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_tiebreak_and_per_user_numbering(spark):
    """Duplicate timestamps order by event_id; sessions number per user."""
    from duckdb_title_mapper_spark.operators.sessionize import session_stats

    ev = _mk_events(
        spark,
        [
            (10, "2024-01-01 00:00:00", 1, 2.0),
            (11, "2024-01-01 00:00:00", 1, 3.0),  # same ts, same session
            (12, "2024-01-01 09:00:00", 1, 5.0),  # new session
            (20, "2024-01-01 00:00:00", 2, 7.0),  # other user -> seq 1
        ],
    )
    rows = {
        (r["user_id"], r["session_seq"]): (r["n_events"], float(r["total_value"]))
        for r in session_stats(ev, gap_seconds=1800).collect()
    }
    assert rows == {(1, 1): (2, 5.0), (1, 2): (1, 5.0), (2, 1): (1, 7.0)}


def test_matches_pure_python_oracle(spark, sf_dir):
    """Sessions-per-user match an independent pure-Python scan of the
    same events (the same oracle style the streaming sessionizer's
    tests use)."""
    from pyspark.sql import functions as F

    from duckdb_title_mapper_spark.sources.tables import load_events
    from duckdb_title_mapper_spark.operators.sessionize import sessionize_batch

    batch = (
        sessionize_batch(load_events(spark, sf_dir), gap_seconds=1800)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"))
    )
    pdf = (
        load_events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
    )
    expected = {}
    for uid, grp in pdf.groupby("user_id"):
        n = 0
        last = None
        for _, row in grp.sort_values(["ts", "event_id"]).iterrows():
            us = int(row["ts"].value) // 1000
            if last is None or us - last > 1800 * 1_000_000:
                n += 1
            last = us
        expected[int(uid)] = n
    got = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert got == expected
