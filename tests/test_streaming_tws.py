"""transformWithStateInPandas operator (Spark 4 arbitrary-state API).

The API's state-server protocol needs ``protobuf``, which this container
lacks — the test skips there (and the operator stays out of workload.py
for the same reason); on an environment with protobuf it verifies the
running-stats emission against the equivalent batch aggregate.
"""

import pytest

from conftest import SF_DIR

protobuf = pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas state server requires protobuf",
)


def test_user_stats_tws_matches_batch_aggregate(spark):
    from pyspark.sql import functions as F

    from duckdb_title_mapper_spark.sources import load_events
    from duckdb_title_mapper_spark.streaming import (
        run_to_memory_rocksdb,
        stream_events,
        user_stats_tws,
    )

    got = run_to_memory_rocksdb(
        user_stats_tws(stream_events(spark, SF_DIR))
    )
    want = (
        load_events(spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
            F.min(F.unix_micros("ts")).alias("first_ts_us"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
