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
