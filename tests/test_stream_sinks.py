"""File-sink exactly-once: re-running the same stream against the same
checkpoint + output path must not duplicate rows (the sink's commit log
plus the source's processed-file log make the rerun a no-op)."""

import os
import tempfile

SF_DIR = "/root/testdata/sf0.001"


def test_file_sink_rerun_is_noop(spark):
    from duckdb_title_mapper_spark.streaming import stream_events

    out = tempfile.mkdtemp(prefix="dtm_sink_once_")
    data, chk = os.path.join(out, "data"), os.path.join(out, "chk")

    def run():
        q = (
            stream_events(spark, SF_DIR)
            .writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n1 = spark.read.parquet(data).count()
    assert n1 > 0
    run()  # same checkpoint: no new input files -> no new output
    n2 = spark.read.parquet(data).count()
    assert n2 == n1
