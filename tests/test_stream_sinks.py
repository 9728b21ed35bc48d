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


def test_bad_csv_permissive_manifest(spark):
    """Pin the PERMISSIVE-mode parse the src_csv_badrecords oracle
    encodes, line by line (ADVICE r3): current Spark marks a too-short
    row ('5,50') corrupt under an explicit schema — historically short
    rows were null-padded without being flagged.  If a future Spark
    changes parser semantics this fails HERE, pointing at the static
    oracle that then needs re-deriving."""
    import tempfile

    from duckdb_title_mapper_spark.workload import _BAD_CSV_LINES

    d = tempfile.mkdtemp(prefix="dtm_bad_csv_")
    with open(os.path.join(d, "part-000.csv"), "w") as f:
        f.write("\n".join(_BAD_CSV_LINES) + "\n")
    rows = {
        r.id: r
        for r in spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("id BIGINT, qty INT, tag STRING, _corrupt_record STRING")
        .csv(d)
        .collect()
    }
    assert len(rows) == 6
    corrupt = {i for i, r in rows.items() if r._corrupt_record is not None}
    # type-mismatch row and short row are corrupt; empty field is a
    # legal NULL on a good row
    assert corrupt == {2, 5}
    assert rows[4]._corrupt_record is None and rows[4].qty is None
    good_qty = sum(r.qty for r in rows.values()
                   if r._corrupt_record is None and r.qty is not None)
    assert good_qty == 100  # the oracle's qty_sum
