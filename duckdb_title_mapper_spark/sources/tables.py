"""Table loaders for the driver testdata and generic schema'd file IO.

``events.ts`` is parquet INT64 TIMESTAMP(NANOS), which Spark 4 rejects
outright; it is read as raw nanos (``spark.sql.legacy.parquet.nanosAsLong``)
and rebuilt as a microsecond timestamp.  Sub-microsecond precision is not
observable in any declared query (buckets ≥ 1 s, orderings tie-break on
ids), and DuckDB's TIMESTAMP_NS view of the same column agrees at µs.
"""

from __future__ import annotations

EVENT_SCHEMA_RAW = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def load_table(spark, sf_dir: str, name: str):
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark, sf_dir: str):
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # date_trunc / window() truncate in the SESSION timezone; DuckDB's
    # tz-free TIMESTAMP truncates wall time.  They agree only in UTC (or
    # any whole-hour offset) — pin it so parity can't depend on the host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark, sf_dir: str, *names: str):
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# generic schema'd file IO
# ---------------------------------------------------------------------------

def read_csv(spark, path: str, schema: str, header: bool = True, **options):
    """CSV with a declared schema (no inference scan)."""
    return (
        spark.read.options(header=str(header).lower(), **options)
        .schema(schema)
        .csv(path)
    )


def read_json(spark, path: str, schema: str, **options):
    """JSON-lines with a declared schema (no inference scan)."""
    return spark.read.options(**options).schema(schema).json(path)


def write_parquet(df, path: str, partition_by: tuple[str, ...] = (),
                  mode: str = "overwrite"):
    """Partitioned parquet sink — ``partition_by`` low-cardinality keys
    give partition-pruned scans downstream."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def write_bucketed(df, table: str, path: str, key: str, buckets: int = 8,
                   mode: str = "overwrite"):
    """Bucketed external table: co-locates rows by ``key`` hash at WRITE
    time, so later equi-joins/aggregations on ``key`` between tables with
    matching bucketing skip the exchange entirely — the 100 TB answer to
    repeated joins on the same key (pay the shuffle once, at ingest)."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
    return table


def write_csv(df, path: str, header: bool = True, mode: str = "overwrite"):
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
    return path


def write_json(df, path: str, mode: str = "overwrite"):
    df.write.mode(mode).json(path)
    return path
