"""Table loaders for the driver testdata and generic schema'd file IO.

``events.ts`` is parquet INT64 TIMESTAMP(NANOS).  How Spark reads that
changed across 4.x: 4.0 rejects it unless
``spark.sql.legacy.parquet.nanosAsLong`` exposes raw nanos (rebuilt here
to a µs timestamp), while 4.1+ reads it natively as a µs-truncated
``timestamp_ntz`` and ignores the legacy conf.  ``load_events`` detects
which behavior the running Spark exhibits and normalizes both to the same
session-tz (UTC) microsecond TIMESTAMP, so every downstream query sees
one schema regardless of version.  Sub-microsecond precision is not
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


def events_ts_read_type(spark, sf_dir: str) -> str:
    """How THIS Spark materializes the nanos column: 'bigint' (4.0 +
    nanosAsLong) or 'timestamp_ntz' (4.1+ native µs-truncated read)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed entirely in some future version
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dict(df.dtypes)["ts"]


def normalize_events_ts(df):
    """Rebuild ``ts`` as a session-tz microsecond TIMESTAMP from whichever
    raw form the reader produced (floor-truncation to µs in both paths)."""
    from pyspark.sql import functions as F

    t = dict(df.dtypes)["ts"]
    if t == "bigint":  # raw nanos
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if t == "timestamp_ntz":  # native read, already µs; reinterpret in UTC
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df  # already a plain timestamp


def load_events(spark, sf_dir: str):
    # date_trunc / window() truncate in the SESSION timezone; DuckDB's
    # tz-free TIMESTAMP truncates wall time.  They agree only in UTC (or
    # any whole-hour offset) — pin it so parity can't depend on the host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


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
