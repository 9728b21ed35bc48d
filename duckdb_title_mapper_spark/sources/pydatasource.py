"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic event generator.

This is the Spark-4-native answer to "make 100 TB of load-test data":
the source declares N partitions, each worker generates its stripe
independently from pure integer arithmetic (no driver materialization,
no input files), so generation parallelizes to any cluster width and a
run is bit-reproducible across runs/cluster sizes.  The same formulas
are expressible in one DuckDB ``generate_series`` query, which is what
gives the declared workload query an exact oracle.

Row ``k`` of ``n`` (64-bit integer arithmetic; exact for
``k < 2**63 / 2654435761`` ≈ 3.47e9 rows — beyond that the numpy
vectorized path would wrap int64 silently while the DuckDB oracle
errors, so ``n`` past ~3.4e9 per-source-run is out of contract; shard
multiple source runs rather than raising ``n``):
  user_id      = (k * 2654435761) % 10007          (Knuth multiplicative)
  event_type   = types[k % 4]
  value_millis = (k * 1103515245 + 12345) % 1000000  (LCG step)
  value        = value_millis / 1000.0             (per-row IEEE, exact
                                                    cross-engine)
"""

from __future__ import annotations

EVENT_TYPES = ("click", "view", "purchase", "refund")

SYNTH_SCHEMA = (
    "event_seq BIGINT, user_id BIGINT, event_type STRING, "
    "value_millis BIGINT, value DOUBLE"
)


def synth_row(k: int):
    return (
        k,
        (k * 2654435761) % 10007,
        EVENT_TYPES[k % 4],
        (k * 1103515245 + 12345) % 1000000,
        ((k * 1103515245 + 12345) % 1000000) / 1000.0,
    )


def synth_oracle_sql(n: int) -> str:
    """The generator's exact DuckDB twin over ``generate_series``."""
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""SELECT k AS event_seq,
           (k * 2654435761) % 10007 AS user_id,
           ([{types}])[(k % 4) + 1] AS event_type,
           (k * 1103515245 + 12345) % 1000000 AS value_millis,
           CAST((k * 1103515245 + 12345) % 1000000 AS DOUBLE) / 1000.0
             AS value
    FROM generate_series(0, {n - 1}) AS t(k)"""


def register_synthetic_source(spark):
    """Register the ``synthetic_events`` format on the session.  Defined
    lazily (inside the function) because ``pyspark.sql.datasource``
    subclasses are pickled to workers and the API only exists on
    Spark 4+.  Idempotent per session: re-registration rebuilds the
    lookup entry and re-pickles the class for no benefit (~0.15 s per
    call measured), so repeat calls are no-ops."""
    if getattr(spark, "_dtm_synth_source_registered", False):
        return spark
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", "10000"))
            self.parts = int(options.get("parts", "8"))

        def partitions(self):
            # contiguous stripes: partition i owns [lo, hi) — each worker
            # derives its rows from the partition index alone
            step = -(-self.n // self.parts)
            return [
                InputPartition((i * step, min((i + 1) * step, self.n)))
                for i in range(self.parts)
                if i * step < self.n
            ]

        def read(self, partition):
            # Arrow-batched emission (the API accepts RecordBatches):
            # vectorized numpy arithmetic + one Arrow batch per stripe
            # instead of a per-row Python->JVM pickle round-trip
            import numpy as np
            import pyarrow as pa

            lo, hi = partition.value
            k = np.arange(lo, hi, dtype=np.int64)
            millis = (k * 1103515245 + 12345) % 1000000
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(k, pa.int64()),
                    pa.array((k * 2654435761) % 10007, pa.int64()),
                    pa.array(
                        np.asarray(EVENT_TYPES, dtype=object)[k % 4],
                        pa.string(),
                    ),
                    pa.array(millis, pa.int64()),
                    pa.array(millis / 1000.0, pa.float64()),
                ],
                names=[
                    "event_seq", "user_id", "event_type",
                    "value_millis", "value",
                ],
            )

    class SyntheticEventsSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_events"

        def schema(self):
            return SYNTH_SCHEMA

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    from pyspark.sql.datasource import (
        DataSourceStreamReader,
        SimpleDataSourceStreamReader,
    )

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """Streaming face of the same deterministic generator (Spark 4
        Python Data Source streaming API): offset = {"k": next_row};
        each micro-batch emits up to ``batch`` rows until the ``n`` cap,
        then reports no progress so availableNow / processAllAvailable
        terminates.  The simple reader runs driver-side by design (the
        prefetch-and-replay contract); the partitioned batch reader
        above is the cluster-width path — this one exists to certify
        exactly-once offset/commit semantics with a replayable source
        (readBetweenOffsets re-derives any range from pure integer
        arithmetic, so replay after failure is bit-identical)."""

        def __init__(self, options):
            self.n = int(options.get("n", "10000"))
            self.batch = int(options.get("batch", "1000"))

        def initialOffset(self):
            return {"k": 0}

        def _rows(self, lo, hi):
            # a picklable ITERATOR: the prefetch path calls next() on
            # it directly while replay pickles it — a list_iterator
            # satisfies both (a bare list or generator fails one each)
            return iter([synth_row(k) for k in range(lo, hi)])

        def read(self, start):
            lo = start["k"]
            hi = min(lo + self.batch, self.n)
            return self._rows(lo, hi), {"k": hi}

        def readBetweenOffsets(self, start, end):
            return self._rows(start["k"], end["k"])

    class SyntheticEventsPartitionedStreamReader(DataSourceStreamReader):
        """Cluster-scale streaming face (Spark 4 partitioned streaming
        Python Data Source): the driver only advances the offset
        ({"k": next_row}, ``batch`` rows per trigger up to ``n``);
        ``partitions(start, end)`` splits each micro-batch's offset
        range into ``parts`` stripes and WORKERS generate their stripe
        as one Arrow RecordBatch (same vectorized kernel as the batch
        reader).  This is the shape that generates a 100 TB firehose:
        driver state is two integers, per-trigger work fans out to
        cluster width, and replaying any committed range is pure
        arithmetic."""

        def __init__(self, options):
            self.n = int(options.get("n", "10000"))
            self.batch = int(options.get("batch", "1000"))
            self.parts = int(options.get("parts", "4"))

        def initialOffset(self):
            return {"k": 0}

        def latestOffset(self):
            # advance one batch per trigger; freeze at the cap
            cur = getattr(self, "_cur", 0)
            self._cur = min(cur + self.batch, self.n)
            return {"k": self._cur}

        def partitions(self, start, end):
            lo, hi = start["k"], end["k"]
            step = max(1, -(-(hi - lo) // self.parts))
            return [
                InputPartition((lo + i * step, min(lo + (i + 1) * step, hi)))
                for i in range(self.parts)
                if lo + i * step < hi
            ]

        def read(self, partition):
            import numpy as np
            import pyarrow as pa

            lo, hi = partition.value
            k = np.arange(lo, hi, dtype=np.int64)
            millis = (k * 1103515245 + 12345) % 1000000
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(k, pa.int64()),
                    pa.array((k * 2654435761) % 10007, pa.int64()),
                    pa.array(
                        np.asarray(EVENT_TYPES, dtype=object)[k % 4],
                        pa.string(),
                    ),
                    pa.array(millis, pa.int64()),
                    pa.array(millis / 1000.0, pa.float64()),
                ],
                names=[
                    "event_seq", "user_id", "event_type",
                    "value_millis", "value",
                ],
            )

        def commit(self, end):
            pass

    class SyntheticEventsPartitionedSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_events_pstream"

        def schema(self):
            return SYNTH_SCHEMA

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

        def streamReader(self, schema):
            return SyntheticEventsPartitionedStreamReader(self.options)

    spark.dataSource.register(SyntheticEventsSource)
    spark.dataSource.register(SyntheticEventsPartitionedSource)
    spark._dtm_synth_source_registered = True
    return spark
