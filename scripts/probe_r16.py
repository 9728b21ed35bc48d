#!/usr/bin/env python3
"""Round-15 optimization probe: time named queries in isolation with the
bench's exact session configs and timed action (df.count(), best-of-N,
cache-clear between repeats), and optionally dump .explain("formatted")
to plans/r16/<query>_<tag>.txt.

Usage:
  python scripts/probe_r16.py [--repeats N] [--explain TAG] [--sf SF_DIR] q1 q2 ...

The per-query seconds print to stdout as one JSON line so probes can be
diffed.  eff_cores is recorded like bench.py so numbers are read against
host contention, never raw.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    repeats, explain_tag, sf_dir = 3, None, None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_tag = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "HEADLINE":
            import bench as _b
            names.extend(_b.HEADLINE); i += 1
        else:
            names.append(a); i += 1
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench
    from pyspark.sql import SparkSession

    from duckdb_title_mapper_spark.workload import all_queries

    eff = bench._host_effective_cores()
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r16-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()

    import duckdb_title_mapper_spark as engine

    engine.register(spark)
    spark.sql("SELECT standardize_title('warmup query')").collect()
    if any(n.startswith(("stream_", "src_python")) for n in names):
        from duckdb_title_mapper_spark.sources.pydatasource import (
            register_synthetic_source,
        )

        register_synthetic_source(spark)
        (spark.read.format("synthetic_events").option("n", "32")
         .option("parts", "1").load().count())
        _wq = (spark.readStream.format("synthetic_events")
               .option("n", "32").option("batch", "32").load()
               .writeStream.format("memory")
               .queryName("__probe_stream_warm")
               .outputMode("append").start())
        try:
            _wq.processAllAvailable()
        finally:
            _wq.stop()

    out: dict[str, float] = {}
    spreads: dict[str, float] = {}
    rows: dict[str, int] = {}
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _pass in range(repeats):
        for name in names:
            q = registry[name]
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            df = q.spark_fn(spark, sf_dir)
            rows[name] = df.count()
            runs[name].append(time.time() - t0)
            for r in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                r.unpersist(True)
            spark.catalog.clearCache()
    for name in names:
        out[name] = round(min(runs[name]), 3)
        spreads[name] = round(max(runs[name]) - min(runs[name]), 3)
    if explain_tag:
        os.makedirs("plans/r16", exist_ok=True)
        for name in names:
            df = registry[name].spark_fn(spark, sf_dir)
            with open(f"plans/r16/{name}_{explain_tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    print(json.dumps({"queries": out, "spread": spreads, "rows": rows,
                      "eff_cores": eff, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
