#!/usr/bin/env python3
"""Single-session ORDER-BALANCED interleaved A/B for round-16 probes.

Loads the committed (old) workload.py as a sibling module
``duckdb_title_mapper_spark.workload_r16_old`` (relative imports resolve
against the live package — fine while the operators' call signatures are
unchanged) and alternates old/new executions of the named queries in ONE
Spark session, flipping order every pass, so host-contention swings hit
both variants equally (the r15 methodology).

Usage: python scripts/ab_r16.py [--repeats N] [--ref GITREF] q1 q2 ...
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_old_workload(ref: str):
    src = subprocess.run(
        ["git", "show", f"{ref}:duckdb_title_mapper_spark/workload.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/workload_r16_old.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "duckdb_title_mapper_spark.workload_r16_old", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["duckdb_title_mapper_spark.workload_r16_old"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    args = sys.argv[1:]
    repeats, ref = 4, "HEAD"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--ref":
            ref = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench
    from pyspark.sql import SparkSession

    import duckdb_title_mapper_spark as engine
    from duckdb_title_mapper_spark.workload import all_queries

    old_mod = load_old_workload(ref)
    old_registry = old_mod.all_queries()

    eff = bench._host_effective_cores()
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r16-ab")
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
    engine.register(spark)
    spark.sql("SELECT standardize_title('warmup query')").collect()

    def run(q):
        t0 = time.time()
        df = q.spark_fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            r.unpersist(True)
        spark.catalog.clearCache()
        return dt, n

    results: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    for p in range(repeats):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for name in names:
            for variant in order:
                q = (old_registry if variant == "old" else registry)[name]
                spark.sparkContext.setJobDescription(f"ab:{name}:{variant}")
                dt, n = run(q)
                results[name][variant].append(round(dt, 3))
                rows[name][variant] = n
    out = {}
    for name in names:
        o, nw = results[name]["old"], results[name]["new"]
        out[name] = {
            "old_best": min(o), "new_best": min(nw),
            "speedup_best": round(min(o) / min(nw), 3),
            "old_runs": o, "new_runs": nw,
            "rows_equal": rows[name]["old"] == rows[name]["new"],
        }
    print(json.dumps({"ab": out, "eff_cores": eff, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
