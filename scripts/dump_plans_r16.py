#!/usr/bin/env python3
"""Dump .explain("formatted") for the round-16-touched queries to
<outdir>/<query>_<tag>.txt.  Loop queries hide their per-round work
behind checkpoint/persist scans in the final plan, so the dump also
monkeypatches plans.materialize to capture the PRE-materialization plan
of every intermediate relation (``<query>_<tag>_mat<N>.txt``) — the
round interiors are where the r16 claims (SMJ->BHJ, window->fold,
fused snapshots) are visible.

Run from the repo for the _after tag, or from a /tmp worktree at the
baseline commit for _before (pass the repo's plans/r16 as outdir).

Usage: python scripts/dump_plans_r16.py <tag> <outdir> [sf_dir] [q1 q2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOUCHED = [
    "x_node2vec_walks", "x_louvain_rounds", "x_boruvka_msf",
    "x_ktruss_peel",
]


def main():
    tag = sys.argv[1]
    outdir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:] or TOUCHED
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from duckdb_title_mapper_spark.plans import materialize as matmod
    from duckdb_title_mapper_spark.workload import core_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"r16-plans-{tag}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def explain_txt(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    state = {"name": None, "n": 0}
    real_mat = matmod.materialize
    real_mata = matmod.materialize_adaptive

    def _capture(df):
        state["n"] += 1
        path = os.path.join(
            outdir, f"{state['name']}_{tag}_mat{state['n']:02d}.txt")
        try:
            with open(path, "w") as f:
                f.write(explain_txt(df))
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            with open(path, "w") as f:
                f.write(f"EXPLAIN FAILED: {e}\n")

    def mat_spy(df, mode=None):
        _capture(df)
        return real_mat(df, mode)

    def mata_spy(df):
        _capture(df)
        return real_mata(df)

    matmod.materialize = mat_spy
    matmod.materialize_adaptive = mata_spy

    registry = core_queries()
    for name in names:
        state["name"], state["n"] = name, 0
        try:
            df = registry[name].spark_fn(spark, sf_dir)
            txt = explain_txt(df)
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            txt = f"EXPLAIN FAILED: {e}\n"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(name, "done", file=sys.stderr)
        for r in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            r.unpersist(True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
