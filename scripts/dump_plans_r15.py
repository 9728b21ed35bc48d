#!/usr/bin/env python3
"""Dump .explain("formatted") for the round-15-touched queries to
plans/r15/<query>_<tag>.txt.  Run from the repo (or a worktree at the
baseline commit for the _before tag) with the OUTPUT dir as argv[2].

Usage: python scripts/dump_plans_r15.py <tag> <outdir> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOUCHED = [
    "x_ktruss_peel", "x_harmonic_centrality", "x_luby_mis",
    "x_betweenness_seeded", "x_sssp_bellman", "x_suffix_dup_spans",
    "x_suffix_dup_extract", "x_suffix_dedup_apply", "x_suffix_dup_flow",
    "x_holt_linear", "x_connected_components", "x_dbscan_grid",
    "x_unigram_lm_estep", "x_unigram_segment", "x_unigram_lm_estep2",
    "x_unigram_prune_step", "x_unigram_apply_pruned", "x_setsim_ppjoin",
    "x_stable_matching_gs", "x_kcore_peel", "x_graph_diameter_sweep",
    "x_bfs_levels", "x_hits_scores", "x_label_propagation",
    "x_temporal_reachability", "x_deepwalk_corpus", "x_louvain_rounds",
]


def main():
    tag = sys.argv[1]
    outdir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from duckdb_title_mapper_spark.workload import core_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"r15-plans-{tag}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = core_queries()
    for name in TOUCHED:
        try:
            df = registry[name].spark_fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
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
