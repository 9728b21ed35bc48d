"""AQE skew-join demonstration for the gram join-back (VERDICT r5 #7).

The substring/boilerplate family's claim is that hot gram keys (true
boilerplate appearing in thousands of documents) are handled by AQE's
skew-split.  This test makes the claim EXECUTABLE — a planted hot key
must produce ``SortMergeJoin(skew=true)`` in the final adaptive plan —
and pins the plan-shape precondition discovered while writing it:

**OptimizeSkewedJoin only fires when BOTH SortMergeJoin children are
sorts over bare shuffle stages.**  The naive join-back
``grams JOIN (SELECT g, count(..) FROM grams GROUP BY g)`` has the
aggregate BETWEEN the sort and the shuffle on the build side, so Spark
never skew-splits that shape, whatever the thresholds (verified:
forceOptimizeSkewedJoin + 1KB thresholds still leave skew=false).  The
scale-correct form materializes the (vocabulary-sized) df relation
first — exactly what x_substring_dup_rolling's census pattern does —
after which both sides are plain shuffle reads and the skew reader
kicks in.  (At bench scale the df relation broadcasts instead, which
sidesteps skew entirely; this test disables broadcast to model the
100 TB case where the vocabulary no longer fits.)
"""

import hashlib

import pandas as pd

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _planted_hot_corpus(spark):
    """5000 docs of periodic text ("XY"*64) whose stride-8 32-char spans
    are ALL the same fingerprint — one massively hot gram key — plus a
    200-doc unique tail for the median."""
    rows = [(i, "XY" * 64) for i in range(5000)]
    rows += [
        (i, hashlib.md5(f"doc{i}".encode()).hexdigest() * 4)
        for i in range(5000, 5200)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")


def test_hot_gram_key_triggers_aqe_skew_split(spark):
    from duckdb_title_mapper_spark.operators.grams import census_sql
    from duckdb_title_mapper_spark.plans.materialize import materialize

    old = _with_confs(spark, _SKEW_CONFS)
    try:
        _planted_hot_corpus(spark)
        spark.sql(census_sql(True)).createOrReplaceTempView("__gram_census")
        gcount = materialize(
            spark.sql(
                """SELECT g32 AS g, count(DISTINCT doc_id) AS n_docs_with
                FROM __gram_census WHERE g32 IS NOT NULL GROUP BY g32"""
            )
        )
        gcount.createOrReplaceTempView("__skew_gcount")
        df = spark.sql(
            """SELECT gr.doc_id, gc.n_docs_with
            FROM (SELECT doc_id, g32 AS g FROM __gram_census
                  WHERE g32 IS NOT NULL) gr
            JOIN __skew_gcount gc ON gr.g = gc.g"""
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead" in plan
    finally:
        _restore(spark, old)


def test_aggregate_build_side_blocks_skew_split(spark):
    """The negative control that documents WHY the materialized form is
    the scale shape: with the df aggregate inlined on the build side,
    Spark's OptimizeSkewedJoin never fires even under forced/1KB
    settings — the hot partition just runs as one straggler task."""
    from duckdb_title_mapper_spark.operators.grams import census_sql

    confs = dict(_SKEW_CONFS)
    confs["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"] = "1KB"
    confs["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = "1KB"
    old = _with_confs(spark, confs)
    try:
        _planted_hot_corpus(spark)
        spark.sql(census_sql(True)).createOrReplaceTempView("__gram_census")
        df = spark.sql(
            """WITH grams AS (SELECT doc_id, g32 AS g FROM __gram_census
                              WHERE g32 IS NOT NULL),
            gcount AS (SELECT g, count(DISTINCT doc_id) AS n_docs_with
                       FROM grams GROUP BY g)
            SELECT gr.doc_id, gc.n_docs_with
            FROM grams gr JOIN gcount gc ON gr.g = gc.g"""
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan
        assert "skew=true" not in plan
    finally:
        _restore(spark, old)
