"""The materialization mechanism is a deployment choice (VERDICT r1 #3):
``local`` (localCheckpoint — fast, not fault-tolerant) vs ``reliable``
(persist MEMORY_AND_DISK with lineage kept).  Both modes must produce
identical results for every operator that materializes intermediates."""

import pytest


@pytest.fixture()
def edges(spark):
    return spark.sql(
        "SELECT * FROM VALUES (1, 2), (2, 3), (10, 11), (20, 21), "
        "(21, 22), (22, 23) AS e(src, dst)"
    )


def _cc(edges, mode, monkeypatch):
    from duckdb_title_mapper_spark.operators.graph import connected_components

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", mode)
    return sorted(
        (r.vertex, r.component) for r in connected_components(edges).collect()
    )


def test_connected_components_same_in_both_modes(spark, edges, monkeypatch):
    local = _cc(edges, "local", monkeypatch)
    reliable = _cc(edges, "reliable", monkeypatch)
    assert local == reliable
    assert local == [
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    ]


def test_fuzzy_match_same_in_both_modes(spark, monkeypatch):
    from pyspark.sql import functions as F

    from duckdb_title_mapper_spark.operators.fuzzy import fuzzy_match_tfidf

    queries = spark.sql(
        "SELECT * FROM VALUES (0, 'alpha beta'), (1, 'gamma delta riff') "
        "AS q(qid, qtext)"
    )
    corpus = spark.sql(
        "SELECT * FROM VALUES (0, 'alpha beta'), (1, 'beta gamma'), "
        "(2, 'gamma delta') AS c(cid, ctext)"
    )

    def run(mode):
        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", mode)
        out = fuzzy_match_tfidf(queries, corpus, materialize=True)
        return sorted(tuple(r) for r in out.collect())

    assert run("local") == run("reliable")


def test_reliable_mode_keeps_lineage(spark, edges, monkeypatch):
    # persist keeps the logical plan recomputable: the storage level is
    # set and the plan is NOT replaced by a checkpoint scan
    from duckdb_title_mapper_spark.plans.materialize import materialize

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "reliable")
    out = materialize(edges.selectExpr("src + dst AS s"))
    try:
        assert out.storageLevel.useMemory or out.storageLevel.useDisk
        assert "LocalTableScan" in out._jdf.queryExecution().analyzed().toString() \
            or "Project" in out._jdf.queryExecution().analyzed().toString()
    finally:
        out.unpersist()


def test_invalid_mode_rejected(monkeypatch):
    from duckdb_title_mapper_spark.plans.materialize import materialize_mode

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "bogus")
    with pytest.raises(ValueError):
        materialize_mode()
