"""VERDICT r1 #6: the blocked near-dup kernel's straggler escape hatch —
the salted SQL form — must be demonstrated, not just shipped: identical
pair set to the unsalted form, and a plan whose join key actually carries
the salt (so a huge block spreads over ``salt_buckets`` reducers)."""

from duckdb_title_mapper_spark.operators.similarity import near_dup_pairs_sql
from duckdb_title_mapper_spark.plans import explain_str
from duckdb_title_mapper_spark.sources import register_views

SF = "/root/testdata/sf0.001"


def _pairs(spark, sql):
    return sorted(
        (r.vec_a, r.vec_b, r.label, round(r.cosine, 12))
        for r in spark.sql(sql).collect()
    )


def test_salted_form_matches_unsalted_results(spark):
    register_views(spark, SF, "embeddings")
    plain = _pairs(spark, near_dup_pairs_sql(True))
    salted = _pairs(spark, near_dup_pairs_sql(True, salt_buckets=4))
    assert plain == salted
    assert len(plain) > 0  # non-vacuous: the threshold keeps real pairs


def test_salted_form_joins_on_the_salt(spark):
    register_views(spark, SF, "embeddings")
    df = spark.sql(near_dup_pairs_sql(True, salt_buckets=4))
    plan = explain_str(df, "formatted")
    # the equi-join keys must include the pmod-derived salt — that is the
    # whole point: the per-block pair workload hash-spreads 4 ways
    assert "pmod" in plan
    df_plain = spark.sql(near_dup_pairs_sql(True))
    assert "pmod" not in explain_str(df_plain, "formatted")
