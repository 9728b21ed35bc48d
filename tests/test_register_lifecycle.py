"""R14 register lifecycle: before ``register(spark)`` the UDF must NOT
resolve — mirroring the reference's pre-LOAD assertion
(``test/sql/title_mapper.test:5-9``: ``Catalog Error: Scalar Function
with name standardize_title does not exist!`` before ``LOAD``, then the
statement succeeds after ``LOAD title_mapper``)."""

import pytest


def test_unregistered_session_rejects_udf(spark):
    import duckdb_title_mapper_spark as engine

    # newSession(): same SparkContext, FRESH SessionState — so a fresh
    # function registry, untouched by register() calls in other tests.
    fresh = spark.newSession()
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        fresh.sql("SELECT standardize_title('data scientist')").collect()
    assert "standardize_title" in str(exc.value).lower()

    # the LOAD analogue makes the same statement succeed (reference
    # test/sql/title_mapper.test:11-14)
    engine.register(fresh)
    [row] = fresh.sql("SELECT standardize_title('data scientist') AS s").collect()
    assert row.s == "Data Scientist - Mathematical Science Occupations, All Other"


def test_register_is_idempotent(spark):
    import duckdb_title_mapper_spark as engine

    s = spark.newSession()
    engine.register(s)
    engine.register(s)  # re-LOAD must not break the registration
    [row] = s.sql("SELECT standardize_title('poet') AS s").collect()
    assert row.s.startswith("Poet - ")
