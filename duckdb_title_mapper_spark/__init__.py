"""duckdb_title_mapper_spark — a PySpark-native engine with the query and
data-processing capabilities of the ``martin-conur/duckdb-title-mapper``
DuckDB extension, re-expressed Spark-first.

The reference registers one vectorized scalar function
(``standardize_title(VARCHAR) -> VARCHAR``, reference ``src/lib.rs:80-86``)
into a host SQL engine; here :func:`register` is the ``LOAD title_mapper``
analogue — it registers the UDF into a ``SparkSession`` so
``spark.sql("SELECT standardize_title(col) FROM t")`` works, plus the
engine's extension operators (dedup, similarity search, text analysis) as
composable DataFrame transforms.
"""

from __future__ import annotations

__version__ = "0.1.0"

UDF_NAME = "standardize_title"  # reference src/lib.rs:80


def register(spark):
    """Register the engine's SQL surface on a SparkSession (the analogue of
    DuckDB's ``LOAD title_mapper``; before this, the function does not
    exist — mirroring test/sql/title_mapper.test:5-9)."""
    from .functions.table_functions import register_table_functions
    from .operators.standardize import make_standardize_udf

    udf = make_standardize_udf(spark)
    # Deterministic (default) so Catalyst may collapse repeated calls —
    # required for GROUP BY standardize_title(col) correctness (R13).
    spark.udf.register(UDF_NAME, udf)
    register_table_functions(spark)  # split_sentences UDTF, sumsq_mod UDAF
    return spark


def standardize_title(title: str) -> str:
    """Driver-side single-string convenience."""
    from .operators.standardize import standardize_title_str

    return standardize_title_str(title)
