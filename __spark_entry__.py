"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` / ``oracle_sql()`` — the declared operator surface from
SURVEY.md §2, backed by ``duckdb_title_mapper_spark.workload`` (each query
verified locally against its DuckDB oracle with exact value compare via
``scripts/check_oracle.py`` — stricter than the driver's hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: standardize the reference's own 104-title example
    corpus (examples/test_query.sql:5-110) with the full TF-IDF match
    pipeline, roll up by BLS category, and join a star-schema aggregate
    from the sf0.001 parquet tables."""
    from pyspark.sql import functions as F

    import duckdb_title_mapper_spark as engine
    from duckdb_title_mapper_spark.reference_goldens import CORPUS_104
    from duckdb_title_mapper_spark.workload import load

    engine.register(spark)
    sf_dir = "/root/testdata/sf0.001"

    from duckdb_title_mapper_spark.workload import _corpus_df

    titles = _corpus_df(spark, CORPUS_104)
    categories = (
        titles.select(
            F.expr("standardize_title(title)").alias("standardized")
        )
        .select(
            F.split_part("standardized", F.lit(" - "), F.lit(2)).alias("bls_category")
        )
        .groupBy("bls_category")
        .agg(F.count("*").alias("title_count"))
    )

    # a small relational rollup from the star schema, cross-checked shape
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    seg = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"),
        )
    )
    return categories.crossJoin(
        seg.agg(
            F.count("*").alias("segments"),
            F.sum("order_count").alias("orders_total"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from duckdb_title_mapper_spark.workload import all_queries

    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from duckdb_title_mapper_spark.workload import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
