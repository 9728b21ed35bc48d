"""Scale-path operators: salted joins preserve results; bucketed tables
join without an exchange."""

from pyspark.sql import functions as F

from duckdb_title_mapper_spark.operators.skew import salted_join
from duckdb_title_mapper_spark.plans import shuffle_count, without_aqe
from duckdb_title_mapper_spark.sources import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey", buckets=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_bucketed_join_skips_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        "b_orders", str(tmp_path / "b_orders"), "o_orderkey", buckets=4,
    )
    write_bucketed(
        lineitem.select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "b_lineitem", str(tmp_path / "b_lineitem"), "o_orderkey", buckets=4,
    )
    with without_aqe(spark):
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        n_shuffles = shuffle_count(joined)
        # co-located bucketed join: no exchange on either side
        assert n_shuffles == 0, n_shuffles
        assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_approx_stats_within_error_bounds(spark):
    # x_approx_stats is rows-only in the driver gate (sketches are
    # engine-specific); its accuracy contract lives here instead
    from duckdb_title_mapper_spark.workload import all_queries

    [row] = all_queries()["x_approx_stats"].spark_fn(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    orders = load_table(spark, SF, "orders")
    exact_distinct = docs.select("text").distinct().count()
    # HLL default rsd = 5%; allow 3x slack for small-n variance
    assert abs(row.approx_distinct_texts - exact_distinct) <= max(
        0.15 * exact_distinct, 5
    )
    [[exact_median]] = orders.selectExpr(
        "percentile(o_totalprice, 0.5)"
    ).collect()
    assert abs(row.approx_median_price - exact_median) <= 0.05 * exact_median
    assert row.n_docs == docs.count()
    assert row.n_orders == orders.count()
