"""End-to-end pipeline composability: the operators chain the way a real
training-data pipeline would — media -> features -> LSH buckets ->
near-dup candidates -> connected components -> dedup keepers."""

from pyspark.sql import functions as F

from duckdb_title_mapper_spark.operators.graph import connected_components
from duckdb_title_mapper_spark.operators.multimodal import (
    extract_features,
    media_table,
)
from duckdb_title_mapper_spark.operators.similarity import (
    cosine_near_dup_pairs_grouped,
    with_lsh_bucket,
)

SF = "/root/testdata/sf0.001"


def test_media_features_to_dedup_groups(spark):
    # 1. media -> feature vectors (byte histograms)
    media = media_table(spark, SF).where("media_id < 120")
    feats = extract_features(media, bins=16).select(
        F.col("media_id").alias("vec_id"),
        F.expr("transform(features, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )
    # 2. LSH bucket on the features (dim=16)
    bucketed = with_lsh_bucket(feats, num_planes=4, dim=16)
    assert bucketed.where("bucket < 0 OR bucket > 15").count() == 0

    # 3. near-dup pairs within buckets (block col = bucket)
    pairs = cosine_near_dup_pairs_grouped(
        bucketed, block_col="bucket", threshold=0.999
    )
    n_pairs = pairs.count()
    assert n_pairs > 0  # same-text docs share identical histograms

    # 4. transitive closure -> dedup groups
    comps = connected_components(pairs, src="vec_a", dst="vec_b")
    groups = comps.groupBy("component").agg(F.count("*").alias("size"))
    assert groups.count() >= 1
    # every member maps to the min id of its component
    bad = comps.where(F.col("component") > F.col("vertex")).count()
    assert bad == 0
