"""Round-15 operator tests.

x_mutual_best_blocked: the LSH-blocked candidate lane must reproduce
the brute-force mutual-best matching on planted mutual pairs (VERDICT
r14 #5's done-condition).
"""

import numpy as np
import pandas as pd

from duckdb_title_mapper_spark.plans.materialize import materialize as _mat
from duckdb_title_mapper_spark.workload import (
    _MBM_ROUNDS,
    _mutual_best_blocked_lsh_sql,
    _mutual_best_blocked_pairs_sql,
    _mutual_best_spark_rounds,
)


def _planted_mutual_corpus(spark, n_pairs: int = 60, dim: int = 64):
    """n_pairs planted mutual pairs: even vec_id 2i is a random unit
    vector, odd vec_id 2i+1 its near-identical twin (cosine ~0.99999),
    so each even's global best odd IS its twin and vice versa — the
    brute-force mutual-best matching is exactly {(2i, 2i+1)} all in
    round 1.  Twins this tight co-bucket in at least one of the two
    8-plane bands with probability ~1 - 2e-4 per pair (deterministic
    seed, so the outcome is fixed, not flaky)."""
    rng = np.random.RandomState(7)
    base = rng.normal(size=(n_pairs, dim))
    base /= np.linalg.norm(base, axis=1)[:, None]
    twin = base + rng.normal(scale=0.005, size=base.shape)
    twin /= np.linalg.norm(twin, axis=1)[:, None]
    ids, vecs = [], []
    for i in range(n_pairs):
        ids.append(2 * i)
        vecs.append(base[i].astype(np.float32).tolist())
        ids.append(2 * i + 1)
        vecs.append(twin[i].astype(np.float32).tolist())
    pdf = pd.DataFrame({
        "vec_id": pd.Series(ids, dtype="int64"),
        "label": pd.Series([0] * len(ids), dtype="int32"),
        "embedding": vecs,
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")
    return {i: np.asarray(v, dtype=np.float64) for i, v in zip(ids, vecs)}


def _brute_mutual_rounds(vecs: dict, rounds: int = _MBM_ROUNDS):
    """Pure-python replay of the mutual-best rounds over ALL even x odd
    cosine pairs (the brute-force candidate space)."""
    evens = sorted(i for i in vecs if i % 2 == 0)
    odds = sorted(i for i in vecs if i % 2 == 1)
    unit = {i: v / np.linalg.norm(v) for i, v in vecs.items()}
    cos = {(l, r): float(unit[l] @ unit[r]) for l in evens for r in odds}
    live_l, live_r, matched = set(evens), set(odds), {}
    for rnd in range(1, rounds + 1):
        best_r = {l: max(((cos[(l, r)], -r) for r in live_r))
                  for l in live_l}
        best_l = {r: max(((cos[(l, r)], -l) for l in live_l))
                  for r in live_r}
        this = [(l, -br[1]) for l, br in best_r.items()
                if best_l[-br[1]] == (br[0], -l)]
        for l, r in this:
            matched[(l, r)] = rnd
            live_l.discard(l)
            live_r.discard(r)
        if not live_l or not live_r:
            break
    return matched


def test_blocked_matching_reproduces_brute_on_planted_pairs(spark):
    vecs = _planted_mutual_corpus(spark)
    brute = _brute_mutual_rounds(vecs)
    # every planted twin is a round-1 mutual pair by construction
    assert brute == {(2 * i, 2 * i + 1): 1 for i in range(len(vecs) // 2)}

    lsh = _mat(spark.sql(_mutual_best_blocked_lsh_sql(True)))
    lsh.createOrReplaceTempView("__mbb_lsh_test")
    pairs0 = _mat(spark.sql(
        _mutual_best_blocked_pairs_sql(True, "__mbb_lsh_test")))
    got = {(r.lid, r.rid): r.round
           for r in _mutual_best_spark_rounds(pairs0).collect()}
    assert got == brute


def test_blocked_candidates_are_bucket_bounded(spark):
    """The blocked candidate relation must stay far below the full
    bipartite cross (the whole point of the lane): with 2 bands of
    256 buckets over 120 spread-out vectors, candidates ~ n^2/256 per
    band, not n^2/4."""
    _planted_mutual_corpus(spark)
    lsh = _mat(spark.sql(_mutual_best_blocked_lsh_sql(True)))
    lsh.createOrReplaceTempView("__mbb_lsh_test2")
    n_cand = spark.sql(
        _mutual_best_blocked_pairs_sql(True, "__mbb_lsh_test2")).count()
    n_full = 60 * 60
    assert n_cand < n_full / 4
