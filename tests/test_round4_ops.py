"""Semantic tests for the round-4 operators: the SemDeDup keeper rule,
the BM25 monotonicity properties, and winnowing's coverage guarantee.
Cross-engine exactness is covered by the oracle parity suite; these pin
the OPERATOR SEMANTICS against small hand-checkable inputs so a future
refactor cannot silently change meaning while staying self-consistent.
"""

import math

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_semantic_dedup_keeper_rule(spark):
    """dup_of must be the MINIMUM same-cluster lower-id member with
    cosine >= tau, kept iff none exists — recomputed independently in
    pure Python from the same parquet."""
    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        r.vec_id: (r.cluster_id, r.dup_of, r.kept)
        for r in all_queries()["x_semantic_dedup"].spark_fn(spark, SF_DIR).collect()
    }

    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in raw}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    cents = {cid: vecs[cid] for cid in range(16)}
    assign = {
        vid: min(cents, key=lambda c: (l2(v, cents[c]), c))
        for vid, v in vecs.items()
    }
    nrm = {vid: math.sqrt(dot(v, v)) for vid, v in vecs.items()}

    for vid, v in vecs.items():
        sims = [
            o
            for o in vecs
            if o < vid
            and assign[o] == assign[vid]
            and dot(vecs[o], v) / (nrm[o] * nrm[vid]) >= 0.35
        ]
        cluster_id, dup_of, kept = got[vid]
        assert cluster_id == assign[vid], vid
        assert dup_of == (min(sims) if sims else None), vid
        assert kept == (not sims), vid


def test_bm25_monotonicity_and_bounds(spark):
    """Recompute BM25 in pure Python from token stats and compare the
    top-20 (ids and nano-unit scores) exactly; also sanity-check the
    score is positive and docs containing no query term are absent."""
    import duckdb

    # core_queries: the UNWRAPPED form, so delivered order is the
    # operator's own rank order (the registry wrapper re-sorts by all
    # columns for the driver gate)
    from duckdb_title_mapper_spark.workload import core_queries

    got = [
        (r.doc_id, r.score_s9)
        for r in core_queries()["x_bm25_topk"].spark_fn(spark, SF_DIR).collect()
    ]
    assert len(got) == 20
    assert all(s > 0 for _, s in got)

    import re

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    toks = {d: re.findall(r"\w+", t.lower()) for d, t in docs.items()}
    n = float(len(docs))
    terms = ("spark", "window", "merge")
    df = {
        t: float(sum(1 for ts in toks.values() if t in ts)) for t in terms
    }
    avgdl = sum(len(ts) for ts in toks.values()) / n

    def score(d):
        # nano-units; python round() is banker's vs SQL half-up, so the
        # comparison below allows +/-2 nano-units per score
        s = 0
        for t in terms:
            tf = float(toks[d].count(t))
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            term = idf * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * (len(toks[d]) / avgdl))
            )
            s += int(round(term * 1e9))
        return s

    expect = sorted(
        ((d, score(d)) for d in docs if score(d) > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, s_got), (_, s_exp) in zip(got, expect):
        assert abs(s_got - s_exp) <= 2, (s_got, s_exp)


def test_winnowing_coverage_guarantee(spark):
    """The winnowing theorem: two documents sharing a substring of
    length >= w + k - 1 (= 11 for k=8, w=4) MUST share at least one
    fingerprint hash.  Crafted pair shares a 24-char run; a third doc
    shares nothing.  Checked through the real operator by planting the
    docs in a temp view that shadows the documents table."""
    from duckdb_title_mapper_spark.workload import _winnow_final_sql, _winnow_fp_sql

    shared = "the quick brown fox jump"  # 24 chars >> 11
    rows = [
        (1, "AAAA " + shared + " 1111"),
        (2, "BBBBBBB " + shared + " 22"),
        (3, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").createOrReplaceTempView(
        "documents"
    )
    try:
        fp = spark.sql(_winnow_fp_sql(True))
        fp.createOrReplaceTempView("__winnow_fp_test")
        out = {
            r.doc_id: r.asDict()
            for r in spark.sql(_winnow_final_sql("__winnow_fp_test")).collect()
        }
        assert out[1]["n_shared_fps"] >= 1
        assert out[2]["n_shared_fps"] >= 1
        assert out[3]["n_shared_fps"] == 0
        # and the sampler property: fingerprints ~ 2/(w+1) of grams
        for d in (1, 2, 3):
            assert out[d]["n_fingerprints"] <= out[d]["n_grams"]
    finally:
        spark.catalog.dropTempView("documents")
