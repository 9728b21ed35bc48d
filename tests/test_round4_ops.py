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


def test_gopher_rules_independent_recompute(spark):
    """Per-doc Gopher verdict recomputed in pure Python (re + Counter)
    from the same parquet: every stat column and the integerized pass
    flag must agree exactly."""
    import re
    from collections import Counter

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        r.doc_id: r.asDict()
        for r in all_queries()["x_gopher_rules"].spark_fn(spark, SF_DIR).collect()
    }

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(docs)
    n_passing = 0
    for doc_id, text in docs:
        toks = re.findall(r"\w+", text.lower())
        wc = len(toks)
        cs = sum(len(t) for t in toks)
        alpha = sum(1 for t in toks if re.fullmatch(r"[a-z]+", t))
        bigrams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        top = max(bigrams.values()) if bigrams else None
        nb = sum(bigrams.values()) if bigrams else None
        r = got[doc_id]
        assert r["word_count"] == wc
        assert r["mean_word_len"] == (cs / wc if wc else None)
        assert r["alpha_frac"] == (alpha / wc if wc else None)
        assert r["top_bigram_frac"] == (top / nb if nb else None)
        expect_pass = int(
            50 <= wc <= 100000
            and 3 * wc <= cs <= 10 * wc
            and 5 * alpha >= 4 * wc
            and nb is not None
            and 5 * top <= nb
        )
        assert r["passes_gopher"] == expect_pass
        n_passing += expect_pass
    # the synthetic corpus must exercise BOTH branches or the flag is vacuous
    assert 0 < n_passing < len(docs)


def test_gopher_rules_edge_docs(spark):
    """Crafted edge docs through the real SQL: empty text, single-word
    doc (no bigrams -> NULL ratios, fails), repeated-bigram doc (fails
    the concentration gate), and a passing doc."""
    from duckdb_title_mapper_spark.workload import _gopher_rules_sql

    passing = " ".join(
        f"w{chr(97 + i % 26)}{chr(97 + (i * 7) % 26)}bird" for i in range(80)
    )
    rows = [
        (1, ""),
        (2, "hello"),
        (3, "spam ham " * 60),
        (4, passing),
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").createOrReplaceTempView(
        "documents"
    )
    try:
        out = {
            r.doc_id: r.asDict()
            for r in spark.sql(_gopher_rules_sql(True)).collect()
        }
        assert out[1]["word_count"] == 0 and out[1]["passes_gopher"] == 0
        assert out[2]["top_bigram_frac"] is None and out[2]["passes_gopher"] == 0
        # doc 3: one bigram dominates -> concentration gate fails
        assert out[3]["top_bigram_frac"] > 0.2 and out[3]["passes_gopher"] == 0
        assert out[4]["passes_gopher"] == 1
    finally:
        spark.catalog.dropTempView("documents")


def test_tokenizer_fertility_independent_recompute(spark):
    """Per-source fertility recomputed with Python re over the same
    parquet; ratios must be the identical IEEE divisions."""
    import re
    from collections import defaultdict

    import duckdb

    from duckdb_title_mapper_spark.workload import _BPE_PAT, all_queries

    got = {
        r.source: r.asDict()
        for r in all_queries()["x_tokenizer_fertility"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }

    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, bpe, words, chars
    for source, text in duckdb.sql(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall():
        a = agg[source]
        a[0] += 1
        a[1] += len(re.findall(_BPE_PAT, text))
        a[2] += len(re.findall(r"\w+", text))
        a[3] += len(text)
    assert set(got) == set(agg)
    for source, (n, bpe, words, chars) in agg.items():
        r = got[source]
        assert (r["n_docs"], r["bpe_tokens"], r["word_tokens"],
                r["total_chars"]) == (n, bpe, words, chars)
        assert r["fertility"] == bpe / words
        assert r["chars_per_token"] == chars / bpe


def test_hybrid_rrf_independent_recompute(spark):
    """RRF fusion recomputed in pure Python from the two parquet tables:
    BM25 side via duckdb (its list is integer-certified separately by
    check_oracle on x_bm25_topk), vector side via exact cosine in
    Python, fusion + ranks re-derived and compared field-by-field."""
    import math

    import duckdb

    from duckdb_title_mapper_spark.workload import _bm25_sql, all_queries

    got = {
        r.id: r.asDict()
        for r in all_queries()["x_hybrid_rrf"].spark_fn(spark, SF_DIR).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    lex = [r[0] for r in con.execute(_bm25_sql(False)).fetchall()]
    lex_rank = {d: i + 1 for i, d in enumerate(lex)}

    raw = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in raw}
    q = vecs[0]
    qn = math.sqrt(sum(x * x for x in q))

    def cos(v):
        return sum(x * y for x, y in zip(q, v)) / (
            qn * math.sqrt(sum(x * x for x in v))
        )

    order = sorted(
        ((vid, cos(v)) for vid, v in vecs.items() if vid != 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    vec_rank = {vid: i + 1 for i, (vid, _) in enumerate(order)}

    ids = set(lex_rank) | set(vec_rank)
    assert set(got) == ids
    rrf = {
        i: (1.0 / (60 + lex_rank[i]) if i in lex_rank else 0.0)
        + (1.0 / (60 + vec_rank[i]) if i in vec_rank else 0.0)
        for i in ids
    }
    fused = {
        i: r + 1
        for r, i in enumerate(sorted(ids, key=lambda i: (-rrf[i], i)))
    }
    for i in ids:
        r = got[i]
        assert r["lex_rank"] == lex_rank.get(i)
        assert r["vec_rank"] == vec_rank.get(i)
        assert r["fused_rank"] == fused[i]
        assert abs(r["rrf_score"] - rrf[i]) < 1e-12


def test_lm_perplexity_filter_semantics(spark):
    """Recompute the unigram-LM scoring in pure Python: the hash split,
    token counts, and vocabulary must match exactly; per-term nll is
    allowed +-1 nano-unit (libm vs JVM ln before the quantizer), so doc
    sums get a +-n_tokens tolerance; the keep flag must be internally
    consistent with the returned integers (exact)."""
    import hashlib
    import math
    import re

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        r.doc_id: r.asDict()
        for r in all_queries()["x_lm_perplexity_filter"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    train, evald = {}, {}
    for d, t in docs:
        (train if bucket(d) < 80 else evald)[d] = re.findall(r"\w+", t.lower())
    assert set(got) == set(evald)

    from collections import Counter

    counts = Counter(w for ts in train.values() for w in ts)
    n, v = sum(counts.values()), len(counts)
    nll = {
        w: round(-math.log((c + 1) / (n + v)) * 1e9)
        for w, c in counts.items()
    }
    oov = round(math.log(n + v) * 1e9)

    mean = sum(r["avg_nll_s9"] for r in got.values()) // len(got)
    for d, ts in evald.items():
        r = got[d]
        assert r["n_tokens"] == len(ts)
        expect_sum = sum(nll.get(w, oov) for w in ts)
        assert abs(r["sum_nll_s9"] - expect_sum) <= len(ts), d
        # integer-exact internal consistency
        assert r["avg_nll_s9"] == r["sum_nll_s9"] // r["n_tokens"]
        assert r["keep"] == int(r["avg_nll_s9"] <= mean)
    # the filter must split the eval set nontrivially
    kept = sum(r["keep"] for r in got.values())
    assert 0 < kept < len(got)


def test_lsh_blocking_eval_semantics(spark):
    """Blocking metrics recomputed in pure Python: shingle sets, exact
    Jaccard truth at tau=1/2, single-hash minhash-band candidates, and
    the two ratios must match the operator exactly."""
    import hashlib
    import re

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    [row] = all_queries()["x_lsh_blocking_eval"].spark_fn(spark, SF_DIR).collect()

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    shingles = {}
    for d, t in docs:
        ts = re.findall(r"\w+", t.lower())
        shingles[d] = {
            " ".join(ts[i : i + 8]) for i in range(len(ts) - 7)
        }

    ids = sorted(d for d in shingles if shingles[d])
    truth = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if 3 * len(shingles[a] & shingles[b])
        >= len(shingles[a]) + len(shingles[b])
    }
    sigs = {
        d: [min(md5(f"{j}:{g}") for g in shingles[d]) for j in range(4)]
        for d in ids
    }
    cand = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if any(sigs[a][j] == sigs[b][j] for j in range(4))
    }

    n = len(docs)
    assert row.n_docs == n
    assert row.n_possible_pairs == n * (n - 1) // 2
    assert row.n_candidates == len(cand)
    assert row.n_true == len(truth)
    assert row.n_caught == len(truth & cand)
    assert row.pair_completeness == len(truth & cand) / len(truth)
    assert row.reduction_ratio == 1.0 - len(cand) / (n * (n - 1) // 2)
    # the corpus must make the metric non-vacuous
    assert row.n_true > 0 and row.reduction_ratio > 0.99


def test_zorder_layout_bounds_both_dims(spark):
    """Full Python recompute of the Morton mapping AND the property that
    makes Z-order worth it: every bucket's bounding box is narrow in
    BOTH dimensions (a linear sort only bounds its leading column)."""
    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        r.zbucket: r.asDict()
        for r in all_queries()["x_zorder_layout"].spark_fn(spark, SF_DIR).collect()
    }

    rows = duckdb.sql(
        f"""SELECT CAST(user_id AS BIGINT),
                   CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    xs = [x for x, _ in rows]
    hs = [h for _, h in rows]
    x0, x1, h0, h1 = min(xs), max(xs), min(hs), max(hs)

    def morton(xb, yb):
        z = 0
        for i in range(8):
            z |= ((xb >> i) & 1) << (2 * i)
            z |= ((yb >> i) & 1) << (2 * i + 1)
        return z

    from collections import defaultdict

    buckets = defaultdict(list)
    for x, h in rows:
        xb = (x - x0) * 256 // (x1 - x0 + 1)
        yb = (h - h0) * 256 // (h1 - h0 + 1)
        buckets[morton(xb, yb) // (65536 // 64)].append((x, h - h0))
    assert set(got) == set(buckets)
    for b, pts in buckets.items():
        r = got[b]
        assert r["n_rows"] == len(pts)
        assert r["x_min"] == min(p[0] for p in pts)
        assert r["x_max"] == max(p[0] for p in pts)
        assert r["y_min"] == min(p[1] for p in pts)
        assert r["y_max"] == max(p[1] for p in pts)
        # the skipping property: both dims bounded well below full range
        assert r["x_max"] - r["x_min"] <= (x1 - x0 + 1) // 4
        assert r["y_max"] - r["y_min"] <= (h1 - h0 + 1) // 4


def test_skew_diagnosis_semantics(spark):
    """Top-10 hottest keys recomputed with Counter; shares and
    multiple-of-mean are integer-exact."""
    from collections import Counter

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        r.user_id: r.asDict()
        for r in all_queries()["x_skew_diagnosis"].spark_fn(spark, SF_DIR).collect()
    }
    counts = Counter(
        u
        for (u,) in duckdb.sql(
            f"SELECT user_id FROM '{SF_DIR}/events.parquet'"
        ).fetchall()
    )
    total, nk = sum(counts.values()), len(counts)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(got) == {u for u, _ in top}
    for rank, (u, n) in enumerate(top, 1):
        r = got[u]
        assert (r["n_rows"], r["rnk"]) == (n, rank)
        assert r["share_bp"] == n * 10000 // total
        assert r["x_mean_pct"] == n * nk * 100 // total


def test_anomaly_windows_semantics(spark):
    """Recompute hourly counts and the cleared-denominator z-tests in
    pure Python integers; membership (2 sigma) and flag (3 sigma) must
    match exactly."""
    from collections import Counter

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        (r.event_type, r.hour_s): r.asDict()
        for r in all_queries()["x_anomaly_windows"].spark_fn(spark, SF_DIR).collect()
    }

    rows = duckdb.sql(
        f"""SELECT event_type,
                   CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    counts = Counter(rows)
    by_type = {}
    for (et, h), n in counts.items():
        by_type.setdefault(et, []).append(n)

    expect = {}
    for (et, h), n in counts.items():
        ns = by_type[et]
        k, s, q = len(ns), sum(ns), sum(x * x for x in ns)
        dev2 = (n * k - s) ** 2
        var_num = k * q - s * s
        if dev2 > 4 * var_num:
            expect[(et, h)] = {
                "n": n,
                "n_windows": k,
                "total_rows": s,
                "is_anomaly": int(dev2 > 9 * var_num),
            }
    assert set(got) == set(expect)
    assert expect, "corpus must produce 2-sigma outliers"
    for key, e in expect.items():
        r = got[key]
        for f, v in e.items():
            assert r[f] == v, (key, f)


def test_stream_anomaly_equals_batch_twin(spark):
    """The streaming monitor replaying the history must emit exactly the
    batch twin's rows (same windows, counts, and flags)."""
    from duckdb_title_mapper_spark.workload import core_queries

    qs = core_queries()
    batch = {
        (r.event_type, r.hour_s): (r.n, r.n_windows, r.total_rows, r.is_anomaly)
        for r in qs["x_anomaly_windows"].spark_fn(spark, SF_DIR).collect()
    }
    stream = {
        (r.event_type, r.hour_s): (r.n, r.n_windows, r.total_rows, r.is_anomaly)
        for r in qs["stream_anomaly_baseline"].spark_fn(spark, SF_DIR).collect()
    }
    assert stream == batch and batch


def test_join_size_forecast_matches_actual_join(spark):
    """The forecast's total must equal the ACTUAL inner-join row count,
    and per-key contributions must match Counter products."""
    from collections import Counter

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_join_size_forecast"].spark_fn(spark, SF_DIR).collect()
    got = {r.join_key: r.asDict() for r in rows}

    con = duckdb.connect()
    left = Counter(
        u for (u,) in con.execute(
            f"SELECT user_id FROM '{SF_DIR}/events.parquet'"
        ).fetchall()
    )
    right = Counter(
        c for (c,) in con.execute(
            f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    )
    contrib = {
        k: left[k] * right[k] for k in left.keys() & right.keys()
    }
    total = sum(contrib.values())
    actual = con.execute(
        f"""SELECT count(*) FROM '{SF_DIR}/events.parquet' e
            JOIN '{SF_DIR}/customer.parquet' c ON e.user_id = c.c_custkey"""
    ).fetchone()[0]
    assert total == actual and total > 0

    top = sorted(contrib.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(got) == {k for k, _ in top}
    for rank, (k, cb) in enumerate(top, 1):
        r = got[k]
        assert (r["n_left"], r["n_right"], r["contrib"], r["rnk"]) == (
            left[k], right[k], cb, rank,
        )
        assert r["total_rows"] == total
        assert r["n_matching_keys"] == len(contrib)
        assert r["contrib_bp"] == cb * 10000 // total


def test_python_stream_source_equals_batch_source(spark):
    """The streaming face of the synthetic datasource must aggregate to
    exactly the batch reader's result (same generator, offset-tracked
    micro-batches instead of planned partitions)."""
    from duckdb_title_mapper_spark.workload import all_queries

    qs = all_queries()
    batch = {
        r.event_type: (r.n_events, r.sum_millis, r.min_user, r.max_user)
        for r in qs["src_python_datasource"].spark_fn(spark, SF_DIR).collect()
    }
    stream = {
        r.event_type: (r.n_events, r.sum_millis, r.min_user, r.max_user)
        for r in qs["src_python_stream_source"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert stream == batch and len(batch) == 4


def test_partitioned_stream_source_equals_batch(spark):
    """The partitioned streaming reader (worker-side Arrow stripes,
    driver-side offset only) must aggregate to exactly the batch
    reader's result."""
    from duckdb_title_mapper_spark.workload import all_queries

    qs = all_queries()
    batch = {
        r.event_type: (r.n_events, r.sum_millis, r.min_user, r.max_user)
        for r in qs["src_python_datasource"].spark_fn(spark, SF_DIR).collect()
    }
    stream = {
        r.event_type: (r.n_events, r.sum_millis, r.min_user, r.max_user)
        for r in qs["src_python_stream_partitioned"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert stream == batch and len(batch) == 4


def test_kmv_sketch_semantics(spark):
    """KMV recomputed in pure Python: bottom-64 hash set, the
    (k-1)*2^32//h_k estimator, and the error report must match
    exactly; the estimate must also land within the sketch's
    theoretical ~4/sqrt(k) band for this corpus."""
    import hashlib

    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    [r] = all_queries()["x_kmv_sketch"].spark_fn(spark, SF_DIR).collect()

    texts = {
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    hashes = sorted(
        {int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in texts}
    )
    k = 64
    kth = hashes[k - 1]
    est = (k - 1) * 4294967296 // kth
    true = len(hashes)
    assert (r.k, r.kth_hash, r.est_distinct, r.true_distinct) == (
        k, kth, est, true,
    )
    assert r.err_bp == abs(est - true) * 10000 // true
    assert abs(est - true) <= true // 2  # sanity: within 50% at k=64


def test_kmv_sketch_is_mergeable():
    """The scale claim behind KMV: merging per-shard bottom-k sets and
    re-taking the bottom k gives EXACTLY the whole-corpus sketch (so a
    cluster can sketch shards independently and combine) — pure-math
    property pinned against the same hash pipeline the operator uses."""
    import hashlib

    import duckdb

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT DISTINCT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    k = 64

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    whole = sorted({h(t) for t in texts})[:k]
    shard_sketches = [
        sorted({h(t) for i, t in enumerate(texts) if i % 3 == r})[:k]
        for r in range(3)
    ]
    merged = sorted(set().union(*shard_sketches))[:k]
    assert merged == whole


def test_funnel_steps_semantics(spark):
    """Funnel recomputed in pure Python with strict-ordering semantics
    (earliest view, earliest click after it, earliest purchase after
    that); counts and bp conversions must match exactly."""
    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    [r] = all_queries()["x_funnel_steps"].spark_fn(spark, SF_DIR).collect()

    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    by_user = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))

    n1 = n2 = n3 = 0
    for u, evs in by_user.items():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [t for t, e in evs if e == "click" and t > t1]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        if any(t > t2 for t, e in evs if e == "purchase"):
            n3 += 1
    assert (r.step1_view_users, r.step2_click_users,
            r.step3_purchase_users) == (n1, n2, n3)
    assert r.conv12_bp == n2 * 10000 // n1
    assert r.conv23_bp == n3 * 10000 // n2
    # sf0.001 has 15 users, all converting; the recompute equality
    # above is the semantic check — just pin non-emptiness here
    assert 0 < n3 <= n2 <= n1


def test_retention_cohorts_semantics(spark):
    """Retention triangle recomputed in pure Python from epoch-week
    buckets; every cell (cohort, offset, active, bp) must match."""
    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    got = {
        (r.cohort_week, r.week_offset): (r.cohort_size, r.n_active,
                                         r.retention_bp)
        for r in all_queries()["x_retention_cohorts"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }

    rows = duckdb.sql(
        f"""SELECT user_id, event_type,
                   CAST(floor(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) / 7) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    cohort = {}
    for u, et, w in rows:
        if et == "signup":
            cohort[u] = min(cohort.get(u, w), w)
    from collections import defaultdict

    cells = defaultdict(set)
    for u, et, w in rows:
        if u in cohort and w >= cohort[u]:
            cells[(cohort[u], w - cohort[u])].add(u)
    sizes = defaultdict(int)
    for u, cw in cohort.items():
        sizes[cw] += 1
    expect = {
        (cw, off): (sizes[cw], len(us), len(us) * 10000 // sizes[cw])
        for (cw, off), us in cells.items()
    }
    assert got == expect and len(expect) > 3
