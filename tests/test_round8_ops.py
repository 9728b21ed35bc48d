"""Round-8 operator properties: HITS fixed-point vs an independent
Python reference on the same integer arithmetic, Viterbi DP vs a
brute-force path enumeration, footer-stats vs full-scan equality, and
trigram-mining output bounds."""

import hashlib
import itertools

SF = "/root/testdata/sf0.001"


def test_hits_matches_python_reference(spark):
    """hits_fixed_point on a tiny directed graph must equal a plain
    Python implementation of the same integer half-rounds."""
    from duckdb_title_mapper_spark.operators.graph import (
        HITS_SCALE,
        hits_fixed_point,
    )

    edges = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (4, 12)]
    rounds = 4
    hubs = {a: HITS_SCALE for a, _ in edges}
    auths = {}
    for _ in range(rounds):
        auths = {}
        for a, b in edges:
            auths[b] = auths.get(b, 0) + hubs.get(a, 0)
        mx = max(auths.values())
        auths = {b: v * HITS_SCALE // mx for b, v in auths.items()}
        hubs = {}
        for a, b in edges:
            hubs[a] = hubs.get(a, 0) + auths[b]
        mx = max(hubs.values())
        hubs = {a: v * HITS_SCALE // mx for a, v in hubs.items()}

    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    edf = spark.sql(
        f"SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst "
        f"FROM (VALUES {vals}) AS e(src, dst)")
    h_df, a_df = hits_fixed_point(edf, rounds=rounds)
    assert {(r.id, r.hub_fp) for r in h_df.collect()} == set(hubs.items())
    assert {(r.id, r.auth_fp) for r in a_df.collect()} == set(auths.items())


def test_viterbi_matches_bruteforce(spark):
    """The unrolled SQL DP must equal brute-force enumeration of all
    3^T state paths under the same integer weights, for every user."""
    from duckdb_title_mapper_spark.workload import (
        _VIT_EMIT,
        _VIT_INIT,
        _VIT_OBS,
        _VIT_T,
        _VIT_TRANS,
        all_queries,
    )
    from duckdb_title_mapper_spark.sources.tables import load_events

    events = load_events(spark, SF).select(
        "user_id", "ts", "event_id", "event_type").collect()
    seqs = {}
    for r in sorted(events, key=lambda r: (r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(_VIT_OBS.index(r.event_type))
    expected = {}
    for uid, obs in seqs.items():
        obs = obs[:_VIT_T]
        best = {}
        for path in itertools.product(range(3), repeat=len(obs)):
            score = _VIT_INIT[path[0]] + _VIT_EMIT[path[0]][obs[0]]
            for i in range(1, len(obs)):
                score += (_VIT_TRANS[path[i - 1]][path[i]]
                          + _VIT_EMIT[path[i]][obs[i]])
            s = path[-1]
            best[s] = max(best.get(s, -10**9), score)
        expected[uid] = (max(best.values()),
                         min(s for s in best if best[s] == max(best.values())),
                         best.get(0), best.get(1), best.get(2))

    q = all_queries()["x_viterbi_decode"]
    got = {r.user_id: (r.best_score, r.best_state, r.score_s0,
                       r.score_s1, r.score_s2)
           for r in q.spark_fn(spark, SF).collect()}
    assert got == expected


def test_footer_stats_equal_full_scan(spark):
    from pyspark.sql import functions as F

    from duckdb_title_mapper_spark.workload import all_queries

    q = all_queries()["x_parquet_footer_stats"]
    got = {r.table_name: (r.n_rows, r.min_key, r.max_key)
           for r in q.spark_fn(spark, SF).collect()}
    assert len(got) == 10
    for tbl, key in (("orders", "o_orderkey"), ("documents", "doc_id"),
                     ("events", "event_id")):
        df = spark.read.parquet(f"{SF}/{tbl}.parquet")
        row = df.agg(F.count("*"), F.min(key), F.max(key)).collect()[0]
        assert got[tbl] == (row[0], row[1], row[2]), tbl


def test_trigram_mining_bounds(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    q = all_queries()["x_event_trigram_mining"]
    rows = q.spark_fn(spark, SF).collect()
    # output is |event_type|^3-bounded no matter the data size
    assert 0 < len(rows) <= 125
    total = sum(r.support for r in rows)
    for r in rows:
        assert 0 <= r.share_bp <= 10000
        assert r.n_users <= r.support
        assert r.share_bp == r.support * 10000 // total


def test_h264_aac_media_ids_cover_documents(spark):
    """Round-8 media tables emit exactly one payload per document."""
    from duckdb_title_mapper_spark.operators.multimodal import (
        aac_media_table,
        h264_media_table,
    )

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert h264_media_table(spark, SF).count() == n_docs
    assert aac_media_table(spark, SF).count() == n_docs


def test_consistent_hash_minimal_movement(spark):
    """The invariant consistent hashing exists for: removing a shard
    moves ONLY that shard's documents."""
    from duckdb_title_mapper_spark.workload import all_queries

    q = all_queries()["x_consistent_hash_ring"]
    rows = {r.shard: r for r in q.spark_fn(spark, SF).collect()}
    n_total = sum(r.n_docs for r in rows.values())
    assert sum(r.n_after_removal for r in rows.values()) == n_total
    for shard, r in rows.items():
        if shard == "s7":
            assert r.n_moved_out == r.n_docs  # every doc of the removed
            assert r.n_after_removal == 0     # shard moves, none stay
        else:
            assert r.n_moved_out == 0         # nobody else moves
            assert r.n_after_removal >= r.n_docs


def test_kneser_ney_matches_python(spark):
    """pkn_num/pkn_den must equal a direct Python Kneser-Ney on the
    same token stream (d = 3/4 multiplied through)."""
    import re
    from collections import Counter

    from duckdb_title_mapper_spark.workload import all_queries

    texts = [r.text for r in spark.read.parquet(
        f"{SF}/documents.parquet").select("text").collect()]
    bigrams = Counter()
    for t in texts:
        ts = re.findall(r"\w+", t.lower())
        bigrams.update(zip(ts, ts[1:]))
    c1 = Counter()
    n1p = Counter()
    cont = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c
        n1p[w1] += 1
        cont[w2] += 1
    ctot = len(bigrams)

    q = all_queries()["x_kneser_ney_bigram"]
    for r in q.spark_fn(spark, SF).collect():
        c = bigrams[(r.w1, r.w2)]
        assert r.n_ab == c
        assert r.pkn_num == max(4 * c - 3, 0) * ctot \
            + 3 * n1p[r.w1] * cont[r.w2]
        assert r.pkn_den == 4 * c1[r.w1] * ctot
        # the rational is a genuine probability: 0 < num <= den
        assert 0 < r.pkn_num <= r.pkn_den


def test_kendall_tau_matches_bruteforce(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    q = all_queries()["x_kendall_tau_metrics"]
    row = q.spark_fn(spark, SF).collect()[0]
    n = min(
        50,
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_suppkey").distinct().count(),
    )
    assert row.n_pairs == n * (n - 1) // 2
    assert row.concordant + row.discordant == row.n_pairs
    expect = (row.concordant - row.discordant) * 1000
    got = row.tau_permille
    # sign-split integer division semantics
    if expect >= 0:
        assert got == expect // row.n_pairs
    else:
        assert got == -((-expect) // row.n_pairs)


def test_perceptron_matches_python(spark):
    """The unrolled SQL training loop must equal a direct Python batch
    perceptron on the same integer features."""
    import re

    from duckdb_title_mapper_spark.workload import all_queries

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "lang", "n_chars", "text").collect()
    feats = [(
        1 if r.lang == "en" else -1,
        (1, r.n_chars // 100, len(re.findall(r"\w+", r.text)) // 10),
    ) for r in docs]
    w = [0, 0, 0]
    expected = []
    for epoch in (1, 2, 3):
        d = [0, 0, 0]
        n_mis = 0
        for y, x in feats:
            if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0:
                n_mis += 1
                for i in range(3):
                    d[i] += y * x[i]
        w = [wi + di for wi, di in zip(w, d)]
        expected.append((epoch, n_mis, *w))

    q = all_queries()["x_perceptron_epochs"]
    got = sorted((r.epoch, r.n_mis, r.w0, r.w1, r.w2)
                 for r in q.spark_fn(spark, SF).collect())
    assert got == expected


def test_spec_decode_matches_python(spark):
    """Draft/target chains and acceptance lengths vs a direct Python
    n-gram argmax reference."""
    import re
    from collections import Counter

    from duckdb_title_mapper_spark.workload import all_queries

    texts = [r.text for r in spark.read.parquet(
        f"{SF}/documents.parquet").select("text").collect()]
    bc, tc = Counter(), Counter()
    for t in texts:
        ts = re.findall(r"\w+", t.lower())
        bc.update(zip(ts, ts[1:]))
        tc.update(zip(ts, ts[1:], ts[2:]))

    def argmax(counter, key_len):
        best = {}
        for k, c in counter.items():
            ctx, w = k[:key_len], k[key_len]
            cur = best.get(ctx)
            if cur is None or c > cur[1] or (c == cur[1] and w < cur[0]):
                best[ctx] = (w, c)
        return {ctx: w for ctx, (w, c) in best.items()}

    bnext = argmax(bc, 1)
    tnext = argmax(tc, 2)
    seeds = sorted(bc, key=lambda k: (-bc[k], k))[:20]

    q = all_queries()["x_spec_decode_acceptance"]
    rows = {(r.seed_1, r.seed_2): r for r in q.spark_fn(spark, SF).collect()}
    assert set(rows) == set(seeds)
    for (w1, w2), r in rows.items():
        drafts = []
        cur = (w2,)
        for _ in range(4):
            nxt = bnext.get(cur)
            drafts.append(nxt)
            if nxt is None:
                break
            cur = (nxt,)
        drafts += [None] * (4 - len(drafts))
        assert (r.draft_1, r.draft_2, r.draft_3, r.draft_4) == tuple(drafts)
        prefix = [w1, w2]
        n_acc = 0
        for d in drafts:
            t = tnext.get((prefix[-2], prefix[-1]))
            if d is None or t is None or d != t:
                break
            n_acc += 1
            prefix.append(d)
        assert r.n_accepted == n_acc, (w1, w2, drafts, n_acc)


def test_haar_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries
    from duckdb_title_mapper_spark.sources.tables import load_events

    ev = load_events(spark, SF).selectExpr(
        "user_id", "unix_micros(ts) AS us").collect()
    mn = min(r.us for r in ev)
    mx = max(r.us for r in ev)
    series = {}
    for r in ev:
        b = (r.us - mn) * 16 // (mx - mn + 1)
        series.setdefault(r.user_id, [0] * 16)[b] += 1

    q = all_queries()["x_haar_event_wavelet"]
    for r in q.spark_fn(spark, SF).collect():
        c = series[r.user_id]
        s = [c[2 * i] + c[2 * i + 1] for i in range(8)]
        d1 = [c[2 * i] - c[2 * i + 1] for i in range(8)]
        t = [s[2 * i] + s[2 * i + 1] for i in range(4)]
        d2 = [s[2 * i] - s[2 * i + 1] for i in range(4)]
        u = [t[0] + t[1], t[2] + t[3]]
        assert r.approx == u[0] + u[1] == sum(c)
        assert r.d4_0 == u[0] - u[1]
        assert (r.d3_0, r.d3_1) == (t[0] - t[1], t[2] - t[3])
        assert (r.d2_0, r.d2_1, r.d2_2, r.d2_3) == tuple(d2)
        assert r.l1_energy == sum(x * x for x in d1)
