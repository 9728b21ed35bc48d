"""Round-14 operators: brute-force python replays of the declared laws
(the round-13 pattern — every new op's math re-derived independently
of both SQL dialects)."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_priority_sample_matches_python_replay(spark):
    """Priorities, tau, and the DLT estimator replayed directly from
    the orders parquet with decimal-exact cents."""
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "orders")
    rows = spark.sql(
        "SELECT o_custkey AS c, CAST(CAST(o_totalprice AS STRING)"
        " AS DECIMAL(18,2)) AS p FROM orders").collect()
    weights: dict[int, int] = {}
    for r in rows:
        weights[r["c"]] = weights.get(r["c"], 0) + int(
            Decimal(r["p"]) * 100)
    prios = {
        c: (wc * 4294967296) // (_md5_32(str(c)) + 1)
        for c, wc in weights.items()
    }
    order = sorted(prios, key=lambda c: (-prios[c], c))
    k = w._PRIO_K
    assert len(order) > k, "testdata must exceed the sample size"
    tau = prios[order[k]]
    expect = {
        c: (weights[c], prios[c], i + 1, max(weights[c], tau))
        for i, c in enumerate(order[:k])
    }
    got = {
        r["custkey"]: (r["w_cents"], r["prio"], r["rk"],
                       r["est_w_cents"])
        for r in w.core_queries()["x_priority_sample"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    one = (w.core_queries()["x_priority_sample"]
           .spark_fn(spark, SF).collect()[0])
    assert one["true_total"] == sum(weights.values())
    assert one["tau"] == tau


def test_stream_priority_sample_matches_global_replay(spark):
    """The streamed merge of per-batch top-(k+1) stores must equal
    the one-shot global computation — the bottom-k mergeability
    property the operator's exactness rests on."""
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    rows = spark.sql(
        f"SELECT o_orderkey AS o, CAST(CAST(o_totalprice AS STRING)"
        f" AS DECIMAL(18,2)) AS p"
        f" FROM parquet.`{SF}/orders.parquet`").collect()
    weights = {r["o"]: int(Decimal(r["p"]) * 100) for r in rows}
    prios = {o: (wc * 4294967296) // (_md5_32(str(o)) + 1)
             for o, wc in weights.items()}
    order = sorted(prios, key=lambda o: (-prios[o], o))
    k = w._PRIO_K
    tau = prios[order[k]] if len(order) > k else 0
    expect = {
        o: (weights[o], prios[o], i + 1, max(weights[o], tau), tau,
            sum(weights.values()))
        for i, o in enumerate(order[:k])
    }
    got = {
        r["okey"]: (r["w_cents"], r["prio"], r["rk"],
                    r["est_w_cents"], r["tau"], r["true_total"])
        for r in w.core_queries()["stream_priority_sample"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_knn_shapley_matches_python_replay(spark):
    """The Jia et al. recursion replayed directly (s_N = ind/N;
    s_j = s_{j+1} + diff*min(K,j)/(K*j)) in the same sign-split
    micro-unit truncation, ranks from exact float cosines."""
    import math

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "embeddings")
    rows = spark.sql(
        "SELECT vec_id, CAST(label AS BIGINT) AS label, embedding"
        " FROM embeddings").collect()
    vecs = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v))
        vecs[r["vec_id"]] = ([x / nrm for x in v], r["label"])
    K, NQ, M = w._KNNSHAP_K, w._KNNSHAP_NQ, 1_000_000

    def idiv(num: int, den: int) -> int:
        return num // den if num >= 0 else -((-num) // den)

    train = sorted(i for i in vecs if i >= NQ)
    n = len(train)
    totals: dict[int, int] = {i: 0 for i in train}
    for t in (i for i in vecs if i < NQ):
        tu, tl = vecs[t]
        ranked = sorted(
            train,
            key=lambda i: (-sum(a * b for a, b in zip(tu, vecs[i][0])),
                           i),
        )
        ind = [1 if vecs[i][1] == tl else 0 for i in ranked]
        s = [0] * n
        s[n - 1] = idiv(ind[n - 1] * M, n)
        for j in range(n - 1, 0, -1):  # j is 1-based rank of s[j-1]
            diff = ind[j - 1] - ind[j]
            s[j - 1] = s[j] + idiv(diff * min(K, j) * M, K * j)
        for i, sv in zip(ranked, s):
            totals[i] += sv
    top = sorted(train, key=lambda i: (-totals[i], i))[:20]
    expect = {i: totals[i] for i in top}
    got = {
        r["train_id"]: r["shapley_micro"]
        for r in w.core_queries()["x_knn_shapley_value"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    # efficiency-style sanity: each test point's scores sum to the
    # (truncated) accuracy mass — every per-test column sums to
    # ~ind-fraction; here just assert values are bounded by +/- M*NQ
    assert all(abs(v) <= M * NQ for v in got.values())


def test_markov_removal_effect_matches_python_replay(spark):
    """Journey truncation, transition counts, the 6-round absorption
    recursion (sum-then-one-idiv), and the ppm effect replayed
    directly from the events parquet."""
    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT user_id AS u, event_type AS t FROM events"
        " ORDER BY user_id, ts, event_id").collect()
    journeys: dict[int, list] = {}
    for r in rows:
        journeys.setdefault(r["u"], []).append(r["t"])
    trans: dict[tuple, int] = {}
    for seq in journeys.values():
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        path = ["__start__"] + seq
        if path[-1] != "purchase":
            path.append("__end__")
        for a, b in zip(path, path[1:]):
            if a != "purchase":
                trans[(a, b)] = trans.get((a, b), 0) + 1
    rowsum: dict[str, int] = {}
    for (a, _b), c in trans.items():
        rowsum[a] = rowsum.get(a, 0) + c
    channels = sorted({t for seq in journeys.values() for t in seq}
                      - {"purchase"})
    M, K = w._MRE_M, w._MRE_K

    def absorb(rm):
        tt = {k: c for k, c in trans.items()
              if rm not in (k[0], k[1])}
        p = {"purchase": M}
        for _ in range(K):
            nxt = {"purchase": M}
            states = {a for a, _ in tt}
            for s in states:
                ssum = sum(c * p.get(b, 0)
                           for (a, b), c in tt.items() if a == s)
                nxt[s] = ssum // rowsum[s]
            p = nxt
        return p.get("__start__", 0)

    base = absorb("__none__")
    expect = {
        c: (base, absorb(c), ((base - absorb(c)) * 1_000_000) // base)
        for c in channels
    }
    got = {
        r["channel"]: (r["p_base_micro"], r["p_removed_micro"],
                       r["removal_effect_ppm"])
        for r in w.core_queries()["x_markov_removal_effect"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    assert all(0 <= rem <= b for b, rem, _e in got.values())


def test_mutual_best_matching_matches_python_replay(spark):
    """Greedy mutual-nearest rounds replayed directly: exact float
    cosines, lowest-id tiebreaks, both-endpoint removal per round."""
    import math

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "embeddings")
    rows = spark.sql(
        "SELECT vec_id, embedding FROM embeddings").collect()
    unit = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v))
        unit[r["vec_id"]] = [x / nrm for x in v]
    NL = w._MBM_NL
    lefts = sorted(i for i in unit if i < NL)
    rights = sorted(i for i in unit if i >= NL)
    cos = {(l, r): sum(a * b for a, b in zip(unit[l], unit[r]))
           for l in lefts for r in rights}
    pref = {
        l: sorted(rights, key=lambda r: (-cos[(l, r)], r))
        for l in lefts
    }
    live_l, live_r = set(lefts), set(rights)
    expect = {}
    for rnd in range(1, w._MBM_ROUNDS + 1):
        if not live_l or not live_r:
            break
        bestr = {l: min(live_r, key=lambda r: (-cos[(l, r)], r))
                 for l in live_l}
        bestl = {r: min(live_l, key=lambda l: (-cos[(l, r)], l))
                 for r in live_r}
        matched = [(l, r) for l, r in bestr.items()
                   if bestl[r] == l]
        for l, r in matched:
            expect[(l, r)] = (rnd, pref[l].index(r) + 1)
            live_l.discard(l)
            live_r.discard(r)
    got = {
        (r["lid"], r["rid"]): (r["round"], r["pref_rank"])
        for r in w.core_queries()["x_mutual_best_matching"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    # one-to-one: no endpoint reused
    ls = [l for l, _ in got]
    rs = [r for _, r in got]
    assert len(set(ls)) == len(ls) and len(set(rs)) == len(rs)


def test_betweenness_matches_python_replay(spark):
    """Horizon-bounded Brandes replayed directly: BFS sigma counts,
    then the backward dependency with the same idiv truncation."""
    import duckdb_title_mapper_spark.workload as w

    rows = spark.sql(
        "SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d FROM "
        f"parquet.`{SF}/lineitem.parquet` a JOIN "
        f"parquet.`{SF}/lineitem.parquet` b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    ).collect()
    adj: dict[int, set] = {}
    for r in rows:
        adj.setdefault(r["s"], set()).add(r["d"])
        adj.setdefault(r["d"], set()).add(r["s"])
    seeds = sorted(adj)[:w._BC_SEEDS]
    L, M = w._BC_LAYERS, w._BC_M
    totals: dict[int, list] = {}
    for s in seeds:
        layer = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        for r in range(1, L + 1):
            nxt: dict[int, int] = {}
            for u in frontier:
                for v in adj[u]:
                    if v not in layer:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            for v, sg in nxt.items():
                layer[v] = r
                sigma[v] = sg
            frontier = sorted(nxt)
        delta = {v: 0 for v in layer if layer[v] == L}
        for r in range(L - 1, 0, -1):
            for v in [x for x in layer if layer[x] == r]:
                delta[v] = sum(
                    (sigma[v] * (M + delta[wn])) // sigma[wn]
                    for wn in adj[v]
                    if layer.get(wn) == r + 1)
        for v, dv in delta.items():
            acc = totals.setdefault(v, [0, 0, 0])
            acc[0] += dv
            acc[1] += 1
            acc[2] = max(acc[2], dv)
    top = sorted(totals, key=lambda v: (-totals[v][0], v))[:20]
    expect = {v: tuple(totals[v]) for v in top}
    got = {
        r["node"]: (r["bc_micro"], r["n_seeds_reaching"],
                    r["max_seed_delta"])
        for r in w.core_queries()["x_betweenness_seeded"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_regression_discontinuity_matches_python_replay(spark):
    """Hash-spread running variable, bandwidth cells, exact rational
    gap, and the sign-split milli replayed directly."""
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT user_id AS u, CAST(CAST(CAST(value AS STRING)"
        " AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM events").collect()
    spend: dict[int, int] = {}
    for r in rows:
        spend[r["u"]] = spend.get(r["u"], 0) + r["cents"]
    cells: dict[int, list] = {100: [0, 0, 0, 0], 250: [0, 0, 0, 0]}
    for u, cts in spend.items():
        rr = _md5_32(str(u)) % 1000
        for bw, cell in cells.items():
            if 500 <= rr < 500 + bw:
                cell[0] += 1
                cell[1] += cts
            elif 500 - bw <= rr < 500:
                cell[2] += 1
                cell[3] += cts
    expect = {}
    for bw, (nh, sh, nl, sl) in cells.items():
        num, den = sh * nl - sl * nh, nh * nl
        milli = ((num * 1000) // den if num >= 0
                 else -((-num * 1000) // den))
        expect[bw] = (nh, sh, nl, sl, num, den, milli)
    got = {
        r["bw"]: (r["n_hi"], r["s_hi"], r["n_lo"], r["s_lo"],
                  r["gap_num"], r["gap_den"], r["gap_milli_cents"])
        for r in w.core_queries()["x_regression_discontinuity"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    assert all(v[0] > 0 and v[2] > 0 for v in got.values())


def test_kaplan_meier_matches_python_replay(spark):
    """Sessionization, censoring rule, suffix at-risk counts, and the
    ln-sum product limit replayed directly."""
    import math
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT user_id AS u, unix_micros(ts) AS t, event_id AS e"
        " FROM events ORDER BY user_id, t, event_id").collect()
    lo = min(r["t"] for r in rows)
    hi = max(r["t"] for r in rows)
    horizon = lo + ((hi - lo) * 9) // 10
    sessions = []
    cur_u, cur = None, None
    for r in rows:
        if r["u"] != cur_u or r["t"] - cur[-1] >= 1_800_000_000:
            if cur is not None:
                sessions.append(cur)
            cur_u, cur = r["u"], []
        cur.append(r["t"])
    sessions.append(cur)
    obs = [((s[-1] - s[0]) // 1_000_000, 0 if s[-1] >= horizon else 1)
           for s in sessions]
    times: dict[int, list] = {}
    for dur, died in obs:
        cell = times.setdefault(dur, [0, 0])
        cell[died] += 1  # [c, d]
    n_at_risk = len(obs)
    expect = {}
    lnsum, dead_out = 0.0, False
    for dur in sorted(times):
        c, d = times[dur]
        if d > 0:
            if d >= n_at_risk:
                dead_out = True
            else:
                lnsum += math.log(float(n_at_risk - d)
                                  / float(n_at_risk))
            surv = (Decimal("0.000000000") if dead_out else
                    Decimal(repr(round(math.exp(lnsum), 9)))
                    .quantize(Decimal("1e-9")))
            expect[dur] = (n_at_risk, d, c, surv)
        n_at_risk -= d + c
    got = {
        r["dur_s"]: (r["n_at_risk"], r["d"], r["c"], r["survival"])
        for r in w.core_queries()["x_kaplan_meier"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_cumulative_gains_matches_python_replay(spark):
    """Decile assignment (ntile law), cumulative capture and lift ppm
    replayed directly."""
    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql(
        "SELECT n_chars, doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0"
        " END AS y FROM documents"
        " ORDER BY n_chars DESC, doc_id").collect()
    n = len(rows)
    base, rem = divmod(n, 10)
    cells = []
    i = 0
    for dec in range(1, 11):
        size = base + (1 if dec <= rem else 0)
        chunk = rows[i:i + size]
        i += size
        cells.append((dec, size, sum(r["y"] for r in chunk)))
    tot_pos = sum(p for _, _, p in cells)
    cum_n = cum_pos = 0
    expect = {}
    for dec, sz, pos in cells:
        cum_n += sz
        cum_pos += pos
        expect[dec] = (sz, pos, cum_n, cum_pos,
                       cum_pos * 1_000_000 // tot_pos,
                       cum_pos * n * 1_000_000 // (cum_n * tot_pos))
    got = {
        r["decile"]: (r["n"], r["pos"], r["cum_n"], r["cum_pos"],
                      r["capture_ppm"], r["lift_ppm"])
        for r in w.core_queries()["x_cumulative_gains"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_fairness_audit_matches_python_replay(spark):
    """Parity/TPR/FPR ppm and the across-group gaps replayed
    directly, including the median-threshold rank pick."""
    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql("SELECT doc_id, source, lang, n_chars"
                     " FROM documents").collect()
    pool = sorted((r["n_chars"], r["doc_id"]) for r in rows)
    n = len(pool)
    thr = next(v for i, (v, _d) in enumerate(pool, 1)
               if i * 2 <= n and (i + 1) * 2 > n)
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r["source"], []).append(
            (int(r["n_chars"] >= thr), int(r["lang"] == "en")))
    rates = {}
    for src, obs in groups.items():
        gn = len(obs)
        npp = sum(yh for yh, _y in obs)
        npos = sum(y for _yh, y in obs)
        tp = sum(1 for yh, y in obs if yh and y)
        fp = sum(1 for yh, y in obs if yh and not y)
        rates[src] = (gn, npp * 1_000_000 // gn,
                      tp * 1_000_000 // npos if npos else 0,
                      fp * 1_000_000 // (gn - npos)
                      if gn - npos else 0)
    gaps = tuple(max(v[i] for v in rates.values())
                 - min(v[i] for v in rates.values())
                 for i in (1, 2, 3))
    expect = {s: v + gaps for s, v in rates.items()}
    got = {
        r["source"]: (r["n"], r["ppr_ppm"], r["tpr_ppm"],
                      r["fpr_ppm"], r["parity_gap_ppm"],
                      r["tpr_gap_ppm"], r["fpr_gap_ppm"])
        for r in w.core_queries()["x_fairness_audit"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_sequential_halving_matches_python_replay(spark):
    """The race replayed directly: budgets, exact rates, halving
    survivors, and the single winner."""
    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT event_type AS arm,"
        " CAST(CAST(CAST(value AS STRING) AS DECIMAL(18,2)) * 100"
        " AS BIGINT) AS cents, unix_micros(ts) AS us, event_id AS e"
        " FROM events").collect()
    pool = sorted((r["cents"], r["e"]) for r in rows)
    n = len(pool)
    thr = next(v for i, (v, _e) in enumerate(pool, 1)
               if i * 2 <= n and (i + 1) * 2 > n)
    per_arm: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["us"], r["e"])):
        per_arm.setdefault(r["arm"], []).append(
            int(r["cents"] >= thr))
    alive = sorted(per_arm)
    expect = {}
    for rnd, (budget, keep) in enumerate(
            ((32, 3), (64, 2), (128, 1)), 1):
        stats = {}
        for a in alive:
            o = per_arm[a][:budget]
            stats[a] = (len(o), sum(o),
                        sum(o) * 1_000_000 // len(o))
        ranked = sorted(stats, key=lambda a: (-stats[a][2], a))
        for rk, a in enumerate(ranked, 1):
            expect[(rnd, a)] = stats[a] + (rk, int(rk <= keep))
        alive = ranked[:keep]
    got = {
        (r["round"], r["arm"]): (r["n"], r["wins"], r["rate_ppm"],
                                 r["rk"], r["survives"])
        for r in w.core_queries()["x_sequential_halving"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    assert sum(1 for (rnd, _a), v in got.items()
               if rnd == 3 and v[4] == 1) == 1  # exactly one winner


def test_max_coverage_matches_python_replay(spark):
    """The greedy max-coverage picks, gains, and cumulative coverage
    replayed directly over the shingle sets."""
    import re

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql("SELECT source, lower(text) AS t"
                     " FROM documents").collect()
    per_src: dict[str, set] = {}
    for r in rows:
        toks = re.findall(r"\w+", r["t"])
        if len(toks) >= 4:
            per_src.setdefault(r["source"], set()).update(
                " ".join(toks[i:i + 4])
                for i in range(len(toks) - 3))
    total = len(set().union(*per_src.values()))
    covered: set = set()
    expect = {}
    for rnd in range(1, w._MAXCOV_K + 1):
        gains = {s: len(g - covered) for s, g in per_src.items()}
        if not any(gains.values()) and not gains:
            break
        pick = min(gains, key=lambda s: (-gains[s], s))
        covered |= per_src[pick]
        expect[rnd] = (pick, gains[pick], len(covered), total)
    got = {
        r["round"]: (r["picked_source"], r["marginal_gain"],
                     r["covered_distinct"], r["total_distinct"])
        for r in w.core_queries()["x_max_coverage_sources"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    # submodularity: marginal gains are non-increasing
    gains = [v[1] for _, v in sorted(got.items())]
    assert gains == sorted(gains, reverse=True)


def test_quantile_normalize_matches_python_replay(spark):
    """The ceil rank-mapping law replayed directly; the normalized
    per-source distributions must be pooled-quantile aligned."""
    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql("SELECT doc_id, source, n_chars"
                     " FROM documents").collect()
    pool = sorted((r["n_chars"], r["doc_id"]) for r in rows)
    pool_vals = [v for v, _ in pool]
    n = len(pool)
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (r["n_chars"], r["doc_id"]))
    expect = {}
    for src, docs in by_src.items():
        ns = len(docs)
        for rank, (v, did) in enumerate(sorted(docs), 1):
            pr = (rank * n + ns - 1) // ns
            expect[did] = (src, v, pool_vals[pr - 1])
    got = {
        r["doc_id"]: (r["source"], r["n_chars"], r["norm_chars"])
        for r in w.core_queries()["x_quantile_normalize"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_temporal_reachability_matches_python_replay(spark):
    """Foremost-arrival relaxation replayed brute-force, plus the
    semantic point: temporal reach must be <= static reach (paths
    must be time-non-decreasing)."""
    import duckdb_title_mapper_spark.workload as w

    rows = spark.sql(
        "SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d,"
        " CAST(unix_date(CAST(o.o_orderdate AS DATE)) AS BIGINT)"
        " AS day"
        f" FROM parquet.`{SF}/lineitem.parquet` a"
        f" JOIN parquet.`{SF}/lineitem.parquet` b"
        " ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey < b.l_partkey"
        f" JOIN parquet.`{SF}/orders.parquet` o"
        " ON o.o_orderkey = a.l_orderkey").collect()
    edges: dict[int, list] = {}
    nodes = set()
    for r in rows:
        edges.setdefault(r["s"], []).append((r["d"], r["day"]))
        edges.setdefault(r["d"], []).append((r["s"], r["day"]))
        nodes.update((r["s"], r["d"]))
    seed = min(nodes)
    INF = w._TR_INF
    arr = {v: (0 if v == seed else INF) for v in nodes}
    expect = {}

    def snap(rnd):
        reached = [a for a in arr.values() if a < INF]
        expect[rnd] = (len(reached), sum(reached),
                       max(reached) if reached else None)

    snap(0)
    for rnd in range(1, w._TR_ROUNDS + 1):
        nxt = dict(arr)
        for v, av in arr.items():
            if av >= INF:
                continue
            for u, day in edges.get(v, ()):
                if day >= av and day < nxt[u]:
                    nxt[u] = day
        arr = nxt
        snap(rnd)
    got = {
        r["round"]: (r["n_reached"], r["arr_day_sum"],
                     r["arr_day_max"])
        for r in w.core_queries()["x_temporal_reachability"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    # static BFS reach at the same depth is an upper bound
    static = {seed}
    for _ in range(w._TR_ROUNDS):
        static |= {u for v in static for u, _d in edges.get(v, ())}
    assert got[w._TR_ROUNDS][0] <= len(static)


def test_sprt_sequential_matches_python_replay(spark):
    """The cumulative LLR, stopping rule, and decision replayed with
    the same 4-constant nano quantization."""
    import math
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        " AS x FROM events ORDER BY unix_micros(ts), event_id"
    ).collect()

    def nano(v: float) -> int:
        return int(Decimal(repr(round(v, 9))) * 1_000_000_000)

    c1 = nano(math.log(25.0 / 15))
    c2 = nano(math.log(75.0 / 85))
    b1 = nano(math.log(19.0))
    b0 = nano(-math.log(19.0))
    k = 0
    stop = None
    for n, r in enumerate(rows, 1):
        k += r["x"]
        llr = k * c1 + (n - k) * c2
        if llr >= b1 or llr <= b0:
            stop = (n, k, llr, int(llr >= b1), len(rows))
            break
    assert stop is not None, "testdata must cross a boundary"
    (got,) = (w.core_queries()["x_sprt_sequential"]
              .spark_fn(spark, SF).collect())
    assert (got["stop_n"], got["k_at_stop"], got["llr_nano_at_stop"],
            got["accept_h1"], got["fixed_horizon_n"]) == stop
    # sequential testing must beat the fixed horizon on this stream
    assert got["stop_n"] < got["fixed_horizon_n"]


def test_rolling_origin_backtest_matches_python_replay(spark):
    """Dense hour indexing, fold windows, and per-fold integer MAE
    replayed directly."""
    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT event_type AS t,"
        " CAST(date_trunc('hour', ts) AS BIGINT) div 3600 AS h,"
        " count(*) AS n FROM events GROUP BY 1, 2").collect()
    h0 = min(r["h"] for r in rows)
    vol = {(r["t"], r["h"] - h0): r["n"] for r in rows}
    expect = {}
    for k in range(1, 5):
        origin = 24 + 12 * k
        for t in {r["t"] for r in rows}:
            errs = [abs(vol[(t, i)] - vol[(t, i - 24)])
                    for i in range(origin, origin + 12)
                    if (t, i) in vol and (t, i - 24) in vol]
            if errs:
                s = sum(errs)
                expect[(k, t)] = (len(errs), s,
                                  s * 1000 // len(errs))
    got = {
        (r["fold"], r["event_type"]):
            (r["n_eval"], r["total_abs_err"], r["mae_milli"])
        for r in w.core_queries()["x_rolling_origin_backtest"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_slo_burn_alerts_matches_python_replay(spark):
    """Window membership, burn rates, and the cross-multiplied alert
    law replayed directly."""
    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql("SELECT unix_micros(ts) AS us, event_type AS t"
                     " FROM events").collect()
    hi = max(r["us"] for r in rows)
    span = hi - min(r["us"] for r in rows)
    expect = {}
    for arm, lw, sw, fn, fd in (
            ("slow_burn", span // 4, span // 48, 6, 1),
            ("fast_burn", span // 24, span // 288, 72, 5)):
        tl = sum(1 for r in rows if r["us"] > hi - lw)
        el = sum(1 for r in rows if r["us"] > hi - lw
                 and r["t"] == "error")
        ts_ = sum(1 for r in rows if r["us"] > hi - sw)
        es = sum(1 for r in rows if r["us"] > hi - sw
                 and r["t"] == "error")
        alert = int(tl > 0 and ts_ > 0
                    and el * 1000 * fd >= fn * tl
                    and es * 1000 * fd >= fn * ts_)
        expect[arm] = (tl, el, ts_, es,
                       el * 1_000_000 // tl if tl else 0,
                       es * 1_000_000 // ts_ if ts_ else 0, alert)
    got = {
        r["arm"]: (r["tot_l"], r["err_l"], r["tot_s"], r["err_s"],
                   r["burn_long_milli"], r["burn_short_milli"],
                   r["alert"])
        for r in w.core_queries()["x_slo_burn_alerts"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    # the synthetic ~20% error rate burns a 99.9% budget at ~200x, so
    # the slow-burn lane (short window span/48, ~20 events even at
    # sf0.001) must genuinely fire; the fast lane's span/288 window
    # holds ~3 events at this SF and its firing is value-dependent —
    # its law is already locked by the exact replay above
    assert got["slow_burn"][6] == 1


def test_multiclass_f1_matches_python_replay(spark):
    """The ppm metric identities replayed against a direct confusion
    tally, including the never-predicted-class guard and the
    declared truncated-macro law."""
    import re

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql("SELECT doc_id, lang, lower(text) AS t"
                     " FROM documents").collect()
    sig = {"en": "the|a|of|to|and", "es": "el|la|de|que|los",
           "fr": "le|la|les|des|une", "de": "der|die|das|und|ein"}
    prec = ["en", "es", "fr", "de"]
    pairs = []
    for r in rows:
        votes = {l: len(re.findall(rf"\b({p})\b", r["t"]))
                 for l, p in sig.items()}
        best = max(votes.values())
        pred = ("und" if best == 0 else
                next(l for l in prec if votes[l] == best))
        pairs.append((r["lang"], pred))
    classes = sorted({a for a, _ in pairs})
    stats = {}
    for c in classes:
        tp = sum(1 for a, p in pairs if a == c and p == c)
        fp = sum(1 for a, p in pairs if p == c and a != c)
        fn = sum(1 for a, p in pairs if a == c and p != c)
        stats[c] = (tp, fp, fn)
    stp = sum(v[0] for v in stats.values())
    sfp = sum(v[1] for v in stats.values())
    sfn = sum(v[2] for v in stats.values())
    micro = 2 * stp * 1_000_000 // (2 * stp + sfp + sfn)
    f1s = {c: (0 if 2 * tp + fp + fn == 0
               else 2 * tp * 1_000_000 // (2 * tp + fp + fn))
           for c, (tp, fp, fn) in stats.items()}
    macro = sum(f1s.values()) // len(classes)
    expect = {
        c: (tp, fp, fn,
            0 if tp + fp == 0 else tp * 1_000_000 // (tp + fp),
            0 if tp + fn == 0 else tp * 1_000_000 // (tp + fn),
            f1s[c], micro, macro)
        for c, (tp, fp, fn) in stats.items()
    }
    got = {
        r["cls"]: (r["tp"], r["fp"], r["fn"], r["precision_ppm"],
                   r["recall_ppm"], r["f1_ppm"], r["micro_f1_ppm"],
                   r["macro_f1_ppm"])
        for r in w.core_queries()["x_multiclass_f1"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect
    assert "zh" in got and got["zh"][3] == 0  # never-predicted guard


def test_calibration_ece_matches_python_replay(spark):
    """The pure-integer ECE identity replayed directly, including
    the ntile decile law."""
    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql(
        "SELECT least(999, n_chars div 10) AS s, doc_id,"
        " CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y"
        " FROM documents ORDER BY s DESC, doc_id").collect()
    n = len(rows)
    base, rem = divmod(n, 10)
    expect, i, gaps, tot_n = {}, 0, 0, 0
    cells = []
    for b in range(1, 11):
        size = base + (1 if b <= rem else 0)
        chunk = rows[i:i + size]
        i += size
        pos = sum(r["y"] for r in chunk)
        s_sum = sum(r["s"] for r in chunk)
        cells.append((b, size, pos, s_sum))
        gaps += abs(1000 * pos - s_sum)
        tot_n += size
    ece = gaps * 1_000_000 // (1000 * tot_n)
    for b, size, pos, s_sum in cells:
        expect[b] = (size, pos, s_sum, pos * 1_000_000 // size,
                     s_sum * 1000 // size,
                     abs(1000 * pos - s_sum), ece)
    got = {
        r["bin"]: (r["n"], r["pos"], r["s_sum"], r["acc_ppm"],
                   r["conf_ppm"], r["gap_milli_x1000"], r["ece_ppm"])
        for r in w.core_queries()["x_calibration_ece"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_ab_power_matches_python_replay(spark):
    """The exact-rational power formula replayed with fractions —
    ceil division must equal the true rational ceiling."""
    from fractions import Fraction
    from math import ceil

    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    cells = spark.sql(
        "SELECT user_id, unix_micros(ts) div 3600000000 AS h,"
        " max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " AS conv FROM events GROUP BY 1, 2").collect()
    u = len(cells)
    c = sum(r["conv"] for r in cells)
    A = Fraction(28016 * 28016, 10**8)
    p = Fraction(c, u)
    expect = {}
    for mde in (10, 20, 50, 100):
        d = Fraction(mde, 1000)
        expect[mde] = (u, c, c * 1_000_000 // u,
                       ceil(A * 2 * p * (1 - p) / (d * d)))
    got = {
        r["mde_pp_x10"]: (r["units"], r["convs"], r["baseline_ppm"],
                          r["n_per_arm"])
        for r in w.core_queries()["x_ab_power_planning"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_wasserstein_drift_matches_python_replay(spark):
    """The CDF-gap integral replayed directly in exact integers."""
    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT CAST(CAST(CAST(value AS STRING) AS DECIMAL(18,2))"
        " * 100 AS BIGINT) AS cents, unix_micros(ts) AS us"
        " FROM events").collect()
    lo = min(r["us"] for r in rows)
    hi = max(r["us"] for r in rows)
    mid = lo + (hi - lo) // 2
    base = sorted(r["cents"] for r in rows if r["us"] < mid)
    curr = sorted(r["cents"] for r in rows if r["us"] >= mid)
    n1, n2 = len(base), len(curr)
    vals = sorted(set(base) | set(curr))
    raw = 0
    for v, nxt in zip(vals, vals[1:]):
        cum1 = sum(1 for x in base if x <= v)
        cum2 = sum(1 for x in curr if x <= v)
        raw += abs(cum1 * n2 - cum2 * n1) * (nxt - v)
    (r0,) = (w.core_queries()["x_wasserstein_drift"]
             .spark_fn(spark, SF).collect())
    assert (r0["n1"], r0["n2"], r0["w1_raw"]) == (n1, n2, raw)
    assert r0["w1_milli_cents"] == (raw * 1000) // (n1 * n2)


def test_ngram_novelty_matches_python_replay(spark):
    """Distinct n-gram sets per split replayed directly."""
    import re

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql("SELECT doc_id, lower(text) AS t"
                     " FROM documents").collect()
    expect = {}
    for n in (1, 2, 4, 8):
        tr, va = set(), set()
        for r in rows:
            toks = re.findall(r"\w+", r["t"])
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            (va if r["doc_id"] % 2 else tr).update(grams)
        novel = len(va - tr)
        expect[n] = (len(va), novel, novel * 1_000_000 // len(va))
    got = {
        r["n"]: (r["val_distinct"], r["val_novel"], r["novelty_ppm"])
        for r in w.core_queries()["x_ngram_novelty_curve"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_source_entropy_matches_python_replay(spark):
    """The distinct-count-value entropy law replayed directly with
    the same s9 quantization points."""
    import math
    import re
    from collections import Counter
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    w.register_views(spark, SF, "documents")
    rows = spark.sql("SELECT source, lower(text) AS t"
                     " FROM documents").collect()
    per_src: dict[str, Counter] = {}
    for r in rows:
        per_src.setdefault(r["source"], Counter()).update(
            re.findall(r"\w+", r["t"]))

    def l2nano(x: int) -> int:
        return int(Decimal(repr(round(math.log2(float(x)), 9)))
                   * 1_000_000_000)

    expect = {}
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        s_nano = sum(m * c * l2nano(c)
                     for c, m in Counter(cnt.values()).items())
        expect[src] = (n, len(cnt), l2nano(n) - s_nano // n)
    got = {
        r["source"]: (r["n_tokens"], r["n_distinct"],
                      r["entropy_nanobits"])
        for r in w.core_queries()["x_source_entropy"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_psi_drift_matches_python_replay(spark):
    """Bin membership, counts, ppm gaps, and the smoothed psi terms
    replayed directly (same clamp/idiv/round-9 law)."""
    from decimal import Decimal

    import duckdb_title_mapper_spark.workload as w

    w.load(spark, SF, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT CAST(CAST(CAST(value AS STRING) AS DECIMAL(18,2))"
        " * 100 AS BIGINT) AS cents, unix_micros(ts) AS us"
        " FROM events").collect()
    lo = min(r["us"] for r in rows)
    hi = max(r["us"] for r in rows)
    mid = lo + (hi - lo) // 2
    base = [r["cents"] for r in rows if r["us"] < mid]
    curr = [r["cents"] for r in rows if r["us"] >= mid]
    mn, mx = min(base), max(base)
    import math

    def bins(vals):
        out = [0] * 10
        for c in vals:
            out[(min(max(c, mn), mx) - mn) * 10 // (mx - mn + 1)] += 1
        return out

    nb, nc = bins(base), bins(curr)
    t1, t2 = len(base), len(curr)
    expect = {}
    for b in range(10):
        pnum, pden = nb[b] + 1, t1 + 10
        qnum, qden = nc[b] + 1, t2 + 10
        dn = pnum * qden - qnum * pden
        ppm = ((dn * 1_000_000) // (pden * qden) if dn >= 0
               else -((-dn * 1_000_000) // (pden * qden)))
        term = round((float(dn) / (float(pden) * qden))
                     * math.log((float(pnum) * qden)
                                / (float(qnum) * pden)), 9)
        expect[b] = (nb[b], nc[b], ppm,
                     Decimal(repr(term)).quantize(Decimal("1e-9")))
    got = {
        r["bin"]: (r["n_base"], r["n_curr"], r["diff_ppm"],
                   r["psi_term"])
        for r in w.core_queries()["x_psi_drift"]
        .spark_fn(spark, SF).collect()
    }
    assert got == expect


def test_delta_vacuum_query_matches_replay(spark):
    """The declared vacuum query's rows equal deltalog.vacuum_plans
    run directly on the per-source records."""
    import duckdb_title_mapper_spark.workload as w
    from duckdb_title_mapper_spark.sources.deltalog import vacuum_plans

    docs = spark.sql(
        "SELECT source, doc_id, octet_length(text) AS nb FROM "
        "parquet.`" + SF + "/documents.parquet` ORDER BY doc_id"
    ).collect()
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append((r["doc_id"], r["nb"]))
    expect = []
    for src in sorted(by_src):
        expect.extend(
            tuple(row[c] for c in
                  ("source", "horizon", "n_snapshots_retained",
                   "n_files_referenced", "referenced_bytes",
                   "n_tombstones", "n_eligible", "reclaimed_bytes"))
            for row in vacuum_plans(src, by_src[src]))
    got = sorted(
        tuple(r) for r in w.core_queries()["src_table_log_vacuum"]
        .spark_fn(spark, SF).collect())
    assert got == sorted(expect)
