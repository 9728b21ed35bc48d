"""Semantic tests for the late-round-4 operators, recomputed
independently in pure Python (via duckdb for IO only) so a refactor
cannot change operator meaning while staying self-consistent.
Cross-engine exactness is covered by the oracle parity suite; these pin
the MATH.  All run against the DuckDB oracle SQL (no Spark session —
the parity suite already proves the Spark side delivers byte-identical
values, so properties proven here hold for both engines).
"""

import hashlib
from collections import Counter, defaultdict

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("orders", "events", "documents", "lineitem")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracle(con, name):
    from duckdb_title_mapper_spark.workload import all_queries

    return con.execute(all_queries()[name].oracle).fetchall()


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_ks_drift_matches_bruteforce(con):
    """The KS statistic must equal the brute-force max |cumA*nB-cumB*nA|
    over the sorted distinct cent values."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
        " AS BIGINT) FROM orders"
    ).fetchall()
    a, b = Counter(), Counter()
    for k, cents in rows:
        (a if _h8(str(k)) % 2 == 0 else b)[cents] += 1
    na, nb = sum(a.values()), sum(b.values())
    cum_a = cum_b = 0
    best = (-1, None)
    for v in sorted(set(a) | set(b)):
        cum_a += a.get(v, 0)
        cum_b += b.get(v, 0)
        diff = abs(cum_a * nb - cum_b * na)
        if diff > best[0]:
            best = (diff, v)
    (got,) = _oracle(con, "x_ks_drift")
    n_a, n_b, at_cents, ks_num, ks_bp = got
    assert (n_a, n_b) == (na, nb)
    assert ks_num == best[0]
    assert at_cents == best[1]  # argmax ties break to smallest value
    assert ks_bp == (ks_num * 10000) // (na * nb)


def test_ab_test_flags_equal_float_z2(con):
    """The integer inequality must decide EXACTLY the float z^2 > c
    test (the clearing is algebraic, no truncation anywhere)."""
    rows = con.execute(
        "SELECT user_id, event_type FROM events"
    ).fetchall()
    n = Counter()
    x = Counter()
    for uid, et in rows:
        arm = _h8(str(uid)) % 2
        n[arm] += 1
        if et == "purchase":
            x[arm] += 1
    na, xa, nb, xb = n[0], x[0], n[1], x[1]
    (got,) = _oracle(con, "x_ab_test_proportions")
    assert got[:4] == (na, xa, nb, xb)
    N, X = na + nb, xa + xb
    z2_num = (xa * nb - xb * na) ** 2 * N  # exact ints
    z2_den = na * nb * X * (N - X)
    assert got[6] == int(z2_num > 4 * z2_den)
    assert got[7] == int(z2_num > 9 * z2_den)
    # and the integer decision equals the float z^2 comparison
    z2 = z2_num / z2_den
    assert got[6] == int(z2 > 4.0)


def test_markov_transitions_match_bruteforce(con):
    rows = con.execute(
        "SELECT user_id, event_type, epoch_us(ts), event_id FROM events"
    ).fetchall()
    seqs = defaultdict(list)
    for uid, et, us, eid in rows:
        seqs[uid].append((us, eid, et))
    trans = Counter()
    for uid, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    got = {(r[0], r[1]): (r[2], r[3]) for r in
           _oracle(con, "x_markov_transitions")}
    assert {k: v[0] for k, v in got.items()} == dict(trans)
    # row-stochastic in bp: each from-state's bp sums to 10000 - eps
    by_from = defaultdict(int)
    for (a, _), (_, bp) in got.items():
        by_from[a] += bp
    n_types = len({k[0] for k in got})
    for a, s in by_from.items():
        n_targets = sum(1 for k in got if k[0] == a)
        assert 10000 - n_targets < s <= 10000  # floor-division remainder


def test_scd2_intervals_are_contiguous_histories(con):
    got = _oracle(con, "x_scd2_intervals")
    by_user = defaultdict(list)
    for uid, state, version, vf, vt, cur in got:
        by_user[uid].append((version, vf, vt, cur, state))
    for uid, ivs in by_user.items():
        ivs.sort()
        # versions are 1..k contiguous
        assert [v[0] for v in ivs] == list(range(1, len(ivs) + 1))
        # exactly one open current interval, and it is the last
        assert sum(1 for v in ivs if v[3] == 1) == 1
        assert ivs[-1][3] == 1 and ivs[-1][2] is None
        # half-open intervals chain: valid_to == next valid_from
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev[2] == nxt[1]
            assert prev[1] < prev[2]
        # consecutive versions change state (runs were collapsed)
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev[4] != nxt[4]


def test_seasonal_naive_matches_bruteforce(con):
    rows = con.execute(
        "SELECT event_type, CAST(floor(epoch(date_trunc('hour', ts)))"
        " AS BIGINT) AS h, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    w = {(et, h): c for et, h, c in rows}
    agg = defaultdict(lambda: [0, 0])  # type -> [n_eval, total_abs_err]
    for (et, h), c in w.items():
        prev = w.get((et, h - 86400))
        if prev is not None:
            agg[et][0] += 1
            agg[et][1] += abs(c - prev)
    got = {r[0]: (r[1], r[2], r[3]) for r in
           _oracle(con, "x_seasonal_naive_eval")}
    assert {k: (v[0], v[1]) for k, v in got.items()} == \
        {k: tuple(v) for k, v in agg.items()}
    for k, (n_eval, tot, mae) in got.items():
        assert mae == (tot * 1000) // n_eval


def test_sorted_neighborhood_matches_bruteforce(con):
    """Full independent SNM: sort by 32-char lowercased prefix, compare
    each doc to its 3 successors on distinct-token Jaccard >= 1/2."""
    import re

    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    toks = {d: set(re.findall(r"\w+", t.lower())) for d, t in docs}
    order = sorted(docs, key=lambda r: (r[1][:32].lower(), r[0]))
    expect = set()
    for i, (da, ta) in enumerate(order):
        for j in range(i + 1, min(i + 4, len(order))):
            db = order[j][0]
            inter = len(toks[da] & toks[db])
            if 3 * inter >= len(toks[da]) + len(toks[db]):
                expect.add((da, db))
    got = {(r[0], r[1]) for r in _oracle(con, "x_sorted_neighborhood")}
    assert got == expect


def test_copurchase_lift_matches_bruteforce(con):
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    pair_n = Counter()
    item_n = Counter()
    for ok, parts in baskets.items():
        for p in parts:
            item_n[p] += 1
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair_n[(a, b)] += 1
    n_orders = len(baskets)
    got = {(r[0], r[1]): r for r in _oracle(con, "x_copurchase_pairs")}
    expect = {k: v for k, v in pair_n.items() if v >= 2}
    assert set(got) == set(expect)
    for (a, b), r in got.items():
        assert r[2] == expect[(a, b)]
        assert r[3] == item_n[a] and r[4] == item_n[b]
        assert r[5] == (r[2] * n_orders * 10000) // (item_n[a] * item_n[b])


def test_quantile_bins_are_equi_depth(con):
    got = _oracle(con, "x_quantile_bins")
    n = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    sizes = {r[0]: r[1] for r in got}
    assert sum(sizes.values()) == n
    # ntile: first (n % bins) bins get one extra row
    base, extra = divmod(n, 10)
    for b in range(1, 11):
        assert sizes[b] == base + (1 if b <= extra else 0)
    # boundaries are non-decreasing across bins
    rows = sorted(got)
    for prev, nxt in zip(rows, rows[1:]):
        assert prev[3] <= nxt[2]  # hi_cents(b) <= lo_cents(b+1)
