"""Semantic tests for the round-5 operators: count-min sketch math +
mergeability, the BPE pair-count step, t-closeness distances, the
hashed linear scorer, boilerplate membership, and the cyclic recursive
walk.  Cross-engine exactness is covered by the oracle parity suite;
these pin OPERATOR SEMANTICS against independent pure-Python
recomputation so a refactor cannot silently change meaning while
staying self-consistent across both engines.
"""

import hashlib
import re
from collections import Counter, defaultdict

SF_DIR = "/root/testdata/sf0.001"


def _texts():
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()


def _tokens(text):
    return re.findall(r"\w+", text.lower())


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _cm_cells(term_counts, d=4, w=64):
    cells = Counter()
    for term, n in term_counts.items():
        for r in range(d):
            cells[(r, _h32(f"{r}:{term}") % w)] += n
    return cells


def test_countmin_estimates_match_and_dominate(spark):
    """CM estimate recomputed in pure Python must match exactly, and
    every estimate must be >= the true count (the CM guarantee)."""
    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_countmin_sketch"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 20

    tc = Counter()
    for _doc, _src, text in _texts():
        tc.update(_tokens(text))
    cells = _cm_cells(tc)
    for r in rows:
        expect = min(cells[(d, _h32(f"{d}:{r.term}") % 64)] for d in range(4))
        assert r.cm_estimate == expect
        assert r.cm_estimate >= r.true_count == tc[r.term]
        assert r.overestimate == r.cm_estimate - r.true_count >= 0


def test_countmin_sketch_is_mergeable():
    """The scale claim: per-shard sketches summed cell-wise equal the
    whole-corpus sketch exactly — a cluster sketches shards
    independently and adds d*w integers to combine."""
    shard_counts = [Counter(), Counter(), Counter()]
    whole = Counter()
    for doc_id, _src, text in _texts():
        toks = _tokens(text)
        shard_counts[doc_id % 3].update(toks)
        whole.update(toks)
    merged = Counter()
    for sc in shard_counts:
        merged.update(_cm_cells(sc))
    assert merged == _cm_cells(whole)


# ---------------------------------------------------------------------------
# BPE pair-count step
# ---------------------------------------------------------------------------


def test_bpe_merge_step_semantics(spark):
    """Pair counts recomputed in pure Python (adjacent chars weighted
    by corpus word frequency); the returned top-20 must match the
    exact count-desc, then lexicographic, total order."""
    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_bpe_merge_step"].spark_fn(spark, SF_DIR).collect()

    wc = Counter()
    for _doc, _src, text in _texts():
        wc.update(_tokens(text))
    pairs = Counter()
    for word, n in wc.items():
        for i in range(len(word) - 1):
            pairs[(word[i], word[i + 1])] += n
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(rows, key=lambda r: r.merge_rank)
    assert [((r.sym_left, r.sym_right), r.pair_count) for r in got] == expect
    assert [r.merge_rank for r in got] == list(range(1, 21))


# ---------------------------------------------------------------------------
# t-closeness
# ---------------------------------------------------------------------------


def test_t_closeness_semantics(spark):
    """Per-class integerized total-variation distances recomputed in
    pure Python; census fields must match exactly."""
    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    [r] = all_queries()["x_t_closeness"].spark_fn(spark, SF_DIR).collect()

    ev = duckdb.sql(
        "SELECT user_id // 100, CAST(hour(ts) AS BIGINT), event_type"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    g = Counter(e for _, _, e in ev)
    big_g = sum(g.values())
    cls = defaultdict(Counter)
    for ub, hod, e in ev:
        cls[(ub, hod)][e] += 1
    max_bp, n_viol, risk_rows, total = 0, 0, 0, 0
    for counts in cls.values():
        n_c = sum(counts.values())
        total += n_c
        dist = sum(
            abs(counts.get(s, 0) * big_g - gs * n_c) for s, gs in g.items()
        )
        max_bp = max(max_bp, dist * 10000 // (2 * n_c * big_g))
        if dist * 10000 > 2000 * 2 * n_c * big_g:
            n_viol += 1
            risk_rows += n_c
    assert (r.n_classes, r.max_tvd_bp, r.n_violating, r.rows_at_risk) == (
        len(cls), max_bp, n_viol, risk_rows,
    )
    assert r.risk_bp == risk_rows * 10000 // total


# ---------------------------------------------------------------------------
# hashed linear scorer
# ---------------------------------------------------------------------------


def test_linear_quality_scorer_semantics(spark):
    """Scores recomputed in pure Python through the same hash-bucket ->
    pseudo-weight pipeline; spot-check every doc."""
    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_linear_quality_scorer"].spark_fn(
        spark, SF_DIR
    ).collect()
    got = {r.doc_id: r for r in rows}

    for doc_id, _src, text in _texts():
        toks = _tokens(text)
        if not toks:
            assert doc_id not in got
            continue
        score = sum(
            (_h32(t) % 1024 * 2654435761) % 2001 - 1000 for t in toks
        )
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.score == score
        sign = 1 if score >= 0 else -1
        assert r.score_per_kilotoken == sign * (abs(score) * 1000 // len(toks))
        assert r.keep == (score >= 0)


# ---------------------------------------------------------------------------
# boilerplate n-grams
# ---------------------------------------------------------------------------


def test_boilerplate_ngrams_semantics(spark):
    """Distinct 5-gram membership and the 25%-of-source boilerplate
    rule recomputed in pure Python."""
    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_boilerplate_ngrams"].spark_fn(
        spark, SF_DIR
    ).collect()
    got = {r.doc_id: r for r in rows}

    src_docs = Counter()
    doc_grams = {}
    for doc_id, src, text in _texts():
        src_docs[src] += 1
        toks = _tokens(text)
        doc_grams[(doc_id, src)] = {
            " ".join(toks[i:i + 5]) for i in range(len(toks) - 4)
        }
    df = defaultdict(int)
    for (_d, src), grams in doc_grams.items():
        for gm in grams:
            df[(src, gm)] += 1
    for (doc_id, src), grams in doc_grams.items():
        if not grams:
            assert doc_id not in got
            continue
        n_boiler = sum(
            1 for gm in grams if 4 * df[(src, gm)] >= src_docs[src]
        )
        r = got[doc_id]
        assert (r.n_grams, r.n_boiler) == (len(grams), n_boiler)
        assert r.boiler_bp == n_boiler * 10000 // len(grams)


# ---------------------------------------------------------------------------
# cyclic recursive walk
# ---------------------------------------------------------------------------


def test_recursive_cycle_walk_semantics(spark):
    """The path-guarded walk over the rho-shaped functional graph
    recomputed in pure Python: walk until the successor is already on
    the path."""
    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["rel_recursive_cycle_walk"].spark_fn(
        spark, SF_DIR
    ).collect()
    got = {r.start_id: r for r in rows}
    assert len(got) == 25

    for s in range(25):
        path, cur = [s], s
        while True:
            nxt = (5 * cur + 3) % 25
            if nxt in path:
                break
            path.append(nxt)
            cur = nxt
        r = got[s]
        assert (r.walk_len, r.n_visited, r.max_node_seen) == (
            len(path) - 1, len(path), max(path),
        )
    # the graph is genuinely cyclic (a walk that stops before visiting
    # everything must have been stopped by a revisit, not exhaustion)
    assert max(r.n_visited for r in rows) < 25


# ---------------------------------------------------------------------------
# corpus-scaled semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_scaled_k_derivation(spark):
    """k must equal greatest(4, n // 125) and every assigned cluster id
    must be a seed id below k."""
    import duckdb

    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_semantic_dedup_scaled"].spark_fn(
        spark, SF_DIR
    ).collect()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchone()[0]
    k = max(4, n // 125)
    assert len(rows) == n
    assert {r.cluster_id for r in rows} <= set(range(k))


# ---------------------------------------------------------------------------
# coarse winnowing preset
# ---------------------------------------------------------------------------


def test_winnow_coarse_stores_fewer_fingerprints(spark):
    """The coarse preset's whole point: per-doc fingerprint counts must
    be well below the default preset's on the same corpus (w=16 keeps
    ~2/17 of grams vs ~2/5 at w=4)."""
    from duckdb_title_mapper_spark.workload import all_queries

    qs = all_queries()
    fine = {
        r.doc_id: r.n_fingerprints
        for r in qs["x_winnow_fingerprints"].spark_fn(spark, SF_DIR).collect()
    }
    coarse = {
        r.doc_id: r.n_fingerprints
        for r in qs["x_winnow_fingerprints_coarse"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    total_fine = sum(fine.values())
    total_coarse = sum(coarse.get(d, 0) for d in fine)
    assert 0 < total_coarse < total_fine / 2
