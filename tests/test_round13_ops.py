"""Round-13 operator tests: the unigram-LM vocab PRUNE step.

Brute-force replays of the counterfactual-lattice loss and the prune
decision, following the test_round12_ops unigram replay pattern.
"""

import random

import pytest

from tests.conftest import spark  # noqa: F401


def _comps(n):
    if n == 0:
        return [[]]
    return [[l] + rest for l in range(1, min(4, n) + 1)
            for rest in _comps(n - l)]


def _prune_replay(texts):
    """Replay the full seed -> EM x2 -> prune chain in pure Python:
    per-(word, multi piece) counterfactual lattice mass (every
    composition that avoids all spans carrying the piece), exact ppm
    long division, frequency-weighted loss, then the rank / keep /
    re-weight decision."""
    import re
    from collections import Counter

    from duckdb_title_mapper_spark.functions.unigram import (
        E_STEPS,
        GRID,
        MIN_CNT,
        PPM,
        PRUNE_KEEP_DEN,
        PRUNE_KEEP_NUM,
        W_STEPS,
    )

    def estep(words, vocab):
        exp = Counter()
        nw = {}
        for w, f in words.items():
            span_num = Counter()
            z = 0
            for comp in _comps(len(w)):
                pos, weight, spans = 1, 1, []
                for l in comp:
                    weight *= vocab.get(w[pos - 1:pos - 1 + l], 0)
                    spans.append((pos, l))
                    pos += l
                if weight:
                    z += weight
                    for s in spans:
                        span_num[s] += weight
            for i, l in GRID:
                p = w[i - 1:i - 1 + l]
                if i + l - 1 > len(w) or p not in vocab:
                    continue
                num = span_num[(i, l)]
                q = num // z
                exp[p] += f * (q * PPM + ((num - q * z) * PPM) // z)
                nw.setdefault(p, set()).add(w)
        return exp, nw

    toks = []
    for t in texts.values():
        toks += re.findall(r"\w+", t.lower())
    words = Counter(w for w in toks if 2 <= len(w) <= 8)
    cnt = Counter()
    for w, f in words.items():
        for i, l in GRID:
            if i + l - 1 <= len(w):
                cnt[w[i - 1:i - 1 + l]] += f
    vocab1 = {p: 1 + sum(c >= t for t in W_STEPS)
              for p, c in cnt.items()
              if len(p) == 1 or c >= MIN_CNT}
    e1, _ = estep(words, vocab1)
    vocab2 = {p: 1 + sum(e1[p] >= t for t in E_STEPS) for p in vocab1}
    e2, nw2 = estep(words, vocab2)

    # counterfactual loss per multi-char piece
    loss = Counter()
    hit = Counter()
    for w, f in words.items():
        present = {
            w[i - 1:i - 1 + l]
            for i, l in GRID
            if l >= 2 and i + l - 1 <= len(w)
            and w[i - 1:i - 1 + l] in vocab2
        }
        weights = []
        for comp in _comps(len(w)):
            pos, weight, pieces = 1, 1, set()
            for l in comp:
                piece = w[pos - 1:pos - 1 + l]
                weight *= vocab2.get(piece, 0)
                pieces.add(piece)
                pos += l
            if weight:
                weights.append((weight, pieces))
        z = sum(wt for wt, _ in weights)
        for p in present:
            zwo = sum(wt for wt, ps in weights if p not in ps)
            q = zwo // z
            ppm = q * PPM + ((zwo - q * z) * PPM) // z
            loss[p] += f * (PPM - ppm)
            hit[p] += 1

    multi = sorted((p for p in vocab2 if len(p) >= 2),
                   key=lambda p: (-loss[p], p))
    rank = {p: i + 1 for i, p in enumerate(multi)}
    n_multi = len(multi)
    out = {}
    for p in vocab2:
        r = rank.get(p, 0)
        kept = 1 if (len(p) == 1
                     or r * PRUNE_KEEP_DEN <= n_multi * PRUNE_KEEP_NUM) \
            else 0
        wf = (1 + sum(e2[p] >= t for t in E_STEPS)) if kept else 0
        out[p] = (len(p), vocab2[p], cnt[p], e2[p], loss[p], hit[p],
                  r, kept, wf)
    return out


def test_unigram_prune_equals_python_replay(spark):  # noqa: F811
    import pandas as pd

    from duckdb_title_mapper_spark.functions.unigram import unigram_prune
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    random.seed(13)
    base = ["banana", "bandana", "ban", "anna", "nab", "band",
            "cabana", "a", "verylongword123"]
    texts = {
        d: " ".join(random.choice(base) for _ in range(25))
        for d in range(1, 9)
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    got = {
        r["piece"]: (
            r["plen"], r["w"], r["cnt"], r["expected_ppm"],
            r["loss_ppm"], r["n_words_hit"], r["prune_rank"],
            r["kept"], r["w_final"],
        )
        for r in unigram_prune(spark).collect()
    }
    expect = _prune_replay(texts)
    assert got == expect
    # the prune actually dropped pieces and kept all singles
    dropped = [p for p, v in expect.items() if v[7] == 0]
    assert dropped and all(len(p) >= 2 for p in dropped)
    assert all(v[7] == 1 for p, v in expect.items() if len(p) == 1)
    # every candidate's loss is at least its word-frequency floor
    assert all(v[4] >= 1 for p, v in expect.items() if len(p) >= 2)


def test_unigram_prune_oracle_matches_on_tiny_corpus():
    """Dual-dialect exactness on a corpus small enough to eyeball:
    DuckDB oracle vs the pure-Python replay (the Spark side is
    covered by the replay test above and check_oracle at both SFs)."""
    import duckdb
    import pandas as pd

    from duckdb_title_mapper_spark.functions.unigram import (
        prune_oracle_sql,
    )

    random.seed(131)
    base = ["banana", "bandana", "ban", "anna", "nab", "band"]
    texts = {
        d: " ".join(random.choice(base) for _ in range(20))
        for d in range(1, 7)
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        ),
    )
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(prune_oracle_sql()).fetchall()
    }
    assert got == _prune_replay(texts)


def _min_decode(word, vocab):
    """Min-pieces DP with longest-piece tiebreak, mirroring
    viterbi_min_sql's contract."""
    n = len(word)
    big = 99
    c = [0] + [big] * n
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        for l in range(1, min(4, j) + 1):
            if word[j - l:j] in vocab and c[j - l] + 1 < c[j]:
                c[j] = c[j - l] + 1
        for l in range(min(4, j), 0, -1):
            if word[j - l:j] in vocab and c[j - l] + 1 == c[j]:
                bp[j] = l
                break
    pieces = []
    k = n
    while k > 0:
        pieces.append(word[k - bp[k]:k])
        k -= bp[k]
    return c[n], "|".join(reversed(pieces))


def test_unigram_apply_pruned_equals_python_replay(spark):  # noqa: F811
    """train -> prune -> min-pieces APPLY vs a full pure-Python
    replay: vocab2/vocab3 from the prune replay, decode per word."""
    import pandas as pd

    from duckdb_title_mapper_spark.functions.unigram import (
        unigram_apply_pruned,
    )
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    random.seed(13)
    base = ["banana", "bandana", "ban", "anna", "nab", "band",
            "cabana", "a", "verylongword123"]
    texts = {
        d: " ".join(random.choice(base) for _ in range(25))
        for d in range(1, 9)
    }
    pr = _prune_replay(texts)
    vocab2 = set(pr)
    vocab3 = {p for p, v in pr.items() if v[7] == 1}
    # decode every bounded corpus word under both vocabularies
    import re
    from collections import Counter

    expect = {}

    toks = []
    for t in texts.values():
        toks += re.findall(r"\w+", t.lower())
    wf = Counter(w for w in toks if 2 <= len(w) <= 8)
    for w in wf:
        c2, s2 = _min_decode(w, vocab2)
        c3, s3 = _min_decode(w, vocab3)
        expect[w] = (wf[w], len(w), c2, c3,
                     0 if s2 == s3 else 1, s2, s3)
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    got = {
        r["word"]: (r["f"], r["n"], r["pieces_full"],
                    r["pieces_pruned"], r["seg_changed"],
                    r["seg_full"], r["seg_pruned"])
        for r in unigram_apply_pruned(spark).collect()
    }
    assert got == expect
    # pruning can only lengthen the minimal segmentation
    assert all(v[3] >= v[2] for v in expect.values())
    assert any(v[4] == 1 for v in expect.values())


def test_ivf_certified_contract(spark):  # noqa: F811
    """The in-row recall certification semantics: <= 3 approx rows per
    query with contiguous ranks, exact_rank in {-1, 1..3}, and a
    planted twin (vec 9001 = copy of query 1's vector) is recovered at
    approx rank 1 with exact_rank 1 — same cell by construction."""
    import pandas as pd

    from duckdb_title_mapper_spark.operators.similarity import (
        ivf_certified,
    )
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    random.seed(1313)
    dim = 8
    rows = [
        {"vec_id": i, "embedding": [random.uniform(-1, 1)
                                    for _ in range(dim)]}
        for i in range(60)
    ]
    twin = dict(rows[1])
    rows.append({"vec_id": 9001, "embedding": list(twin["embedding"])})
    _arrow_df(spark, pd.DataFrame(rows)).createOrReplaceTempView(
        "embeddings")
    got = ivf_certified(spark, adaptive=False, k=3, nq=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= {0, 1, 2}
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert all(r["exact_rank"] in (-1, 1, 2, 3) for r in rs)
    top1 = next(r for r in by_q[1] if r["rank"] == 1)
    assert top1["neighbor_id"] == 9001 and top1["exact_rank"] == 1


def test_delta_log_build_replay_roundtrip(tmp_path):
    """The log survives a real disk round trip under the %020d.json
    naming contract, and the replay accounting matches a hand
    computation on a table small enough to eyeball."""
    from duckdb_title_mapper_spark.sources.deltalog import (
        CHUNK,
        build_log,
        chunk_path,
        compact_path,
        replay_log,
        snapshot_manifest,
    )

    recs = [(i * 3, 10 + i) for i in range(CHUNK * 2 + 3)]  # 3 chunks
    log = build_log("srcA", recs)
    assert sorted(log) == [0, 1]
    for v, blob in log.items():
        (tmp_path / f"{v:020d}.json").write_bytes(blob)
    back = {
        int(p.stem): p.read_bytes()
        for p in tmp_path.glob("*.json")
    }
    rep = replay_log(back)
    assert rep["n_commits"] == 2
    assert rep["log_bytes"] == sum(len(b) for b in log.values())
    assert rep["n_removed"] == 2
    # live = compacted(chunks 0+1) + chunk 2
    assert sorted(rep["live"]) == [compact_path("srcA"),
                                   chunk_path("srcA", 2)]
    comp = rep["live"][compact_path("srcA")]
    assert comp["numRecords"] == 2 * CHUNK
    assert comp["minDocId"] == 0
    assert comp["maxDocId"] == (2 * CHUNK - 1) * 3
    man = snapshot_manifest("srcA", recs)
    assert man["live_records"] == len(recs)
    assert man["n_live_files"] == 2
    # threshold = (0 + 54) div 2 = 27; compact spans 0..45 (kept),
    # chunk 2 spans 48..54 (kept) -> nothing prunable here
    assert man["n_pruned_files"] == 0
    assert man["scanned_records"] == len(recs)
    # single-chunk table: one commit, nothing removed, chunk 0 live
    small = snapshot_manifest("srcB", recs[:3])
    assert (small["n_commits"], small["n_removed_files"],
            small["n_live_files"]) == (1, 0, 1)


def test_delta_log_time_travel_versions():
    """Version 0 sees all chunks; version 1 sees the compacted set
    with conserved records/bytes and a strictly larger log."""
    from duckdb_title_mapper_spark.sources.deltalog import (
        CHUNK,
        time_travel_manifests,
    )

    recs = [(i, 10 + i % 7) for i in range(CHUNK * 3)]
    v0, v1 = time_travel_manifests("srcT", recs)
    assert v0["version"] == 0 and v1["version"] == 1
    assert v0["n_live_files"] == 3 and v1["n_live_files"] == 2
    assert v0["n_removed_files"] == 0 and v1["n_removed_files"] == 2
    assert v0["live_records"] == v1["live_records"] == len(recs)
    assert v0["live_bytes"] == v1["live_bytes"]
    assert v1["log_bytes"] > v0["log_bytes"]
    # single-chunk source: one snapshot only
    assert len(time_travel_manifests("srcT", recs[:2])) == 1


def test_delta_log_vacuum_plans():
    """Retention semantics: h=0 protects tombstones via the
    pre-compaction snapshot; h=1 makes the merged chunks eligible
    with their exact byte mass; single-chunk tables never reclaim."""
    from duckdb_title_mapper_spark.sources.deltalog import (
        CHUNK,
        build_log,
        chunk_path,
        replay_log,
        vacuum_plans,
    )

    recs = [(i, 10 + i % 7) for i in range(CHUNK * 3)]
    h0, h1 = vacuum_plans("srcV", recs)
    assert (h0["horizon"], h1["horizon"]) == (0, 1)
    assert h0["n_snapshots_retained"] == 2
    assert h1["n_snapshots_retained"] == 1
    # h=0 references every chunk + the compacted file
    assert h0["n_files_referenced"] == 4
    assert h0["n_tombstones"] == 2 and h0["n_eligible"] == 0
    assert h0["reclaimed_bytes"] == 0
    # h=1 references live set only; chunks 0-1 become the delete list
    assert h1["n_files_referenced"] == 2
    assert h1["n_eligible"] == 2
    rep0 = replay_log({0: build_log("srcV", recs)[0]})
    sz01 = (rep0["live"][chunk_path("srcV", 0)]["size"]
            + rep0["live"][chunk_path("srcV", 1)]["size"])
    assert h1["reclaimed_bytes"] == sz01
    # conservation: compaction conserves bytes, so the final horizon's
    # referenced mass equals the live total
    assert h1["referenced_bytes"] == h0["referenced_bytes"] - sz01
    # single-chunk source: one horizon, nothing tombstoned
    (only,) = vacuum_plans("srcW", recs[:3])
    assert (only["n_tombstones"], only["n_eligible"],
            only["reclaimed_bytes"]) == (0, 0, 0)


def test_delta_log_replay_rejects_torn_logs():
    """Every framing invariant the replayer claims to validate."""
    import json

    from duckdb_title_mapper_spark.sources.deltalog import (
        build_log,
        replay_log,
    )

    recs = [(i, 10) for i in range(20)]
    log = build_log("s", recs)

    def expect_reject(bad, msg):
        try:
            replay_log(bad)
            raise AssertionError(f"accepted torn log: {msg}")
        except ValueError:
            pass

    expect_reject({0: log[0], 2: log[1]}, "version gap")
    expect_reject({0: log[0], 1: log[1][:-1]}, "missing newline")
    # protocol not first
    lines = log[0].decode().splitlines()
    expect_reject({0: ("\n".join(lines[1:] + lines[:1]) + "\n").encode()},
                  "header order")
    # duplicate add of a live path
    dup = lines[2]
    expect_reject({0: ("\n".join(lines + [dup]) + "\n").encode()},
                  "duplicate add")
    # remove of a never-added path
    rm = json.dumps({"remove": {"path": "ghost", "dataChange": False}},
                    separators=(",", ":"))
    expect_reject({0: log[0], 1: (rm + "\n").encode()}, "dead remove")
    # unknown action kind
    expect_reject({0: log[0], 1: b'{"commitInfo":{}}\n'},
                  "unknown action")
    # protocol outside commit 0
    expect_reject({0: log[0], 1: lines[0].encode() + b"\n"},
                  "late protocol")


def test_zorder_pruning_orders_layouts(spark):
    """The demonstrative property the query exists for: z-order never
    scans more than the single-dim sort for the 2-D rectangle, and
    both beat the natural layout; matches are layout-invariant."""
    from duckdb_title_mapper_spark.workload import core_queries

    qs = core_queries()
    # sf0.001's custkeys never reach the rectangle (k1 max 149 < 256),
    # so every layout prunes everything there; sf0.01 selects ~10%
    rows = {r["layout"]: r for r in
            qs["x_zorder_pruning"].spark_fn(
                spark, "/root/testdata/sf0.01").collect()}
    assert set(rows) == {"natural", "k1sort", "zorder"}
    assert len({r["rows_matched"] for r in rows.values()}) == 1
    assert (rows["zorder"]["rows_scanned"]
            <= rows["k1sort"]["rows_scanned"]
            <= rows["natural"]["rows_scanned"])
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_matched"]
        assert 0 < r["files_touched"] <= r["n_files"] == 64


def test_matryoshka_curve_contract(spark):
    """Budget-64 rows are their own exact self-check, ranks are
    contiguous per (budget, query), and a planted twin is recovered
    at rank 1 under EVERY budget (its prefix is identical too)."""
    import pandas as pd

    from duckdb_title_mapper_spark.operators.similarity import (
        matryoshka_recall,
    )
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    random.seed(64)
    rows = [
        {"vec_id": i, "embedding": [random.uniform(-1, 1)
                                    for _ in range(64)]}
        for i in range(40)
    ]
    rows.append({"vec_id": 7001,
                 "embedding": list(rows[2]["embedding"])})
    _arrow_df(spark, pd.DataFrame(rows)).createOrReplaceTempView(
        "embeddings")
    got = matryoshka_recall(spark, k=3, nq=4).collect()
    for r in got:
        if r["dim_budget"] == 64:
            assert r["exact_rank"] == r["rank"], r
    by = {}
    for r in got:
        by.setdefault((r["dim_budget"], r["query_id"]), []).append(
            r["rank"])
    for ranks in by.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    for d in (8, 16, 64):
        top1 = next(r for r in got
                    if r["dim_budget"] == d and r["query_id"] == 2
                    and r["rank"] == 1)
        assert top1["neighbor_id"] == 7001 and top1["exact_rank"] == 1


def test_pca_power_iteration_finds_planted_direction(spark):
    """On a corpus with one strong planted direction, the integer
    power iteration's s3 vector must align with numpy's dominant
    Gram eigenvector (|cosine| > 0.99), and the Rayleigh quotient
    must approximate the top eigenvalue of the quantized Gram."""
    import numpy as np
    import pandas as pd

    from duckdb_title_mapper_spark.workload import core_queries
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    rng = np.random.default_rng(1313)
    direction = rng.normal(size=64)
    direction /= np.linalg.norm(direction)
    rows = []
    for i in range(120):
        v = (rng.normal() * 0.9) * direction + 0.1 * rng.normal(size=64)
        rows.append({"vec_id": i,
                     "embedding": [float(x) for x in v]})
    _arrow_df(spark, pd.DataFrame(rows)).createOrReplaceTempView(
        "embeddings")
    qs = core_queries()
    # call the underlying spark fn against the registered view (the
    # query re-registers embeddings from sf_dir, so run the SQL direct)
    from duckdb_title_mapper_spark.workload import _pca_power_sql

    got = spark.sql(_pca_power_sql(True)).collect()
    v3 = np.zeros(64)
    for r in got:
        v3[r["dim"]] = r["v3"]
    ray = got[0]["ray_num"] / got[0]["ray_den"]
    # numpy replay on the same s3-quantized matrix
    m = np.array([row["embedding"] for row in rows], dtype=np.float64)
    x3 = np.round(np.round(m, 9) * 1000.0)
    gram = x3.T @ x3
    evals, evecs = np.linalg.eigh(gram)
    top = evecs[:, -1]
    cos = abs(v3 @ top) / (np.linalg.norm(v3) * np.linalg.norm(top))
    assert cos > 0.99, cos
    assert abs(ray - evals[-1]) / evals[-1] < 0.05, (ray, evals[-1])


def test_delta_checkpoint_roundtrip_and_validation():
    from duckdb_title_mapper_spark.sources.deltalog import (
        CHUNK,
        build_checkpoint,
        build_log,
        checkpoint_manifest,
        read_checkpoint,
        replay_log,
    )

    recs = [(i * 2, 11 + i % 5) for i in range(CHUNK * 3 + 1)]
    rep = replay_log(build_log("srcC", recs))
    ckpt = build_checkpoint(rep["live"])
    assert read_checkpoint(ckpt) == rep["live"]
    man = checkpoint_manifest("srcC", recs)
    assert man["ckpt_equals_replay"] == 1
    assert man["ckpt_bytes"] == len(ckpt)
    assert man["live_records"] == len(recs)
    # torn checkpoints are rejected: unsorted paths / non-add action
    lines = ckpt.decode().splitlines()
    bad = ("\n".join(lines[::-1]) + "\n").encode()
    try:
        read_checkpoint(bad)
        raise AssertionError("unsorted checkpoint accepted")
    except ValueError:
        pass
    bad2 = b'{"remove":{"path":"x"}}\n'
    try:
        read_checkpoint(bad2)
        raise AssertionError("non-add checkpoint line accepted")
    except ValueError:
        pass


def test_msgpack_roundtrip_and_framing():
    from duckdb_title_mapper_spark.sources.msgpack import (
        build_msgpack,
        read_msgpack,
        record_len,
        str_len,
        uint_len,
    )

    # ladder boundaries: the minimal-encoding cutovers the oracle bakes in
    for v, n in [(0, 1), (127, 1), (128, 2), (255, 2), (256, 3),
                 (65535, 3), (65536, 5), (1 << 32, 9)]:
        assert uint_len(v) == n, (v, n)
    for nb, n in [(0, 1), (31, 32), (32, 34), (255, 257), (256, 259),
                  (65535, 65538), (65536, 65541)]:
        assert str_len(nb) == n, (nb, n)

    recs = [(1, "a"), (7, "héllo"), (130, "x" * 40), (70000, "y" * 300)]
    blob = build_msgpack("web", recs)
    back = read_msgpack(blob)
    assert back == {"source": "web", "n": 4, "records": recs}
    # byte accounting: framing(20 + src-str + count) + record bytes
    rec_bytes = sum(record_len(d, len(t.encode("utf-8")))
                    for d, t in recs)
    assert len(blob) == 20 + str_len(3) + uint_len(4) + rec_bytes

    # strict reader: truncation, trailing bytes, count mismatch,
    # non-monotone ids all rejected
    for bad in [blob[:-1], blob + b"\x00"]:
        try:
            read_msgpack(bad)
            raise AssertionError("malformed container accepted")
        except ValueError:
            pass
    try:
        read_msgpack(build_msgpack("s", [(5, "a"), (5, "b")]))
        raise AssertionError("non-rising doc_ids accepted")
    except ValueError:
        pass


def test_vopt_histogram_dp_matches_bruteforce(spark):
    """The relational DP must find the true optimum: brute-force all
    C(n-1, B-1) bucket boundary placements on a small planted series
    and compare the total n-weighted SSE; the emitted buckets must
    reproduce their own costs and sum to the optimum."""
    import itertools
    import random

    from duckdb_title_mapper_spark.workload import (
        _vopt_backtrack_sql,
        _vopt_dp_round_sql,
    )

    rng = random.Random(13)
    vols = [rng.randint(0, 40) for _ in range(10)]
    n, buckets = len(vols), 3

    def seg_cost(lo, hi):  # python replay on (lo, hi] 1-indexed
        xs = vols[lo:hi]
        return len(xs) * sum(x * x for x in xs) - sum(xs) ** 2

    best = min(
        sum(seg_cost(lo, hi)
            for lo, hi in zip((0,) + cuts, cuts + (n,)))
        for cuts in itertools.combinations(range(1, n), buckets - 1)
    )

    pre_rows = ", ".join(
        f"({i + 1}, {sum(vols[:i + 1])}, "
        f"{sum(x * x for x in vols[:i + 1])})"
        for i in range(n)) + ", (0, 0, 0)"
    spark.sql(f"SELECT * FROM (VALUES {pre_rows}) AS t(i, s, q)"
              ).createOrReplaceTempView("__vopt_t_pre")
    spark.sql("""SELECT hi.i, hi.s, hi.q,
           (hi.i - lo.i) * (hi.q - lo.q)
             - (hi.s - lo.s) * (hi.s - lo.s) AS c,
           CAST(0 AS BIGINT) AS j
      FROM __vopt_t_pre hi JOIN __vopt_t_pre lo ON lo.i = 0
      WHERE hi.i > 0""").createOrReplaceTempView("__vopt_t_dp1")
    for b in range(2, buckets + 1):
        spark.sql(_vopt_dp_round_sql(f"__vopt_t_dp{b - 1}",
                                     "__vopt_t_pre")
                  ).createOrReplaceTempView(f"__vopt_t_dp{b}")
    rows = spark.sql(_vopt_backtrack_sql(
        [f"__vopt_t_dp{b}" for b in range(1, buckets + 1)],
        "__vopt_t_pre")).collect()
    assert len(rows) == buckets
    assert rows[0]["total_cost"] == best
    assert sum(r["seg_cost"] for r in rows) == best
    # emitted boundaries tile [1, n] and reproduce their own costs
    by_b = sorted(rows, key=lambda r: r["bucket"])
    assert by_b[0]["lo_idx"] == 1 and by_b[-1]["hi_idx"] == n
    for prev, cur in zip(by_b, by_b[1:]):
        assert cur["lo_idx"] == prev["hi_idx"] + 1
    for r in by_b:
        assert r["seg_cost"] == seg_cost(r["lo_idx"] - 1, r["hi_idx"])


def test_als_user_step_solves_normal_equations(spark):
    """The emitted rationals must exactly solve (A + lam*I) x = b for
    the assembly in the same row — checked with fractions, not by
    re-deriving the formula."""
    from fractions import Fraction

    from duckdb_title_mapper_spark.workload import _als_user_step_sql

    for t in ("lineitem", "orders", "part"):
        import duckdb_title_mapper_spark.workload as w

        w.load(spark, "/root/testdata/sf0.001", t) \
            .createOrReplaceTempView(t)
    rows = spark.sql(_als_user_step_sql(True)).collect()
    assert rows, "no users emitted"
    lam = 5
    for r in rows:
        den = r["den"]
        assert den > 0  # (A + lam*I) is positive definite
        x1, x2 = Fraction(r["x1_num"], den), Fraction(r["x2_num"], den)
        assert (r["a11"] + lam) * x1 + r["a12"] * x2 == r["b1"]
        assert r["a12"] * x1 + (r["a22"] + lam) * x2 == r["b2"]


def test_holt_linear_equals_python_replay(spark):
    """The recursive CTE must implement exactly the declared integer
    dynamical system: replay l_t = (y + 3*(l+b)) /t 4, b_t =
    ((l_t - l) + 7*b) /t 8 (truncating division) in Python over the
    same pool and compare the emitted states."""
    import duckdb_title_mapper_spark.workload as w

    sf = "/root/testdata/sf0.001"
    w.load(spark, sf, "events").createOrReplaceTempView("events")
    pool = spark.sql(w._holt_pool_sql(True)).collect()
    series = {}
    for r in pool:
        series.setdefault(r["event_type"], {})[r["i"]] = r["vol"]

    def tdiv(n, d):  # truncate toward zero, the sign-split semantic
        return n // d if n >= 0 else -((-n) // d)

    expect = {}
    for et, vols in series.items():
        n = max(vols)
        l, b = vols[1] * 1000, 0
        for i in range(2, n + 1):
            l_next = tdiv(vols[i] * 1000 + 3 * (l + b), 4)
            b = tdiv((l_next - l) + 7 * b, 8)
            l = l_next
            if i in (24, 48):
                expect[(et, i)] = (l, b, l + b)
    got = {
        (r["event_type"], r["at_hour"]):
            (r["level_s3"], r["trend_s3"], r["forecast_s3"])
        for r in w.core_queries()["x_holt_linear"].spark_fn(spark, sf)
        .collect()
    }
    assert got == expect
    # the trend state actually moves (a flat series would hide a
    # broken beta update)
    assert any(v[1] != 0 for v in expect.values())


def test_matrix_profile_matches_bruteforce(spark):
    """Diagonal-decomposition distances and the motif/discord ranking
    must equal the naive all-pairs computation on a planted series."""
    import random

    import pandas as pd

    from duckdb_title_mapper_spark.operators.standardize import _arrow_df
    from duckdb_title_mapper_spark.workload import (
        _mprofile_dists_sql,
        _mprofile_final_sql,
    )

    rng = random.Random(7)
    vols = [rng.randint(1, 6) for _ in range(12)]
    m = 4
    # plant vols as per-hour event counts (vol = rows in that hour)
    ts = []
    for h, k in enumerate(vols):
        ts.extend(pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=h)
                  + pd.Timedelta(seconds=s) for s in range(k))
    _arrow_df(spark, pd.DataFrame({"ts": ts})
              ).createOrReplaceTempView("events")

    spark.sql(_mprofile_dists_sql(True, m=m)
              ).createOrReplaceTempView("__mpt_dists")
    got = sorted(
        tuple(r) for r in
        spark.sql(_mprofile_final_sql("__mpt_dists")).collect())

    def dist2(i, j):  # 1-indexed window starts
        return sum((vols[i - 1 + k] - vols[j - 1 + k]) ** 2
                   for k in range(m))

    n_win = len(vols) - m + 1
    pairs = [(i, j, dist2(i, j)) for i in range(1, n_win + 1)
             for j in range(1, n_win + 1) if j - i >= m]
    prof = {}
    for i, j, d in pairs:
        prof[i] = min(prof.get(i, 1 << 60), d)
        prof[j] = min(prof.get(j, 1 << 60), d)
    motifs = sorted(pairs, key=lambda x: (x[2], x[0], x[1]))[:3]
    discords = sorted(prof.items(), key=lambda x: (-x[1], x[0]))[:3]
    expect = sorted(
        [(1, i, j, d, rk + 1) for rk, (i, j, d) in enumerate(motifs)]
        + [(0, i, None, v, rk + 1)
           for rk, (i, v) in enumerate(discords)])
    assert got == expect


def test_shapley_matches_permutation_form(spark):
    """The subset-lattice Shapley computation must equal the
    definitional permutation form: phi_c = mean over all 4! channel
    orderings of the marginal contribution v(before+c) - v(before)."""
    import itertools

    import duckdb_title_mapper_spark.workload as w

    sf = "/root/testdata/sf0.001"
    w.load(spark, sf, "events").createOrReplaceTempView("events")
    masks = [r["mask"] for r in
             spark.sql(w._shapley_masks_sql(True)).collect()]

    def v(S):
        return sum(1 for m in masks if (m & S) == m)

    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    expect = {}
    for c, b in bits.items():
        tot = 0
        for perm in itertools.permutations(bits.values()):
            S = 0
            for x in perm:
                if x == b:
                    break
                S |= x
            tot += v(S | b) - v(S)
        expect[c] = tot  # already scaled by 4! (sum over 24 perms)

    got = {r["channel"]: r["phi_x24"] for r in
           w.core_queries()["x_shapley_attribution"]
           .spark_fn(spark, sf).collect()}
    assert got == expect
    # efficiency: the sum of scaled values is 24*(v(full) - v(empty))
    assert sum(expect.values()) == 24 * (v(15) - v(0))


def _sf001_baskets(spark):
    import duckdb_title_mapper_spark.workload as w

    sf = "/root/testdata/sf0.001"
    w.register_views(spark, sf, "lineitem", "part")
    rows = spark.sql(
        "SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
    ).collect()
    baskets = {}
    for r in rows:
        baskets.setdefault(r["ok"], set()).add(r["item"])
    return baskets


def test_assoc_rules_matches_python_replay(spark):
    """The Apriori lattice + rule scoring must equal a brute-force
    Python count over the same baskets (semantic lock — the DuckDB
    oracle shares the SQL shape, this replay does not)."""
    import itertools

    import duckdb_title_mapper_spark.workload as w

    baskets = _sf001_baskets(spark)
    n = len(baskets)
    denom = 400

    def sup(items):
        return sum(1 for b in baskets.values() if set(items) <= b)

    all_items = sorted({i for b in baskets.values() for i in b})
    f1 = {i for i in all_items if sup([i]) * denom >= n}
    f2 = {(a, b) for a, b in itertools.combinations(sorted(f1), 2)
          if sup([a, b]) * denom >= n}
    f3 = {}
    for a, b, c in itertools.combinations(sorted(f1), 3):
        if ({(a, b), (a, c), (b, c)} <= f2
                and sup([a, b, c]) * denom >= n):
            f3[(a, b, c)] = sup([a, b, c])
    rules = []
    for (a, b, c), s3 in f3.items():
        for ant, cons in (((a, b), c), ((a, c), b), ((b, c), a)):
            sa, sc = sup(list(ant)), sup([cons])
            rules.append((ant[0], ant[1], cons, s3, sa, sc,
                          s3 * 1000 // sa, s3 * n * 10000 // (sa * sc)))
    rules.sort(key=lambda r: (-r[7], -r[3], r[0], r[1], r[2]))
    expect = rules[:50]
    from duckdb_title_mapper_spark.workload import core_queries

    got = [tuple(r) for r in core_queries()["x_assoc_rules"]
           .spark_fn(spark, "/root/testdata/sf0.001").collect()]
    assert sorted(got) == sorted(expect)


def test_sssp_bellman_matches_python_replay(spark):
    """5-round Bellman-Ford replay over the same weighted edges."""
    import hashlib

    baskets = _sf001_baskets(spark)  # registers lineitem/part views
    sf = "/root/testdata/sf0.001"
    rows = spark.sql(
        "SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d "
        "FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    ).collect()

    def wgt(s, d):
        h = hashlib.md5(f"{s}:{d}".encode()).hexdigest()[:8]
        return int(h, 16) % 9 + 1

    edges = []
    for r in rows:
        wv = wgt(r["s"], r["d"])
        edges.append((r["s"], r["d"], wv))
        edges.append((r["d"], r["s"], wv))
    nodes = sorted({a for a, _b, _w in edges})
    INF = 999999
    dist = {v: INF for v in nodes}
    dist[min(nodes)] = 0
    for _ in range(5):
        nxt = dict(dist)
        for a, b, wv in edges:
            if dist[b] < INF and dist[b] + wv < nxt[a]:
                nxt[a] = min(nxt[a], dist[b] + wv)
        dist = nxt
    expect = {}
    for v, dv in dist.items():
        c, s = expect.get(dv, (0, 0))
        expect[dv] = (c + 1, s + v)
    from duckdb_title_mapper_spark.workload import core_queries

    got = {r["dist"]: (r["n_nodes"], r["node_sum"])
           for r in core_queries()["x_sssp_bellman"]
           .spark_fn(spark, sf).collect()}
    assert got == expect


def test_gsp_sequences_matches_python_replay(spark):
    """Max-gap subsequence supports replayed brute-force per user.

    The level-3 candidate set deliberately requires the (a, c)
    sub-pair to be window-frequent — part of the query's declared
    spec (see _gsp_f3_sql), NOT an apriori-closure claim (closure
    fails for non-contiguous subsequences under a max-gap)."""
    import duckdb_title_mapper_spark.workload as w

    sf = "/root/testdata/sf0.001"
    w.load(spark, sf, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "SELECT user_id AS u, event_type AS t, unix_micros(ts) AS us "
        "FROM events").collect()
    users = {}
    for r in rows:
        users.setdefault(r["u"], []).append((r["us"], r["t"]))
    W, NUM, DEN = w._GSP_W_US, w._GSP_NUM, w._GSP_DEN
    n_users = len(users)
    types = sorted({r["t"] for r in rows})

    def holds2(evts, a, b):
        return any(t1 == a and t2 == b and 0 < u2 - u1 <= W
                   for u1, t1 in evts for u2, t2 in evts)

    def holds3(evts, a, b, c):
        for um, tm in evts:
            if tm != b:
                continue
            if (any(t == a and 0 < um - u <= W for u, t in evts)
                    and any(t == c and 0 < u - um <= W
                            for u, t in evts)):
                return True
        return False

    sup2 = {(a, b): sum(holds2(e, a, b) for e in users.values())
            for a in types for b in types}
    f2 = {k: v for k, v in sup2.items() if v * DEN >= NUM * n_users}
    expect = {(2, a, b, None): v for (a, b), v in f2.items()}
    cand3 = {(a, b, c)
             for (a, b) in f2 for (b2, c) in f2 if b == b2
             and (a, c) in f2}
    for a, b, c in cand3:
        s = sum(holds3(e, a, b, c) for e in users.values())
        if s * DEN >= NUM * n_users:
            expect[(3, a, b, c)] = s
    from duckdb_title_mapper_spark.workload import core_queries

    got = {(r["lvl"], r["e1"], r["e2"], r["e3"]): r["sup"]
           for r in core_queries()["x_gsp_sequences"]
           .spark_fn(spark, sf).collect()}
    assert got == expect


def test_bootstrap_ci_matches_python_replay(spark):
    """The hash resampling, replicate sums, and percentile picks must
    equal a direct Python replay of the declared law."""
    import hashlib

    import duckdb_title_mapper_spark.workload as w

    sf = "/root/testdata/sf0.001"
    w.load(spark, sf, "events").createOrReplaceTempView("events")
    pool = [r["vol"] for r in spark.sql(
        "WITH hourly AS (SELECT unix_micros(ts) div 3600000000 AS hh,"
        " CAST(count(*) AS BIGINT) AS vol FROM events GROUP BY 1)"
        " SELECT vol FROM hourly ORDER BY hh LIMIT 48").collect()]
    n, reps = len(pool), 200

    def h(r, i):
        return int(hashlib.md5(f"{r}:{i}".encode()).hexdigest()[:8],
                   16)

    sums = sorted(
        (sum(pool[h(r, i) % n] for i in range(1, n + 1)), r)
        for r in range(1, reps + 1))
    lo, hi = sums[reps * 25 // 1000][0], sums[reps * 975 // 1000 - 1][0]
    got = w.core_queries()["x_bootstrap_ci"].spark_fn(spark, sf) \
        .collect()[0]
    assert (got["lo_sum"], got["hi_sum"]) == (lo, hi)
    assert got["point_sum"] == sum(pool)


def test_mann_kendall_matches_python_replay(spark):
    """S, the ties-corrected variance, and the cross-multiplied
    significance verdict replayed directly."""
    from collections import Counter

    import duckdb_title_mapper_spark.workload as w

    sf = "/root/testdata/sf0.001"
    w.load(spark, sf, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        "WITH hourly AS (SELECT event_type,"
        " unix_micros(ts) div 3600000000 AS h,"
        " CAST(count(*) AS BIGINT) AS vol FROM events GROUP BY 1, 2),"
        " p AS (SELECT event_type, vol, row_number() OVER"
        " (PARTITION BY event_type ORDER BY h) AS i FROM hourly)"
        " SELECT event_type, vol, i FROM p WHERE i <= 48").collect()
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append((r["i"], r["vol"]))
    expect = {}
    for et, pts in series.items():
        vols = [v for _i, v in sorted(pts)]
        n = len(vols)
        s = sum((vols[j] > vols[i]) - (vols[j] < vols[i])
                for i in range(n) for j in range(i + 1, n))
        ties = Counter(vols)
        var18 = (n * (n - 1) * (2 * n + 5)
                 - sum(t * (t - 1) * (2 * t + 5)
                       for t in ties.values()))
        sig = 1 if (abs(s) >= 1
                    and (abs(s) - 1) ** 2 * 180000 >= 38416 * var18) \
            else 0
        expect[et] = (s, var18, sig)
    got = {r["event_type"]: (r["s"], r["var18"], r["significant_95"])
           for r in w.core_queries()["x_mann_kendall"]
           .spark_fn(spark, sf).collect()}
    assert got == expect
