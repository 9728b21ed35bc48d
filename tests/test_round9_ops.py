"""Round-9 operator properties: independent Python recomputation of the
round-9 queries' semantics on the same inputs — a third derivation next
to the Spark plan and the DuckDB oracle (the session-3 discipline)."""

import hashlib
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

_WORD = re.compile(r"\w+", re.ASCII)  # Java/RE2 \w is ASCII-only


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pylist()


def _embs():
    return pq.read_table(f"{SF}/embeddings.parquet").to_pylist()


def _seq_dot(a, b):
    """Index-order double fold — the _embed_dot contract."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_ndcg_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    rows = _embs()
    qs = [r for r in rows if r["vec_id"] < 8]
    want = {}
    for q in qs:
        qn = _seq_dot(q["embedding"], q["embedding"]) ** 0.5
        cands = []
        for c in rows:
            if c["vec_id"] == q["vec_id"]:
                continue
            cn = _seq_dot(c["embedding"], c["embedding"]) ** 0.5
            score = _seq_dot(q["embedding"], c["embedding"]) / (qn * cn)
            if c["label"] == q["label"]:
                gain = 3
            elif c["label"] // 2 == q["label"] // 2:
                gain = 1
            else:
                gain = 0
            cands.append((score, c["vec_id"], gain))
        by_score = sorted(cands, key=lambda t: (-t[0], t[1]))
        dcg = sum(g * (2520 // (i + 1))
                  for i, (_, _, g) in enumerate(by_score[:10]))
        by_gain = sorted(cands, key=lambda t: (-t[2], t[1]))
        idcg = sum(g * (2520 // (i + 1))
                   for i, (_, _, g) in enumerate(by_gain[:10]))
        n_rel = sum(1 for _, _, g in by_score[:10] if g > 0)
        want[q["vec_id"]] = (dcg, idcg, n_rel)

    got = {r.query_id: (r.dcg_s2520, r.idcg_s2520, r.n_rel_at_k)
           for r in all_queries()["x_ndcg_topk"].spark_fn(spark, SF).collect()}
    assert got == want


def test_span_corruption_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    agg = {}
    for d in _docs():
        n = len(_WORD.findall(d["text"].lower()))
        spans = [(p, 1 + (d["doc_id"] + p) % 3)
                 for p in range(1, n + 1)
                 if p % 17 == d["doc_id"] % 17]
        masked = sum(min(ln, n - p + 1) for p, ln in spans)
        a = agg.setdefault(d["source"], [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += len(spans)
        a[3] += masked
        a[4] += n - masked + len(spans)
        a[5] += masked + len(spans) + 1
    want = {
        src: (a[0], a[1], a[2], a[3], a[3] * 10000 // a[1], a[4], a[5])
        for src, a in agg.items()
    }
    got = {r.source: (r.n_docs, r.total_tokens, r.total_spans,
                      r.total_masked, r.mask_ratio_bp, r.encoder_tokens,
                      r.decoder_tokens)
           for r in all_queries()["x_span_corruption"]
           .spark_fn(spark, SF).collect()}
    assert got == want


def test_ab_srm_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    events = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id",
                                         "event_type"]).to_pylist()
    arms = {}
    for e in events:
        arm = int(hashlib.md5(str(e["user_id"]).encode())
                  .hexdigest()[:8], 16) % 2
        arms.setdefault(e["event_type"], set()).add((e["user_id"], arm))
    want = {}
    for et, users in arms.items():
        n0 = sum(1 for _, a in users if a == 0)
        n1 = len(users) - n0
        d = n0 - n1
        ppm = d * d * 1000000 // len(users)
        want[et] = (n0, n1, len(users), d, ppm, ppm > 3841)
    got = {r.event_type: (r.n_control, r.n_treatment, r.n_users,
                          r.delta, r.srm_ppm, r.srm_flag)
           for r in all_queries()["x_ab_srm_check"]
           .spark_fn(spark, SF).collect()}
    assert got == want


def test_prefix_cache_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    by_source = {}
    for d in sorted(_docs(), key=lambda d: d["doc_id"]):
        by_source.setdefault(d["source"], []).append(
            _WORD.findall(d["text"].lower()))
    want = {}
    for src, seqs in by_source.items():
        n_pairs = cached = req = 0
        for prev, cur in zip(seqs, seqs[1:]):
            lcp = 0
            for a, b in zip(prev, cur):
                if a != b:
                    break
                lcp += 1
            n_pairs += 1
            cached += lcp
            req += len(cur)
        want[src] = (n_pairs, cached, req, cached * 10000 // req)
    got = {r.source: (r.n_pairs, r.cached_prefix_tokens,
                      r.request_tokens, r.hit_ratio_bp)
           for r in all_queries()["x_prefix_cache_hits"]
           .spark_fn(spark, SF).collect()}
    assert got == want


def test_audio_qa_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    agg = {}
    for d in _docs():
        h = hashlib.md5(d["text"].encode()).digest()
        amps = [min(32767, (h[s] % 33) * 1024) for s in range(16)]
        n_silent = sum(1 for a in amps if a == 0)
        n_clipped = sum(1 for a in amps if a == 32767)
        energy = sum(64 * a * a for a in amps)
        a = agg.setdefault(d["source"], [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if (n_silent <= 4 and n_clipped == 0) else 0
        a[2] += n_silent
        a[3] += n_clipped
        a[4] += energy
        a[5] = max(a[5], max(64 * x * x for x in amps))
    want = {src: tuple(a) for src, a in agg.items()}
    got = {r.source: (r.n_audio, r.n_kept, r.total_silent_segs,
                      r.total_clipped_segs, r.total_energy,
                      r.max_seg_energy)
           for r in all_queries()["x_audio_qa_gate"]
           .spark_fn(spark, SF).collect()}
    assert got == want


def test_dpo_pairs_matches_python(spark):
    from duckdb_title_mapper_spark.workload import all_queries

    groups = {}
    for d in _docs():
        reward = 2 * len(_WORD.findall(d["text"].lower())) + (
            d["n_chars"] % 7)
        groups.setdefault((d["source"], d["lang"]), []).append(
            (reward, d["doc_id"]))
    want = {}
    for key, members in groups.items():
        if len(members) < 2:
            continue
        rmax = max(r for r, _ in members)
        rmin = min(r for r, _ in members)
        if rmax == rmin:
            continue
        chosen = min(doc for r, doc in members if r == rmax)
        rejected = min(doc for r, doc in members if r == rmin)
        want[key] = (chosen, rmax, rejected, rmin, rmax - rmin,
                     len(members))
    got = {(r.source, r.lang): (r.chosen_doc, r.chosen_reward,
                                r.rejected_doc, r.rejected_reward,
                                r.reward_margin, r.n_candidates)
           for r in all_queries()["x_dpo_pairs"]
           .spark_fn(spark, SF).collect()}
    assert got == want
