"""Semantic invariants for the round-12 work: the exact suffix-array
substring dedup (prefix doubling) must equal a brute-force pure-Python
replay — VERDICT r11 #2's done-criterion — on a planted corpus whose
duplicate structure exercises every output column."""

import random

from duckdb_title_mapper_spark.operators.suffixes import (
    LADDER,
    suffix_dup_spans,
)

random.seed(12)
SF = "/root/testdata/sf0.001"
_AL = "abcdefghijklmnopqrstuvwxyz "


def _rand(n):
    return "".join(random.choice(_AL) for _ in range(n))


def _planted_corpus():
    """Docs with shared substrings at several ladder levels: a 64-char
    block in docs 1/2 (two separate copies in doc 2 -> occ 3, and a
    merged-run test), a 40-char block in docs 3/4 (spans32 but not
    level 64), an exactly-8-char shared token in docs 5/6 (ladder
    floor, no dup32), and doc 7 all-unique (filtered out)."""
    b64 = _rand(64)
    b40 = _rand(40)
    b8 = _rand(8)
    return {
        1: _rand(30) + b64 + _rand(25),
        2: b64 + _rand(17) + b64 + _rand(9),
        3: _rand(50) + b40 + _rand(12),
        4: b40 + _rand(33),
        5: _rand(20) + b8 + _rand(20),
        6: b8 + _rand(41),
        7: _rand(120),
    }


def _replay(docs):
    """Brute-force character-equality replay of the declared contract
    (corpus-wide window counts per ladder level, dup32 runs merged)."""
    from collections import Counter

    counts = {}
    for k in LADDER:
        c = Counter()
        for t in docs.values():
            for p in range(len(t) - k + 1):
                c[t[p:p + k]] += 1
        counts[k] = c
    rows = {}
    for d, t in docs.items():
        max_pow2 = 0
        for k in LADDER:
            if any(
                counts[k][t[p:p + k]] >= 2
                for p in range(len(t) - k + 1)
            ):
                max_pow2 = k
        if max_pow2 < 8:
            continue
        dup = [
            p
            for p in range(len(t) - 31)
            if counts[32][t[p:p + 32]] >= 2
        ]
        runs = []
        for p in dup:
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        span = [hi - lo + 1 + 31 for lo, hi in runs]
        rows[d] = (
            max_pow2,
            len(dup),
            len(runs),
            sum(span),
            max(span) if span else 0,
            max((counts[32][t[p:p + 32]] for p in dup), default=0),
        )
    return rows


def test_arrow_ipc_pyarrow_authority():
    """The from-scratch flatbuffer/IPC codec against the reference
    implementation: pyarrow must parse our bytes (schema, values,
    batch split), and our walker must parse pyarrow's bytes — both
    directions, byte-level framing validated by read_arrow_ipc."""
    import io

    import pyarrow as pa

    from duckdb_title_mapper_spark.sources.arrowipc import (
        BATCH_META,
        FOOTER_BASE,
        batch_message,
        build_arrow_ipc,
        footer_bytes,
        read_arrow_ipc,
    )

    recs = [(i, f"text number {i} " + "x" * (i % 37))
            for i in range(1, 101)]
    blob = build_arrow_ipc(recs)
    back = read_arrow_ipc(blob)
    assert back["records"] == recs
    assert back["n_batches"] == 4
    t = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
    assert t.column("doc_id").to_pylist() == [d for d, _ in recs]
    assert t.column("text").to_pylist() == [s for _, s in recs]
    sink = io.BytesIO()
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in recs], pa.int64()),
        "text": pa.array([s for _, s in recs], pa.string()),
    })
    with pa.ipc.new_file(sink, tbl.schema) as w:
        w.write_table(tbl, max_chunksize=32)
    assert read_arrow_ipc(sink.getvalue())["records"] == recs
    # the oracle's closed-form constants: metadata size is value- and
    # row-count-independent, footer affine in block count
    assert len(batch_message(10**6, 2**40, [(2**35, 2**30)] * 5)) \
        == BATCH_META
    assert len(footer_bytes([(1, 2, 3)] * 7)) == FOOTER_BASE + 24 * 7


def test_orc_pyarrow_authority():
    """The from-scratch ORC writer against the Apache ORC C++ reader
    (via pyarrow.orc): it must parse our bytes and return the exact
    table.  The reverse direction is out of the declared profile
    (modern writers emit RLEv2 + row indexes); our walker instead
    proves strict framing validation on its own profile."""
    import io

    import pyarrow
    from pyarrow import orc

    from duckdb_title_mapper_spark.sources.orcfile import (
        build_orc,
        read_orc,
        rle_v1_decode,
        rle_v1_literals,
    )

    recs = [(i, f"text number {i} " + "x" * (i % 37))
            for i in range(1, 101)]
    blob = build_orc(recs)
    back = read_orc(blob)
    assert back["records"] == recs
    assert back["n_stripes"] == 4
    t = orc.ORCFile(io.BytesIO(blob)).read()
    assert t.column("doc_id").to_pylist() == [d for d, _ in recs]
    assert t.column("text").to_pylist() == [s for _, s in recs]
    assert isinstance(t, pyarrow.Table)
    # RLEv1 decoder also handles delta RUNS (other writers' streams):
    # control 0x05 = run of 8, delta +2, zigzag base 10
    run = bytes([0x05, 0x02]) + b"\x14"
    assert rle_v1_decode(run, 8, signed=True) == list(range(10, 26, 2))
    # literal encoder round-trips negatives via zigzag
    vals = [0, -1, 5, -1000, 2**40, -(2**40)]
    assert rle_v1_decode(rle_v1_literals(vals, True), len(vals),
                         True) == vals
    # framing validation: a flipped PostScript magic must be rejected
    bad = bytearray(blob)
    bad[-4] = ord("X")
    try:
        read_orc(bytes(bad))
        raise AssertionError("torn ORC accepted")
    except ValueError:
        pass


def _unigram_replay(texts):
    """Brute-force replay of the unigram E-step contract: enumerate
    every composition of each bounded word into 1..4-char pieces,
    path weight = product of vocab weights, expected counts by exact
    span-mass / lattice-mass division with the same two-step ppm
    long division the SQL performs."""
    import re
    from collections import Counter

    from duckdb_title_mapper_spark.functions.unigram import (
        GRID,
        MIN_CNT,
        PPM,
        W_STEPS,
    )

    toks = []
    for t in texts.values():
        toks += re.findall(r"\w+", t.lower())
    words = Counter(w for w in toks if 2 <= len(w) <= 8)
    cnt = Counter()
    for w, f in words.items():
        for i, l in GRID:
            if i + l - 1 <= len(w):
                cnt[w[i - 1:i - 1 + l]] += f
    vocab = {
        p: 1 + sum(c >= t for t in W_STEPS)
        for p, c in cnt.items()
        if len(p) == 1 or c >= MIN_CNT
    }

    def comps(n):
        if n == 0:
            return [[]]
        return [
            [l] + rest
            for l in range(1, min(4, n) + 1)
            for rest in comps(n - l)
        ]

    exp = Counter()
    nw = {}
    for w, f in words.items():
        span_num = Counter()
        z = 0
        for comp in comps(len(w)):
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
            ppm = q * PPM + ((num - q * z) * PPM) // z
            exp[p] += f * ppm
            nw.setdefault(p, set()).add(w)
    return {
        p: (len(p), vocab[p], cnt[p], exp[p], len(nw[p]))
        for p in vocab
    }


def test_unigram_estep_equals_python_replay(spark):
    import pandas as pd

    from duckdb_title_mapper_spark.functions.unigram import unigram_estep
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    base = ["banana", "bandana", "ban", "anna", "nab", "band",
            "cabana", "a", "verylongword123"]
    texts = {
        d: " ".join(
            random.choice(base) for _ in range(25)
        )
        for d in range(1, 9)
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    got = {
        r["piece"]: (
            r["plen"],
            r["w"],
            r["cnt"],
            r["expected_ppm"],
            r["n_words"],
        )
        for r in unigram_estep(spark).collect()
    }
    expect = _unigram_replay(texts)
    assert got == expect
    # planted structure fired: multi-weight pieces, an excluded long
    # word, a sub-threshold multi-char piece absent from the vocab
    assert max(v[1] for v in expect.values()) >= 2
    assert all(len(p) <= 4 for p in expect)
    assert any(v[3] > 0 for v in expect.values())


def test_unigram_viterbi_equals_python_replay(spark):
    """Max-product decode with the declared smallest-piece tie-break,
    against a brute-force enumeration of every segmentation."""
    import pandas as pd

    from duckdb_title_mapper_spark.functions.unigram import (
        GRID,
        MIN_CNT,
        W_STEPS,
        unigram_segment,
    )
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    base = ["banana", "bandana", "ban", "anna", "nab", "band",
            "cabana", "a", "verylongword123"]
    texts = {
        d: " ".join(random.choice(base) for _ in range(25))
        for d in range(1, 9)
    }
    # replay vocab (same as the E-step contract)
    import re
    from collections import Counter

    toks = []
    for t in texts.values():
        toks += re.findall(r"\w+", t.lower())
    words = Counter(w for w in toks if 2 <= len(w) <= 8)
    cnt = Counter()
    for w, f in words.items():
        for i, l in GRID:
            if i + l - 1 <= len(w):
                cnt[w[i - 1:i - 1 + l]] += f
    vocab = {
        p: 1 + sum(c >= t for t in W_STEPS)
        for p, c in cnt.items()
        if len(p) == 1 or c >= MIN_CNT
    }
    expect = {}
    for w, f in words.items():
        n = len(w)
        m = [0] * (n + 1)
        bp = [0] * (n + 1)
        m[0] = 1
        for j in range(1, n + 1):
            best, bl = 0, 0
            for l in range(1, min(4, j) + 1):
                v = vocab.get(w[j - l:j], 0) * m[j - l]
                if v > best:  # strict: first (smallest) l wins ties
                    best, bl = v, l
            m[j], bp[j] = best, bl
        pieces = []
        c = n
        while c > 0:
            l = bp[c]
            pieces.append(w[c - l:c])
            c -= l
        expect[w] = (f, n, m[n], len(pieces),
                     "|".join(reversed(pieces)))

    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    got = {
        r["word"]: (r["f"], r["n"], r["best_score"], r["n_pieces"],
                    r["seg"])
        for r in unigram_segment(spark).collect()
    }
    assert got == expect
    assert any(v[3] >= 2 for v in expect.values())  # real multi-cuts


def test_bradley_terry_equals_python_replay(spark):
    """Fixed-point MM arithmetic replayed with Python // floor
    division, battles rebuilt from the same md5 derivations."""
    import hashlib

    import pandas as pd

    from duckdb_title_mapper_spark.operators.standardize import _arrow_df
    from duckdb_title_mapper_spark.workload import all_queries

    random.seed(13)
    srcs = ["alpha", "beta", "gamma", "delta"]
    docs = {d: random.choice(srcs) for d in range(1, 161)}
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "source": [docs[d] for d in docs],
         "text": ["x"] * len(docs)}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    idx = {s: i for i, s in enumerate(sorted(set(docs.values())))}
    by_idx = {i: s for s, i in idx.items()}
    k = len(idx)
    long_rows = []
    for d, a in docs.items():
        b = by_idx[h(str(d)) % k]
        if b == a:
            continue
        wa = 1 if h(str(d) + "w") % 2 == 0 else 0
        long_rows.append((a, b, wa))
        long_rows.append((b, a, 1 - wa))
    games, wins, pair_n = {}, {}, {}
    for m, o, won in long_rows:
        games[m] = games.get(m, 0) + 1
        wins[m] = wins.get(m, 0) + won
        pair_n[(m, o)] = pair_n.get((m, o), 0) + 1
    g1 = {m: (wins[m] * 2000000) // games[m] for m in games}
    s_i = {}
    for (m, o), n_mo in pair_n.items():
        s_i[m] = s_i.get(m, 0) + (n_mo * 10**12) // (g1[m] + g1[o])
    g2 = {m: (wins[m] * 10**12) // s_i[m] for m in games}
    order = sorted(games, key=lambda m: (-g2[m], -wins[m], m))
    expect = {
        m: (games[m], wins[m], g1[m], g2[m], order.index(m) + 1)
        for m in games
    }

    q = all_queries()["x_bradley_terry_mm"]
    # spark_fn re-registers views from sf_dir; call the SQL path on
    # our planted view instead
    from duckdb_title_mapper_spark.plans.materialize import materialize
    from duckdb_title_mapper_spark.workload import _bradley_terry_sql

    long_df = materialize(
        spark.sql(_bradley_terry_sql(True, head_only="long")))
    long_df.createOrReplaceTempView("__bt_long")
    gam = materialize(spark.sql(_bradley_terry_sql(
        True, long_rel="__bt_long", head_only="gamma")))
    gam.createOrReplaceTempView("__bt_gamma")
    out = spark.sql(_bradley_terry_sql(
        True, long_rel="__bt_long", gam_rel="__bt_gamma",
        head_only="final"))
    got = {
        r["source"]: (r["games"], r["wins"], r["g1_ppm"], r["g2_ppm"],
                      r["bt_rank"])
        for r in out.collect()
    }
    assert got == expect
    assert q.oracle is not None


def test_suffix_dup_spans_equals_python_replay(spark):
    import pandas as pd

    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    docs = _planted_corpus()
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[d] for d in docs]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    got = {
        r["doc_id"]: (
            r["max_dup_pow2"],
            r["n_dup32_pos"],
            r["n_spans32"],
            r["dup_chars32"],
            r["max_span32"],
            r["max_occ32"],
        )
        for r in suffix_dup_spans(spark).collect()
    }
    expect = _replay(docs)
    assert got == expect
    # the planted structure actually fired every axis
    assert expect[1][0] == 64 and expect[2][5] == 3
    assert expect[3][0] >= 32 and expect[5][0] == 8
    assert 7 not in expect


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _recs = st.lists(
        st.tuples(
            st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
            st.text(
                alphabet=st.characters(codec="utf-8",
                                       blacklist_categories=("Cs",)),
                max_size=120),
        ),
        min_size=1, max_size=90)

    @given(_recs)
    @settings(max_examples=60, deadline=None)
    def test_arrow_ipc_roundtrip_property(recs):
        """Any (int64, utf8) record list round-trips through the
        from-scratch flatbuffer/IPC codec byte-exactly, whatever the
        batch split or payload shape."""
        from duckdb_title_mapper_spark.sources.arrowipc import (
            build_arrow_ipc,
            read_arrow_ipc,
        )

        back = read_arrow_ipc(build_arrow_ipc(recs))
        assert back["records"] == recs
        assert back["n_batches"] == (len(recs) + 31) // 32

    @given(_recs)
    @settings(max_examples=60, deadline=None)
    def test_orc_roundtrip_property(recs):
        """Any (int64, utf8) record list round-trips through the
        from-scratch ORC writer/walker — including negative ids
        (zigzag) and multi-stripe splits."""
        from duckdb_title_mapper_spark.sources.orcfile import (
            build_orc,
            read_orc,
        )

        back = read_orc(build_orc(recs))
        assert back["records"] == recs
        assert back["n_stripes"] == (len(recs) + 31) // 32
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_binary_embedding_planted_twin(spark):
    """The 1-bit quantization contract on a planted corpus: a vector
    and its tiny-perturbation twin share every sign bit, so Hamming
    rank 1 must recover the twin AND the in-row exact cosine rank
    must certify it as the true nearest neighbor."""
    import numpy as np
    import pandas as pd

    from duckdb_title_mapper_spark.operators.standardize import _arrow_df
    from duckdb_title_mapper_spark.plans.materialize import materialize
    from duckdb_title_mapper_spark.workload import _binary_embed_sql

    rng = np.random.RandomState(7)
    base = rng.randn(8, 64) * 2 + np.sign(rng.randn(8, 64)) * 0.5
    rows = []
    for i in range(8):
        rows.append((i, base[i].astype("float32").tolist()))
        # twin: same signs, slightly different magnitudes
        rows.append((100 + i,
                     (base[i] * 1.01).astype("float32").tolist()))
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                        "embedding": [r[1] for r in rows]})
    _arrow_df(spark, pdf).createOrReplaceTempView("embeddings")
    sig = materialize(spark.sql(_binary_embed_sql(True, head_only="sig")))
    sig.createOrReplaceTempView("__bin_sig_t")
    out = spark.sql(_binary_embed_sql(
        True, sig_rel="__bin_sig_t", head_only="final")).collect()
    top1 = {r["query_id"]: r for r in out if r["ham_rank"] == 1}
    for q in range(8):
        assert top1[q]["vec_id"] == 100 + q, top1[q]
        assert top1[q]["hamming"] == 0
        assert top1[q]["exact_rank"] == 1


def test_doremi_mixture_sums_to_one(spark):
    """Theorem: sum_d mix_num = mix_den (the smoothed mixture is an
    exact probability distribution) — holds by construction
    63*k*W + k*W = 64*k*W; assert it on real data."""
    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_doremi_step"].spark_fn(
        spark, SF).collect()
    dens = {r["mix_den"] for r in rows}
    assert len(dens) == 1
    assert sum(r["mix_num"] for r in rows) == dens.pop()
    assert all(r["mix_num"] > 0 for r in rows)


def test_wilcoxon_matches_pure_python_replay(spark):
    """W+/W- and the tie-corrected variance pieces against a
    from-first-principles replay on the same hourly volumes
    (midranks with ties, zeros dropped) — plus the free theorem
    w_plus + w_minus = n(n+1) on doubled ranks."""
    import pyarrow.parquet as pq

    from duckdb_title_mapper_spark.workload import all_queries

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["ts", "event_type"])
    hrs = {}
    for ts, et in zip(t.column("ts").to_pylist(),
                      t.column("event_type").to_pylist()):
        if et not in ("click", "purchase"):
            continue
        hr = (int(ts.timestamp() * 1_000_000)) // 3_600_000_000
        x, y = hrs.get(hr, (0, 0))
        hrs[hr] = (x + 1, y) if et == "click" else (x, y + 1)
    diffs = [x - y for x, y in hrs.values() if x != y]
    srt = sorted(abs(d) for d in diffs)
    # doubled midrank of each |d|: 2*rank + ties - 1
    first = {}
    cnt = {}
    for i, v in enumerate(srt):
        first.setdefault(v, i + 1)
        cnt[v] = cnt.get(v, 0) + 1
    wp = sum(2 * first[abs(d)] + cnt[abs(d)] - 1
             for d in diffs if d > 0)
    wm = sum(2 * first[abs(d)] + cnt[abs(d)] - 1
             for d in diffs if d < 0)
    n = len(diffs)
    var48 = (2 * n * (n + 1) * (2 * n + 1)
             - sum(t3 ** 3 - t3 for t3 in cnt.values()))

    row = all_queries()["x_wilcoxon_signed_rank"].spark_fn(
        spark, SF).collect()[0]
    assert row["n_pairs"] == n
    assert row["w_plus_doubled"] == wp
    assert row["w_minus_doubled"] == wm
    assert row["w_mean_x4"] == n * (n + 1)
    assert row["w_var_x48"] == var48
    assert wp + wm == n * (n + 1)


def test_suffix_dedup_apply_equals_python_replay(spark):
    """The declared union-removal semantics replayed brute-force:
    a position's 32-window is removed iff the window text is
    duplicated corpus-wide and (doc, pos) is not the arrival-key
    minimum of its equality class; cleaned text = chars outside the
    union of removed windows."""
    import hashlib

    import pandas as pd

    from duckdb_title_mapper_spark.operators.standardize import _arrow_df
    from duckdb_title_mapper_spark.operators.suffixes import (
        _apply_l32_sql,
        apply_final_sql,
    )
    from duckdb_title_mapper_spark.plans.materialize import materialize

    docs = _planted_corpus()
    occ = {}
    for d, t in sorted(docs.items()):
        for p in range(1, len(t) - 30):
            occ.setdefault(t[p - 1:p + 31], []).append((d, p))
    expect = {}
    for d, t in docs.items():
        removed = set()
        for p in range(1, len(t) - 30):
            sites = occ[t[p - 1:p + 31]]
            if len(sites) > 1 and min(sites) != (d, p):
                removed.update(range(p, p + 32))
        if not removed:
            continue
        cleaned = "".join(
            ch for i, ch in enumerate(t, start=1) if i not in removed)
        expect[d] = (len(t), len(removed), len(cleaned),
                     hashlib.md5(cleaned.encode()).hexdigest())

    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[d] for d in docs]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    iv = materialize(spark.sql(_apply_l32_sql(True)))
    iv.createOrReplaceTempView("__sfxap_iv_t")
    got = {
        r["doc_id"]: (r["old_len"], r["removed_chars"], r["new_len"],
                      r["clean_md5"])
        for r in spark.sql(
            apply_final_sql("__sfxap_iv_t", True)).collect()
    }
    assert got == expect
    # the planted 64-block's copies in docs 2/4 were excised while
    # doc 1 (holding the class representatives) was left untouched
    assert expect[2][1] >= 64 and 1 not in expect and 4 in expect


def test_arrow_ipc_rejects_torn_files():
    """Framing validation: every structural invariant the walker
    claims to check must actually reject a violation."""
    import struct

    from duckdb_title_mapper_spark.sources.arrowipc import (
        build_arrow_ipc,
        read_arrow_ipc,
    )

    blob = build_arrow_ipc([(1, "alpha"), (2, "beta")])

    def rejects(mutated, why):
        try:
            read_arrow_ipc(bytes(mutated))
            raise AssertionError(f"accepted: {why}")
        except (ValueError, struct.error):
            pass

    rejects(b"XRROW1\x00\x00" + blob[8:], "head magic")
    rejects(blob[:-6] + b"ARROW2", "tail magic")
    b = bytearray(blob)
    b[8] = 0  # continuation of the schema message
    rejects(b, "schema continuation")
    # footer bodyLength corrupted: bump the footer length field so the
    # footer region shifts and block accounting tears
    b = bytearray(blob)
    flen = struct.unpack_from("<i", b, len(b) - 10)[0]
    struct.pack_into("<i", b, len(b) - 10, flen + 8)
    rejects(b, "footer length")
    # stray bytes between EOS and footer
    eos = blob.rindex(b"\xff\xff\xff\xff\x00\x00\x00\x00")
    rejects(blob[:eos + 8] + b"\x00" * 8 + blob[eos + 8:], "stray bytes")


def test_stream_topk_leaderboard_is_prefix_consistent(spark):
    """Each batch's board must equal the exact top-10 of the token
    counts over arrival slices <= that batch, and ranks must be a
    dense 1..k prefix with non-increasing counts."""
    from duckdb_title_mapper_spark.streaming.sinks import (
        topk_leaderboard_stream,
    )

    rows = topk_leaderboard_stream(spark, SF).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r)
    assert set(by_batch) == {0, 1, 2, 3}
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    cum = Counter()
    truth = {}
    for s in range(4):
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            if d % 4 == s:
                cum.update(re.findall(r"\w+", txt.lower()))
        top = sorted(cum.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        truth[s] = top
    for s, rs in by_batch.items():
        rs = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert [(r["tok"], r["cnt"]) for r in rs] == truth[s]


def test_zip_npy_authorities():
    """stdlib zipfile and numpy must parse our bytes; our walker must
    parse stdlib-written STORED archives; torn members rejected."""
    import io
    import zipfile

    import numpy as np

    from duckdb_title_mapper_spark.sources.zipnpy import (
        NPY_NAME,
        build_zip,
        npy_bytes_closed_form,
        npy_int64,
        read_npy_int64,
        read_zip,
    )

    ids = list(range(1, 101))
    members = [(NPY_NAME, npy_int64(ids))] + [
        (f"doc_{i}.txt", f"text {i} ".encode() + b"x" * (i % 37))
        for i in ids
    ]
    blob = build_zip(members)
    back = read_zip(blob)
    assert back["members"] == members
    assert read_npy_int64(back["members"][0][1]) == ids
    assert len(npy_int64(ids)) == npy_bytes_closed_form(100, 3)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    assert zf.namelist() == [m[0] for m in members]
    arr = np.load(io.BytesIO(zf.read(NPY_NAME)))
    assert arr.dtype == np.int64 and arr.tolist() == ids
    sink = io.BytesIO()
    with zipfile.ZipFile(sink, "w", zipfile.ZIP_STORED) as w:
        for n, d in members:
            w.writestr(n, d)
    assert read_zip(sink.getvalue())["members"] == members
    # CRC validation: flip a data byte inside the first text member
    bad = bytearray(blob)
    idx = blob.index(b"text 1 ")
    bad[idx] ^= 0xFF
    try:
        read_zip(bytes(bad))
        raise AssertionError("corrupt ZIP member accepted")
    except ValueError:
        pass


def test_unigram_estep2_equals_python_replay(spark):
    """The full E -> octave-M -> E loop replayed brute-force: the
    iteration-2 expected counts must match a replay that re-runs the
    composition enumeration under the re-estimated octave weights."""
    import re
    from collections import Counter

    import pandas as pd

    from duckdb_title_mapper_spark.functions.unigram import (
        E_STEPS,
        GRID,
        MIN_CNT,
        PPM,
        W_STEPS,
        unigram_estep2,
    )
    from duckdb_title_mapper_spark.operators.standardize import _arrow_df

    base = ["banana", "bandana", "ban", "anna", "nab", "band",
            "cabana", "a", "verylongword123"]
    texts = {
        d: " ".join(random.choice(base) for _ in range(25))
        for d in range(1, 9)
    }

    def estep(words, vocab):
        def comps(n):
            if n == 0:
                return [[]]
            return [[l] + rest for l in range(1, min(4, n) + 1)
                    for rest in comps(n - l)]

        exp = Counter()
        for w, f in words.items():
            span_num = Counter()
            z = 0
            for comp in comps(len(w)):
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
        return exp

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
    e1 = estep(words, vocab1)
    vocab2 = {p: 1 + sum(e1[p] >= t for t in E_STEPS) for p in vocab1}
    e2 = estep(words, vocab2)
    expect = {p: (vocab2[p], e2[p]) for p in vocab2}

    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    )
    _arrow_df(spark, pdf).createOrReplaceTempView("documents")
    got = {r["piece"]: (r["w"], r["expected_ppm"])
           for r in unigram_estep2(spark).collect()}
    assert got == expect
    # the M-step actually moved at least one weight
    assert any(vocab2[p] != vocab1[p] for p in vocab1)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _corpus = st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=120),
        min_size=1, max_size=6)

    @given(_corpus)
    @settings(max_examples=25, deadline=None)
    def test_suffix_sql_matches_replay_on_random_corpora(texts):
        """The shared prefix-doubling SQL (DuckDB dialect — the same
        generators build the Spark side) against the brute-force
        replay on RANDOM corpora: a 4-letter alphabet forces heavy
        class collisions, empty/short docs exercise the retirement
        edges beyond the planted corpus."""
        import duckdb

        from duckdb_title_mapper_spark.operators.suffixes import (
            suffix_oracle_sql,
        )

        docs = {i + 1: t for i, t in enumerate(texts)}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (SELECT "
            "unnest(?) AS doc_id, unnest(?) AS text)",
            [list(docs), [docs[d] for d in docs]])
        rows = con.execute(suffix_oracle_sql()).fetchall()
        got = {r[0]: tuple(r[1:]) for r in rows}
        expect = {
            d: (v[0], v[1], v[2], v[3], v[4], v[5])
            for d, v in _replay(docs).items()
        }
        # column order: doc_id, max_dup_pow2, then the five span cols
        assert got == expect

    @given(st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=1, max_size=5))
    @settings(max_examples=25, deadline=None)
    def test_unigram_sql_matches_replay_on_random_corpora(texts):
        """The shared unigram E-step SQL (DuckDB dialect) against the
        composition-enumeration replay on random 2-letter corpora —
        heavy piece collisions and words hitting both vocab-threshold
        sides."""
        import duckdb

        from duckdb_title_mapper_spark.functions.unigram import (
            oracle_sql,
        )

        docs = {i + 1: t for i, t in enumerate(texts)}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (SELECT "
            "unnest(?) AS doc_id, unnest(?) AS text)",
            [list(docs), [docs[d] for d in docs]])
        rows = con.execute(oracle_sql()).fetchall()
        got = {r[0]: (r[1], r[3], r[2], r[4], r[5]) for r in rows}
        exp = _unigram_replay(docs)
        expect = {p: (v[0], v[2], v[1], v[3], v[4])
                  for p, v in exp.items()}
        assert got == expect
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_average_precision_matches_fraction_replay(spark):
    """AP@20 rationals against an exact fractions.Fraction replay
    computed from the raw embeddings (numpy float64 cosine, same
    tie-break)."""
    from fractions import Fraction

    import numpy as np
    import pyarrow.parquet as pq

    from duckdb_title_mapper_spark.workload import (
        _AP_LCM,
        all_queries,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    labels = dict(zip(ids, t.column("label").to_pylist()))
    vecs = {i: np.asarray(v, dtype=np.float64)
            for i, v in zip(ids, t.column("embedding").to_pylist())}
    unit = {i: v / np.sqrt((v * v).sum()) for i, v in vecs.items()}
    expect = {}
    for q in [i for i in ids if i < 8]:
        scored = sorted(
            ((float(unit[q] @ unit[b]), b) for b in ids if b != q),
            key=lambda sb: (-sb[0], sb[1]))[:20]
        rels = [1 if labels[b] == labels[q] else 0 for _s, b in scored]
        run, ap = 0, Fraction(0)
        for k, r in enumerate(rels, start=1):
            run += r
            if r:
                ap += Fraction(run, k)
        n_rel = sum(rels)
        num = ap * _AP_LCM
        assert num.denominator == 1  # every 1/k divides the LCM
        expect[q] = (n_rel, int(num), max(n_rel, 1) * _AP_LCM)

    got = {
        r["query_id"]: (r["n_rel20"], r["ap_num"], r["ap_den"])
        for r in all_queries()["x_average_precision"].spark_fn(
            spark, SF).collect()
    }
    assert got == expect
    assert any(v[0] > 0 for v in expect.values())


def test_rbo_matches_fraction_replay(spark):
    """RBO@10 prefix rationals against a fractions.Fraction replay
    from the raw lineitem table (same cents metric, same ties)."""
    from collections import defaultdict
    from fractions import Fraction

    import pyarrow.parquet as pq

    from duckdb_title_mapper_spark.workload import all_queries

    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_orderkey", "l_extendedprice"])
    cents = defaultdict(int)
    orders = defaultdict(set)
    for sk, ok, p in zip(t.column("l_suppkey").to_pylist(),
                         t.column("l_orderkey").to_pylist(),
                         t.column("l_extendedprice").to_pylist()):
        cents[sk] += int(round(p * 100))
        orders[sk].add(ok)
    sks = sorted(cents)
    by_rev = sorted(sks, key=lambda s: (-cents[s], s))
    by_cnt = sorted(sks, key=lambda s: (-len(orders[s]), s))
    rbo = Fraction(0)
    expect = {}
    for d in range(1, 11):
        ov = len(set(by_rev[:d]) & set(by_cnt[:d]))
        rbo += Fraction(ov * 9 ** (d - 1), d * 10 ** d)
        num = rbo * 2520 * 10 ** 10
        assert num.denominator == 1
        expect[d] = (ov, ov * (2520 // d), 2520, int(num),
                     2520 * 10 ** 10)
    got = {
        r["depth"]: (r["overlap"], r["agreement_num"],
                     r["agreement_den"], r["rbo_num"], r["rbo_den"])
        for r in all_queries()["x_rbo_rank_overlap"].spark_fn(
            spark, SF).collect()
    }
    assert got == expect
    assert expect[10][0] >= 1  # the rankings overlap somewhere


def test_wilson_pieces_reconstruct_textbook_interval(spark):
    """The emitted rationals must reconstruct the classic Wilson
    bounds: center +- 625*sqrt(rad)/scale_den equals the float
    formula with z = 1.96 to ~1e-12, and the md5 pass counts replay
    exactly."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    from duckdb_title_mapper_spark.workload import all_queries

    rows = all_queries()["x_wilson_interval"].spark_fn(
        spark, SF).collect()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source"])
    cn = {}
    for d, s in zip(t.column("doc_id").to_pylist(),
                    t.column("source").to_pylist()):
        h = int(hashlib.md5(f"{d}pass".encode()).hexdigest()[:8], 16)
        n, c = cn.get(s, (0, 0))
        cn[s] = (n + 1, c + (1 if h % 5 < 2 else 0))
    z = 1.96
    for r in rows:
        n, c = cn[r["source"]]
        assert (r["n"], r["c"]) == (n, c)
        p = c / n
        center = (p + z * z / (2 * n)) / (1 + z * z / n)
        half = (z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
                / (1 + z * z / n))
        got_center = r["center_num"] / r["center_den"]
        got_half = (625 * math.sqrt(r["rad_num"] / r["rad_den"])
                    / r["scale_den"])
        assert abs(got_center - center) < 1e-12
        assert abs(got_half - half) < 1e-12
