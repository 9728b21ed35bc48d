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
