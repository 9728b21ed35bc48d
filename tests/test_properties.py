"""Property-based checks (hypothesis) for the temporal join operators:
random key/timestamp multisets vs an independent pure-Python oracle.
Small example counts — each example runs real Spark jobs."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

pytest.importorskip("hypothesis")

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=30)

PROBES = st.lists(st.tuples(KEYS, TS), min_size=1, max_size=15)
BUILDS = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=15)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@given(probes=PROBES, builds=BUILDS)
@_SETTINGS
def test_asof_matches_python_oracle(spark, direction, probes, builds):
    from duckdb_title_mapper_spark.operators.asof import asof_join

    # contract: right unique per (key, ts) — keep the max payload
    uniq = {}
    for i, (k, t) in enumerate(builds):
        uniq[(k, t)] = max(uniq.get((k, t), -1), i)
    build_rows = [(k, t, p) for (k, t), p in sorted(uniq.items())]
    probe_rows = [(i, k, t) for i, (k, t) in enumerate(probes)]

    left = _df(spark, probe_rows, ["pid", "k", "pt"])
    right = (
        _df(spark, build_rows, ["k", "bt", "payload"])
        if build_rows
        else _df(spark, [(0, -999, -1)], ["k", "bt", "payload"])
    )
    got = {
        r["pid"]: (r["payload"], r["asof_ts"])
        for r in asof_join(
            left, right, on="k", left_ts="pt", right_ts="bt",
            right_payload="payload", direction=direction,
        ).collect()
    }
    brows = build_rows or [(0, -999, -1)]
    for pid, k, pt in probe_rows:
        if direction == "backward":
            cands = [(bt, p) for bk, bt, p in brows if bk == k and bt <= pt]
            want = max(cands) if cands else None
        else:
            cands = [(bt, p) for bk, bt, p in brows if bk == k and bt >= pt]
            want = min(cands) if cands else None
        if want is None:
            assert got[pid] == (None, None), (pid, got[pid])
        else:
            assert got[pid] == (want[1], want[0]), (pid, got[pid], want)


@given(probes=PROBES, builds=BUILDS, band=st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_range_join_count_matches_python_oracle(spark, probes, builds, band):
    from duckdb_title_mapper_spark.operators.asof import range_join_count

    probe_rows = [(i, k, t) for i, (k, t) in enumerate(probes)]
    build_rows = [(k, t) for k, t in builds]
    probe = _df(spark, probe_rows, ["pid", "k", "pt"])
    build = (
        _df(spark, build_rows, ["k", "bt"])
        if build_rows
        else _df(spark, [(0, -999)], ["k", "bt"])
    )
    out = range_join_count(
        probe, build, on="k", probe_ts="pt", build_ts="bt",
        band=band, probe_row_id="pid",
    )
    got = {r["pid"]: r["n_in_band"] for r in out.collect()}
    brows = build_rows or [(0, -999)]
    for pid, k, pt in probe_rows:
        n = sum(1 for bk, bt in brows if bk == k and pt - band < bt <= pt)
        assert got.get(pid, 0) == n, (pid, got.get(pid), n)


TOKENS = st.lists(
    st.sampled_from(["alpha", "beta", "g4mm4", "x", "delta", "ee"]),
    min_size=0,
    max_size=40,
)


@given(tokens=TOKENS)
@_SETTINGS
def test_gopher_rules_sql_matches_python(spark, tokens):
    """The Gopher-verdict SQL against a generated document must agree
    with an independent Python recompute on every stat and the
    integerized pass flag — including empty/one-token edge docs the
    parquet corpus never produces."""
    import re
    from collections import Counter

    from duckdb_title_mapper_spark.workload import _gopher_rules_sql

    text = " ".join(tokens)
    spark.createDataFrame(
        [(1, text)], "doc_id BIGINT, text STRING"
    ).createOrReplaceTempView("documents")
    try:
        [r] = spark.sql(_gopher_rules_sql(True)).collect()
    finally:
        spark.catalog.dropTempView("documents")

    toks = re.findall(r"\w+", text.lower())
    wc = len(toks)
    cs = sum(len(t) for t in toks)
    alpha = sum(1 for t in toks if re.fullmatch(r"[a-z]+", t))
    bigrams = Counter(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    top = max(bigrams.values()) if bigrams else None
    nb = sum(bigrams.values()) if bigrams else None

    assert r.word_count == wc
    assert r.mean_word_len == (cs / wc if wc else None)
    assert r.alpha_frac == (alpha / wc if wc else None)
    assert r.top_bigram_frac == (top / nb if nb else None)
    assert r.passes_gopher == int(
        50 <= wc <= 100000
        and 3 * wc <= cs <= 10 * wc
        and 5 * alpha >= 4 * wc
        and nb is not None
        and 5 * top <= nb
    )
