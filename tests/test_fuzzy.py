"""Generalized TF-IDF fuzzy-match semantics (rational-idf DataFrame form):
exact self-match, OOV drop, and lowest-cid tie-break — in both the lazy
and the materialize=True (localCheckpointed) physical forms."""

import pytest

from duckdb_title_mapper_spark.operators.fuzzy import fuzzy_match_tfidf


@pytest.mark.parametrize("materialize", [False, True])
def test_fuzzy_match_basics(spark, materialize):
    corpus = spark.sql(
        """SELECT * FROM (VALUES
             (10, 'senior data engineer'),
             (20, 'staff ml engineer'),
             (30, 'accountant')
           ) AS t(cid, ctext)"""
    )
    queries = spark.sql(
        """SELECT * FROM (VALUES
             (1, 'senior data engineer'),
             (2, 'ml engineer'),
             (3, 'zzz qqq'),
             (4, 'data accountant')
           ) AS t(qid, qtext)"""
    )
    out = {
        r["query_id"]: (r["matched_id"], float(r["score"]))
        for r in fuzzy_match_tfidf(
            queries, corpus, materialize=materialize
        ).collect()
    }
    assert out[1][0] == 10 and abs(out[1][1] - 1.0) < 1e-9  # exact match
    assert out[2][0] == 20  # best token overlap
    assert 3 not in out  # fully OOV query has no match row
    assert out[4][0] in (10, 30)


def test_fuzzy_tie_breaks_to_lowest_cid(spark):
    # two corpus docs with identical token multisets -> identical scores
    corpus = spark.sql(
        """SELECT * FROM (VALUES
             (7, 'alpha beta'), (3, 'beta alpha'), (9, 'gamma delta')
           ) AS t(cid, ctext)"""
    )
    queries = spark.sql("SELECT 1 AS qid, 'alpha beta' AS qtext")
    (row,) = fuzzy_match_tfidf(queries, corpus).collect()
    assert row["matched_id"] == 3  # lowest cid wins the exact tie


def test_rational_idf_diverges_from_ln_idf_on_crafted_case(spark):
    """Pin the documented deviation (operators/fuzzy.py:14-23) with a
    known-divergent case instead of prose (VERDICT r3 #6): rational idf
    (N/df) exaggerates rare-term norm dilution far more than ln(N/df),
    so a corpus doc diluted by a one-off rare token can LOSE the argmax
    under rational idf while WINNING it under the reference's ln idf.

    Construction (N=10 docs, query "alpha beta"):
      * doc 0 = "alpha chi"  — chi is df=1 (max idf), diluting doc 0
        by idf_chi in quadrature;
      * doc 1 = "beta"       — beta is df=9, so idf_beta is tiny under
        ln (ln 10/9 ~ 0.105) but still >1 under rational (10/9);
      * docs 2-9 carry beta (and 2-5 alpha) drowned in unique fillers.
    Rational: score(doc1) = idf_beta/2 = 0.56 beats doc 0's
    idf_alpha^2 / (2 sqrt(idf_alpha^2 + idf_chi^2)) = 0.196.
    ln: score(doc1) = 0.053 loses to doc 0's 0.0998."""
    import math

    docs = {0: "alpha chi", 1: "beta"}
    f = 0
    for cid in range(2, 10):
        fillers = " ".join(f"filler{(f := f + 1)}x{j}" for j in range(8))
        docs[cid] = ("alpha beta " if cid <= 5 else "beta ") + fillers

    corpus = spark.createDataFrame(
        [(cid, text) for cid, text in docs.items()], "cid INT, ctext STRING"
    )
    queries = spark.createDataFrame([(0, "alpha beta")], "qid INT, qtext STRING")
    got = fuzzy_match_tfidf(queries, corpus).collect()
    assert len(got) == 1
    # the engine's (documented) rational-idf argmax
    assert got[0].matched_id == 1

    # independent pure-python scorer with the reference's ln idf
    # (src/utils.rs:62-191 formulas, unstemmed to isolate the idf change)
    n = float(len(docs))
    toks = {cid: t.split() for cid, t in docs.items()}
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1

    def weights(ts, idf):
        return {
            t: (ts.count(t) / len(ts)) * idf(n / df.get(t, n))
            for t in set(ts)
        }

    def argmax_ln():
        q = weights("alpha beta".split(), math.log)
        qn = math.sqrt(sum(w * w for w in q.values()))
        best = None
        for cid in sorted(toks):
            d = weights(toks[cid], math.log)
            dot = sum(q[t] * d[t] for t in q.keys() & d.keys())
            dn = math.sqrt(sum(w * w for w in d.values()))
            s = dot / (dn * qn) if dot else 0.0
            if best is None or s > best[1] + 1e-12:
                best = (cid, s)
        return best[0]

    # the reference's ln idf picks a DIFFERENT winner on this case
    assert argmax_ln() == 0
