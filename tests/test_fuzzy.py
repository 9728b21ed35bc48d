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
