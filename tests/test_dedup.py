"""Dedup operator semantics: SimHash (order-insensitive LSH fingerprint),
rolling hash (order-SENSITIVE fingerprint), exact dedup keeper choice."""

from pyspark.sql import functions as F

from duckdb_title_mapper_spark.operators.dedup import (
    exact_dedup,
    with_rolling_fingerprint,
    with_simhash,
)


def _docs(spark):
    return spark.sql(
        """SELECT * FROM (VALUES
             (0, 'the quick brown fox'),
             (1, 'the quick brown fox'),
             (2, 'fox brown quick the'),
             (3, 'a completely different document about spark engines'),
             (4, 'the quick brown foxes')
           ) AS t(doc_id, text)"""
    )


def test_simhash_identical_and_permuted(spark):
    out = {
        r["doc_id"]: r["sh"]
        for r in with_simhash(_docs(spark), "text", out_col="sh").collect()
    }
    assert out[0] == out[1]  # identical text -> identical signature
    assert out[0] == out[2]  # token permutation -> same (multiset-based)
    assert out[0] != out[3]  # different content -> different signature
    assert all(0 <= v < 2**32 for v in out.values())


def test_simhash_near_dup_low_hamming(spark):
    out = {
        r["doc_id"]: r["sh"]
        for r in with_simhash(_docs(spark), "text", out_col="sh").collect()
    }
    ham_near = bin(out[0] ^ out[4]).count("1")  # one token changed
    ham_far = bin(out[0] ^ out[3]).count("1")  # unrelated doc
    assert ham_near < ham_far


def test_rolling_fingerprint_order_sensitive(spark):
    out = {
        r["doc_id"]: r["fp"]
        for r in with_rolling_fingerprint(_docs(spark), "text", "fp").collect()
    }
    assert out[0] == out[1]  # identical -> identical
    assert out[0] != out[2]  # permuted tokens -> DIFFERENT (order matters)
    assert all(0 <= v < 1_000_000_007 for v in out.values())


def test_exact_dedup_deterministic_keeper(spark):
    df = spark.sql(
        """SELECT * FROM (VALUES
             (3, 'x'), (1, 'x'), (2, 'x'), (7, 'y')
           ) AS t(doc_id, text)"""
    )
    kept = exact_dedup(df, "text").orderBy("text").collect()
    assert [(r["doc_id"], r["text"]) for r in kept] == [(1, "x"), (7, "y")]


def test_simhash_empty_text_no_tokens(spark):
    df = spark.sql("SELECT * FROM (VALUES (0, ''), (1, 'word')) AS t(doc_id, text)")
    rows = with_simhash(df, "text", out_col="sh").collect()
    # doc 0 has no tokens -> no vote rows -> absent from the signature join
    assert sorted(r["doc_id"] for r in rows) == [1]
