"""ml-based MinHashLSH candidate generation: exact dups always collide,
distances are true Jaccard distances on the candidate set."""

from duckdb_title_mapper_spark.operators.dedup import minhash_lsh_candidate_pairs


def test_lsh_finds_exact_and_near_dups(spark):
    df = spark.sql(
        """SELECT * FROM (VALUES
             (0, 'the quick brown fox jumps over the lazy dog'),
             (1, 'the quick brown fox jumps over the lazy dog'),
             (2, 'the quick brown fox jumps over a sleepy dog'),
             (3, 'completely unrelated text about spark engines')
           ) AS t(doc_id, text)"""
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_distance"]
        for r in minhash_lsh_candidate_pairs(
            df, "doc_id", "text", max_jaccard_distance=0.6
        ).collect()
    }
    assert pairs[(0, 1)] == 0.0  # identical token sets always collide
    assert (0, 2) in pairs and 0.0 < pairs[(0, 2)] <= 0.6
    assert not any(3 in p for p in pairs)  # unrelated doc not a candidate


def test_lsh_deterministic_across_runs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidate_pairs(df, "doc_id", "text").collect()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidate_pairs(df, "doc_id", "text").collect()
    )
    assert a == b
