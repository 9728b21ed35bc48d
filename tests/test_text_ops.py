"""Standalone text-op column transforms: tokens, Porter2 stems, and the
distributed TF-IDF weights vs the driver-side exact index."""

import math

from duckdb_title_mapper_spark.functions.tfidf import build_index
from duckdb_title_mapper_spark.operators.text_ops import (
    tfidf_weights,
    with_stemmed_tokens,
    with_tokens,
)

DOCS = [
    (0, "Software Engineer"),
    (1, "senior software engineer"),
    (2, "data engineering manager"),
    (3, "running runs runner"),
]


def _df(spark):
    return spark.sql(
        "SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS t(doc_id, text)"
    )


def test_with_tokens(spark):
    out = {r["doc_id"]: r["tokens"] for r in with_tokens(_df(spark), "text").collect()}
    assert out[0] == ["software", "engineer"]
    assert out[2] == ["data", "engineering", "manager"]


def test_with_stemmed_tokens_matches_python(spark):
    from duckdb_title_mapper_spark.functions.text import tokenize_and_stem

    out = {
        r["doc_id"]: r["stemmed"]
        for r in with_stemmed_tokens(_df(spark), "text").collect()
    }
    for i, t in DOCS:
        assert out[i] == tokenize_and_stem(t), t
    assert out[3] == ["run", "run", "runner"]  # Porter2 specifics


def test_tfidf_weights_match_exact_index(spark):
    """The distributed (unstemmed) weights must equal the driver-side
    index built with the same formulas over the same corpus."""
    got = {
        (r["id"], r["token"]): r["tf_idf"]
        for r in tfidf_weights(_df(spark), "doc_id", "text").collect()
    }
    # independent exact computation
    toks = [t.lower().split(" ") for _, t in DOCS]
    toks = [[w for w in doc] for doc in toks]
    n = len(toks)
    for (i, tok), w in got.items():
        doc = toks[i]
        tf = doc.count(tok) / len(doc)
        df_ = sum(1 for d in toks if tok in d)
        assert abs(w - tf * math.log(n / df_)) < 1e-12, (i, tok)


def test_stemmed_tfidf_uses_index_vocabulary(spark):
    # stemmed variant merges 'engineer'/'engineering' stems per Porter2
    rows = tfidf_weights(_df(spark), "doc_id", "text", stemmed=True).collect()
    tokens = {r["token"] for r in rows}
    assert "engin" in tokens or "engineer" in tokens
    # sanity: same stem set as the exact index builder
    idx = build_index([t for _, t in DOCS])
    assert tokens == set(idx.term_to_idx)
