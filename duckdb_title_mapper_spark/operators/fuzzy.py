r"""Generalized TF-IDF fuzzy matching against an ARBITRARY corpus (X2).

``standardize_title`` is the reference's pipeline specialized to its
embedded knowledge base; this operator is the same algorithm — tokenize →
TF-IDF → cosine → argmax-with-lowest-index-tiebreak (reference
``src/utils.rs:62-191``) — parameterized by any (id, text) corpus
relation, expressed as a pure-DataFrame inverted-index join (the
SURVEY.md §4.3 scale form): no broadcast limit on the corpus, no Python
in the hot path, every stage a plain shuffle Catalyst can plan.

Two deliberate deviations from the reference formulas, both documented:

* **no stemming** — Porter2 is not expressible in either SQL dialect;
  the stemmed variant exists in ``operators/standardize.py`` (UDF form).
* **rational IDF**: ``idf = N / df`` instead of ``ln(N / df)``.  ``ln``
  differs by ±1 ulp between JVM ``Math.log`` and libm across thousands
  of weight values, which a value-hash oracle would catch; plain
  division is IEEE-exact in both engines.  Rational idf is order-
  isomorphic to ln-idf in df (both strictly decreasing), so rankings
  agree in the common case, though not universally across multi-term
  sums.

Cross-engine float discipline (what makes the oracle exact-match):
per-(doc,term) weights are computed with identical IEEE ops
(``(cnt/len) * (N/df)``) then CAST to ``DECIMAL(18,12)`` — one
deterministic rounding — so the group-by SUMs for dots and norms are
decimal-exact and summation-order-free; the final score returns to
DOUBLE with an identical op sequence (``dot / (cn * qn)``) per row.
"""

from __future__ import annotations

W_DEC = "DECIMAL(18,12)"


def _tok(spark_dialect: bool, rel: str, id_col: str, text_col: str) -> str:
    """(id, tok) — one row per \\w+ token occurrence, lowercased."""
    if spark_dialect:
        return (
            f"SELECT {id_col} AS id, "
            f"explode(regexp_extract_all(lower({text_col}), '\\\\w+', 0)) AS tok "
            f"FROM {rel}"
        )
    return (
        f"SELECT {id_col} AS id, "
        rf"unnest(regexp_extract_all(lower({text_col}), '\w+')) AS tok "
        f"FROM {rel}"
    )


def fuzzy_match_sql(spark_dialect: bool, queries_rel: str, corpus_rel: str,
                    qid: str = "qid", qtext: str = "qtext",
                    cid: str = "cid", ctext: str = "ctext") -> str:
    """Top-1 TF-IDF cosine match of every query against the corpus.

    ``queries_rel`` / ``corpus_rel`` are SQL relations (table names or
    parenthesized subqueries) exposing (qid, qtext) / (cid, ctext).
    Output: (qid, qtext, matched_cid, matched_text, score), one row per
    query that shares at least one in-vocabulary token with the corpus;
    ties break to the LOWEST cid (the reference's argmax, utils.rs:173).
    """
    qtok = _tok(spark_dialect, queries_rel, qid, qtext)
    ctok = _tok(spark_dialect, corpus_rel, cid, ctext)
    return f"""WITH qtok AS ({qtok}),
    ctok AS ({ctok}),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS num_docs FROM {corpus_rel}),
    cdf AS (SELECT tok, CAST(count(DISTINCT id) AS DOUBLE) AS df
            FROM ctok GROUP BY tok),
    clen AS (SELECT id, CAST(count(*) AS DOUBLE) AS len FROM ctok GROUP BY id),
    qlen AS (SELECT id, CAST(count(*) AS DOUBLE) AS len FROM qtok GROUP BY id),
    cw AS (
      SELECT t.id, t.tok,
             CAST((CAST(t.cnt AS DOUBLE) / clen.len) * (n.num_docs / cdf.df)
                  AS {W_DEC}) AS w
      FROM (SELECT id, tok, count(*) AS cnt FROM ctok GROUP BY id, tok) t
      JOIN clen ON clen.id = t.id
      JOIN cdf ON cdf.tok = t.tok
      CROSS JOIN n),
    qw AS (
      SELECT t.id, t.tok,
             CAST((CAST(t.cnt AS DOUBLE) / qlen.len) * (n.num_docs / cdf.df)
                  AS {W_DEC}) AS w
      FROM (SELECT id, tok, count(*) AS cnt FROM qtok GROUP BY id, tok) t
      JOIN qlen ON qlen.id = t.id
      JOIN cdf ON cdf.tok = t.tok
      CROSS JOIN n),
    cnorm AS (SELECT id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm
              FROM cw GROUP BY id),
    qnorm AS (SELECT id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm
              FROM qw GROUP BY id),
    dots AS (
      SELECT qw.id AS query_id, cw.id AS corpus_id,
             sum(qw.w * cw.w) AS dot
      FROM qw JOIN cw ON cw.tok = qw.tok
      GROUP BY qw.id, cw.id),
    scored AS (
      SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, corpus_id ASC) AS rn
      FROM (
        SELECT d.query_id, d.corpus_id,
               -- quantized to 9 decimals AS A DECIMAL: DuckDB's
               -- decimal->double cast double-rounds (hugeint / 10^scale in
               -- float) and drifts 1 ulp from the JVM's correctly-rounded
               -- BigDecimal cast, and mathematically-equal cosines can
               -- compute to bit-different doubles; ranking and emitting the
               -- quantized decimal makes order and output engine-exact,
               -- with exact ties falling through to the corpus_id tiebreak
               CAST(round(CAST(d.dot AS DOUBLE) / (cnorm.nrm * qnorm.nrm), 9)
                    AS DECIMAL(12,9)) AS score
        FROM dots d
        JOIN cnorm ON cnorm.id = d.corpus_id
        JOIN qnorm ON qnorm.id = d.query_id) raw)
    SELECT q.{qid} AS query_id, q.{qtext} AS query_text,
           s.corpus_id AS matched_id, c.{ctext} AS matched_text, s.score
    FROM scored s
    JOIN {queries_rel} q ON q.{qid} = s.query_id
    JOIN {corpus_rel} c ON c.{cid} = s.corpus_id
    WHERE s.rn = 1"""


def fuzzy_match_tfidf(queries_df, corpus_df,
                      qid: str = "qid", qtext: str = "qtext",
                      cid: str = "cid", ctext: str = "ctext"):
    """DataFrame wrapper: top-1 TF-IDF cosine match of ``queries_df``
    (qid, qtext) against ``corpus_df`` (cid, ctext)."""
    spark = queries_df.sparkSession
    queries_df.createOrReplaceTempView("__fuzzy_queries")
    corpus_df.createOrReplaceTempView("__fuzzy_corpus")
    return spark.sql(
        fuzzy_match_sql(
            True, "__fuzzy_queries", "__fuzzy_corpus", qid, qtext, cid, ctext
        )
    )
