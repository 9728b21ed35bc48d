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
                      cid: str = "cid", ctext: str = "ctext",
                      materialize: bool = False):
    """Top-1 TF-IDF cosine match of ``queries_df`` (qid, qtext) against
    ``corpus_df`` (cid, ctext) — DataFrame form of ``fuzzy_match_sql``.

    ``materialize`` is the scale knob.  Spark inlines each shared
    subplan per consumer, so the lazy composition re-derives the token
    relations, weights, and source scans in every branch (33 exchanges,
    6 source scans measured on the SQL form).  With ``materialize=True``
    every shared intermediate is ``localCheckpoint``ed at first use —
    sources and token relations computed once, weight relations once —
    the "pay the shuffle once" shape for a 100 TB corpus.  Leave it
    False for small inputs: eight materialization jobs cost more than
    the recompute they save below ~millions of rows (measured 2.8 s vs
    1.7 s at sf0.1).

    Arithmetic is expression-for-expression identical to the SQL form
    (same IEEE op order, same DECIMAL casts), so both settings
    hash-match the DuckDB oracle exactly, tie-breaks included.
    """
    from pyspark.sql import Window, functions as F

    from ..plans.materialize import materialize as _materialize

    mat = _materialize if materialize else (lambda df: df)
    q_src = mat(
        queries_df.select(F.col(qid).alias("qid"), F.col(qtext).alias("qtext"))
    )
    c_src = mat(
        corpus_df.select(F.col(cid).alias("cid"), F.col(ctext).alias("ctext"))
    )

    def tok(src, id_c, text_c):
        return src.select(
            F.col(id_c).alias("id"),
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_c}), '\\\\w+', 0)")
            ).alias("tok"),
        )

    ctok = mat(tok(c_src, "cid", "ctext"))
    qtok = mat(tok(q_src, "qid", "qtext"))

    # n as a DOUBLE literal — same value the SQL form's CROSS JOIN n carries
    num_docs = float(c_src.count())

    # corpus document frequencies: vocabulary-sized, consumed by BOTH
    # weight relations -> materialize, then broadcast into the joins
    cdf = mat(
        ctok.groupBy("tok").agg(
            F.count_distinct("id").cast("double").alias("df")
        )
    )

    def weights(tok_rel):
        lens = tok_rel.groupBy("id").agg(
            F.count("*").cast("double").alias("len")
        )
        cnts = tok_rel.groupBy("id", "tok").agg(F.count("*").alias("cnt"))
        w = (
            (F.col("cnt").cast("double") / F.col("len"))
            * (F.lit(num_docs) / F.col("df"))
        ).cast(W_DEC.lower())
        return (
            cnts.join(lens, "id")
            .join(F.broadcast(cdf), "tok")
            .select("id", "tok", w.alias("w"))
        )

    cw = mat(weights(ctok))
    qw = mat(weights(qtok))

    def norms(w_rel):
        return w_rel.groupBy("id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
        )

    cnorm = norms(cw).withColumnRenamed("id", "corpus_id")
    qnorm = norms(qw).withColumnRenamed("id", "query_id")

    dots = (
        qw.select(F.col("id").alias("query_id"), "tok", F.col("w").alias("qw"))
        .join(
            cw.select(
                F.col("id").alias("corpus_id"), "tok", F.col("w").alias("cw")
            ),
            "tok",
        )
        .groupBy("query_id", "corpus_id")
        .agg(F.sum(F.col("qw") * F.col("cw")).alias("dot"))
    )

    score = (
        F.round(
            F.col("dot").cast("double") / (F.col("c_nrm") * F.col("q_nrm")), 9
        ).cast("decimal(12,9)")
    )
    scored = (
        dots.join(
            F.broadcast(cnorm.withColumnRenamed("nrm", "c_nrm")), "corpus_id"
        )
        .join(qnorm.withColumnRenamed("nrm", "q_nrm"), "query_id")
        .select("query_id", "corpus_id", score.alias("score"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("corpus_id")
    )
    best = scored.withColumn("rn", F.row_number().over(w_rank)).where(
        F.col("rn") == 1
    )
    return (
        best.join(
            q_src.select(
                F.col("qid").alias("query_id"),
                F.col("qtext").alias("query_text"),
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                c_src.select(
                    F.col("cid").alias("corpus_id"),
                    F.col("ctext").alias("matched_text"),
                )
            ),
            "corpus_id",
        )
        .select(
            "query_id",
            "query_text",
            F.col("corpus_id").alias("matched_id"),
            "matched_text",
            "score",
        )
    )
