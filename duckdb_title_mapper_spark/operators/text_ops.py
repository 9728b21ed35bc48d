r"""X4: the match pipeline's sub-operators (M1, M2, M3/M4) exposed as
standalone DataFrame column operators over arbitrary text columns.

The reference keeps tokenize/stem/vectorize private inside its one scalar
function (``src/utils.rs:43-117``); a training-data pipeline wants them as
reusable column transforms.  Tokenization (M1) stays JVM-side
(``regexp_extract_all`` + ``lower`` — identical to the Python tokenizer
for ASCII corpora); stemming (M2) is the validated Porter2 in an
Arrow-batched pandas UDF (no Spark builtin exists); TF-IDF vectorization
(M3/M4) emits sparse (token, weight) pairs computed distributed with the
exact reference formulas (``tf = count/len``, ``idf = ln(N/df)``, natural
log, no smoothing).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd


def with_tokens(df, text_col: str, out_col: str = "tokens"):
    """M1: ``\\w+`` tokens, lowercased (JVM-side, codegen-friendly)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        out_col, F.expr(rf"regexp_extract_all(lower({text_col}), '\\w+', 0)")
    )


def with_stemmed_tokens(df, text_col: str, out_col: str = "stemmed"):
    """M1+M2: tokenize + Porter2-stem (Arrow-batched pandas UDF; the
    stemmer is pure Python — validated against the reference's golden
    outputs, see FIXTURES.md)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def stem_batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ..functions.text import tokenize_and_stem

        for s in it:
            yield s.map(lambda t: tokenize_and_stem(t) if t is not None else None)

    return df.withColumn(out_col, stem_batch(text_col))


def tfidf_weights(df, id_col: str, text_col: str, stemmed: bool = False):
    """M3/M4 distributed: (id, token, tf_idf) rows over the whole column,
    with the corpus = the column itself.  Exact reference formulas via a
    posting-shaped plan: explode -> token df counts -> join -> weight.
    Wholly Catalyst; the stem variant swaps in the pandas-UDF tokens."""
    from pyspark.sql import functions as F

    toks = (
        with_stemmed_tokens(df, text_col, "__toks")
        if stemmed
        else with_tokens(df, text_col, "__toks")
    )
    base = toks.select(
        F.col(id_col).alias("id"),
        F.size("__toks").alias("doc_len"),
        F.explode("__toks").alias("token"),
    )
    n_docs = df.count()
    df_counts = base.groupBy("token").agg(
        F.countDistinct("id").alias("doc_freq")
    )
    tf = base.groupBy("id", "doc_len", "token").agg(
        F.count("*").alias("cnt")
    )
    return (
        tf.join(df_counts, "token")
        .select(
            "id",
            "token",
            (
                (F.col("cnt").cast("double") / F.col("doc_len"))
                * F.log(F.lit(float(n_docs)) / F.col("doc_freq"))
            ).alias("tf_idf"),
        )
    )
