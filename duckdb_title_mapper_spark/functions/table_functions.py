r"""Python UDTF / UDAF surface.

The reference registers exactly one scalar function (``src/lib.rs:80-86``)
— table functions and aggregates are capabilities its DuckDB host provides
natively.  Our engine supplies them Spark-first:

* ``SplitSentences`` — an arrow-optimized Python UDTF: one input row
  (doc_id, text) → one output row per non-empty '.'-separated sentence
  with its index and token count.  Used via ``LATERAL`` join, the Spark
  spelling of a table-function cross apply.
* ``sumsq_mod_udaf`` — a grouped-agg pandas UDF (the UDAF shape): sum of
  squares mod 1e9+7 over arbitrary-precision Python ints, so the oracle
  can recompute it exactly with HUGEINT arithmetic.
"""

import re  # no `from __future__ import annotations`: pandas_udf needs live hints

MOD = 1_000_000_007

_WORD = re.compile(r"\w+")


def register_table_functions(spark):
    """Register split_sentences (UDTF) and sumsq_mod (grouped-agg UDF)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf, udtf

    @udtf(returnType="sentence_idx INT, sentence STRING, n_tokens INT")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i, s, len(_WORD.findall(s))

    spark.udtf.register("split_sentences", SplitSentences)

    @pandas_udf("long")
    def sumsq_mod(v: pd.Series) -> int:
        return int(sum(int(x) * int(x) for x in v) % MOD)

    spark.udf.register("sumsq_mod", sumsq_mod)
    return spark


def rolling_sum_udaf():
    """Grouped-agg pandas UDF for use OVER a bounded window frame (Spark
    evaluates it once per frame, shipping the frame's rows to the Arrow
    worker).  Integer sum — cross-engine exact."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def rolling_sum(v: pd.Series) -> int:
        return int(v.sum())

    return rolling_sum
