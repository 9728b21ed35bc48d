"""Temporal joins Spark lacks as built-ins: as-of join and banded range
join, expressed as shuffle-minimal DataFrame compositions.

The reference implements no joins at all (its whole surface is one scalar
function — src/lib.rs:72-77); these belong to the mandated scale-out
surface (SURVEY.md §2.3 note, §2.4).  DuckDB has a native ``ASOF JOIN``,
which gives the driver oracle an exact independent implementation to
check ours against.

Scale design (100 TB):

* ``asof_join`` — the classic union-marker trick: union both sides,
  window once by key ordered by time, carry the last right-side row
  forward with ``last(..., ignorenulls=True)``.  ONE shuffle on the key,
  zero join blow-up, state is one row per partition during the sort —
  versus a naive ``p JOIN c ON key AND c.ts <= p.ts`` + argmax, which
  materializes O(|p| × avg matches) intermediate rows.
* ``range_join_count`` — bucketize time by the band width; each probe row
  explodes to exactly two bucket probes (band width == bucket width ⇒
  any in-band build row lands in bucket b or b-1).  The join is then a
  pure equi-join on (key, bucket) that AQE/sort-merge handles, and the
  residual band predicate filters after.  Bounds per-pair work even for
  hot keys — versus letting Spark plan the inequality as a sort-merge on
  the key alone, where one hot user degenerates to a per-key cross
  product.
"""

from __future__ import annotations


def asof_join(left, right, on: str, left_ts: str, right_ts: str,
              right_payload: str, inclusive: bool = True,
              direction: str = "backward"):
    """For each ``left`` row, attach the nearest ``right`` row for the
    same ``on`` key: ``direction="backward"`` (default) takes the
    greatest ``right_ts`` <= ``left_ts`` (strictly < if
    ``inclusive=False``); ``direction="forward"`` takes the smallest
    ``right_ts`` >= ``left_ts`` (strictly >) — DuckDB ``ASOF LEFT
    JOIN`` / pandas ``merge_asof`` semantics (unmatched left rows keep
    NULLs).

    ``right`` must be unique per (on, right_ts); pre-aggregate if not —
    DuckDB's ASOF leaves the winner among exact-tie timestamps
    unspecified, so well-defined semantics require that dedup anyway.

    Returns ``left``'s columns + ``<right_payload>`` + ``asof_ts`` (the
    matched right timestamp, NULL when unmatched).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # Right rows must sort BEFORE left rows at equal timestamps for
    # inclusive semantics, after for strict; the forward join is the
    # same running-last carry over DESCENDING time.
    right_rank = 0 if inclusive else 2
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_payload].dataType).alias(
            "__payload"),
        F.struct(*lcols).alias("__row"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(right_rank).alias("__side"),
        F.col(right_payload).alias("__payload"),
        F.lit(None).cast(l.schema["__row"].dataType).alias("__row"),
    )
    t_order = (
        F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    un = l.unionByName(r)
    carried = un.select(
        "__side",
        "__row",
        F.last("__payload", ignorenulls=True).over(w).alias(right_payload),
        F.last(
            F.when(F.col("__side") != 1, F.col("__t")), ignorenulls=True
        ).over(w).alias("asof_ts"),
    )
    out = carried.where(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in lcols],
        right_payload,
        "asof_ts",
    )


def range_join_count(probe, build, on: str, probe_ts: str, build_ts: str,
                     band: int, count_alias: str = "n_in_band",
                     probe_row_id: str | None = None):
    """Inner banded join + count: for each ``probe`` row, the number of
    ``build`` rows with the same ``on`` key and
    ``probe_ts - band < build_ts <= probe_ts`` (timestamps and ``band``
    are integers in the same unit).  Probe rows with zero in-band build
    rows are absent (inner semantics).

    ``probe_row_id``: a column that uniquely identifies probe rows, so
    duplicate probe rows each keep their own output row.  When None, a
    per-row surrogate id is attached — the 'for each probe row' contract
    holds either way (grouping by the full row alone would silently merge
    duplicates into one row with a combined count).

    Emits ``probe``'s columns + ``<count_alias>``.
    """
    from pyspark.sql import functions as F

    pcols = probe.columns
    if probe_row_id is None:
        # surrogate values never reach the output, so the result multiset
        # does not depend on partition layout
        probe = probe.withColumn("__pid", F.monotonically_increasing_id())
    else:
        probe = probe.withColumn("__pid", F.col(probe_row_id))
    p = probe.select(
        "__pid",
        F.struct(*pcols).alias("__row"),
        F.col(on).alias("__k"),
        F.col(probe_ts).alias("__pt"),
        F.explode(
            F.array(
                F.floor(F.col(probe_ts) / band) - 1,
                F.floor(F.col(probe_ts) / band),
            )
        ).alias("__bucket"),
    )
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_ts).alias("__bt"),
        F.floor(F.col(build_ts) / band).alias("__bucket"),
    )
    joined = p.join(b, on=["__k", "__bucket"]).where(
        (F.col("__bt") > F.col("__pt") - band)
        & (F.col("__bt") <= F.col("__pt"))
    )
    agg = joined.groupBy("__pid", "__row").agg(
        F.count("*").alias(count_alias)
    )
    return agg.select(
        *[F.col(f"__row.{c}").alias(c) for c in pcols], count_alias
    )
