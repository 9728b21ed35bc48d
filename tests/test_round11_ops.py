"""Semantic invariants for the round-11 work (beyond the oracle
value-compare in test_oracle_parity), starting with the streaming
image-dedup at-least-once retry contract the r10 advice flagged."""

import os
import tempfile

SF = "/root/testdata/sf0.001"


def test_image_dedup_batch_retry_is_idempotent(spark):
    """foreachBatch retry contract: re-running a batch whose
    ``bands.b{id}`` dir was already written (attempt crashed after
    the bands write, before the checkpoint commit) must rewrite
    BYTE-IDENTICAL flags — the prior attempt's own bands must not be
    probed as 'earlier arrivals' (which would self-match every doc at
    Hamming 0 and flip the whole batch to dup-on-arrival)."""
    from pyspark.sql import functions as F

    from duckdb_title_mapper_spark.streaming.sinks import (
        _image_dedup_merge_batch)

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
    )
    batch0 = docs.where(F.col("doc_id") % 4 == 0)
    batch1 = docs.where(F.col("doc_id") % 4 == 1)
    out = tempfile.mkdtemp(prefix="dtm_test_imgdedup_retry_")

    def flags(bid):
        rows = spark.read.parquet(
            os.path.join(out, f"flags.b{bid}")).collect()
        return sorted((r["doc_id"], r["is_dup"]) for r in rows)

    _image_dedup_merge_batch(out, batch0, 0)
    _image_dedup_merge_batch(out, batch1, 1)
    first = flags(1)
    # retry: bands.b1 now exists on disk, exactly the half-committed
    # state a foreachBatch redelivery sees
    assert os.path.isdir(os.path.join(out, "bands.b1"))
    _image_dedup_merge_batch(out, batch1, 1)
    assert flags(1) == first
    # and the flags are not degenerate: self-matching would make every
    # doc a dup; the planted dHash groups guarantee SOME dups exist
    n_dup = sum(d for _, d in first)
    assert 0 < n_dup < len(first)


def test_hnsw_search_planted_twin_recall(spark):
    """The ANN family's quality contract (test_ann_scaled discipline):
    on a planted corpus where each base vector has a near-identical
    twin, the graph search must recover the twin at rank 1 for every
    query — and mark it exact_rank 1 (the in-row recall companion)."""
    import numpy as np
    import pandas as pd

    from duckdb_title_mapper_spark.workload import _hnsw_search_sql

    rng = np.random.RandomState(0)
    n_base, dim = 120, 64
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1)[:, None]
    twin = base + rng.normal(scale=0.02, size=base.shape)
    twin /= np.linalg.norm(twin, axis=1)[:, None]
    ids = list(range(n_base)) + [i + 10000 for i in range(n_base)]
    pdf = pd.DataFrame({
        "vec_id": pd.Series(ids, dtype="int64"),
        "label": pd.Series([0] * len(ids), dtype="int32"),
        "embedding": [r.astype(np.float32).tolist()
                      for r in np.vstack([base, twin])],
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")
    rows = spark.sql(_hnsw_search_sql(True)).collect()
    top1 = {r.query_id: r for r in rows if r.rank == 1}
    for q in range(8):
        assert top1[q].neighbor_id == q + 10000, (q, top1[q])
        assert top1[q].exact_rank == 1


def test_hnsw_search_structure_on_driver_data(spark):
    """Shape invariants on the real corpus: 8 queries x exactly 3
    ranks, neighbor != query, exact_rank in {-1, 1, 2, 3}."""
    from duckdb_title_mapper_spark.workload import core_queries

    rows = core_queries()["x_hnsw_search"].spark_fn(spark, SF).collect()
    assert len(rows) == 24
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
        assert r.neighbor_id != r.query_id
        assert r.exact_rank in (-1, 1, 2, 3)
    assert sorted(by_q) == list(range(8))
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())


def test_warc_codec_roundtrip_and_framing():
    from duckdb_title_mapper_spark.sources import warc

    recs = [warc.build_warcinfo("web")] + [
        warc.build_conversion("web", i, f"doc {i} body " * (i + 1))
        for i in range(4)]
    gz = warc.build_warc_gz(recs)
    back = warc.read_warc_gz(gz)
    assert [r["type"] for r in back] == ["warcinfo"] + ["conversion"] * 4
    assert back[2]["uri"] == "https://corpus.example/web/1"
    assert back[2]["block"].decode() == "doc 1 body " * 2
    # determinism (the oracle contract): identical inputs, identical bytes
    assert warc.build_warc_gz(recs) == gz
    # closed-form sizes the SQL oracle recomputes
    text = "doc 1 body " * 2
    n = len(text.encode())
    assert len(warc.build_conversion("web", 1, text)) == (
        warc.CONV_FIXED_BYTES + len("web") + len("1") + len(str(n)) + n)
    assert len(warc.build_warcinfo("a-much-longer-source")) == \
        warc.INFO_BYTES


def test_warc_reader_rejects_torn_and_malformed():
    import pytest

    from duckdb_title_mapper_spark.sources import warc

    rec = warc.build_conversion("s", 7, "hello")
    gz = warc.build_warc_gz([rec])
    with pytest.raises(ValueError):
        warc.read_warc_gz(gz[:-3])  # torn gzip member
    with pytest.raises(ValueError):
        warc.parse_warc_record(b"WARC/0.9\r\n\r\n\r\n\r\n")  # bad version
    with pytest.raises(ValueError):
        warc.parse_warc_record(rec[:-2])  # missing CRLF CRLF trailer
    # Content-Length lies short -> trailer check must fail loudly
    bad = rec.replace(b"Content-Length: 5", b"Content-Length: 3")
    with pytest.raises(ValueError):
        warc.parse_warc_record(bad)
