"""The t2 gate, locally: every declared query must EXACTLY match its DuckDB
oracle at sf0.001, in DELIVERED row order (the driver's sf0.01 value hash
is row-order sensitive — r2 evidence — so ``canon`` keeps delivered order
and exact equality here implies a hash match there)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
from check_oracle import canon  # noqa: E402

from duckdb_title_mapper_spark.workload import TABLES, all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(name, spark, duck):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, SF_DIR)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    assert len(s_rows) >= 0  # materialized
    if q.oracle is None:
        pytest.skip("rows-only query (no SQL-expressible oracle)")
    rel = duck.sql(q.oracle)
    d_cols, d_rows = list(rel.columns), rel.fetchall()
    sc, s_canon = canon(s_rows, s_cols)
    dc, d_canon = canon(d_rows, d_cols)
    assert sc == dc, f"column mismatch: {sc} vs {dc}"
    assert len(s_canon) == len(d_canon), "row count mismatch"
    mismatches = [i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b]
    assert not mismatches, (
        f"{len(mismatches)} rows differ; first: "
        f"spark={s_canon[mismatches[0]]} duckdb={d_canon[mismatches[0]]}"
    )
