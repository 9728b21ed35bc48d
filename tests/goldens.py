"""Re-export of the package's golden vectors (kept in the package so the
driver-facing workload can inline them into oracle SQL)."""

from duckdb_title_mapper_spark.reference_goldens import (  # noqa: F401
    AUTHORITATIVE,
    CORPUS_104,
    EDGE_CASES,
    MESSY_PROBES,
    STEM_VECTORS,
)
