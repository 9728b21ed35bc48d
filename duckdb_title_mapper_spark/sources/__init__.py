"""Source/sink connectors.

The reference's only "source" is DuckDB's own relational machinery (its
workload creates tables with DDL + INSERT, ``README.md:188-201``); this
package supplies the file-format surface a Spark engine needs: schema'd
parquet/CSV/JSON readers for the driver testdata plus partitioned
writers.  Explicit schemas everywhere — schema inference is a full extra
scan at 100 TB and can drift between files.
"""

from .tables import (  # noqa: F401
    EVENT_SCHEMA_RAW,
    load_table,
    load_events,
    read_csv,
    read_json,
    register_views,
    write_bucketed,
    write_csv,
    write_json,
    write_parquet,
)
