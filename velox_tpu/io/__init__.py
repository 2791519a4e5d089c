"""Host I/O: session catalog, table ingest, TPC-H data generation.

The TPU answer to velox/connectors + velox/dwio (SURVEY.md §2.8): the scan
stack is host-CPU territory — Arrow/Parquet decode on host, one H2D
transfer per column chunk, device batches thereafter.
"""

from velox_tpu.io.catalog import (  # noqa: F401
    register_table, register_arrow, register_parquet, register_orc,
    register_csv, register_json, register_feather, register_parquet_dir,
    get_table, drop_table,
    list_tables, Table, ParquetTable,
)
