"""Model-aware readers/writers."""

from .io import (
    iceberg_catalog_conf,
    read_csv,
    read_parquet,
    read_table,
    scan_for,
    write_report,
    write_report_table,
    write_validated,
)

__all__ = [
    "iceberg_catalog_conf",
    "read_csv",
    "read_parquet",
    "read_table",
    "scan_for",
    "write_report",
    "write_report_table",
    "write_validated",
]
