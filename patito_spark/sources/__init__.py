"""Model-aware readers/writers."""

from .io import read_csv, read_parquet, read_table, scan_for, write_report

__all__ = ["read_csv", "read_parquet", "read_table", "scan_for", "write_report"]
