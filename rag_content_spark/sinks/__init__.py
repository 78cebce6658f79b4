"""Sinks (SURVEY §2.7): canonical Parquet index + export writers."""
