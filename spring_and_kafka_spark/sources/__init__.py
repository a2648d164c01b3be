"""Batch sources/sinks: Parquet fixture tables, CSV/JSON readers, binaryFile."""
