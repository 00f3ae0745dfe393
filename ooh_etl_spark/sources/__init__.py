"""Data sources: parquet catalog (tables.py) + the OOH XML reader."""
