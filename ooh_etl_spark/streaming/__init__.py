"""Structured Streaming operators (windowed queries live in
ooh_etl_spark.queries.streaming; custom stateful operators here)."""
