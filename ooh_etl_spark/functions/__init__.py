"""Expression-level function library (Column → Column, codegen-friendly)."""
