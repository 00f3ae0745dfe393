"""Reusable operator library (compositions over DataFrame built-ins)."""
