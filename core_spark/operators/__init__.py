"""Batch query operators: time-series verbs, data quality, dedup, similarity."""
