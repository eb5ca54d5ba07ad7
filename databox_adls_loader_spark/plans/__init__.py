"""Pipelines (SURVEY §3) and the oracle-checked query registry."""
