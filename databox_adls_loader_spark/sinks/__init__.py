"""Sinks — SURVEY §2.8 (K1-K8)."""
