"""Structured-Streaming variant — SURVEY §2.10 / §7 phase 6."""
