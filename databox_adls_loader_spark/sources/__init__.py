"""Sources & parsers — SURVEY §2.1 (S1-S9)."""
