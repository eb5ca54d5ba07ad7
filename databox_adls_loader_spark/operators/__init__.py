"""Relational + extension operators — SURVEY §2.2-2.7 and the north-star
training-data-pipeline surface (dedup, similarity, text analysis,
multimodal)."""
