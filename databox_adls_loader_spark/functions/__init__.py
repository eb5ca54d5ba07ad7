"""Scalar-function surface (SURVEY §2.9) + oracle-exactness helpers."""
