"""Deterministic (engine- and order-independent) aggregation helpers.

Float sums are order-dependent, and Spark and DuckDB neither share a
summation order nor a rounding mode — so every money/measure aggregate in
the oracle-checked queries is computed in *exact decimal* arithmetic and
only cast to double at the end.  The decimal sum is exact, and a given
exact value converts to the same IEEE double everywhere, making the
value-hash comparison stable.  The same casts appear verbatim in the
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast a double measure to exact decimal (sources carry ≤2-decimal
    money and ≤2-decimal rates, so scale 2/4 loses nothing)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal SUM → double."""
    return F.sum(dec(col, scale)).cast("double")


def dsum_expr(sql_expr: str) -> Column:
    """Exact SUM of a decimal-typed SQL expression → double."""
    return F.expr(f"CAST(SUM({sql_expr}) AS DOUBLE)")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as
    doubles (one final rounding step, identical in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") /
            F.count(c).cast("double"))
