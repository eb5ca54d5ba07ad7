"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row, attach the latest right row with the same key and
``right_ts <= left_ts``.  The naive formulation is a range join
(`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark plans as a
broadcast-nested-loop or an exploding theta join — O(n·m) per key.

Spark-first formulation: UNION the two sides, window per key ordered by
(ts, side) with ``last(right_payload, ignorenulls)`` over the preceding
frame, keep left rows.  One shuffle per side on the key, linear work,
no range explosion — survives 100 TB where the range join dies.
Right-at-equal-ts sorts before left (side 0 < 1) so the match is
inclusive, matching DuckDB's ASOF JOIN (the oracle for
`asof_latest_purchase` in plans/queries_tpch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before its timestamp (same key).  Right payload columns come back
    null-filled when no match exists (or the match is older than
    ``tolerance_seconds``, if given)."""
    rpayload = [c for c in right.columns if c not in (key, right_ts)]
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
          for c in rpayload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__r_ts"),
    )
    l_cols = [c for c in left.columns if c not in (key, left_ts)]
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        *[F.col(c).alias(f"__r_{c}") for c in rpayload],
        F.col(right_ts).alias("__r_ts"),
    )
    w = (Window.partitionBy(key).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
          for c in rpayload],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        stale = (F.col("__ts").cast("long") - F.col("__m_ts").cast("long")
                 > tolerance_seconds)
        out = out.select(
            "*",
            *[F.when(stale, F.lit(None)).otherwise(F.col(f"__m_{c}"))
              .alias(f"__t_{c}") for c in rpayload],
            F.when(stale, F.lit(None)).otherwise(F.col("__m_ts")).alias("__t_ts"),
        )
        m = lambda c: f"__t_{c}"  # noqa: E731
        mts = "__t_ts"
    else:
        m = lambda c: f"__m_{c}"  # noqa: E731
        mts = "__m_ts"
    return out.select(
        F.col(key),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in l_cols],
        *[F.col(m(c)).alias(f"right_{c}") for c in rpayload],
        F.col(mts).alias(f"right_{right_ts}"),
    )
