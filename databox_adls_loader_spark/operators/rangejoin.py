"""Point-in-interval (range) join via interval bucketing.

`points.ts BETWEEN intervals.start AND intervals.end` has no equi key, so
Spark plans it as a broadcast-nested-loop join — O(|points|·|intervals|).
The scalable formulation buckets time into fixed windows: each interval is
exploded to the buckets it spans (map-side, spans are short relative to
the bucket width by construction), each point belongs to exactly ONE
bucket, and the join becomes an equi join on the bucket id with the exact
range predicate as a residual filter.  Each qualifying (point, interval)
pair meets in exactly one bucket — no post-join dedup.

Bucket width trades replication for selectivity: width ≈ the median
interval length keeps replication ≤ 2× while making the equi join carry
only near-miss candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_ts: str = "ts",
                           start_col: str = "start", end_col: str = "end",
                           bucket_seconds: int = 3600) -> DataFrame:
    """Inner join of each point to every interval containing it
    (``start <= ts < end``).  Columns of both inputs are preserved (they
    must not collide).  For per-interval counts that keep empty intervals,
    aggregate this result and left-join it back to the interval table."""
    w = bucket_seconds
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_ts).cast("double") / w).cast("long"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(F.col(start_col).cast("double") / w).cast("long"),
            F.floor(F.col(end_col).cast("double") / w).cast("long"))))
    in_range = ((F.col(point_ts) >= F.col(start_col))
                & (F.col(point_ts) < F.col(end_col)))
    return iv.join(p, "__bucket").filter(in_range).drop("__bucket")
