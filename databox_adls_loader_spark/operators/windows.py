"""Scalable ordered-window computation.

A bare ``Window.orderBy(...)`` (no partitionBy) moves every row to ONE
partition — the classic 100 TB cliff.  The standard fix is the two-phase
cumulative sum: range-partition on the order key (distributed sort), run
the window *within* each partition, then add per-partition offsets computed
from a tiny driver-side pass over the partition totals.

With exact-decimal values the result is bit-identical to the
single-partition window (decimal addition is associative), so the
oracle-checked queries can use this form directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exclusive_running_sum(df: DataFrame, order_col: str, value: Column,
                          out_col: str = "running",
                          num_partitions: int | None = None,
                          value_type: str = "decimal(38,6)") -> DataFrame:
    """Exclusive (rows-preceding) running sum over a global ordering,
    without a single-partition window.

    ``value`` must be an exact type (decimal/long) for bit-identical
    equivalence with the naive global window; pass ``value_type``
    ("bigint" for token/byte counts) to keep the zero literal and the
    broadcast offsets in the same exact type.  The per-partition totals
    collect is ≤ num_partitions rows — O(cluster size), not O(data).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # the pid assignment must be computed ONCE: repartitionByRange samples
    # boundaries per job, so the totals pass and the window pass would
    # otherwise see different partitionings — persist pins it
    # persist pins the pid assignment (repartitionByRange samples new
    # boundaries per job otherwise).  Not explicitly unpersisted: the
    # cached blocks are reclaimed by the ContextCleaner once the returned
    # plan becomes unreachable — an eager unpersist here would force
    # recomputation (and re-sampling) in the consumer.
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = F.coalesce(F.sum(value).over(w), F.lit(0).cast(value_type))

    totals = (
        ranged.groupBy("__pid").agg(F.sum(value).alias("__t"))
        .collect()
    )
    totals_map: dict[int, object] = {r["__pid"]: r["__t"] for r in totals}
    offset = 0
    offsets = []
    for pid in sorted(totals_map):
        offsets.append((pid, offset))
        offset = offset + (totals_map[pid] or 0)
    off_df = F.broadcast(spark.createDataFrame(
        [(p, str(o)) for p, o in offsets], "__pid: int, __off: string"))
    # offsets travel as strings → exact decimal parse (no double roundtrip)
    return (
        ranged.join(off_df, "__pid")
        .withColumn(out_col, local + F.col("__off").cast(value_type))
        .drop("__pid", "__off")
    )


def carry_forward_last(df: DataFrame, order_col: str, value_col: str,
                       out_col: str = "carried",
                       num_partitions: int | None = None) -> DataFrame:
    """Distributed last-non-null-carry-forward over a global ordering
    (the "propagate the most recent header" pattern) — same two-phase
    shape as `exclusive_running_sum`: range-partition, carry within each
    partition via a local window, then fill each partition's
    before-first-value prefix from the preceding partitions' final value
    (a ≤num_partitions-row driver pass + broadcast join).  Never a
    single-partition window."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    local = F.last(value_col, ignorenulls=True).over(w)

    finals = (
        ranged.groupBy("__pid")
        .agg(F.max(F.when(F.col(value_col).isNotNull(),
                          F.struct(F.col(order_col).alias("o"),
                                   F.col(value_col).alias("v"))))
             .alias("__fin"))
        .collect()
    )
    fin_map = {r["__pid"]: (r["__fin"]["v"] if r["__fin"] else None)
               for r in finals}
    carry_in: dict[int, object] = {}
    running = None
    for pid in sorted(fin_map):
        carry_in[pid] = running
        if fin_map[pid] is not None:
            running = fin_map[pid]
    carry_df = F.broadcast(spark.createDataFrame(
        [(p, v) for p, v in carry_in.items()],
        "__pid: int, __carry: string"))  # string values only (header carry)
    return (
        ranged.join(carry_df, "__pid")
        .withColumn(out_col, F.coalesce(local, F.col("__carry")))
        .drop("__pid", "__carry")
    )
