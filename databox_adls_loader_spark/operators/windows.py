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

    Output invariant (callers may rely on it): the returned frame is
    range-partitioned ASCENDING on ``order_col`` and sorted by it within
    each partition — partitions enumerate in global key order, so a
    final ``ORDER BY order_col`` downstream needs only a
    ``sortWithinPartitions``, never a new range exchange.

    Round-13 shape (guide §2.4): the local prefix used to be a
    ``Window.partitionBy(__pid)`` — but the data is RANGE-partitioned,
    so that window re-shuffled every row by hash(__pid) and the caller's
    final orderBy re-shuffled them BACK by range: three exchanges where
    the algorithm needs one.  Now the rows are sorted within the range
    partitions once, and the exclusive prefix is accumulated in ONE
    Arrow pass per partition (exact ``decimal.Decimal`` / arbitrary-
    precision ``int`` arithmetic — bit-identical to the decimal/long
    window sum, which is order-insensitive because exact addition is
    associative).  The offsets ride a tiny driver dict inside the
    closure instead of a broadcast join.
    """
    import decimal as _dec

    import pandas as pd
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # the pid assignment must be computed ONCE: repartitionByRange samples
    # boundaries per job, so the totals pass and the prefix pass would
    # otherwise see different partitionings — persist pins it (and pins
    # the within-partition sort order the prefix pass walks).  Not
    # explicitly unpersisted: the cached blocks are reclaimed by the
    # ContextCleaner once the returned plan becomes unreachable — an
    # eager unpersist here would force recomputation (and re-sampling)
    # in the consumer.
    # null values contribute nothing to a running SUM — coalescing them
    # to 0 up front is value-identical and keeps the int64 column
    # null-free through Arrow (a nullable batch would surface as float64)
    ranged = (
        df.withColumn("__v", F.coalesce(value.cast(value_type),
                                        F.lit(0).cast(value_type)))
        .repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = (
        ranged.groupBy("__pid").agg(F.sum("__v").alias("__t"))
        .collect()
    )
    totals_map: dict[int, object] = {r["__pid"]: r["__t"] for r in totals}
    offset = 0
    offsets: dict[int, object] = {}
    for pid in sorted(totals_map):
        offsets[pid] = offset
        offset = offset + (totals_map[pid] or 0)

    out_type = _parse_datatype_string(value_type)
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, out_type, True)])
    out_cols = [f.name for f in out_schema.fields]
    is_decimal = value_type.strip().lower().startswith("decimal")

    def add_prefix(batches):
        # one partition per call; batches arrive in the persisted (sorted)
        # order, so a running accumulator IS the exclusive prefix.  Exact
        # arithmetic only: decimal.Decimal at full precision, or Python
        # int — never float.
        acc = None
        with _dec.localcontext() as ctx:
            ctx.prec = 76        # > 2×38 digits: no rounding ever
            for pdf in batches:
                if not len(pdf):
                    continue
                if acc is None:
                    acc = offsets.get(int(pdf["__pid"].iloc[0]), 0)
                    if is_decimal and not isinstance(acc, _dec.Decimal):
                        acc = _dec.Decimal(acc)
                prior = []
                for v in pdf["__v"]:
                    prior.append(acc)
                    acc = acc + (v if is_decimal else int(v))
                res = pdf.drop(columns=["__v", "__pid"])
                res[out_col] = pd.Series(
                    prior, index=res.index,
                    dtype="object" if is_decimal else "int64")
                yield res[out_cols]

    return ranged.mapInPandas(add_prefix, out_schema)


def carry_forward_last(df: DataFrame, order_col: str, value_col: str,
                       out_col: str = "carried",
                       num_partitions: int | None = None) -> DataFrame:
    """Distributed last-non-null-carry-forward over a global ordering
    (the "propagate the most recent header" pattern) — same two-phase
    shape as `exclusive_running_sum`: range-partition, carry within each
    partition via a local window, then fill each partition's
    before-first-value prefix from the preceding partitions' final value
    (a ≤num_partitions-row driver pass + tiny closure dict).  Never a
    single-partition window.

    Round-13 shape (guide §2.4, same fix as `exclusive_running_sum`):
    the local carry used to be a ``Window.partitionBy(__pid)`` over
    RANGE-partitioned data — a full hash(__pid) re-shuffle plus its
    sort for a computation that is a single ordered walk of each
    partition.  Now the rows are sorted within the range partitions
    once and the carry is ONE Arrow pass per partition."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
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

    val_type = df.schema[value_col].dataType
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, val_type, True)])
    out_cols = [f.name for f in out_schema.fields]

    def carry(batches):
        cur = None
        first = True
        for pdf in batches:
            if not len(pdf):
                continue
            if first:
                cur = carry_in.get(int(pdf["__pid"].iloc[0]))
                first = False
            out = []
            for v in pdf[value_col]:
                if v is not None and v == v:   # last non-null wins
                    cur = v
                out.append(cur)
            res = pdf.drop(columns=["__pid"])
            res[out_col] = pd.Series(out, index=res.index, dtype=object)
            yield res[out_cols]

    return ranged.mapInPandas(carry, out_schema)


def global_row_number(df: DataFrame, order: list[tuple[str, str]],
                      out_col: str = "row_number",
                      num_partitions: int | None = None
                      ) -> tuple[DataFrame, int]:
    """Global row_number over a total ordering with NO single-partition
    window: range-partition on the order key (distributed sort), number
    rows *within* each partition in parallel, then add broadcast
    per-partition offsets (≤ num_partitions rows collected — O(cluster
    size), not O(data)).

    ``order`` is [(column, "asc"|"desc"), ...] and must be a total order
    (add a unique tiebreak) for a deterministic result.  Returns
    (DataFrame, total_row_count) — the total falls out of the offsets
    pass for free, so rank-distribution callers don't re-scan.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sort_exprs = [F.col(c).desc() if d == "desc" else F.col(c).asc()
                  for c, d in order]
    # ONE full-data shuffle total: range partition, sort within each
    # partition, then read (pid, local index) straight out of
    # monotonically_increasing_id — Spark packs the partition id in the
    # upper bits and a per-partition counter in the lower 33, so local
    # numbering needs no Window at all (a Window.partitionBy(pid) here
    # would re-shuffle by hash(pid) — the data is range-, not
    # hash-partitioned).  Limit: 2^33 rows per partition; size
    # num_partitions so a partition stays under ~8.5 B rows.
    # persist pins the pid assignment AND the id counters —
    # repartitionByRange samples new boundaries per job otherwise (same
    # trap as exclusive_running_sum)
    ranged = (
        df.repartitionByRange(num_partitions, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
        .withColumn("__lrn", F.col("__mid").bitwiseAND((1 << 33) - 1) + 1)
        .persist()
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c")).collect()
    cmap = {r["__pid"]: r["__c"] for r in counts}
    off, rows = 0, []
    for pid in sorted(cmap):
        rows.append((pid, off))
        off += cmap[pid]
    off_df = F.broadcast(spark.createDataFrame(rows, "__pid: int, __off: long")
                         if rows else
                         spark.createDataFrame([], "__pid: int, __off: long"))
    out = (
        ranged.join(off_df, "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off", "__mid")
    )
    return out, off


def global_row_number_grouped(df: DataFrame, group_col: str,
                              order: list[tuple[str, str]],
                              out_col: str = "row_number",
                              num_partitions: int | None = None
                              ) -> tuple[DataFrame, dict]:
    """Per-group global row_number — the numbering restarts at 1 for
    each distinct ``group_col`` value — in ONE range shuffle, where a
    per-group `global_row_number` loop pays the whole two-phase pass
    (sampling job + shuffle + persist + counts collect) once per group.

    Range-partition on (group, order...), sort within partitions, and
    derive every group's offsets from one ≤|partitions|·|groups|-row
    stats collect: per-(partition, group) row count plus the group's
    first local index (a group's rows are contiguous in the partition
    sort order, so its local position is ``__lrn - first + 1``).  The
    per-group numbering is identical to `global_row_number` run on the
    group's slice with the same ``order`` — same total order, same
    two-phase construction.  Returns (DataFrame, {group_value:
    n_rows_in_group})."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sort_exprs = [F.col(group_col).asc()] + [
        F.col(c).desc() if d == "desc" else F.col(c).asc()
        for c, d in order]
    ranged = (
        df.repartitionByRange(num_partitions, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
        .withColumn("__lrn", F.col("__mid").bitwiseAND((1 << 33) - 1) + 1)
        .persist()
    )
    stats = (ranged.groupBy("__pid", group_col)
             .agg(F.count(F.lit(1)).alias("__c"),
                  F.min("__lrn").alias("__lo")).collect())
    off: dict = {}
    rows = []
    for r in sorted(stats, key=lambda r: (r[group_col], r["__pid"])):
        g = r[group_col]
        rows.append((r["__pid"], g, off.get(g, 0), r["__lo"]))
        off[g] = off.get(g, 0) + r["__c"]
    gtype = df.schema[group_col].dataType.simpleString()
    off_df = F.broadcast(spark.createDataFrame(
        rows, f"__pid int, {group_col} {gtype}, __off long, __lo long")
        if rows else spark.createDataFrame(
            [], f"__pid int, {group_col} {gtype}, __off long, __lo long"))
    out = (
        ranged.join(off_df, ["__pid", group_col])
        .withColumn(out_col,
                    (F.col("__off") + F.col("__lrn") - F.col("__lo") + 1)
                    .cast("long"))
        .drop("__pid", "__lrn", "__off", "__lo", "__mid")
    )
    return out, off


def global_ranks(df: DataFrame, order: list[tuple[str, str]],
                 ntile: int | None = None,
                 num_partitions: int | None = None,
                 unique: bool = False) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist (and optionally
    ntile) over a GLOBAL ordering, built entirely from scale-safe parts:

    * row_number via `global_row_number` (range partition + offsets);
    * tie-group min/max via windows partitioned BY THE ORDER VALUES
      (ties share a partition key — no global sort);
    * dense_rank = a second two-phase row_number over the distinct
      tie-group ranks (cardinality ≤ distinct order tuples);
    * percent_rank/cume_dist/ntile from the SQL definitions —
      (rank-1)/(n-1), max_rn/n, and exact integer bucket math — with n
      carried as a literal from the offsets pass (no extra scan).

    Tie groups are the full ``order`` tuple, exactly SQL's
    ``RANK() OVER (ORDER BY <order>)``.  This is the 100 TB form of the
    one window shape Spark executes on a single partition
    (`WindowExec: No Partition Defined`); results are bit-identical to
    the native global window.

    ``unique=True`` declares the ``order`` tuple a KEY (e.g. it ends in
    a unique tiebreak column): no row has peers, so rank = dense_rank =
    row_number, the tie-group max is the row itself, and the whole
    tie-window + dense-rank second pass + rank join collapse to map-side
    column math over ONE `global_row_number` — one range shuffle and one
    O(partitions) offsets job instead of three shuffles and two jobs.
    Values are identical BY DEFINITION (SQL peers are rows equal on the
    full ORDER BY tuple; a key admits none) — asserted against the
    general path in tests/test_profile.py.  The caller owns the
    uniqueness claim; passing unique=True over a non-key order returns
    row_number-ranks, which SQL RANK would not.
    """
    base, n = global_row_number(df, order, "__rn", num_partitions)
    if unique:
        out = (base.withColumn("rnk", F.col("__rn"))
               .withColumn("drnk", F.col("__rn"))
               .withColumn(
                   "pct_rank",
                   F.when(F.lit(n) > 1,
                          (F.col("rnk") - 1).cast("double")
                          / F.lit(float(n - 1 if n > 1 else 1)))
                   .otherwise(F.lit(0.0)))
               .withColumn("cume_dist",
                           F.col("__rn").cast("double") / F.lit(float(n or 1))))
        if ntile is not None:
            out = out.withColumn("ntile", _ntile_expr("__rn", n, int(ntile)))
        return out.withColumnRenamed("__rn", "row_number")
    tie_cols = [c for c, _ in order]
    wt = Window.partitionBy(*tie_cols)
    t = (base.withColumn("rnk", F.min("__rn").over(wt))
             .withColumn("__maxrn", F.max("__rn").over(wt)))
    dense_src = t.select(F.col("rnk").alias("__grnk")).distinct()
    dense, dn = global_row_number(dense_src, [("__grnk", "asc")], "drnk",
                                  num_partitions)
    # Gate the broadcast on the dense frame's ACTUAL cardinality (free —
    # it falls out of its offsets pass), not on n: with a unique tiebreak
    # the frame has exactly n rows, and broadcasting anywhere near 10M
    # rows would collect them all through the driver.  1M × two longs
    # ≈ 16 MB — safely broadcastable; above that, plain shuffle join
    # (AQE can still convert at runtime if the measured size is small).
    dense = dense.withColumnRenamed("__grnk", "rnk")
    out = t.join(F.broadcast(dense) if dn <= 1_000_000 else dense, "rnk")
    out = out.withColumn(
        "pct_rank",
        F.when(F.lit(n) > 1,
               (F.col("rnk") - 1).cast("double") / F.lit(float(n - 1 if n > 1 else 1)))
        .otherwise(F.lit(0.0)),
    ).withColumn("cume_dist", F.col("__maxrn").cast("double") / F.lit(float(n or 1)))
    if ntile is not None:
        out = out.withColumn("ntile", _ntile_expr("__rn", n, int(ntile)))
    return out.withColumnRenamed("__rn", "row_number").drop("__maxrn")


def _ntile_expr(rn_col: str, n: int, k: int) -> Column:
    """Exact SQL NTILE(k) from a 1-based global row number: q = n div k
    rows per bucket, the first r = n mod k buckets take one extra row —
    exact integer division only (the float-floor form can misround near
    2^53).  Shared by `global_ranks` and `global_ntile`."""
    q, r = n // k, n % k
    return (
        F.when(F.col(rn_col) <= r * (q + 1),
               F.expr(f"({rn_col} - 1) div {q + 1}") + 1)
        .otherwise(F.lit(r) + F.expr(f"({rn_col} - {r * (q + 1)} - 1) div {max(q, 1)}") + 1)
        .cast("long")
    )


def global_ntile(df: DataFrame, order: list[tuple[str, str]], k: int,
                 num_partitions: int | None = None) -> DataFrame:
    """NTILE(k) over a global ordering from `global_row_number` alone.
    NTILE depends only on the row number — not on rank/dense_rank — so
    this skips `global_ranks`' tie-group windows, dense-rank second pass,
    and rank join entirely: ONE full-data shuffle (the range partition),
    then map-side integer math.  Use this when only the bucket is
    consumed (equi-depth histograms, range-split advisors)."""
    base, n = global_row_number(df, order, "__rn", num_partitions)
    return (base.withColumn("ntile", _ntile_expr("__rn", n, int(k)))
            .withColumnRenamed("__rn", "row_number"))


def exclusive_running_min(df: DataFrame, order: list[tuple[str, str]],
                          value_col: str, out_col: str = "running_min",
                          num_partitions: int | None = None) -> DataFrame:
    """Exclusive (strict-predecessor) running MIN of ``value_col`` over
    a global multi-column ordering, without a single-partition window —
    the same two-phase shape as `exclusive_running_sum`: range-partition
    on the order key, window within each partition, then fold the
    per-partition mins on the driver (≤ num_partitions rows) and
    broadcast each partition's carry-in.  Rows with no strict
    predecessor get NULL.

    ``order`` is [(column, "asc"|"desc"), ...] and should be a total
    order for a deterministic result; ``value_col`` must be a date or
    integral column (the carry travels as its string form, which both
    round-trips exactly and compares correctly driver-side)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c).asc() if d == "asc" else F.col(c).desc()
            for c, d in order]
    ranged = (df.repartitionByRange(num_partitions, *cols)
              .withColumn("__pid", F.spark_partition_id())
              .persist())
    w = (Window.partitionBy("__pid").orderBy(*cols)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = F.min(value_col).over(w)
    finals = (ranged.groupBy("__pid")
              .agg(F.min(value_col).alias("__m")).collect())
    fin_map = {r["__pid"]: r["__m"] for r in finals}
    carry_in: dict[int, object] = {}
    running = None
    for pid in sorted(fin_map):
        carry_in[pid] = running
        m = fin_map[pid]
        if m is not None and (running is None or m < running):
            running = m
    dtype = dict(df.dtypes)[value_col]
    carry_df = F.broadcast(spark.createDataFrame(
        [(p, None if v is None else str(v))
         for p, v in carry_in.items()], "__pid: int, __carry: string"))
    carried = F.col("__carry").cast(dtype)
    return (ranged.join(carry_df, "__pid")
            .withColumn(out_col, F.least(
                F.coalesce(local, carried), F.coalesce(carried, local)))
            .drop("__pid", "__carry"))
