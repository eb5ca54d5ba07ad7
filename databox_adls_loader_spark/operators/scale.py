"""Scale utilities: bucketed co-located joins and skew salting.

The reference parallelizes with thread pools and distcp mappers (SURVEY
§4); the Spark-native equivalents of its "run many copies" advice are
physical-layout controls:

  * bucketing — pre-shuffle a fact table ON DISK by its join key so every
    subsequent join/aggregate on that key is exchange-free (the 100 TB
    equivalent of the reference's per-prefix sharding, F3);
  * salting — split a hot key across `n_salts` sub-keys so one skewed
    reducer becomes n parallel ones (complements AQE skew-join, which
    only splits *partitions*, not single keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Readers of `table` joining/aggregating on `bucket_cols` get
    exchange-free plans: Spark's native bucketing records the hash
    partitioning in the catalog, so the join's ClusteredDistribution is
    already satisfied.  At 100 TB this converts every repeated
    fact⋈fact join from two full shuffles into zero."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def salt_keys(df: DataFrame, key: str, n_salts: int,
              unique_col: str) -> DataFrame:
    """Fact side of a salted join: deterministic sub-key from a unique
    column's hash (no RNG — reruns and task retries produce identical
    salts, keeping the operation idempotent like the reference's sinks)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int"))


def explode_salts(dim: DataFrame, n_salts: int) -> DataFrame:
    """Dim side: replicate each row once per salt value (dim is small —
    replication is n_salts × |dim|, still broadcastable)."""
    return dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int"))))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                unique_col: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-proof equi join: fact rows of one hot key spread across
    `n_salts` (key, salt) sub-keys; the dim side is replicated to match.
    Result is row-identical to the unsalted join.

    Use when ONE key dominates (null-ish sentinel ids, celebrity users):
    AQE's skew-join splits oversized *partitions* but cannot split a
    single key's hash bucket — salting can.

    Only inner/left are supported: right/full outer would surface each
    unmatched dim row once per salt replica (n_salts null-padded rows
    instead of one)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "hows would duplicate unmatched dim rows per salt replica")
    f = salt_keys(fact, key, n_salts, unique_col)
    d = explode_salts(dim, n_salts)
    joined = f.join(d, [key, "__salt"], how)
    return joined.drop("__salt")


def merge_upsert(existing: DataFrame, updates: DataFrame,
                 key: str) -> DataFrame:
    """Batch MERGE semantics without a table format: updates win on key
    collision, unmatched rows from both sides survive (upsert).  Column
    sets must match.  At scale this is the rewrite step of a
    foreachBatch/CDC sink (pair with `cdc_latest_per_key` to collapse the
    update stream first); with a transactional table format the same
    logic is `MERGE INTO` — this operator is the format-free equivalent."""
    upd = updates.select(*existing.columns)
    keep_existing = existing.join(upd.select(key), key, "left_anti")
    return keep_existing.unionByName(upd)


def compact_parquet_dir(spark, in_dir: str, out_dir: str,
                        target_mb: int = 512) -> int:
    """Small-file compaction — the standing maintenance job of any
    long-running ingest: N tiny parquet files become
    ceil(total_bytes / target) evenly-sized ones.

    File sizes come from the scan's own ``_metadata.file_size`` hidden
    column — a distributed footer-level read of exactly the files the
    rewrite will consume (a driver-side `FileSystem` listing would both
    serialize on the Py4J gateway for the very many-small-files case this
    utility exists for, and count nested files the scan never reads).
    The rewrite is one round-robin repartition so rows spread evenly
    regardless of input skew.  Returns the output partition count."""
    import math

    src = spark.read.parquet(in_dir)
    total = (
        src.select(F.col("_metadata.file_path").alias("p"),
                   F.col("_metadata.file_size").alias("b"))
        .groupBy("p").agg(F.first("b").alias("b"))
        .agg(F.sum("b").alias("b")).collect()[0]["b"]
    ) or 0
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    src.repartition(n).write.mode("overwrite").parquet(out_dir)
    return n


def zorder_key2(a, b, bits: int = 8):
    """Z-order (Morton) interleave of two non-negative int columns into
    one bigint locality key: bit k of ``a`` lands at position 2k, bit k
    of ``b`` at 2k+1.

    Sorting/range-partitioning a 100 TB table by this key before writing
    clusters rows that are close in BOTH dimensions into the same files,
    so 2-D range predicates prune to O(√files) instead of scanning one
    dimension's clustering only — the standard multi-dimensional layout
    technique (public: Morton 1966; used by several lakehouse engines).
    Pure codegen'd integer bit math (shift/and/or), bit-portable to any
    engine."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a, b = a.cast("long"), b.cast("long")
    out = F.lit(0).cast("long")
    for k in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k))
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1))
    return out


def merge_when(existing: DataFrame, updates: DataFrame, key: str,
               update_when=None, delete_when=None,
               insert_when=None) -> DataFrame:
    """Conditional MERGE semantics over plain frames — the full
    three-clause form `merge_upsert` is the unconditional special case
    of:

        WHEN MATCHED AND <delete_when>  THEN DELETE
        WHEN MATCHED AND <update_when>  THEN UPDATE SET *   (else keep)
        WHEN NOT MATCHED AND <insert_when> THEN INSERT *    (else drop)

    Clause conditions are boolean Columns over the aliased join —
    reference target columns as ``e.<col>`` and source columns as
    ``u.<col>`` (e.g. ``F.col("u.ts") > F.col("e.ts")`` for
    only-newer-wins).  ``None`` means the SQL default: update_when →
    always update on match, delete_when → never delete, insert_when →
    always insert.  Delete is checked before update, matching MERGE's
    first-matching-clause rule when both conditions hold.

    One full-outer join on the key (both sides shuffle-partitioned on
    it, co-locating with any upstream keyed layout); column sets must
    match."""
    cols = existing.columns
    upd = updates.select(*cols)
    e, u = existing.alias("e"), upd.alias("u")
    j = e.join(u, F.col(f"e.{key}").eqNullSafe(F.col(f"u.{key}")),
               "full_outer")
    matched = (F.col(f"e.{key}").isNotNull()
               & F.col(f"u.{key}").isNotNull())
    only_e = F.col(f"u.{key}").isNull()
    upd_c = F.lit(True) if update_when is None else update_when
    del_c = F.lit(False) if delete_when is None else delete_when
    ins_c = F.lit(True) if insert_when is None else insert_when
    keep = F.when(matched & del_c, F.lit(None)) \
            .when(matched & upd_c, F.lit("u")) \
            .when(matched, F.lit("e")) \
            .when(only_e, F.lit("e")) \
            .when(ins_c, F.lit("u"))
    out_cols = [F.when(F.col("__side") == "e", F.col(f"e.{c}"))
                 .otherwise(F.col(f"u.{c}")).alias(c) for c in cols]
    return (j.withColumn("__side", keep)
            .filter(F.col("__side").isNotNull())
            .select(*out_cols))
