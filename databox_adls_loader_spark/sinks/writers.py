"""K1/K2 file writers.

Reference:
  K1: one `basename<N>` filelist per Data Box unit
      (/root/reference/generate-file-list.py:68-72)
  K2: pretty JSON identity-map array for human editing
      (/root/reference/copy-acls.py:103-104, identity-mapper.py:61-62)

Spark-first: K1 is `write.partitionBy("unit")` — each unit directory gets
its paths, written by the executors in parallel (the reference writes
sequentially on one machine).  K2 stays a single small JSON array —
`to_json(collect_list(...))` producing ONE file, because the contract is
"a human edits this".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_unit_filelists(alloc: DataFrame, out_dir: str) -> None:
    """K1: text filelists partitioned by unit (F2 assigned-only filter +
    X3 ordered emission).  At scale each unit's list is written by its own
    task set; `sortWithinPartitions` keeps within-file path order."""
    (
        alloc.filter(F.col("unit") != 0)
        .repartition("unit")
        .sortWithinPartitions("unit", "path")
        .select("unit", F.col("path").alias("value"))
        .write.mode("overwrite").partitionBy("unit").text(out_dir)
    )


def identity_map_json(dim: DataFrame) -> str:
    """K2: the identity-map skeleton as one pretty JSON array string
    (driver-side — the map is tiny by construction)."""
    rows = [
        {"type": r["type"], "source": r["source"], "target": r["target"]}
        for r in dim.orderBy("type", "source").collect()
    ]
    import json
    return json.dumps(rows, indent=2)


def write_identity_map(dim: DataFrame, path: str) -> None:
    """K2 to a single local/DBFS file (atomic-ish: temp + rename)."""
    data = identity_map_json(dim)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(data)
    os.replace(tmp, path)


def write_partitioned(df: DataFrame, out_dir: str,
                      partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet layout (dir per partition value).
    Queries filtering on ``partition_cols`` read only matching directories
    — Catalyst partition pruning, the at-rest analog of the reference's
    --prefix sharding (F3).  Keep partition cardinality moderate (date,
    type — never a high-cardinality id) or the listing dominates."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(out_dir)


def compact_parquet(spark, in_dir: str, out_dir: str,
                    target_mb: int = 128) -> int:
    """Small-file compaction: rewrite a directory into files of
    ~``target_mb`` each (the chronic small-file problem of incremental
    sinks — a 100 TB table of 1 MB files breaks listing and scan
    planning).  Sizes from the source listing, not a data scan.
    Returns the output file count."""
    import math

    # size from the binaryFile source listing (metadata only, content
    # pruned) — works on any Hadoop-supported filesystem, where os.walk
    # would silently report 0 for s3://... URIs and compact to one file
    from pyspark.sql import functions as F
    total = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(in_dir)
        .agg(F.sum("length")).first()[0]) or 0
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return n_files


def backfill_partitions(df: "DataFrame", out_dir: str,
                        partition_cols: list[str]) -> None:
    """Idempotent partition backfill: overwrite ONLY the partitions
    present in ``df``, leaving every other partition untouched
    (``spark.sql.sources.partitionOverwriteMode=dynamic``, scoped to this
    write and restored afterwards).

    This is the nightly-rerun primitive at 100 TB: re-deriving one bad
    day must not truncate the other ~3650 day directories (static
    overwrite mode would).  Pairs with the mergeable-state rollup
    (`ivm_daily_event_rollup`): recompute the delta partitions, then
    dynamic-overwrite exactly those."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_dir)
    finally:
        spark.conf.set(key, prev)
