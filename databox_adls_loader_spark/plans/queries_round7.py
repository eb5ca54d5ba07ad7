"""Round-7 registry extensions: the DSv2 format path over the
versioned table (batch reader with pushed-filter file pruning and
merge-on-read overlays) and JOIN-shaped MV routing, each proven under
the driver's value-hash gate.

Reference parity note: the reference (Azure/databox-adls-loader) has no
analytics surface beyond SURVEY §2 — these extend the beyond-reference
lakehouse layer (driver contract: __spark_entry__.py; correctness gate:
tools/check_correctness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, register


# ---------------------------------------------------------------------------
# spark.read.format("vtable"): the composability path, hash-proven
# ---------------------------------------------------------------------------

@register(
    "scale_vtable_format_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS pruned_ok
    FROM orders WHERE o_orderkey < 1000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "dsv2", "skipping"],
)
def scale_vtable_format_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSv2 BATCH format over the versioned table
    (`sources/vtable_batch`): the same clustered `orders` snapshot
    `scale_versioned_pruned_read` proves through the library API is
    here mounted via ``spark.read.format("vtable")`` and filtered with
    a PLAIN DataFrame predicate — pushFilters must carry the conjunct
    into the manifest pruner (pruned_ok asserts partitions() shrank)
    and the result must hash-match the raw-SQL oracle, proving the
    format path's pruning + Arrow batch delivery are lossless.  This is
    the composability contract: external DataFrame code mounts the
    table without importing the library."""
    from pyspark.sql.datasource import LessThan

    from ..sources.vtable_batch import VTableBatchReader, register_vtable
    from .queries_round5 import _versioned_orders

    t = _versioned_orders(spark, sf_dir)
    register_vtable(spark)
    # observable pruning proof: the pushed conjunct must shrink the
    # reader's partition plan (driver-side manifest work, no data I/O)
    rd_all = VTableBatchReader({"path": t}, None)
    rd = VTableBatchReader({"path": t}, None)
    list(rd.pushFilters([LessThan(("o_orderkey",), 1000)]))
    pruned_ok = len(rd.partitions()) < len(rd_all.partitions())
    df = (spark.read.format("vtable").option("path", t).load()
          .filter(F.col("o_orderkey") < 1000))
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("pruned_ok", F.lit(bool(pruned_ok)))
            .orderBy("o_orderstatus"))


@register(
    "scale_vtable_format_mor_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders WHERE o_orderkey >= 1000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "dsv2", "mor"],
)
def scale_vtable_format_mor_read(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Merge-on-read THROUGH the format: the session's DV table (orders
    with ``o_orderkey < 1000`` deleted merge-on-read, zero data files
    rewritten — same fixture as `scale_dv_delete_read`) is mounted via
    ``spark.read.format("vtable")``; the executor-side numpy run-mask
    must drop exactly the deleted positions, so the aggregate
    hash-matches plain SQL with the rows filtered out."""
    from ..sources.vtable_batch import register_vtable
    from .queries_round6 import _dv_orders

    t, _untouched, _n = _dv_orders(spark, sf_dir)
    register_vtable(spark)
    df = spark.read.format("vtable").option("path", t).load()
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .orderBy("o_orderstatus"))
