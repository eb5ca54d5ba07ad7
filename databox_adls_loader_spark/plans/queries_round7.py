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


# ---------------------------------------------------------------------------
# JOIN-shaped SQL routing: star query onto a denormalized summary MV
# ---------------------------------------------------------------------------

_MV_STAR: dict = {}


def _drop_mv_star(keys=None) -> None:
    import shutil

    for k in list(_MV_STAR) if keys is None else list(keys):
        shutil.rmtree(_MV_STAR.pop(k)[1], ignore_errors=True)


def _mv_star_nation_prices(spark: SparkSession, sf_dir: str):
    """Once per (session, sf_dir): the DENORMALIZED star summary —
    orders ⋈ customer ⋈ nation grouped by (n_name, day) storing
    count(*)/max/min of o_totalprice (all exactly re-aggregable, no
    float accumulation) — committed as a versioned table, with the JOIN
    LINEAGE declared on the spec (joins + dim_sources + qualified
    measure_sources) so `sql_rewrite` can prove a star QUERY coverable."""
    import atexit
    import tempfile

    from . import mv as M

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    hit = _MV_STAR.get(key)
    if hit is None:
        _drop_mv_star([k for k in _MV_STAR if k[0] != app_id])
        if not _MV_STAR:
            atexit.register(_drop_mv_star)
        t = tempfile.mkdtemp(prefix="spark_graft_mv_star_")
        orders, customer, nation = _t(spark, sf_dir,
                                      "orders", "customer", "nation")
        build = (
            orders
            .join(customer.select("c_custkey", "c_nationkey"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name",
                     F.col("o_orderdate").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.max("o_totalprice").alias("max_price"),
                 F.min("o_totalprice").alias("min_price")))
        M.refresh(build, t)
        spec = M.MVSpec(
            name="mv_star_nation_prices", dims=("n_name", "day"),
            dim_types=("string", "date"),
            measures=(("count", "n_orders"), ("max", "max_price"),
                      ("min", "min_price")),
            rows_hint=60_000, table_dir=t,
            base_table="orders",
            measure_sources=("*", "orders.o_totalprice",
                             "orders.o_totalprice"),
            joins=(("customer", "c_custkey", "orders", "o_custkey"),
                   ("customer", "c_nationkey", "nation", "n_nationkey")),
            dim_sources=("nation.n_name", "date:orders.o_orderdate"))
        hit = (spec, t)
        _MV_STAR[key] = hit
    return hit


@register(
    "mv_sql_route_star",
    oracle="""
    SELECT n.n_name,
           CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           MAX(o.o_totalprice) AS max_price,
           MIN(o.o_totalprice) AS min_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name <> 'KENYA'
    GROUP BY 1, 2 ORDER BY n_name, month
    """,
    tags=["mv", "sql", "rewrite", "star", "join"],
)
def mv_sql_route_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-shaped SQL-text MV routing (the Goldstein-Larson join case)
    under the value-hash gate: the query text is a real STAR query —
    FROM orders JOIN customer JOIN nation, grouped by a dim attribute
    and a month rollup of the fact date — and the resolver must prove
    the view stored the SAME join set (normalized ON pairs), resolve
    every qualified column through the declared dim/measure lineage
    (month-of-timestamp answered from the stored CAST-date day dim),
    push the dim predicate through, and re-aggregate the summary —
    the fact⋈dims join is never executed at query time.  The catalog
    also holds a DECOY with a missing join (must be refused on
    structure, not cost); fallback raises, so a route miss fails
    loudly.  The oracle recomputes from the raw tables: a hash match
    proves join-set proof + lineage resolution + rollup all exact."""
    import dataclasses

    from . import mv as M

    spec, _t_dir = _mv_star_nation_prices(spark, sf_dir)
    decoy = dataclasses.replace(
        spec, name="mv_star_missing_join", rows_hint=1,
        joins=(("customer", "c_custkey", "orders", "o_custkey"),))
    q = ("SELECT n.n_name, "
         "date_trunc('month', o.o_orderdate) AS month, "
         "COUNT(*) AS n_orders, MAX(o.o_totalprice) AS max_price, "
         "MIN(o.o_totalprice) AS min_price "
         "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
         "JOIN nation n ON c.c_nationkey = n.n_nationkey "
         "WHERE n.n_name <> 'KENYA' "
         "GROUP BY n.n_name, 2 ORDER BY n_name, month")

    def _no_fallback(_q):
        raise AssertionError("resolver must route, not fall back")

    df, used = M.sql_rewrite(spark, q, [decoy, spec],
                             fallback=_no_fallback)
    assert used == spec.name
    return df
