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

from ..session import spread
from .queries import _t, fixture_timed, register
from .queries_ext import _hex15_to_long as _hex15


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


@fixture_timed("mv_star_r7")
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


# ---------------------------------------------------------------------------
# behavioral analytics: attribution, streaks, co-occurrence, milestones
# ---------------------------------------------------------------------------

@register(
    "sess9_last_touch_attribution",
    oracle="""
    WITH w AS (
      SELECT event_type,
             last_value(CASE WHEN event_type IN ('click','view','signup')
                        THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events)
    SELECT COALESCE(touch, 'direct') AS channel,
           COUNT(*) AS n_conversions
    FROM w WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
    tags=["sessions", "attribution", "window"],
)
def sess9_last_touch_attribution(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Last-touch attribution (operator:
    `operators/sessions.last_touch_attribution`): every purchase
    credits the user's most recent strictly-preceding click/view/signup
    — the marketing-credit rule behind channel ROI dashboards;
    touchless conversions credit 'direct'.  The rows-frame ends at
    1 PRECEDING on BOTH engines, so self-credit is structurally
    impossible and the boundary rows hash identically."""
    from ..operators.sessions import last_touch_attribution

    (events,) = _t(spark, sf_dir, "events")
    return (last_touch_attribution(
        events, "purchase", ["click", "view", "signup"],
        tiebreak_col="event_id")
        .orderBy("channel"))


@register(
    "sess10_activity_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
               FROM events),
    i AS (SELECT user_id,
                 day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY day) AS INT) AS k
          FROM d),
    s AS (SELECT user_id, COUNT(*) AS len FROM i GROUP BY user_id, k),
    m AS (SELECT user_id, MAX(len) AS streak_days FROM s
          GROUP BY user_id)
    SELECT CAST(streak_days AS BIGINT) AS streak_days,
           COUNT(*) AS n_users
    FROM m GROUP BY 1 ORDER BY streak_days
    """,
    tags=["sessions", "streaks", "islands"],
)
def sess10_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, as a
    (streak_days → n_users) distribution (operator:
    `operators/sessions.activity_streaks`) — the classic
    gaps-and-islands detection (island key = day − row_number days),
    pure integer/date arithmetic, per-user windows only."""
    from ..operators.sessions import activity_streaks

    (events,) = _t(spark, sf_dir, "events")
    return (activity_streaks(events)
            .select(F.col("streak_days").cast("long").alias("streak_days"),
                    F.col("n_users").cast("long").alias("n_users"))
            .orderBy("streak_days"))


@register(
    "sess11_event_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t
                FROM events),
    n AS (SELECT t, COUNT(*) AS n FROM ut GROUP BY t),
    b AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_both
          FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
    SELECT ta, tb, CAST(n_both AS BIGINT) AS n_both,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           CAST(n_both * 1000000 // na.n AS BIGINT) AS p_b_given_a_ppm,
           CAST(n_both * 1000000 // nb.n AS BIGINT) AS p_a_given_b_ppm
    FROM b JOIN n na ON b.ta = na.t JOIN n nb ON b.tb = nb.t
    ORDER BY ta, tb
    """,
    tags=["sessions", "cooccurrence", "lift"],
)
def sess11_event_cooccurrence(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Event-type co-occurrence matrix with exact-ppm conditional reach
    (operator: `operators/sessions.event_cooccurrence`) — 'users who
    did X also did Y'.  The self-join runs on the DISTINCT (user, type)
    frame, so per-user fan-out is |types|², never event count."""
    from ..operators.sessions import event_cooccurrence

    (events,) = _t(spark, sf_dir, "events")
    return event_cooccurrence(events).orderBy("ta", "tb")


@register(
    "sess12_milestone_completion",
    oracle="""
    WITH f AS (SELECT user_id AS u, event_type AS t,
                      MIN(epoch_us(ts)) AS fu
               FROM events
               WHERE event_type IN ('signup', 'view', 'purchase')
               GROUP BY 1, 2),
    pm AS (SELECT t AS milestone, COUNT(*) AS n_users,
                  CAST(NULL AS BIGINT) AS p50_span_us
           FROM f GROUP BY t),
    pu AS (SELECT u, COUNT(*) AS k, MAX(fu) - MIN(fu) AS span
           FROM f GROUP BY u),
    al AS (SELECT 'ALL' AS milestone, COUNT(*) AS n_users,
                  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY span)
                       AS BIGINT) AS p50_span_us
           FROM pu WHERE k = 3)
    SELECT milestone, CAST(n_users AS BIGINT) AS n_users, p50_span_us
    FROM (SELECT * FROM pm UNION ALL SELECT * FROM al)
    ORDER BY milestone
    """,
    tags=["sessions", "milestones", "funnel"],
)
def sess12_milestone_completion(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """ANY-ORDER milestone-set completion (operator:
    `operators/sessions.milestone_completion`) — the unordered sibling
    of the step funnels: per milestone its reach, plus the users who
    hit ALL of {signup, view, purchase} and their median first-to-last
    span in exact µs (percentile_disc: a value from the data, no
    interpolation — hash-portable)."""
    from ..operators.sessions import milestone_completion

    (events,) = _t(spark, sf_dir, "events")
    return (milestone_completion(events, ["signup", "view", "purchase"])
            .select("milestone",
                    F.col("n_users").cast("long").alias("n_users"),
                    "p50_span_us")
            .orderBy("milestone"))


# ---------------------------------------------------------------------------
# robust/exact time-series forms: CUSUM changepoint, MAD outliers, TWAP
# ---------------------------------------------------------------------------

@register(
    "ts_cusum_changepoint_fleet",
    oracle="""
    WITH d AS (SELECT o_orderstatus AS st, CAST(o_orderdate AS DATE)
                      AS day, COUNT(*) AS v
               FROM orders GROUP BY 1, 2),
    c AS (SELECT st, day,
                 ABS(SUM(v) OVER (PARTITION BY st ORDER BY day
                                  ROWS UNBOUNDED PRECEDING)
                     * (COUNT(*) OVER (PARTITION BY st))
                     - (ROW_NUMBER() OVER (PARTITION BY st ORDER BY day))
                     * (SUM(v) OVER (PARTITION BY st))) AS a,
                 COUNT(*) OVER (PARTITION BY st) AS nd
          FROM d),
    r AS (SELECT st, day, a, nd,
                 ROW_NUMBER() OVER (PARTITION BY st
                                    ORDER BY a DESC, day DESC) AS rn
          FROM c)
    SELECT st AS o_orderstatus, day AS peak_day,
           CAST(a AS BIGINT) AS peak_abs_cusum,
           CAST(nd AS BIGINT) AS n_days
    FROM r WHERE rn = 1 ORDER BY o_orderstatus
    """,
    tags=["timeseries", "cusum", "changepoint", "fleet"],
)
def ts_cusum_changepoint_fleet(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """CUSUM changepoint candidate per order-status series (operator:
    `operators/timeseries.cusum_peak`): the day where the cumulative
    deviation of daily order counts from the series mean peaks —
    INTEGER-exact by scaling (dev = v·n − total, never a mean
    division), per-key windows only, ties to the latest day on both
    engines."""
    from ..operators.timeseries import cusum_peak

    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy("o_orderstatus",
                            F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    return (cusum_peak(daily, "o_orderstatus", "day", "n")
            .orderBy("o_orderstatus"))


@register(
    "ts_mad_robust_fleet",
    oracle="""
    WITH e AS (SELECT event_type AS t,
                      CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        AS v
               FROM events),
    m AS (SELECT t, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                         AS BIGINT) AS med
          FROM e GROUP BY t),
    d AS (SELECT e.t, ABS(e.v - m.med) AS dev, m.med
          FROM e JOIN m ON e.t = m.t),
    md AS (SELECT t, CAST(percentile_disc(0.5) WITHIN GROUP
                          (ORDER BY dev) AS BIGINT) AS mad
           FROM d GROUP BY t)
    SELECT d.t AS event_type, COUNT(*) AS n, MAX(d.med) AS med,
           MAX(md.mad) AS mad,
           CAST(SUM(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN md ON d.t = md.t GROUP BY 1 ORDER BY 1
    """,
    tags=["timeseries", "mad", "robust", "fleet"],
)
def ts_mad_robust_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust dispersion + Hampel-rule outlier counts per
    event-type series (operator: `operators/timeseries.mad_outliers`)
    — the heavy-tail-proof sibling of the z-score fleet: percentile_disc
    picks VALUES from the data (no interpolation), so integer-scaled
    inputs give integer-exact medians, MADs, and flags on both
    engines."""
    from ..functions.exact import dec
    from ..operators.timeseries import mad_outliers

    (events,) = _t(spark, sf_dir, "events")
    e = events.select("event_type",
                      (dec("value", 4) * 10000).cast("long")
                      .alias("v_scaled"))
    return (mad_outliers(e, "event_type", "v_scaled", k=3)
            .orderBy("event_type"))


@register(
    "ts_twap_daily",
    oracle="""
    WITH e AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
                      epoch_us(ts) AS us, event_id,
                      CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        AS v
               FROM events),
    s AS (SELECT k, day, v, us,
                 LEAD(us) OVER (PARTITION BY k, day
                                ORDER BY us, event_id) AS nxt
          FROM e),
    g AS (SELECT k, day, SUM(v * (nxt - us)) AS vdt,
                 SUM(nxt - us) AS dt
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT k AS event_type, day,
           CAST(vdt // dt AS BIGINT) AS twap_scaled,
           CAST(dt AS BIGINT) AS span_us
    FROM g WHERE dt > 0 ORDER BY event_type, day
    """,
    tags=["timeseries", "twap", "integral"],
)
def ts_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (event_type, day) (operator:
    `operators/timeseries.time_weighted_avg`): each observation holds
    until the next one that day — the step-function integral a plain
    AVG gets wrong under bursty sampling.  All integer µs × scaled-
    value arithmetic with an event_id tiebreak, so segment ownership
    under tied timestamps is deterministic and the DIV is exact."""
    from ..functions.exact import dec
    from ..operators.timeseries import time_weighted_avg

    (events,) = _t(spark, sf_dir, "events")
    return (time_weighted_avg(events, "event_type", "ts",
                              (dec("value", 4) * 10000).cast("long"))
            .orderBy("event_type", "day"))


# ---------------------------------------------------------------------------
# concentration, content checksums, privacy audit
# ---------------------------------------------------------------------------

@register(
    "prof_decile_lift_totalprice",
    oracle="""
    WITH r AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents,
                      ROW_NUMBER() OVER (ORDER BY o_totalprice,
                                         o_orderkey) AS rn,
                      COUNT(*) OVER () AS nt
               FROM orders),
    d AS (SELECT (rn - 1) * 10 // nt + 1 AS decile, cents FROM r),
    t AS (SELECT SUM(cents) AS tot FROM d),
    p AS (SELECT decile, COUNT(*) AS n, SUM(cents) AS sum_cents
          FROM d GROUP BY decile)
    SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
           CAST(sum_cents AS BIGINT) AS sum_cents,
           CAST(sum_cents * 1000000 // tot AS BIGINT) AS share_ppm,
           CAST(SUM(sum_cents) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) * 1000000 // tot AS BIGINT)
             AS cum_share_ppm
    FROM p CROSS JOIN t ORDER BY decile
    """,
    tags=["profile", "decile", "concentration"],
)
def prof_decile_lift_totalprice(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Decile lift over order totals (operator:
    `operators/profile.decile_lift`): per decile the exact cents mass,
    share, and cumulative share in ppm — the bucketed concentration
    report next to the Lorenz curve.  Deciles come from the two-phase
    range-partitioned row_number (no single-partition window), with
    o_orderkey totalizing boundary ties on both engines."""
    from ..operators.profile import decile_lift

    (orders,) = _t(spark, sf_dir, "orders")
    return (decile_lift(orders, "o_totalprice", "o_orderkey")
            .orderBy("decile"))


@register(
    "dq_group_checksum_orders",
    oracle=f"""
    WITH h AS (SELECT o_orderstatus,
      {_hex15(
        "md5(concat_ws(chr(31), "
        "coalesce(CAST(o_orderkey AS VARCHAR), chr(0) || 'null'), "
        "coalesce(o_orderpriority, chr(0) || 'null')))")} AS h
      FROM orders)
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_sig,
           CAST(SUM(h % 1000003) AS BIGINT) AS sum_sig
    FROM h GROUP BY 1 ORDER BY 1
    """,
    tags=["dq", "checksum", "fingerprint"],
)
def dq_group_checksum_orders(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Order-independent per-group content checksum (operator:
    `operators/profile.group_checksum`) — the cross-engine table-diff
    primitive: count + BIT_XOR + mod-prime SUM of a canonical md5 row
    hash per status group.  Two engines (or two replicas of a 100 TB
    table) agree on a group iff all three signatures agree, with no
    sort and no row shipping — this query hash-proves the Spark and
    DuckDB fingerprints are bit-identical."""
    from ..operators.profile import group_checksum

    (orders,) = _t(spark, sf_dir, "orders")
    return (group_checksum(orders, ["o_orderstatus"],
                           ["o_orderkey", "o_orderpriority"])
            .orderBy("o_orderstatus"))


@register(
    "pii_k_anonymity_audit",
    oracle="""
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_n,
           CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS l_distinct,
           COUNT(*) < 5 AS k_violation,
           COUNT(DISTINCT n_chars) < 2 AS l_violation
    FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["pii", "privacy", "k-anonymity"],
)
def pii_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit (operator:
    `operators/pii.k_anonymity_audit`) over the (lang, source)
    quasi-identifier with n_chars as the sensitive attribute: per QI
    group its size, distinct-sensitive count, and the k<5 / l<2
    violation flags — the privacy gate a corpus slice passes before
    publication.  One grouped aggregate, |QI groups| output rows."""
    from ..operators.pii import k_anonymity_audit

    (docs,) = _t(spark, sf_dir, "documents")
    return (k_anonymity_audit(docs, ["lang", "source"], "n_chars",
                              k=5, l=2)
            .orderBy("lang", "source"))


# ---------------------------------------------------------------------------
# skyline, interpolation, packing economics, position attribution
# ---------------------------------------------------------------------------

@register(
    "o6_pareto_frontier_orders",
    oracle="""
    WITH base AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents,
             CAST(o_orderdate AS DATE) AS day
      FROM orders
      WHERE o_orderdate >= '1995-03-01' AND o_orderdate < '1995-04-01'),
    pts AS (SELECT price_cents, day, COUNT(*) AS n_rows
            FROM base GROUP BY 1, 2)
    SELECT p.price_cents, p.day, CAST(p.n_rows AS BIGINT) AS n_rows
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_cents >= p.price_cents AND q.day <= p.day
        AND (q.price_cents > p.price_cents OR q.day < p.day))
    ORDER BY price_cents DESC
    """,
    tags=["skyline", "pareto", "window"],
)
def o6_pareto_frontier_orders(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """SKYLINE query (operator: `operators/profile.pareto_frontier_2d`)
    — the Pareto-optimal orders of March 1995: maximal price, minimal
    date, no other order at least as good on both and better on one.
    The Spark plan is the distributed sweep (distinct points + the
    TWO-PHASE exclusive running min from `operators/windows` — no
    single-partition window, no quadratic dominance join); the oracle
    is the quadratic NOT EXISTS definition, so the hash match proves
    the sweep ≡ the definition."""
    from ..operators.profile import pareto_frontier_2d

    (orders,) = _t(spark, sf_dir, "orders")
    pts = (orders
           .filter((F.col("o_orderdate") >= "1995-03-01")
                   & (F.col("o_orderdate") < "1995-04-01"))
           .select((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                   .cast("long").alias("price_cents"),
                   F.col("o_orderdate").cast("date").alias("day")))
    return (pareto_frontier_2d(pts, "price_cents", "day")
            .orderBy(F.desc("price_cents")))


@register(
    "ts_linear_interpolation",
    oracle="""
    WITH d AS (SELECT o_orderstatus AS k, CAST(o_orderdate AS DATE)
                      AS day,
                      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT)) AS BIGINT) AS v
               FROM orders WHERE o_orderkey % 7 = 0
               GROUP BY 1, 2),
    cal AS (SELECT k, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))
                      ::DATE AS day
            FROM (SELECT k, MIN(day) AS lo, MAX(day) AS hi FROM d
                  GROUP BY k)),
    j AS (SELECT c.k, c.day, d.v FROM cal c
          LEFT JOIN d ON c.k = d.k AND c.day = d.day),
    f AS (SELECT k, day, v,
                 MAX(CASE WHEN v IS NOT NULL THEN
                       struct_pack(day := day, v := v) END)
                   OVER (PARTITION BY k ORDER BY day
                         ROWS UNBOUNDED PRECEDING) AS p,
                 MIN(CASE WHEN v IS NOT NULL THEN
                       struct_pack(day := day, v := v) END)
                   OVER (PARTITION BY k ORDER BY day DESC
                         ROWS UNBOUNDED PRECEDING) AS n
          FROM j)
    SELECT k, day,
           CASE WHEN v IS NOT NULL THEN v
                WHEN p IS NOT NULL AND n IS NOT NULL
                     AND n.day > p.day THEN
                  p.v + CAST(SIGN(n.v - p.v) AS BIGINT)
                      * (ABS(n.v - p.v)
                         * (day - p.day) // (n.day - p.day))
           END AS value,
           v IS NULL AND p IS NOT NULL AND n IS NOT NULL
             AND n.day > p.day AS is_interpolated
    FROM f ORDER BY k, day
    """,
    tags=["timeseries", "interpolation", "gapfill"],
)
def ts_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation per series (operator:
    `operators/timeseries.linear_interpolate`): a sparsified daily
    revenue series (1-in-7 orders) densifies to its calendar and
    interior gaps fill as v0 + sign·(|Δv|·days DIV span) —
    magnitude-DIV-then-sign because Spark DIV truncates while DuckDB //
    floors, and they only agree on non-negative numerators.  Edges stay
    NULL (extrapolation is forward_fill's job)."""
    from ..operators.timeseries import linear_interpolate

    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.filter(F.col("o_orderkey") % 7 == 0)
             .groupBy(F.col("o_orderstatus").alias("k"),
                      F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("long")).cast("long").alias("v")))
    return (linear_interpolate(daily, "k", "day", "v")
            .orderBy("k", "day"))


@register(
    "mix_padding_waste",
    oracle=r"""
    WITH t AS (SELECT len(regexp_split_to_array(trim(text), '\s+'))
                      AS tok
               FROM documents
               WHERE text IS NOT NULL AND trim(text) <> ''),
    e AS (SELECT tok, UNNEST([64, 128, 256, 512]) AS max_len FROM t)
    SELECT CAST(max_len AS BIGINT) AS max_len, COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens,
           CAST(SUM(((tok + max_len - 1) // max_len) * max_len)
                AS BIGINT) AS padded_tokens,
           CAST((SUM(((tok + max_len - 1) // max_len) * max_len)
                 - SUM(tok)) * 1000000
                // SUM(((tok + max_len - 1) // max_len) * max_len)
                AS BIGINT) AS waste_ppm
    FROM e GROUP BY max_len ORDER BY max_len
    """,
    tags=["mixing", "packing", "tokens"],
)
def mix_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste economics (operator:
    `operators/mixing.padding_waste`): for each candidate sequence
    length, the pad-token fraction a chunk-and-pad batcher would burn
    on this corpus — the number that picks max_len (and justifies
    sequence packing) before a training run.  Whitespace token counts,
    ⌈t/L⌉ chunks, all integral."""
    from ..operators.mixing import padding_waste

    (docs,) = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (padding_waste(
        docs.filter(F.col("text").isNotNull()
                    & (F.trim(F.col("text")) != "")), toks)
        .orderBy("max_len"))


@register(
    "sess13_position_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id AS u, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase')
      WHERE rn = 1),
    touches AS (
      SELECT e.user_id AS u, e.event_type AS ch, e.ts, e.event_id
      FROM events e JOIN conv c ON e.user_id = c.u
      WHERE e.event_type IN ('click', 'view', 'signup')
        AND (e.ts < c.ts OR (e.ts = c.ts AND e.event_id < c.event_id))),
    rt AS (SELECT u, ch,
                  ROW_NUMBER() OVER (PARTITION BY u
                                     ORDER BY ts, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY u) AS m
           FROM touches),
    cr AS (SELECT u, ch,
                  CASE WHEN m = 1 THEN 1000000
                       WHEN rn = 1 OR rn = m THEN
                         CASE WHEN m = 2 THEN 500000 ELSE 400000 END
                       ELSE 200000 // (m - 2) END AS credit
           FROM rt)
    SELECT * FROM (
      SELECT ch AS channel, CAST(SUM(credit) AS BIGINT) AS credit_ppm,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users_touched
      FROM cr GROUP BY 1
      UNION ALL
      SELECT 'direct', CAST(COUNT(*) * 1000000 AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM conv WHERE u NOT IN (SELECT u FROM touches)
      HAVING COUNT(*) > 0)
    ORDER BY channel
    """,
    tags=["sessions", "attribution", "position"],
)
def sess13_position_attribution(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution (operator:
    `operators/sessions.position_attribution`): each converting user's
    pre-first-purchase touches split 10⁶ ppm of credit 40/20/40
    (first/middles/last, integer DIV; 1 touch → 100%, 2 → 50/50,
    0 → direct) — the recency-bias corrective next to
    `sess9_last_touch_attribution`.  Struct min/max with the event-id
    tiebreak makes first/last deterministic under tied timestamps on
    both engines."""
    from ..operators.sessions import position_attribution

    (events,) = _t(spark, sf_dir, "events")
    return (position_attribution(
        events, "purchase", ["click", "view", "signup"])
        .orderBy("channel"))


# ---------------------------------------------------------------------------
# conditional MERGE, change-data-feed proof, SCD2 dimension history
# ---------------------------------------------------------------------------

@register(
    "merge_conditional_orders",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_orderpriority
               FROM orders WHERE o_orderkey % 3 = 0),
    s AS (SELECT o_orderkey, o_orderstatus, 'X' AS o_orderpriority
          FROM orders WHERE o_orderkey % 2 = 0)
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM (
      SELECT s.o_orderkey, s.o_orderstatus, s.o_orderpriority
      FROM s JOIN t ON s.o_orderkey = t.o_orderkey
      WHERE NOT t.o_orderstatus = 'F'
      UNION ALL
      SELECT t.o_orderkey, t.o_orderstatus, t.o_orderpriority FROM t
      WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM s)
      UNION ALL
      SELECT s.o_orderkey, s.o_orderstatus, s.o_orderpriority FROM s
      WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM t)
        AND s.o_orderstatus = 'O')
    ORDER BY o_orderkey
    """,
    tags=["merge", "conditional", "sql-surface"],
)
def merge_conditional_orders(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Three-clause conditional MERGE (operator:
    `operators/scale.merge_when`): WHEN MATCHED AND target-status-F →
    DELETE, WHEN MATCHED → UPDATE to the source row, WHEN NOT MATCHED
    AND source-status-O → INSERT.  The oracle spells each clause as a
    set expression, so the hash match proves the single full-outer-join
    plan implements MERGE's first-matching-clause rule exactly
    (delete checked before update)."""
    from ..operators.scale import merge_when

    (orders,) = _t(spark, sf_dir, "orders")
    t = (orders.filter(F.col("o_orderkey") % 3 == 0)
         .select("o_orderkey", "o_orderstatus", "o_orderpriority"))
    s = (orders.filter(F.col("o_orderkey") % 2 == 0)
         .select("o_orderkey", "o_orderstatus",
                 F.lit("X").alias("o_orderpriority")))
    out = merge_when(
        t, s, "o_orderkey",
        delete_when=F.col("e.o_orderstatus") == "F",
        insert_when=F.col("u.o_orderstatus") == "O")
    return out.orderBy("o_orderkey")


_CDF_TABLE: dict = {}


def _drop_cdf_tables(keys=None) -> None:
    import shutil

    for k in list(_CDF_TABLE) if keys is None else list(keys):
        shutil.rmtree(_CDF_TABLE.pop(k), ignore_errors=True)


@fixture_timed("cdf_orders_r7")
def _cdf_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): a 3-version table with a known
    change history — v1 = orders with o_orderkey < 5000; v2 = MERGE
    upserting keys in [2500, 7500) with priority 'X-UPDATED' (updates
    the [2500, 5000) overlap, inserts [5000, 7500)); v3 = merge-on-read
    DELETE of keys < 1000 — so `changes_between(1, 3)` has a
    closed-form oracle over the raw table."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    t = _CDF_TABLE.get(key)
    if t is None:
        _drop_cdf_tables([k for k in _CDF_TABLE if k[0] != key[0]])
        if not _CDF_TABLE:
            atexit.register(_drop_cdf_tables)
        t = tempfile.mkdtemp(prefix="spark_graft_cdf_")
        (orders,) = _t(spark, sf_dir, "orders")
        base = orders.select("o_orderkey", "o_orderstatus",
                             "o_orderpriority")
        V.write_snapshot(base.filter(F.col("o_orderkey") < 5000), t)
        upd = (base.filter((F.col("o_orderkey") >= 2500)
                           & (F.col("o_orderkey") < 7500))
               .withColumn("o_orderpriority", F.lit("X-UPDATED")))
        V.merge_into_snapshot(spark, t, upd, key="o_orderkey")
        V.delete_where(spark, t, "o_orderkey < 1000",
                       predicates=[("o_orderkey", "<", 1000)])
        _CDF_TABLE[key] = t
    return t


@register(
    "scale_cdf_between_versions",
    oracle="""
    SELECT o_orderkey, _change_type FROM (
      SELECT o_orderkey, 'delete' AS _change_type FROM orders
      WHERE o_orderkey < 1000
      UNION ALL
      SELECT o_orderkey, 'update_postimage' FROM orders
      WHERE o_orderkey >= 2500 AND o_orderkey < 5000
      UNION ALL
      SELECT o_orderkey, 'insert' FROM orders
      WHERE o_orderkey >= 5000 AND o_orderkey < 7500)
    ORDER BY o_orderkey
    """,
    tags=["scale", "versioned", "cdf"],
)
def scale_cdf_between_versions(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Change data feed under the value-hash gate: a 3-version table
    with a KNOWN history (append, scoped MERGE, merge-on-read DELETE —
    `_cdf_orders`) diffed by `sinks/versioned.changes_between(1, 3)`;
    the oracle states the closed-form change set from the raw table, so
    a hash match proves insert/delete/update classification — across a
    merge AND a DV delete — row-exact.  Unchanged rows must produce
    nothing."""
    from ..sinks import versioned as V

    t = _cdf_orders(spark, sf_dir)
    ch = V.changes_between(spark, t, 1, 3, key="o_orderkey")
    return ch.select("o_orderkey", "_change_type").orderBy("o_orderkey")


@register(
    "scd2_customer_priority_intervals",
    oracle="""
    WITH u AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS ts,
                      o_orderkey, o_orderpriority
               FROM orders),
    c AS (SELECT *, LAG(o_orderpriority) OVER w AS prev,
                 LAG(ts) OVER w AS prev_ts
          FROM u WINDOW w AS (PARTITION BY o_custkey
                              ORDER BY ts, o_orderkey)),
    k AS (SELECT o_custkey, o_orderpriority, ts, o_orderkey FROM c
          WHERE prev_ts IS NULL OR prev IS DISTINCT FROM o_orderpriority)
    SELECT o_custkey, o_orderpriority, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY o_custkey
                          ORDER BY ts, o_orderkey) AS valid_to
    FROM k ORDER BY o_custkey, valid_from, o_orderkey
    """,
    tags=["scd2", "temporal", "dimension"],
)
def scd2_customer_priority_intervals(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """SCD TYPE-2 dimension history (operator:
    `operators/asof.scd2_intervals`): each customer's order-priority
    update stream collapses into half-open validity intervals, with
    consecutive IDENTICAL values deduped (no-op updates never open a
    version) and valid_to NULL on the current one — the dimension-
    history builder whose output `asof_join` resolves facts against.
    Order-key tiebreak totalizes same-day updates on both engines."""
    from ..operators.asof import scd2_intervals

    (orders,) = _t(spark, sf_dir, "orders")
    upd = orders.select("o_custkey",
                        F.col("o_orderdate").cast("date").alias("ts"),
                        "o_orderkey", "o_orderpriority")
    return (scd2_intervals(upd, "o_custkey", "ts", ["o_orderpriority"],
                           tiebreak_col="o_orderkey")
            .orderBy("o_custkey", "valid_from"))


# ---------------------------------------------------------------------------
# pipeline decision-support: threshold sweep, length-vs-dup cross stats
# ---------------------------------------------------------------------------

@register(
    "dedup_contamination_threshold_sweep",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 11 = 0),
    cnt AS (SELECT s.doc_id, COUNT(*) AS c
            FROM sh s JOIN bench b USING (g)
            WHERE s.doc_id % 11 <> 0 GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks
            WHERE doc_id % 11 <> 0),
    ks AS (SELECT UNNEST([1, 2, 3, 4]) AS min_shared)
    SELECT k.min_shared,
           CAST(COUNT(c.doc_id) AS BIGINT) AS n_flagged,
           CAST(COUNT(c.doc_id) * 1000000 // MAX(t.n) AS BIGINT)
             AS flagged_ppm
    FROM ks k CROSS JOIN tot t
    LEFT JOIN cnt c ON c.c >= k.min_shared
    GROUP BY k.min_shared ORDER BY min_shared
    """,
    tags=["dedup", "contamination", "sweep"],
)
def dedup_contamination_threshold_sweep(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Decontamination threshold SENSITIVITY (operator:
    `operators/dedup.contamination` at min_shared=1, swept in the
    plan): how many non-benchmark docs get flagged at shared-3-gram
    thresholds 1-4, with the flagged fraction in exact ppm — the
    decision table that picks the threshold BEFORE committing to a
    decontamination pass (too low ablates the corpus, too high leaks
    eval data).  One gram join; the sweep is a 4-row explode over the
    per-doc counts."""
    from ..operators.dedup import contamination

    (docs,) = _t(spark, sf_dir, "documents")
    cont = contamination(docs, F.col("doc_id") % 11 == 0, n=3,
                         min_shared=1)
    nb = cont.filter(F.col("doc_id") % 11 != 0)
    # the whole sweep is ONE aggregate: a conditional sum per threshold
    # (no theta join, no BNL) unpivoted to |thresholds| rows
    ks = (1, 2, 3, 4)
    agg = nb.agg(F.count(F.lit(1)).alias("__n"),
                 *[F.sum((F.col("n_shared_grams") >= k).cast("long"))
                   .alias(f"__f{k}") for k in ks])
    rows = F.explode(F.array(*[
        F.struct(F.lit(k).cast("long").alias("min_shared"),
                 F.col(f"__f{k}").alias("f")) for k in ks])).alias("s")
    return (agg.select(rows, "__n")
            .select(F.col("s.min_shared").alias("min_shared"),
                    F.col("s.f").cast("long").alias("n_flagged"),
                    F.expr("CAST(s.f * 1000000L DIV __n AS BIGINT)")
                    .alias("flagged_ppm"))
            .orderBy("min_shared"))


@register(
    "dq_length_vs_dup_rate",
    oracle=r"""
    WITH t AS (SELECT doc_id,
                      len(regexp_split_to_array(trim(text), '\s+'))
                        AS tok,
                      md5(text) AS h
               FROM documents WHERE text IS NOT NULL),
    d AS (SELECT doc_id, LEAST(tok // 16, 6) AS bucket,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) > 1
                   AS is_dup
          FROM t)
    SELECT CAST(bucket AS BIGINT) AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dups,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS dup_ppm
    FROM d GROUP BY 1 ORDER BY len_bucket
    """,
    tags=["dq", "dedup", "cross-stats"],
)
def dq_length_vs_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-stratified duplicate-rate cross statistic: per token-count
    bucket (16-token steps, capped), the exact-duplicate fraction in
    ppm — the 'are short docs likelier to be copies' diagnostic that
    decides whether dedup thresholds should be length-conditional.
    Duplicate = same md5(text) as a lower doc_id (first copy survives,
    the `dedup_exact` keep-first convention); per-hash windows only."""
    from pyspark.sql.window import Window

    (docs,) = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("h").orderBy("doc_id")
    d = (docs.filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.size(F.split(F.trim(F.col("text")), r"\s+"))
                 .alias("tok"),
                 F.md5("text").alias("h"))
         .withColumn("is_dup", F.row_number().over(w) > 1)
         .withColumn("len_bucket",
                     F.least(F.expr("tok DIV 16"), F.lit(6))))
    return (d.groupBy(F.col("len_bucket").cast("long").alias("len_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("is_dup").cast("long")).cast("long")
                 .alias("n_dups"),
                 F.expr("CAST(SUM(CAST(is_dup AS BIGINT)) * 1000000L "
                        "DIV COUNT(1) AS BIGINT)").alias("dup_ppm"))
            .orderBy("len_bucket"))


# ---------------------------------------------------------------------------
# multimodal: metadata-plane tile scheduling
# ---------------------------------------------------------------------------

from .queries_ext import _MM_BASE_CTE, _hexpair  # noqa: E402


@register(
    "mm_tile_grid_plan",
    oracle=f"""
    WITH {_MM_BASE_CTE},
    im AS (SELECT i, 64 + {_hexpair("dh", "0")} % 192 AS w,
                  64 + {_hexpair("dh", "1")} % 192 AS h
           FROM dg WHERE modality = 'image'),
    tx AS (SELECT i, w, h, unnest(range(0, (w + 63) // 64)) AS tx
           FROM im),
    ty AS (SELECT i, w, h, tx, unnest(range(0, (h + 63) // 64)) AS ty
           FROM tx)
    SELECT i AS asset_id, CAST(tx AS BIGINT) AS tile_x,
           CAST(ty AS BIGINT) AS tile_y,
           CAST(tx * 64 AS BIGINT) AS x0,
           CAST(ty * 64 AS BIGINT) AS y0,
           CAST(LEAST(64, w - tx * 64) AS BIGINT) AS tile_w,
           CAST(LEAST(64, h - ty * 64) AS BIGINT) AS tile_h
    FROM ty ORDER BY asset_id, tile_x, tile_y
    """,
    tags=["multimodal", "planning"],
)
def mm_tile_grid_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-tiling fan-out schedule (operator:
    `operators/multimodal.tile_grid_plan`): one row per 64-px tile of
    every image asset with offsets and clipped edge extents — the plan
    a distributed crop/encode stage consumes, computed ENTIRELY on the
    decoded-metadata plane (payload bytes never read; the decode stub's
    dimensions are digest arithmetic the oracle recomputes, proving the
    mapInPandas decode + integer tiling end to end)."""
    from ..operators import multimodal

    assets = multimodal.synthetic_assets(spark, n=64)
    feats = multimodal.extract_features(assets)
    return (multimodal.tile_grid_plan(feats, tile=64)
            .orderBy("asset_id", "tile_x", "tile_y"))


@register(
    "dedup_jaccard_threshold_sweep",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS i
      FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    ), pu AS (
      SELECT i, sa.sz + sb.sz - i AS u
      FROM inter JOIN sizes sa ON a = sa.doc_id
      JOIN sizes sb ON b = sb.doc_id
    ), ks AS (SELECT UNNEST([50, 60, 70, 80, 90]) AS t10)
    SELECT CAST(t10 AS BIGINT) AS threshold_pct,
           CAST(SUM(CASE WHEN i * 100 >= t10 * u THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs
    FROM ks CROSS JOIN pu GROUP BY t10 ORDER BY threshold_pct
    """,
    tags=["dedup", "jaccard", "sweep"],
)
def dedup_jaccard_threshold_sweep(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Near-dup threshold SENSITIVITY: exact word-3-gram Jaccard pair
    counts at thresholds 0.5-0.9, compared INTEGER-exactly
    (inter·100 ≥ t·union — no float boundary anywhere) — the decision
    table that picks the dedup threshold next to
    `dedup_contamination_threshold_sweep`'s.  Candidate pairs come from
    the PPJoin PREFIX FILTER at the sweep's minimum threshold θ=0.5
    (`operators/dedup.jaccard_pair_counts_prefix_filter`), which is
    LOSSLESS for every sweep threshold ≥ 0.5 — the full-postings
    self-join oracle hash-matching is the machine proof.  The round-7
    verdict flagged the previous unfiltered gram self-join (Σ df(g)²
    over the whole gram distribution, a skew bomb at 100×); the prefix
    form pays only Σ df² over PREFIX occurrences, where hot grams
    mostly fall out."""
    from ..operators.dedup import jaccard_pair_counts_prefix_filter

    (docs,) = _t(spark, sf_dir, "documents")
    pu = jaccard_pair_counts_prefix_filter(docs, threshold=0.5)
    ts = (50, 60, 70, 80, 90)
    agg = pu.agg(*[F.sum((F.col("i") * 100 >= t * F.col("u"))
                         .cast("long")).alias(f"__c{t}") for t in ts])
    rows = F.explode(F.array(*[
        F.struct(F.lit(t).cast("long").alias("threshold_pct"),
                 F.coalesce(F.col(f"__c{t}"), F.lit(0)).alias("n"))
        for t in ts])).alias("s")
    return (agg.select(rows)
            .select(F.col("s.threshold_pct").alias("threshold_pct"),
                    F.col("s.n").cast("long").alias("n_pairs"))
            .orderBy("threshold_pct"))


@register(
    "text_langid_confusion",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> lower(x) IN
            ('the','a','of','and','is'))) AS s_en,
        len(list_filter(toks, x -> lower(x) IN
            ('le','la','et','des','une'))) AS s_fr,
        len(list_filter(toks, x -> lower(x) IN
            ('el','los','una','que','por'))) AS s_es,
        len(list_filter(toks, x -> lower(x) IN
            ('der','die','und','ein','nicht'))) AS s_de,
        len(list_filter(toks, x -> lower(x) IN
            ('的','是','了','在','我'))) AS s_zh
      FROM t
    ), pred AS (
      SELECT doc_id, lang,
             CASE WHEN greatest(s_en,s_fr,s_es,s_de,s_zh) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'en'
                  WHEN s_fr = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'fr'
                  WHEN s_es = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'es'
                  WHEN s_de = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'de'
                  ELSE 'zh' END AS lang_pred
      FROM s
    ), m AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pred
             GROUP BY 1, 2),
    tot AS (SELECT lang AS tl, SUM(n) AS tn FROM m GROUP BY lang)
    SELECT m.lang, m.lang_pred, CAST(m.n AS BIGINT) AS n,
           CAST(m.n * 1000000 // t.tn AS BIGINT) AS row_share_ppm
    FROM m JOIN tot t ON m.lang = t.tl
    ORDER BY m.lang, m.lang_pred
    """,
    tags=["text", "evaluation", "confusion"],
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-vs-label CONFUSION MATRIX: the marker-token language
    heuristic (`operators/text.lang_id`) cross-tabulated against the
    corpus's declared `lang` column, with per-true-label row shares in
    exact ppm — the evaluation table any heuristic labeler ships with.
    (The fixture's labels are synthetic, so the matrix shows the
    heuristic's actual behavior, not 100% diagonal — which is exactly
    what makes it a real evaluation artifact.)"""
    from ..operators import text

    (docs,) = _t(spark, sf_dir, "documents")
    m = (docs.select("lang", text.lang_id("text").alias("lang_pred"))
         .groupBy("lang", "lang_pred")
         .agg(F.count(F.lit(1)).alias("n")))
    tot = m.groupBy("lang").agg(F.sum("n").alias("tn"))
    return (m.join(F.broadcast(tot), "lang")
            .select("lang", "lang_pred", F.col("n").cast("long").alias("n"),
                    F.expr("CAST(n * 1000000L DIV tn AS BIGINT)")
                    .alias("row_share_ppm"))
            .orderBy("lang", "lang_pred"))


# ---------------------------------------------------------------------------
# hidden partitioning: transform pruning under the value-hash gate
# ---------------------------------------------------------------------------

_PART_ORDERS: dict = {}


def _drop_part_orders(keys=None) -> None:
    import shutil

    for k in list(_PART_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_PART_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("partitioned_orders_r7")
def _partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): `orders` committed to a versioned
    table HIDDEN-PARTITIONED by ``month(o_orderdate)`` x
    ``bucket(8, o_custkey)`` — the layout-as-contract fixture the
    partition-pruning query below reads.  Same lifecycle discipline as
    `queries_round5._versioned_orders` (atexit cleanup, new session
    evicts prior session's trees)."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    t = _PART_ORDERS.get(key)
    if t is None:
        _drop_part_orders([k for k in _PART_ORDERS if k[0] != app_id])
        if not _PART_ORDERS:
            atexit.register(_drop_part_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_porders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(
            orders, t, mode="overwrite",
            partition_by=["month(o_orderdate)", "bucket(8,o_custkey)"])
        _PART_ORDERS[key] = t
    return t


@register(
    "scale_hidden_partition_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS month_pruned, TRUE AS bucket_pruned
    FROM orders
    WHERE o_orderdate >= DATE '1995-03-01'
      AND o_orderdate <  DATE '1995-06-01'
      AND o_custkey = 371
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "partitioning", "skipping"],
)
def scale_hidden_partition_read(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """HIDDEN PARTITIONING end to end under the value-hash gate
    (`sinks/partitioning`): `orders` lives in a versioned table
    declared ``month(o_orderdate)`` x ``bucket(8, o_custkey)`` — the
    Iceberg transform idea: users query SOURCE columns, the reader
    converts the date range into a month-ordinal range and the
    customer equality into one hash bucket, and prunes whole files by
    the manifest's partition tuples BEFORE Spark lists anything.
    Both prune dimensions are asserted observable (month_pruned /
    bucket_pruned: each predicate alone must shrink the plan) and the
    surviving rows must aggregate to exactly what plain SQL over the
    raw table gives — layout is a contract, not a heuristic.  At
    100 TB this is the difference between "stats usually skip" and
    "a month of data is a month of files"."""
    import datetime

    from ..sinks import versioned as V

    t = _partitioned_orders(spark, sf_dir)
    v = V.latest_version(t)
    date_preds = [("o_orderdate", ">=", datetime.date(1995, 3, 1)),
                  ("o_orderdate", "<", datetime.date(1995, 6, 1))]
    cust_pred = [("o_custkey", "=", 371)]
    total = len(V._read_manifest(t, v))
    month_kept, _ = V.prune_files(t, v, date_preds)
    bucket_kept, _ = V.prune_files(t, v, cust_pred)
    df = V.read_version(spark, t, predicates=date_preds + cust_pred)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("month_pruned",
                        F.lit(len(month_kept) < total))
            .withColumn("bucket_pruned",
                        F.lit(len(bucket_kept) < total))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# MV routing: join-set subsumption (fact-only query onto a star summary)
# ---------------------------------------------------------------------------

@register(
    "mv_sql_route_subsume",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY 1 ORDER BY month
    """,
    tags=["mv", "sql", "rewrite", "subsumption", "join"],
)
def mv_sql_route_subsume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SET SUBSUMPTION routing (the Goldstein-Larson join-subsumed
    case) under the value-hash gate: the query is a plain FACT-ONLY
    rollup — ``FROM orders GROUP BY month`` — while the only stored
    summary is the DENORMALIZED star (orders ⋈ customer ⋈ nation).
    Routing is sound only because both of the view's extra joins are
    declared LOSSLESS (PK-FK: c_custkey/n_nationkey unique, the FKs
    non-null), so every orders row reached the view's input exactly
    once and dropping the joins leaves each month's aggregates
    unchanged.  The catalog also holds the SAME view *without* the
    lossless declaration and a cheaper rows_hint — the resolver must
    refuse it on structure (undeclared extra join), not pick it on
    cost; the oracle recomputes from raw `orders`, so a hash match
    proves the subsumption logic exact.  This is the production MV
    shape: one denormalized summary answering both the star query
    (`mv_sql_route_star`) and its fact-only rollups."""
    import dataclasses

    from . import mv as M

    spec, _t_dir = _mv_star_nation_prices(spark, sf_dir)
    declared = dataclasses.replace(
        spec, name="mv_star_lossless",
        lossless_joins=spec.joins)
    undeclared_decoy = dataclasses.replace(
        spec, name="mv_star_undeclared", rows_hint=1)
    q = ("SELECT date_trunc('month', o_orderdate) AS month, "
         "COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price, "
         "MIN(o_totalprice) AS min_price "
         "FROM orders GROUP BY 1 ORDER BY month")

    def _no_fallback(_q):
        raise AssertionError("resolver must route, not fall back")

    df, used = M.sql_rewrite(spark, q, [undeclared_decoy, declared],
                             fallback=_no_fallback)
    assert used == declared.name
    return df


# ---------------------------------------------------------------------------
# behavioral commerce analytics: market basket, RFM, inter-order gaps
# ---------------------------------------------------------------------------

@register(
    "basket_brand_pairs_lift",
    oracle="""
    WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT COUNT(DISTINCT okey) AS nt FROM ob),
    bt AS (SELECT brand, COUNT(*) AS nb FROM ob GROUP BY brand),
    pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
                  COUNT(*) AS n_pairs
           FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
           GROUP BY 1, 2)
    SELECT pr.brand_a, pr.brand_b, CAST(pr.n_pairs AS BIGINT) AS n_pairs,
           CAST(pr.n_pairs * 1000000 // n.nt AS BIGINT) AS support_ppm,
           CAST(pr.n_pairs * 1000000 // ba.nb AS BIGINT)
             AS conf_a_to_b_ppm,
           CAST(((pr.n_pairs * 1000000 // ba.nb) * n.nt) // bb.nb
                AS BIGINT) AS lift_ppm
    FROM pr CROSS JOIN n
    JOIN bt ba ON pr.brand_a = ba.brand
    JOIN bt bb ON pr.brand_b = bb.brand
    ORDER BY brand_a, brand_b
    """,
    tags=["basket", "association", "lift"],
)
def basket_brand_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over order baskets: support,
    confidence, and lift for every BRAND pair co-purchased in one
    order, in exact ppm.  The pair space is bounded by |brands|² (never
    |orders|²): baskets reduce to DISTINCT (order, brand) first, the
    self-join runs inside each order key, and the output is <= C(25,2)
    rows at any scale — the a-priori first pass shaped for a 100 TB
    fact.  Lift is the documented integer composition
    ((pairs*1e6 DIV n_a) * N) DIV n_b — each intermediate bounded by
    1e6*N, no 128-bit product, identical in both engines."""
    (li, part) = _t(spark, sf_dir, "lineitem", "part")
    ob = (li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                  li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("p_brand").alias("brand"))
          .distinct())
    nt = F.broadcast(ob.agg(
        F.countDistinct("okey").alias("nt")))          # 1-row contract
    bt = F.broadcast(ob.groupBy("brand").agg(
        F.count(F.lit(1)).alias("nb")))                # <= |brands| rows
    a, b = ob.alias("a"), ob.alias("b")
    pr = (a.join(b, (F.col("a.okey") == F.col("b.okey"))
                 & (F.col("a.brand") < F.col("b.brand")))
          .groupBy(F.col("a.brand").alias("brand_a"),
                   F.col("b.brand").alias("brand_b"))
          .agg(F.count(F.lit(1)).alias("n_pairs")))
    return (pr.crossJoin(nt)
            .join(bt.withColumnRenamed("brand", "brand_a")
                    .withColumnRenamed("nb", "nb_a"), "brand_a")
            .join(bt.withColumnRenamed("brand", "brand_b")
                    .withColumnRenamed("nb", "nb_b"), "brand_b")
            .select(
                "brand_a", "brand_b",
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.expr("CAST(n_pairs * 1000000L DIV nt AS BIGINT)")
                .alias("support_ppm"),
                F.expr("CAST(n_pairs * 1000000L DIV nb_a AS BIGINT)")
                .alias("conf_a_to_b_ppm"),
                F.expr("CAST(((n_pairs * 1000000L DIV nb_a) * nt) "
                       "DIV nb_b AS BIGINT)").alias("lift_ppm"))
            .orderBy("brand_a", "brand_b"))


@register(
    "rfm_segment_grid",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_d,
             COUNT(*) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    mx AS (SELECT MAX(last_d) AS maxd FROM base),
    r AS (
      SELECT o_custkey, freq, cents,
             date_diff('day', last_d, mx.maxd) AS r_days,
             COUNT(*) OVER () AS nt
      FROM base CROSS JOIN mx),
    q AS (
      SELECT cents,
             (ROW_NUMBER() OVER (ORDER BY r_days, o_custkey) - 1) * 5
               // nt + 1 AS r_q,
             (ROW_NUMBER() OVER (ORDER BY freq DESC, o_custkey) - 1) * 5
               // nt + 1 AS f_q,
             (ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) - 1) * 5
               // nt + 1 AS m_q
      FROM r)
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           COUNT(*) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS tot_cents
    FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=["rfm", "segmentation", "window"],
)
def rfm_segment_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation grid: every customer scored into quintiles of
    Recency (days since last order; 1 = most recent), Frequency
    (orders; 1 = most), and Monetary (exact cents; 1 = highest), then
    the <= 125 (r,f,m) cells aggregated — the classic CRM cohort cube.
    Quintiles are row_number-based ((rn-1)*5 DIV n + 1, custkey
    tiebreak).  The three global orderings share ONE range shuffle:
    each customer row replicates under a dim tag (0=recency, 1=freq,
    2=monetary) with its DESC orders negated into a single ascending
    long key, the tagged union range-partitions on (dim, key, custkey)
    once, and all three row_numbers fall out of one ≤|partitions|·3-row
    stats collect (per-(partition, dim) counts + first local index) —
    one sampling pass, one sort, one offsets job where the previous
    shape paid three two-phase `global_row_number` passes (~3× the
    per-job floor on a frame that is ∝ |customers|, never |orders|).
    NO single-partition window anywhere; the recency anchor is a 1-row
    broadcast contract frame."""
    (orders,) = _t(spark, sf_dir, "orders")
    base = (orders.groupBy("o_custkey")
            .agg(F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
                 F.count(F.lit(1)).alias("freq"),
                 F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                       .cast("long")).cast("long").alias("cents")))
    mx = F.broadcast(base.agg(F.max("last_d").alias("maxd")))
    base = (base.crossJoin(mx)
            .withColumn("r_days", F.datediff("maxd", "last_d")))
    # (dim, key) replicas: key = the dim's order value, negated where
    # the original order is DESC — long negation is exact, so ORDER BY
    # key ASC, custkey ASC is the identical total order per dim.
    rep = base.select(
        F.col("o_custkey").alias("ck"), "cents",
        F.explode(F.array(
            F.struct(F.lit(0).alias("dim"),
                     F.col("r_days").cast("long").alias("key")),
            F.struct(F.lit(1).alias("dim"),
                     (-F.col("freq")).cast("long").alias("key")),
            F.struct(F.lit(2).alias("dim"),
                     (-F.col("cents")).cast("long").alias("key"))))
        .alias("e")).select("ck", "cents", "e.dim", "e.key")
    np_ = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # persist pins the pid assignment (repartitionByRange samples new
    # boundaries per job) and the sorted order the local index reads
    ranged = (rep.repartitionByRange(np_, "dim", "key", "ck")
              .sortWithinPartitions("dim", "key", "ck")
              .withColumn("__mid", F.monotonically_increasing_id())
              .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
              .withColumn("__lrn",
                          F.col("__mid").bitwiseAND((1 << 33) - 1) + 1)
              .persist())
    stats = (ranged.groupBy("__pid", "dim")
             .agg(F.count(F.lit(1)).alias("__c"),
                  F.min("__lrn").alias("__lo")).collect())
    off: dict[int, int] = {0: 0, 1: 0, 2: 0}
    rows = []
    for r in sorted(stats, key=lambda r: (r["dim"], r["__pid"])):
        rows.append((r["__pid"], r["dim"], off[r["dim"]], r["__lo"]))
        off[r["dim"]] += r["__c"]
    nt = off[0]
    off_df = F.broadcast(spark.createDataFrame(
        rows, "__pid int, dim int, __off long, __lo long"))
    # rn = rows of this dim in earlier partitions + local position
    # among this partition's same-dim run (contiguous in sort order)
    q = (ranged.join(off_df, ["__pid", "dim"])
         .withColumn("rn", F.col("__off") + (F.col("__lrn")
                                             - F.col("__lo")) + 1)
         .withColumn(
             "q", F.expr(f"CAST((rn - 1) * 5 DIV {nt} + 1 AS BIGINT)"))
         .groupBy("ck")
         .agg(F.max(F.when(F.col("dim") == 0, F.col("q"))).alias("r_q"),
              F.max(F.when(F.col("dim") == 1, F.col("q"))).alias("f_q"),
              F.max(F.when(F.col("dim") == 2, F.col("q"))).alias("m_q"),
              F.max("cents").alias("cents")))
    return (q.groupBy("r_q", "f_q", "m_q")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("cents").cast("long").alias("tot_cents"))
            .orderBy("r_q", "f_q", "m_q"))


@register(
    "cust_order_gap_by_segment",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders),
    gg AS (SELECT o_custkey, gap_days FROM g WHERE gap_days IS NOT NULL)
    SELECT c.c_mktsegment, COUNT(*) AS n_gaps,
           CAST(SUM(gg.gap_days) * 1000000 // COUNT(*) AS BIGINT)
             AS avg_gap_ppm,
           CAST(percentile_disc(0.5)
                WITHIN GROUP (ORDER BY gg.gap_days) AS BIGINT)
             AS p50_gap_days
    FROM gg JOIN customer c ON gg.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=["sessions", "gaps", "window", "fleet"],
)
def cust_order_gap_by_segment(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Inter-order gap distribution by market segment: per-customer
    consecutive-order day gaps (a PER-KEY partitioned lag — the fleet
    window shape, parallel across customers), rolled up per segment as
    exact-ppm mean and discrete median.  The repurchase-cadence report
    behind churn models; percentile_disc keeps the median an actual
    observed gap on both engines."""
    from pyspark.sql import Window

    (orders, customer) = _t(spark, sf_dir, "orders", "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    g = (orders
         .withColumn("gap_days",
                     F.datediff(F.col("o_orderdate").cast("date"),
                                F.lag(F.col("o_orderdate").cast("date"))
                                .over(w)))
         .filter(F.col("gap_days").isNotNull())
         .select("o_custkey", "gap_days"))
    return (g.join(customer.select("c_custkey", "c_mktsegment"),
                   g.o_custkey == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 F.expr("CAST(SUM(gap_days) * 1000000L DIV COUNT(*) "
                        "AS BIGINT)").alias("avg_gap_ppm"),
                 F.expr("CAST(percentile_disc(0.5) WITHIN GROUP "
                        "(ORDER BY gap_days) AS BIGINT)")
                 .alias("p50_gap_days"))
            .orderBy("c_mktsegment"))


@register(
    "cohort_ltv_triangle",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             MIN((EXTRACT(year FROM o_orderdate) - 1970) * 12
                 + EXTRACT(month FROM o_orderdate) - 1) AS m0
      FROM orders GROUP BY o_custkey),
    x AS (
      SELECT f.m0 AS cohort_m,
             (EXTRACT(year FROM o.o_orderdate) - 1970) * 12
               + EXTRACT(month FROM o.o_orderdate) - 1 - f.m0
               AS months_since,
             o.o_custkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey)
    SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
           CAST(months_since AS BIGINT) AS months_since,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM x GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["cohort", "ltv", "retention"],
)
def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers bucketed by FIRST-order month
    (epoch-month ordinal — integer arithmetic, no calendar floats),
    then active-customer counts and exact revenue cents per
    (cohort, months-since-acquisition) cell — the acquisition-payback
    matrix growth teams read top-right to bottom-left.  One
    per-customer min, one co-keyed join on o_custkey (both shuffles
    ∝ |orders| with map-side partial aggregation), output bounded by
    |months|²/2 cells regardless of data size."""
    (orders,) = _t(spark, sf_dir, "orders")
    mo = ((F.year("o_orderdate") - F.lit(1970)) * 12
          + F.month("o_orderdate") - 1)
    f = (orders.groupBy("o_custkey").agg(F.min(mo).alias("m0"))
         .withColumnRenamed("o_custkey", "fk"))
    x = (orders.join(f, orders.o_custkey == f.fk)
         .select(F.col("m0").cast("long").alias("cohort_m"),
                 (mo - F.col("m0")).cast("long").alias("months_since"),
                 "o_custkey",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("cents")))
    return (x.groupBy("cohort_m", "months_since")
            .agg(F.countDistinct("o_custkey").cast("long")
                 .alias("n_active"),
                 F.sum("cents").cast("long").alias("cents"))
            .orderBy("cohort_m", "months_since"))


# ---------------------------------------------------------------------------
# type widening: mixed-physical-width read under the value-hash gate
# ---------------------------------------------------------------------------

_WIDENED_ORDERS: dict = {}


def _drop_widened_orders(keys=None) -> None:
    import shutil

    for k in list(_WIDENED_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_WIDENED_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("widened_orders_r7")
def _widened_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): a versioned `orders` whose
    o_orderkey began INT, was widened to BIGINT metadata-only, and then
    received a BIGINT append — the two file eras carry different
    physical widths on disk."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    t = _WIDENED_ORDERS.get(key)
    if t is None:
        _drop_widened_orders([k for k in _WIDENED_ORDERS if k[0] != app_id])
        if not _WIDENED_ORDERS:
            atexit.register(_drop_widened_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_worders_")
        (orders,) = _t(spark, sf_dir, "orders")
        narrow = (orders.filter(F.col("o_orderkey") % 2 == 0)
                  .withColumn("o_orderkey",
                              F.col("o_orderkey").cast("int")))
        V.write_snapshot(narrow, t, mode="overwrite")
        V.widen_column(t, "o_orderkey", "bigint")
        V.write_snapshot(orders.filter(F.col("o_orderkey") % 2 == 1), t)
        _WIDENED_ORDERS[key] = t
    return t


@register(
    "scale_type_widened_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(MAX(o_orderkey) AS BIGINT) AS key_max
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "widening", "evolution"],
)
def scale_type_widened_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TYPE WIDENING end to end under the value-hash gate
    (`sinks/versioned.widen_column` — the Iceberg-V3/Delta shape):
    half of `orders` was committed with an INT32 o_orderkey, the
    column was widened to BIGINT metadata-only (zero files rewritten),
    and the other half appended as INT64 — the snapshot's files
    physically disagree on width, the manifest's declared schema
    settles it, and the scan up-casts the narrow era natively.  The
    oracle recomputes from the raw table, so a hash match proves the
    mixed-width read loses and corrupts nothing.  At 100 TB this is
    how an id column outgrows int32 without a table rewrite."""
    from ..sinks import versioned as V

    t = _widened_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("key_sum"),
                 F.max("o_orderkey").cast("long").alias("key_max"))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# Branches + tags: write-audit-publish, hash-proven
# ---------------------------------------------------------------------------

_WAP_ORDERS: dict = {}


def _drop_wap_orders(keys=None) -> None:
    import shutil

    for k in list(_WAP_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_WAP_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("wap_orders_r7")
def _wap_orders(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Once per (session, sf_dir): the full write-audit-publish cycle.
    Main gets `orders` minus every 7th key; a branch stages exactly
    those missing rows; main is probed DURING the audit (isolation);
    the branch is published by fast-forward and dropped.  Returns
    (table_dir, isolated) where ``isolated`` records that main's row
    count did not move while the branch held staged data."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    hit = _WAP_ORDERS.get(key)
    if hit is None:
        _drop_wap_orders([k for k in _WAP_ORDERS if k[0] != app_id])
        if not _WAP_ORDERS:
            atexit.register(_drop_wap_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_wap_")
        (orders,) = _t(spark, sf_dir, "orders")
        base = orders.filter(F.col("o_orderkey") % 7 != 0)
        staged = orders.filter(F.col("o_orderkey") % 7 == 0)
        V.write_snapshot(base, t, mode="overwrite")
        n_main_before = V.read_version(spark, t).count()
        bdir = V.create_branch(t, "audit")
        V.write_snapshot(staged, bdir)
        # isolation probe: the staged write must be invisible on main
        isolated = V.read_version(spark, t).count() == n_main_before
        V.create_tag(t, "pre-publish")
        V.fast_forward(t, "audit")
        # parent-aware drop: published files must survive
        V.drop_branch(t, "audit")
        _WAP_ORDERS[key] = hit = (t, isolated)
    return hit


@register(
    "scale_branch_wap_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS isolated,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 <> 0)
               AS n_tagged
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "branch", "wap"],
)
def scale_branch_wap_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH end to end under the value-hash gate
    (`sinks/versioned` refs section — the Iceberg branch/tag model):
    main holds `orders` minus every 7th key, a zero-copy branch stages
    exactly the missing rows, main is probed mid-audit (``isolated``
    asserts the staged write never leaked), a ``pre-publish`` TAG pins
    the unpublished snapshot, and `fast_forward` publishes the audited
    head as one manifest write.  The post-publish aggregate must
    hash-match plain SQL over the COMPLETE raw table (publish lost and
    duplicated nothing), and ``n_tagged`` re-reads main through the tag
    ref — still the pre-publish row count after the branch is dropped.
    At 100 TB this is the staging discipline: risky batches land on a
    fork, get audited, and become visible in one atomic pointer move."""
    from ..sinks import versioned as V

    t, isolated = _wap_orders(spark, sf_dir)
    n_tagged = V.read_version(spark, t, ref="pre-publish").count()
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("isolated", F.lit(bool(isolated)))
            .withColumn("n_tagged", F.lit(int(n_tagged)))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# Partition-spec evolution: dual-era pruning, hash-proven
# ---------------------------------------------------------------------------

_EVOLVED_ORDERS: dict = {}


def _drop_evolved_orders(keys=None) -> None:
    import shutil

    for k in list(_EVOLVED_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_EVOLVED_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("evolved_orders_r7")
def _evolved_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): `orders` written in TWO partition
    eras — keys below the median under ``month(o_orderdate)``, then a
    metadata-only `set_partition_spec` to ``bucket(8, o_custkey)`` and
    the remaining keys appended under the new layout.  No file is
    rewritten; the manifest's spec registry + per-file spec ids carry
    both eras."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    t = _EVOLVED_ORDERS.get(key)
    if t is None:
        _drop_evolved_orders([k for k in _EVOLVED_ORDERS if k[0] != app_id])
        if not _EVOLVED_ORDERS:
            atexit.register(_drop_evolved_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_evorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        cut = orders.approxQuantile("o_orderkey", [0.5], 0.0)[0]
        V.write_snapshot(orders.filter(F.col("o_orderkey") <= cut), t,
                         mode="overwrite",
                         partition_by=["month(o_orderdate)"])
        V.set_partition_spec(t, ["bucket(8,o_custkey)"])
        V.write_snapshot(orders.filter(F.col("o_orderkey") > cut), t)
        _EVOLVED_ORDERS[key] = t
    return t


@register(
    "scale_spec_evolution_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS month_pruned, TRUE AS bucket_pruned
    FROM orders
    WHERE o_orderdate >= DATE '1995-03-01'
      AND o_orderdate <  DATE '1995-06-01'
      AND o_custkey = 371
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "partitioning", "evolution"],
)
def scale_spec_evolution_read(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """PARTITION-SPEC EVOLUTION under the value-hash gate
    (`sinks/versioned.set_partition_spec` — the Iceberg per-file-spec
    model): half of `orders` lives under ``month(o_orderdate)``, the
    layout was then switched metadata-only to ``bucket(8, o_custkey)``
    and the other half appended — zero files rewritten, two eras in
    one snapshot.  The date predicate must prune ERA-1 files under the
    month transform and the customer equality must prune ERA-2 files
    under the bucket transform (each asserted observable against that
    era's file count), and the combined read must hash-match plain SQL
    over the raw table — evolution changed layout, never answers.  At
    100 TB this is how a table re-layouts as its workload shifts
    without a petabyte rewrite."""
    import datetime

    from ..sinks import versioned as V

    t = _evolved_orders(spark, sf_dir)
    v = V.latest_version(t)
    specs = V.table_partition_specs(t, v)
    ids = V.table_partition_spec_ids(t, v)
    month_id = next(k for k, sp in specs.items()
                    if sp == ["month(o_orderdate)"])
    bucket_id = next(k for k, sp in specs.items()
                     if sp == ["bucket(8,o_custkey)"])
    era1 = {f for f, i in ids.items() if i == month_id}
    era2 = {f for f, i in ids.items() if i == bucket_id}
    date_preds = [("o_orderdate", ">=", datetime.date(1995, 3, 1)),
                  ("o_orderdate", "<", datetime.date(1995, 6, 1))]
    cust_pred = [("o_custkey", "=", 371)]
    month_kept, _ = V.prune_files(t, v, date_preds)
    bucket_kept, _ = V.prune_files(t, v, cust_pred)
    # each era prunes under ITS OWN spec: the month predicate shrinks
    # era-1, the bucket equality shrinks era-2
    month_pruned = len(set(month_kept) & era1) < len(era1)
    bucket_pruned = len(set(bucket_kept) & era2) < len(era2)
    df = V.read_version(spark, t, predicates=date_preds + cust_pred)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("month_pruned", F.lit(bool(month_pruned)))
            .withColumn("bucket_pruned", F.lit(bool(bucket_pruned)))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# equality deletes + merge-on-read UPDATE: row mutation under the hash gate
# ---------------------------------------------------------------------------

_EQ_ORDERS: dict = {}


def _drop_eq_orders(keys=None) -> None:
    import shutil

    for k in list(_EQ_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_EQ_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("eq_orders_r7")
def _eq_orders(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Once per (session, sf_dir): snapshot `orders` into a versioned
    table, compact clustered by o_orderkey, EQUALITY-delete every key
    < 100 (`delete_where_keys` — one key file, NO data scan, NO file
    rewritten), then APPEND one row re-using deleted key 0 — the
    sequence-semantics proof: the equality delete must kill key 0 in
    the old files while the re-insert stays alive.  Returns
    (table_dir, mor_ok) where mor_ok asserts the delete commit was
    metadata-only AND stats pruning scoped `applies_to` below the full
    manifest."""
    import atexit
    import datetime
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _EQ_ORDERS.get(key)
    if got is None:
        _drop_eq_orders([k for k in _EQ_ORDERS if k[0] != key[0]])
        if not _EQ_ORDERS:
            atexit.register(_drop_eq_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_eqorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        v0 = V.compact_snapshot(spark, t, n_files=8,
                                cluster_by=["o_orderkey"])
        files_before = V._read_manifest(t, v0)
        v1, n_keys = V.delete_where_keys(
            spark, t, "o_orderkey", list(range(100)))
        entry = V.table_eq_deletes(t, v1)[0]
        mor_ok = (V._read_manifest(t, v1) == files_before
                  and n_keys == 100
                  and len(entry["applies_to"]) < len(files_before))
        V.write_snapshot(
            spark.createDataFrame(
                [(0, 1, "Z", 1.0,
                  datetime.datetime(1999, 1, 1), "0-NONE")],
                orders.schema),
            t)
        got = (t, mor_ok)
        _EQ_ORDERS[key] = got
    return got


@register(
    "scale_eq_delete_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS mor_ok
    FROM (
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders
                               WHERE o_orderkey < 100)
      UNION ALL SELECT 'Z', 1.0
    )
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "equality-deletes"],
)
def scale_eq_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUALITY deletes under the value-hash gate (`sinks/versioned.
    delete_where_keys` — the Iceberg v2 eq-delete shape): keys < 100
    are deleted at O(|keys|) commit cost with no data scan and no file
    rewritten (mor_ok), a later append RE-INSERTS key 0 and must
    survive (sequence semantics: the delete applies only to files
    present when it committed), and the merge-on-read read — a
    broadcast anti join against the key file, scoped by stats-pruned
    ``applies_to`` — must hash-match plain SQL computing the same
    delete + re-insert.  At 100 TB this is the CDC-tombstone path: a
    key-delete batch lands as metadata, readers pay one small anti
    join, and compaction materializes it asynchronously."""
    from ..sinks import versioned as V

    t, mor_ok = _eq_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("mor_ok", F.lit(bool(mor_ok)))
            .orderBy("o_orderstatus"))


_UPD_ORDERS: dict = {}


def _drop_upd_orders(keys=None) -> None:
    import shutil

    for k in list(_UPD_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_UPD_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("upd_orders_r7")
def _upd_orders(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Once per (session, sf_dir): versioned `orders`, compacted
    clustered by key, then a merge-on-read UPDATE — rows with
    o_orderkey < 500 get status 'U' and a 10.00 price bump, committed
    as run-length position deletes + an appended update file in ONE
    version (`update_where`).  mor_ok asserts every pre-update data
    file still rides in the new manifest (nothing rewritten) and the
    reported n_updated equals the matched-key count."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _UPD_ORDERS.get(key)
    if got is None:
        _drop_upd_orders([k for k in _UPD_ORDERS if k[0] != key[0]])
        if not _UPD_ORDERS:
            atexit.register(_drop_upd_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_updorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        n_match = orders.filter(F.col("o_orderkey") < 500).count()
        V.write_snapshot(orders, t)
        v0 = V.compact_snapshot(spark, t, n_files=8,
                                cluster_by=["o_orderkey"])
        files_before = V._read_manifest(t, v0)
        v1, n_upd = V.update_where(
            spark, t, "o_orderkey < 500",
            {"o_orderstatus": "'U'",
             "o_totalprice": "o_totalprice + 10.0"},
            predicates=[("o_orderkey", "<", 500)])
        mor_ok = (set(files_before) <= set(V._read_manifest(t, v1))
                  and n_upd == n_match)
        got = (t, mor_ok)
        _UPD_ORDERS[key] = got
    return got


@register(
    "scale_update_mor_read",
    oracle="""
    SELECT CASE WHEN o_orderkey < 500 THEN 'U'
                ELSE o_orderstatus END AS o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN o_orderkey < 500
                              THEN o_totalprice + 10.0
                              ELSE o_totalprice END
                         AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS mor_ok
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "mor-update"],
)
def scale_update_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE under the value-hash gate (`sinks/
    versioned.update_where`): the read of the updated snapshot — old
    files minus position-deleted rows, plus the appended update images
    — must hash-match plain SQL's CASE-WHEN rendering of ``UPDATE
    orders SET o_orderstatus='U', o_totalprice=o_totalprice+10 WHERE
    o_orderkey < 500``.  mor_ok asserts the MOR contract: no pre-update
    file was rewritten (the delete is run-length positions, the update
    a scoped append) and n_updated is exact.  At 100 TB an UPDATE
    touching 500 keys costs O(matched rows), not a table rewrite."""
    from ..sinks import versioned as V

    t, mor_ok = _upd_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("mor_ok", F.lit(bool(mor_ok)))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# analytics batch 3: multidimensional aggregation, retention, drawdown,
# JSON extraction, corpus novelty, winback, seasonality
# ---------------------------------------------------------------------------

@register(
    "agg_cube_returns_qty",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
    tags=["agg", "cube", "multidim"],
)
def agg_cube_returns_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping
    combinations in ONE pass — Spark's `DataFrame.cube` plans a single
    shuffle with map-side partial aggregation expanding the grouping
    sets, vs four separate scans.  Labels coalesce to 'ALL' (the
    columns are non-null in this schema, so the sentinel is
    unambiguous).  Scale: the expansion multiplies rows by ≤4 BEFORE
    partial aggregation collapses them — no extra scan, one exchange.
    Reference boundary: the reference's summing is single-level
    (processDirectoryIntoUnits); multidimensional rollup is
    beyond-reference surface."""
    (li,) = _t(spark, sf_dir, "lineitem")
    # single-row-group scan: the per-row work above it (join probes /
    # decimal agg / grouping-set Expand) would run one-task; spread is a
    # no-op once a scan splits (guide §2.5)
    li = spread(li)
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    "n", "sum_qty")
            .orderBy("rf", "ls"))


@register(
    "sess14_weekly_retention_triangle",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(week) AS cweek FROM wk GROUP BY user_id
    ), sizes AS (
      SELECT cweek, COUNT(*) AS cohort_n FROM cohort GROUP BY cweek
    ), hits AS (
      SELECT c.cweek, date_diff('day', c.cweek, w.week) // 7 AS offset_w,
             COUNT(DISTINCT w.user_id) AS active_n
      FROM cohort c JOIN wk w USING (user_id)
      GROUP BY 1, 2
    )
    SELECT CAST(h.cweek AS VARCHAR) AS cohort_week,
           h.offset_w, s.cohort_n, h.active_n,
           h.active_n * 1000000 // s.cohort_n AS retained_ppm
    FROM hits h JOIN sizes s ON h.cweek = s.cweek
    WHERE h.offset_w <= 4
    ORDER BY cohort_week, offset_w
    """,
    tags=["sessions", "retention", "cohort"],
)
def sess14_weekly_retention_triangle(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by FIRST-active
    week, then per week-offset the ppm share still active.  Shape: one
    distinct over (user, week) — the raw event stream collapses before
    any join — then a cohort self-join that is |users×weeks|, never
    |events|.  Exact integer ppm keeps the oracle transcendental-free.
    At 100 TB the distinct is the only event-sized shuffle; everything
    after is user-sized."""
    (ev,) = _t(spark, sf_dir, "events")
    wk = (ev.select("user_id",
                    F.date_trunc("week", "ts").cast("date").alias("week"))
          .distinct())
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cweek"))
    sizes = cohort.groupBy("cweek").agg(F.count(F.lit(1)).alias("cohort_n"))
    hits = (wk.join(cohort, "user_id")
            .select("cweek",
                    (F.datediff("week", "cweek") / 7)
                    .cast("long").alias("offset_w"), "user_id")
            .groupBy("cweek", "offset_w")
            .agg(F.countDistinct("user_id").alias("active_n")))
    return (hits.join(sizes, "cweek")
            .filter(F.col("offset_w") <= 4)
            .select(F.col("cweek").cast("string").alias("cohort_week"),
                    "offset_w", "cohort_n", "active_n",
                    (F.col("active_n") * 1000000 / F.col("cohort_n"))
                    .cast("long").alias("retained_ppm"))
            .orderBy("cohort_week", "offset_w"))


@register(
    "ts_max_drawdown_fleet",
    oracle="""
    WITH flows AS (
      SELECT event_type, ts, event_id,
             CAST(value AS DECIMAL(18,2)) - 100.00 AS flow
      FROM events
    ), cums AS (
      SELECT event_type, ts, event_id,
             SUM(flow) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
      FROM flows
    ), runs AS (
      SELECT event_type, cum,
             MAX(cum) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak
      FROM cums
    )
    SELECT event_type,
           CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown,
           COUNT(*) AS n
    FROM runs GROUP BY event_type ORDER BY event_type
    """,
    tags=["timeseries", "fleet", "drawdown"],
)
def ts_max_drawdown_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series (finance/SRE burn-down form): over
    the centered cumulative flow, the largest peak-to-current drop.
    Two stacked running windows (cumsum, then running max of the
    cumsum) — both PARTITIONED BY the series key, so the fleet form
    scales horizontally across keys with no single-partition funnel
    (the per-key ordering is the standard bounded assumption: one
    series' history fits a partition; cross-key parallelism is the
    scale axis).  DECIMAL flows keep the prefix sums exact, so the
    hash gate holds."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    flows = ev.select(
        "event_type", "ts", "event_id",
        (F.col("value").cast("decimal(18,2)") - F.lit(100.00)
         .cast("decimal(18,2)")).alias("flow"))
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    runs = (flows.withColumn("cum", F.sum("flow").over(w))
            .withColumn("peak", F.max(F.col("cum")).over(w)))
    return (runs.groupBy("event_type")
            .agg(F.max(F.col("peak") - F.col("cum")).cast("double")
                 .alias("max_drawdown"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("event_type"))


@register(
    "agg_grouping_sets_orders",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
           COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)), ())
    ORDER BY prio, yr
    """,
    tags=["agg", "grouping-sets", "multidim"],
)
def agg_grouping_sets_orders(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """GROUPING SETS with DISJOINT dimensions — the by-priority report,
    the by-year report, and the grand total from ONE scan (unlike
    `agg_cube_returns_qty`'s full cross product): Spark expands the
    sets map-side and aggregates in a single exchange, which at 100 TB
    replaces three separate jobs over the same fact scan.  Sentinel
    labels ('ALL' / -1) disambiguate the null-extended grouping rows
    (the source columns are non-null)."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
               COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS rev
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)),
                                ())
        ORDER BY prio, yr
    """)


@register(
    "text_ngram_first_seen_curve",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), first_seen AS (
      SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g
    )
    SELECT first_doc // 50 AS doc_bucket,
           COUNT(*) AS new_grams
    FROM first_seen GROUP BY 1 ORDER BY 1
    """,
    tags=["text", "corpus", "novelty"],
)
def text_ngram_first_seen_curve(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Corpus novelty (Heaps-law) curve: for every distinct word
    3-gram, the doc-id bucket where it FIRST appears — new-vocabulary
    mass per bucket, the dataset-curation signal for 'is more data
    still adding anything new'.  One explode + min-aggregate: the
    cumulative-distinct problem becomes an embarrassingly parallel
    group-by (min is associative), never a sequential scan.  At 100 TB
    the gram stream shuffles once on the gram key."""
    from ..operators.dedup import word_shingles

    (docs,) = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("g"))
    return (grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
            .select((F.col("first_doc") / 50).cast("long")
                    .alias("doc_bucket"))
            .groupBy("doc_bucket")
            .agg(F.count(F.lit(1)).alias("new_grams"))
            .orderBy("doc_bucket"))


@register(
    "cust_winback_by_segment",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    ), winback AS (
      SELECT DISTINCT o_custkey FROM gaps WHERE gap_days > 365
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(w.o_custkey) AS n_winback,
           COUNT(w.o_custkey) * 1000000 // COUNT(*) AS winback_ppm
    FROM customer c LEFT JOIN winback w ON c.c_custkey = w.o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=["sessions", "commerce", "winback"],
)
def cust_winback_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win-back analysis: customers with a >365-day silence between
    consecutive orders who then returned, as a ppm share of each market
    segment.  The lag window partitions by customer (fleet-parallel);
    the winback set is customer-sized, so the segment join broadcasts.
    Ties on order date break on o_orderkey for a deterministic lag."""
    from pyspark.sql.window import Window

    orders, cust = _t(spark, sf_dir, "orders", "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff("o_orderdate",
                   F.lag("o_orderdate").over(w)).alias("gap_days"))
    winback = (gaps.filter(F.col("gap_days") > 365)
               .select("o_custkey").distinct())
    return (cust.join(F.broadcast(winback),
                      cust["c_custkey"] == winback["o_custkey"], "left")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.count("o_custkey").alias("n_winback"))
            .select("c_mktsegment", "n_customers", "n_winback",
                    (F.col("n_winback") * 1000000 / F.col("n_customers"))
                    .cast("long").alias("winback_ppm"))
            .orderBy("c_mktsegment"))


@register(
    "ts_dow_seasonality_index",
    oracle="""
    WITH d AS (
      SELECT event_type, isodow(ts) AS dow, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, SUM(n) AS total FROM d GROUP BY event_type
    )
    SELECT d.event_type, d.dow, d.n,
           CAST(d.n * 7000000 // t.total AS BIGINT) AS season_index_ppm
    FROM d JOIN tot t ON d.event_type = t.event_type
    ORDER BY d.event_type, d.dow
    """,
    tags=["timeseries", "seasonality"],
)
def ts_dow_seasonality_index(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: observed count ×7
    over the type's total, in exact ppm (1 000 000 = a perfectly flat
    week).  ISO day numbering bridges the engines (Spark's dayofweek is
    Sunday-first; the oracle's isodow is Monday-first — the shift is
    computed, not assumed).  Two tiny aggregates over one scan; the
    per-type totals frame is |types| rows, broadcast."""
    (ev,) = _t(spark, sf_dir, "events")
    d = (ev.select("event_type",
                   (((F.dayofweek("ts") + 5) % 7) + 1).alias("dow"))
         .groupBy("event_type", "dow")
         .agg(F.count(F.lit(1)).alias("n")))
    tot = d.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (d.join(F.broadcast(tot), "event_type")
            .select("event_type", "dow", "n",
                    (F.col("n") * 7000000 / F.col("total")).cast("long")
                    .alias("season_index_ppm"))
            .orderBy("event_type", "dow"))


# ---------------------------------------------------------------------------
# analytics batch 4: peak detection, lexical diversity, revenue
# concentration, session-duration distribution
# ---------------------------------------------------------------------------

@register(
    "ts_hourly_peak_by_type",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, hr, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, hr) AS rk
      FROM h
    )
    SELECT event_type, hr, n, rk = 1 AS is_peak
    FROM r WHERE rk <= 3 ORDER BY event_type, rk
    """,
    tags=["timeseries", "peak", "argmax"],
)
def ts_hourly_peak_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-load detection: top-3 hours of day per event type with the
    argmax flagged — the ops-dashboard shape.  The rank window runs
    over the AGGREGATED frame (|types|×24 rows), never the raw events,
    so the only event-sized work is one group-by; ties break on the
    hour for a deterministic rank."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   F.hour("ts").cast("long").alias("hr"))
         .groupBy("event_type", "hr")
         .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hr"))
    return (h.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("event_type", "hr", "n",
                    (F.col("rk") == 1).alias("is_peak"), "rk")
            .orderBy("event_type", "rk")
            .drop("rk"))


@register(
    "text_type_token_ratio_by_lang",
    oracle=r"""
    WITH toks AS (
      SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT t) AS n_types,
           CAST(COUNT(DISTINCT t) * 1000000 // COUNT(*) AS BIGINT)
             AS ttr_ppm
    FROM toks GROUP BY lang ORDER BY lang
    """,
    tags=["text", "lexical-diversity"],
)
def text_type_token_ratio_by_lang(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Type-token ratio (lexical diversity) per language — the corpus-
    quality signal that separates templated/boilerplate text (low TTR)
    from natural prose.  One explode + per-lang count-distinct; exact
    integer ppm.  At 100 TB the distinct shuffles on (lang, token) with
    map-side partial aggregation collapsing repeats first."""
    from ..operators.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokens("text")).alias("t"))
    return (toks.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.countDistinct("t").alias("n_types"))
            .select("lang", "n_tokens", "n_types",
                    (F.col("n_types") * 1000000 / F.col("n_tokens"))
                    .cast("long").alias("ttr_ppm"))
            .orderBy("lang"))


@register(
    "cust_revenue_concentration_8020",
    oracle="""
    WITH spend AS (
      SELECT c_mktsegment AS seg, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT seg, rev,
             SUM(rev) OVER (PARTITION BY seg
                            ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             SUM(rev) OVER (PARTITION BY seg) AS total,
             COUNT(*) OVER (PARTITION BY seg) AS n_cust
      FROM spend
    )
    SELECT seg, n_cust,
           COUNT(*) FILTER (WHERE cum * 5 < total * 4) + 1
             AS n_for_80pct,
           CAST((COUNT(*) FILTER (WHERE cum * 5 < total * 4) + 1)
                * 1000000 // n_cust AS BIGINT) AS share_ppm
    FROM ranked GROUP BY seg, n_cust ORDER BY seg
    """,
    tags=["commerce", "concentration", "pareto"],
)
def cust_revenue_concentration_8020(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 question): per market segment,
    the smallest number of top customers whose cumulative spend reaches
    80% of the segment's revenue, and that count as a ppm share of the
    segment.  The comparison is integer-exact (cum×5 < total×4 avoids
    the 0.8 float entirely — DECIMAL both sides).  Windows run over the
    CUSTOMER-sized spend frame, partitioned by segment; the event-sized
    work is one join + group-by.  Deterministic tie-break on custkey."""
    from pyspark.sql.window import Window

    orders, cust = _t(spark, sf_dir, "orders", "customer")
    spend = (orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
             .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("rev")))
    wcum = (Window.partitionBy("seg")
            .orderBy(F.desc("rev"), F.asc("o_custkey"))
            .rowsBetween(Window.unboundedPreceding, 0))
    wseg = Window.partitionBy("seg")
    ranked = (spend
              .withColumn("cum", F.sum("rev").over(wcum))
              .withColumn("total", F.sum("rev").over(wseg))
              .withColumn("n_cust", F.count(F.lit(1)).over(wseg)))
    return (ranked.groupBy("seg", "n_cust")
            .agg((F.count_if(F.col("cum") * 5 < F.col("total") * 4)
                  + 1).alias("n_for_80pct"))
            .select("seg", "n_cust", "n_for_80pct",
                    (F.col("n_for_80pct") * 1000000 / F.col("n_cust"))
                    .cast("long").alias("share_ppm"))
            .orderBy("seg"))


@register(
    "sess15_duration_histogram",
    oracle="""
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id),
                    ts) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM marks
    ), durs AS (
      SELECT user_id, sid,
             date_diff('second', MIN(ts), MAX(ts)) AS dur_s
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(dur_s // 600 AS BIGINT) AS bucket_10min,
           COUNT(*) AS n_sessions,
           CAST(SUM(dur_s) AS BIGINT) AS total_seconds
    FROM durs GROUP BY 1 ORDER BY 1
    """,
    tags=["sessions", "histogram"],
)
def sess15_duration_histogram(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Session-duration distribution: 30-minute-gap sessionization,
    then a 10-minute-bucket histogram of session lengths — the
    engagement-shape report.  Gap marks and session ids are per-user
    windows (fleet-parallel); durations aggregate per (user, session);
    the histogram is bucket-sized.  Tie-break on event_id makes the
    lag deterministic under equal timestamps."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id", "ts",
        F.when(F.lag("ts").over(w).isNull()
               | (F.unix_timestamp("ts")
                  - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
               F.lit(1)).otherwise(F.lit(0)).alias("new_s"))
    wcum = (Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0))
    sess = marks.withColumn("sid", F.sum("new_s").over(wcum))
    durs = (sess.groupBy("user_id", "sid")
            .agg((F.unix_timestamp(F.max("ts"))
                  - F.unix_timestamp(F.min("ts"))).alias("dur_s")))
    return (durs.select((F.col("dur_s") / 600).cast("long")
                        .alias("bucket_10min"), "dur_s")
            .groupBy("bucket_10min")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("dur_s").cast("long").alias("total_seconds"))
            .orderBy("bucket_10min"))


# ---------------------------------------------------------------------------
# CDC apply: upserts + equality tombstones under the hash gate
# ---------------------------------------------------------------------------

_CDC_ORDERS: dict = {}


def _drop_cdc_orders(keys=None) -> None:
    import shutil

    for k in list(_CDC_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_CDC_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("cdc_orders_r7")
def _cdc_orders(spark: SparkSession, sf_dir: str) -> tuple[str, bool]:
    """Once per (session, sf_dir): versioned `orders`, then ONE CDC
    batch through `sinks/cdc.apply_cdc_batch`: delete every key ≡0
    (mod 97), update every key ≡0 (mod 89, not mod 97) to status 'U'
    with a 5.00 price bump.  cdc_ok asserts the delete landed as an
    equality tombstone (an `eq_deletes` manifest entry exists) and the
    reported per-phase counts match the key arithmetic."""
    import atexit
    import tempfile

    from ..sinks import cdc as C
    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CDC_ORDERS.get(key)
    if got is None:
        _drop_cdc_orders([k for k in _CDC_ORDERS if k[0] != key[0]])
        if not _CDC_ORDERS:
            atexit.register(_drop_cdc_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_cdcorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        V.compact_snapshot(spark, t, n_files=8, cluster_by=["o_orderkey"])
        k_col = F.col("o_orderkey")
        dels = (orders.filter(k_col % 97 == 0)
                .select(*orders.columns)
                .withColumn("op", F.lit("d"))
                .withColumn("seq", F.lit(1)))
        ups = (orders.filter((k_col % 89 == 0) & (k_col % 97 != 0))
               .withColumn("o_orderstatus", F.lit("U"))
               .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
               .withColumn("op", F.lit("u"))
               .withColumn("seq", F.lit(1)))
        n_del = dels.count()
        n_up = ups.count()
        out = C.apply_cdc_batch(dels.unionByName(ups), t,
                                key="o_orderkey", seq_col="seq",
                                batch_id=0)
        cdc_ok = (out["n_deletes"] == n_del
                  and out["n_upserts"] == n_up
                  and any(V.table_eq_deletes(t, v)
                          for v in V.versions(t)))
        got = (t, cdc_ok)
        _CDC_ORDERS[key] = got
    return got


@register(
    "scale_cdc_apply_read",
    oracle="""
    SELECT CASE WHEN o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
                THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN o_orderkey % 89 = 0
                                   AND o_orderkey % 97 <> 0
                              THEN o_totalprice + 5.0
                              ELSE o_totalprice END
                         AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS cdc_ok
    FROM orders
    WHERE o_orderkey % 97 <> 0
    GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "cdc", "equality-deletes"],
)
def scale_cdc_apply_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A CDC batch applied end to end (`sinks/cdc.apply_cdc_batch` —
    deletes as equality tombstones at O(keys) commit cost, upserts as a
    scoped MERGE, exactly-once phase ledger) and then READ: the result
    must hash-match plain SQL computing the same delete + update over
    raw orders.  This is the streaming-CDC landing path a 100 TB table
    needs — a tombstone batch costs metadata, the merge rewrites only
    key-matched files, and a foreachBatch crash-replay re-runs only the
    uncommitted phase."""
    from ..sinks import versioned as V

    t, cdc_ok = _cdc_orders(spark, sf_dir)
    df = V.read_version(spark, t)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("cdc_ok", F.lit(bool(cdc_ok)))
            .orderBy("o_orderstatus"))
