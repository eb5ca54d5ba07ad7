"""Round-6 registry extensions: multi-benchmark Bloom decontamination
and per-key FLEET variants of the global-window time-series queries
(the "partition by series key" form `operators/timeseries.py` documents
— here oracle-proven, not just documented).

Reference parity note: the reference (Azure/databox-adls-loader) has no
analytics surface beyond SURVEY §2 — these are the beyond-reference
operators a 100 TB training-data pipeline needs (driver contract:
__spark_entry__.py; correctness gate: tools/check_correctness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, register


# ---------------------------------------------------------------------------
# multi-benchmark decontamination: ONE union bitmap, per-bench exact verify
# ---------------------------------------------------------------------------

@register(
    "dedup_contamination_multibench",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), bench AS (
      SELECT 'b11' AS bench, g
      FROM (SELECT DISTINCT g FROM sh WHERE doc_id % 11 = 0)
      UNION ALL
      SELECT 'b13', g FROM (SELECT DISTINCT g FROM sh WHERE doc_id % 13 = 0)
      UNION ALL
      SELECT 'b17', g FROM (SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0)
    )
    SELECT s.doc_id, b.bench, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM sh s JOIN bench b ON s.g = b.g
    GROUP BY s.doc_id, b.bench
    HAVING COUNT(*) >= 2
    ORDER BY s.doc_id, b.bench
    """,
    tags=["dedup", "contamination", "bloom", "multibench"],
)
def dedup_contamination_multibench(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Decontamination against THREE benchmarks through ONE union Bloom
    bitmap + per-benchmark exact verify of the flagged slice (operator:
    `operators/dedup.contamination_multibench`).  The oracle is the
    straight no-prefilter per-bench exact join — hash-matching it proves
    the Bloom phase discarded only true negatives, for every benchmark
    at once.  Scale: bitmap stays m_bits/8 bytes however many benchmarks
    union in; the exact verify touches only flagged docs."""
    from ..operators.dedup import contamination_multibench

    (docs,) = _t(spark, sf_dir, "documents")
    benches = {f"b{m}": docs.filter(F.col("doc_id") % m == 0)
               for m in (11, 13, 17)}
    return (contamination_multibench(docs, benches)
            .orderBy("doc_id", "bench"))


# ---------------------------------------------------------------------------
# per-key fleet variants of the global-window exceptions
# ---------------------------------------------------------------------------

@register(
    "ts_anomaly_zscore_fleet",
    oracle="""
    WITH daily AS (
      SELECT n.n_name AS series, CAST(o.o_orderdate AS DATE) AS day,
             CAST(floor(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))))
                  AS BIGINT) AS rev_usd
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), stats AS (
      SELECT series, day, rev_usd,
             COUNT(rev_usd) OVER w AS n_window,
             SUM(rev_usd) OVER w AS s1,
             SUM(rev_usd * rev_usd) OVER w AS s2
      FROM daily
      WINDOW w AS (PARTITION BY series ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT series, strftime(day, '%Y-%m-%d') AS day, rev_usd,
           CAST(n_window AS BIGINT) AS n_window,
           CAST(s1 AS BIGINT) AS win_sum,
           CAST(s2 AS BIGINT) AS win_sumsq,
           n_window >= 4 AND
             (n_window * rev_usd - s1) * (n_window * rev_usd - s1)
               > 9 * (n_window * s2 - s1 * s1) AS is_anomaly
    FROM stats ORDER BY series, day
    """,
    tags=["timeseries", "anomaly", "window", "fleet"],
)
def ts_anomaly_zscore_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ts_anomaly_zscore`'s FLEET form: one trailing-7-day z>3 anomaly
    stream PER NATION (25 independent series), via
    `rolling_zscore_anomalies(partition_by="series")` — the window
    partitions on the series key, so a million-series fleet spreads
    across executors with no global sort and no `WindowExec: No
    Partition Defined` hazard.  Same exact-integer flag math as the
    global form; every per-series flag value-hash-checked.  The
    customer/nation dims resolve via joins Catalyst auto-broadcasts at
    this scale (at 100 TB customer shuffles on custkey; nation stays a
    broadcast)."""
    from ..operators.timeseries import rolling_zscore_anomalies

    orders, customer, nation = _t(spark, sf_dir,
                                  "orders", "customer", "nation")
    daily = (
        orders
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("series"),
                 F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
             .cast("long").alias("rev_usd"))
    )
    out = rolling_zscore_anomalies(daily, day_col="d", value_col="rev_usd",
                                   window=7, z=3, partition_by="series")
    return (out.select("series", F.date_format("d", "yyyy-MM-dd").alias("day"),
                       "rev_usd", "n_window", "win_sum", "win_sumsq",
                       "is_anomaly")
            .orderBy("series", "day"))


@register(
    "trend_revenue_ols_fleet",
    oracle="""
    WITH daily AS (
      SELECT n.n_name AS series,
             datediff('day', DATE '1992-01-01',
                      CAST(o.o_orderdate AS DATE)) AS x,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), s AS (
      SELECT series, COUNT(*) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT series, n_days,
           CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
           ROUND(CAST(CAST(n_days * sxy - sx * sy AS BIGINT) AS DOUBLE)
                 / CAST(CAST(n_days * sxx - sx * sx AS BIGINT) AS DOUBLE), 6)
             AS slope_cents_per_day
    FROM s ORDER BY series
    """,
    tags=["trend", "regression", "fleet"],
)
def trend_revenue_ols_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`trend_daily_revenue_ols`'s FLEET form: one exact-integer OLS
    revenue slope PER NATION.  Identical closed-form bigint moments
    (n·Σxy − Σx·Σy over n·Σx² − (Σx)²) after the per-(series, day)
    pre-aggregation; the series key just widens from 5 priorities to 25
    nations resolved through the customer dim — the plan stays two
    partial-aggregated shuffles, no window, no driver math, and scales
    to millions of series because every stage is keyed by series."""
    from ..functions.exact import dec

    orders, customer, nation = _t(spark, sf_dir,
                                  "orders", "customer", "nation")
    daily = (
        orders
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("series"),
                 F.datediff(F.col("o_orderdate").cast("date"),
                            F.lit("1992-01-01").cast("date")).alias("x"))
        .agg(F.sum((dec("o_totalprice") * 100).cast("long")).alias("y"))
    )
    s = daily.groupBy("series").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("x").cast("long")).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("long") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("long") * F.col("x").cast("long")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (s.select(
        "series", "n_days",
        num.alias("slope_num"), den.alias("slope_den"),
        F.round(num.cast("double") / den.cast("double"), 6)
        .alias("slope_cents_per_day"))
        .orderBy("series"))
