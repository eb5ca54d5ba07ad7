"""Time-series regularization: per-key calendar densification (gap fill)
and forward fill.

Aggregated event/order series are sparse — days with no rows simply don't
exist — but downstream consumers (moving averages, day-over-day deltas,
training-curve joins) need a dense, regular grid.  These operators
densify per key and carry the last observation forward, the standard
"regularize then resample" step of a telemetry/feature pipeline.

Scale notes
-----------
* `calendar_fill` emits one row per (key, day-in-span): output-linear,
  produced by an `explode(sequence(min, max))` over the per-key bounds —
  a skinny aggregate (2 dates per key) followed by a generator, never a
  driver-side loop.  The join back to the observed rows is keyed by
  (key, date) — plain hash shuffle, co-partitioned with any upstream
  per-(key, date) aggregate that produced `daily`.
* `forward_fill` windows partition BY KEY — parallel across keys, and a
  single key's partition is bounded by its calendar span (days), not by
  raw event rows.  No global (single-partition) window anywhere.
* A key spanning 30 years is ~11k rows — trivially fine; the hazard to
  watch is millions of keys × tiny spans, which is exactly the shape the
  explode handles (many small partitions, no skew).

Reference parity: the reference has no time dimension at all; this is
part of the beyond-reference pipeline surface (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def calendar_fill(daily: DataFrame, key_col: str,
                  date_col: str) -> DataFrame:
    """Densify a per-(key, date) frame to one row per key per calendar
    day between that key's own first and last observed date.  Missing
    days appear with NULL in every non-key column.

    Precondition: `daily` is unique per (key, date) — i.e. it is the
    output of a groupBy(key, date) aggregate, not raw events.
    """
    bounds = daily.groupBy(key_col).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi"))
    cal = bounds.select(
        key_col, F.explode(F.sequence("__lo", "__hi")).alias(date_col))
    return cal.join(daily, [key_col, date_col], "left")


def forward_fill(df: DataFrame, key_col: str, order_col: str,
                 cols: list[str]) -> DataFrame:
    """Carry the last non-NULL value of each column in ``cols`` forward
    along ``order_col`` within each key (rows before the first
    observation stay NULL).  `last(ignorenulls)` over a running frame —
    one pass, partitioned by key."""
    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rolling_distinct_count(df: DataFrame, day_col: Column | str,
                           key_col: str, window: int = 7,
                           out_day: str = "epoch_day",
                           out_col: str = "n_active") -> DataFrame:
    """Trailing-``window``-day distinct ``key_col`` per day — the DAU/WAU
    ("weekly active users") aggregate.

    ``COUNT(DISTINCT) OVER (RANGE ...)`` is unsupported in Spark, and the
    naive per-day self-join re-scans the data once per day.  Instead each
    DISTINCT (key, day) pair is exploded to the ≤``window`` reporting
    days it can contribute to, then one distinct-aggregate runs per
    reporting day: expansion is bounded at window× the distinct PAIR set
    (not raw events — the distinct collapses first, map-side), and every
    stage is an ordinary partial-aggregated shuffle.  Days inside the
    observed span with no contributing key report 0.

    ``day_col`` must be integer days (e.g. ``unix_micros(ts) div
    86_400_000_000`` — engine-portable epoch math, no timezone/dow
    convention involved); the output day column is the same integer day.
    """
    d = F.col(day_col) if isinstance(day_col, str) else day_col
    pairs = df.select(d.cast("long").alias("__d"),
                      F.col(key_col).alias("__k")).distinct()
    bounds = pairs.agg(F.min("__d").alias("__lo"), F.max("__d").alias("__hi"))
    cal = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias(out_day))
    contrib = pairs.select(
        "__k",
        F.explode(F.sequence(F.col("__d"), F.col("__d") + (window - 1)))
        .alias(out_day))
    counts = contrib.groupBy(out_day).agg(
        F.count_distinct("__k").alias(out_col))
    return (
        cal.join(counts, out_day, "left")
        .select(out_day,
                F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col))
    )


def gap_fill_forward(daily: DataFrame, key_col: str, date_col: str,
                     ffill_cols: list[str],
                     zero_fill: dict[str, Column] | None = None
                     ) -> DataFrame:
    """Composed form: densify the calendar, zero-fill the columns in
    ``zero_fill`` (name → fill literal; counts get 0, not a carried
    value), and forward-fill ``ffill_cols``."""
    dense = calendar_fill(daily, key_col, date_col)
    for name, lit in (zero_fill or {}).items():
        dense = dense.withColumn(name, F.coalesce(F.col(name), lit))
    return forward_fill(dense, key_col, date_col, ffill_cols)


def rolling_zscore_anomalies(daily: DataFrame, day_col: str = "day",
                             value_col: str = "val", window: int = 7,
                             z: int = 3, min_points: int = 4,
                             partition_by: str | None = None) -> DataFrame:
    """Trailing-window z-score anomaly flags in EXACT integer math.

    For each point x with trailing-window (previous ``window`` rows)
    count n, sum S1 and sum-of-squares S2, the float rule
    |x − μ| > z·σ is equivalent (multiply both sides by n², square) to

        (n·x − S1)² > z² · (n·S2 − S1²)

    — all bigint, no sqrt/float, so the flags are bit-portable to the
    SQL oracle.  ``value_col`` must be integer-valued (floor money to
    whole units first); magnitudes are safe in int64 while
    (window · max|x|)² < 9.2e18, i.e. |x| ≲ 4e8 at window 7 — past
    that, widen to decimal(38,0) on both engines.

    ``partition_by`` is the series key for per-key FLEETS (one z-score
    stream per nation/device/tenant): the frame partitions on it, so a
    million series parallelize across executors with no global sort.
    With ``partition_by=None`` the window is a bare ordered frame over
    the PRE-AGGREGATED series — bounded by |days|, the documented
    post-aggregate exception to the no-global-window rule (PLANS.md)."""
    base = (Window.partitionBy(partition_by).orderBy(day_col)
            if partition_by else Window.orderBy(day_col))
    w = base.rowsBetween(-window, -1)
    x = F.col(value_col)
    n = F.count(value_col).over(w)
    s1 = F.sum(value_col).over(w)
    s2 = F.sum(x * x).over(w)
    lhs = (n * x - s1) * (n * x - s1)
    rhs = F.lit(z * z) * (n * s2 - s1 * s1)
    return (daily
            .withColumn("n_window", n)
            .withColumn("win_sum", s1)
            .withColumn("win_sumsq", s2)
            .withColumn("is_anomaly",
                        (F.col("n_window") >= min_points) & (lhs > rhs)))


def ewma_binary_fleet(daily: DataFrame, day_col: str, value_col: str,
                      partition_by: str, window: int = 8) -> DataFrame:
    """Truncated exponentially-weighted moving average with α = 1/2 per
    series — the smoothing every ops dashboard runs — in EXACT integer
    arithmetic: with a binary decay every weight α(1−α)^i is a dyadic
    rational, so the L-term truncation is the integer
    ``num = Σ_{i=0..L−1} v_{t−i}·2^{L−1−i}`` over denominator 2^L
    (weights sum to (2^L−1)/2^L — the truncation remainder, documented
    rather than hidden in float drift).  ``ewma_x{2^L}`` is the exact
    numerator (NULL until a full L-row history exists: a NULL lag
    nulls the chain, which is the contract, not an accident);``ewma``
    is the single rounded division.

    Scale: one keyed window per series (no global sort); the L lag
    terms are one fixed-association codegen'd expression, so a
    million-series fleet costs one shuffle on the series key."""
    w = Window.partitionBy(partition_by).orderBy(day_col)
    num = None
    for i in range(window):
        term = (F.lag(F.col(value_col), i).over(w)
                * F.lit(1 << (window - 1 - i)))
        num = term if num is None else num + term
    scale = 1 << window
    return (daily
            .withColumn(f"ewma_x{scale}", num.cast("long"))
            .withColumn("ewma",
                        F.round(F.col(f"ewma_x{scale}").cast("double")
                                / F.lit(float(scale)), 6)))


def cusum_peak(daily: DataFrame, key_col: str, day_col: str,
               value_col: str) -> DataFrame:
    """CUSUM changepoint candidate per series: the day where the
    running sum of deviations from the series mean peaks in absolute
    value — the classic level-shift detector, INTEGER-exact by scaling:
    dev_i = v_i·n − total (never a mean division), cusum_i = Σ dev_j.
    Returns (key, peak_day, peak_abs_cusum, n_days); ties resolve to
    the LATEST day (deterministic).  peak_abs_cusum is in value·n
    units — compare within a series, not across.

    Per-key windows only (no global sort); magnitudes bound at
    |v|·n·n_days — counts/cents over thousands of days stay far inside
    BIGINT."""
    w_ord = (Window.partitionBy(key_col).orderBy(day_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(key_col)
    v = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(w_all)
    tot = F.sum(v).over(w_all)
    i = F.row_number().over(Window.partitionBy(key_col).orderBy(day_col))
    cusum = F.sum(v).over(w_ord) * n - i * tot
    scored = daily.select(
        F.col(key_col), F.col(day_col),
        F.abs(cusum).alias("__abs"), n.alias("__n"))
    return (scored.groupBy(key_col)
            .agg(F.max(F.struct("__abs", day_col)).alias("__peak"),
                 F.max("__n").alias("n_days"))
            .select(F.col(key_col),
                    F.col("__peak")[day_col].alias("peak_day"),
                    F.col("__peak.__abs").cast("long")
                    .alias("peak_abs_cusum"),
                    F.col("n_days").cast("long").alias("n_days")))


def mad_outliers(df: DataFrame, key_col: str, value_col: str,
                 k: int = 3) -> DataFrame:
    """`mad_profile` + the outlier count it motivates, in one result:
    (key, n, med, mad, n_outliers) where outliers satisfy
    |x − med| > k·MAD.  Three passes over the keyed frame (median →
    MAD → count), each a grouped aggregate with a broadcast join of
    per-key scalars — no window, no global sort."""
    v = F.col(value_col).cast("long")
    med = (df.groupBy(key_col)
           .agg(F.expr(f"percentile_disc(0.5) WITHIN GROUP "
                       f"(ORDER BY {value_col})").cast("long")
                .alias("med")))
    dev = (df.select(key_col, v.alias("__v"))
           .join(F.broadcast(med), key_col)
           .withColumn("__dev", F.abs(F.col("__v") - F.col("med"))))
    mad = (dev.groupBy(key_col)
           .agg(F.expr("percentile_disc(0.5) WITHIN GROUP "
                       "(ORDER BY __dev)").cast("long").alias("mad")))
    return (dev.join(F.broadcast(mad), key_col)
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("med").alias("med"), F.max("mad").alias("mad"),
                 F.sum((F.col("__dev") > k * F.col("mad"))
                       .cast("long")).alias("n_outliers"))
            .select(key_col, F.col("n").cast("long").alias("n"),
                    "med", "mad",
                    F.col("n_outliers").cast("long").alias("n_outliers")))


def time_weighted_avg(events: DataFrame, key_col: str,
                      ts_col: str, value_scaled: "Column",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Time-weighted average per (key, day): each observation holds its
    value until the next one the same day (the step-function integral
    sensor/price data needs — a plain AVG over-weights bursts of
    samples); (key, day) groups with fewer than two events have no
    segment and are dropped.

    ``value_scaled`` must already be an INTEGER-scaled value (e.g.
    value·10⁴ — the caller picks the resolution); the result
    ``twap_scaled = Σ v_i·Δt_i DIV Σ Δt_i`` is in the same unit, all
    integer µs × scaled-value arithmetic: |v|≤5·10⁶ × 86 400s·10⁶ µs ≈
    4·10¹⁷ per day-group, inside BIGINT with no further scaling.
    One per-(key, day) lead window + one grouped aggregate.

    ``tiebreak_col`` totalizes the order under equal timestamps —
    tied events form zero-length segments whichever order they take,
    but WHICH value owns the following nonzero segment must be
    deterministic for the cross-engine hash to hold."""
    e = events.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("date").alias("day"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tiebreak_col).alias("tb"),
        value_scaled.cast("long").alias("v"))
    w = Window.partitionBy("k", "day").orderBy("us", "tb")
    seg = (e.withColumn("__next", F.lead("us").over(w))
           .filter(F.col("__next").isNotNull())
           .withColumn("__dt", F.col("__next") - F.col("us")))
    return (seg.groupBy("k", "day")
            .agg(F.sum(F.col("v") * F.col("__dt")).alias("__vdt"),
                 F.sum("__dt").alias("__dt_total"))
            .filter(F.col("__dt_total") > 0)
            .select(F.col("k").alias(key_col), "day",
                    F.expr("CAST(__vdt DIV __dt_total AS BIGINT)")
                    .alias("twap_scaled"),
                    F.col("__dt_total").cast("long").alias("span_us")))


def linear_interpolate(daily: DataFrame, key_col: str, date_col: str,
                       value_col: str) -> DataFrame:
    """Densify each series to its full calendar and fill interior gaps
    by LINEAR interpolation between the surrounding observations, in
    exact integer arithmetic: v = v0 + sign·(|v1−v0|·(d−d0) DIV
    (d1−d0)) — magnitude-DIV-then-sign, because Spark's DIV truncates
    toward zero while DuckDB's // floors, and they only agree on
    non-negative numerators.  Edges (before the first / after the last
    observation) stay NULL — extrapolation is `forward_fill`'s job.
    Returns (key, date, value, is_interpolated).

    Per-key windows over the densified calendar only (bounded by each
    key's day span)."""
    dense = calendar_fill(daily, key_col, date_col)
    w_prev = (Window.partitionBy(key_col).orderBy(date_col)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(key_col).orderBy(F.col(date_col).desc())
              .rowsBetween(Window.unboundedPreceding, 0))
    obs = F.when(F.col(value_col).isNotNull(),
                 F.struct(F.col(date_col).alias("d"),
                          F.col(value_col).alias("v")))
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.last(obs, ignorenulls=True).over(w_next)
    d = F.datediff(F.col(date_col), F.col("__p.d"))
    span = F.datediff(F.col("__n.d"), F.col("__p.d"))
    delta = F.col("__n.v") - F.col("__p.v")
    interp = (F.col("__p.v")
              + F.signum(delta).cast("long")
              * F.expr("CAST(abs(__n.v - __p.v) * "
                       "datediff(__date, __p.d) DIV "
                       "datediff(__n.d, __p.d) AS BIGINT)"))
    return (dense
            .withColumn("__p", prev).withColumn("__n", nxt)
            .withColumn("__date", F.col(date_col))
            .withColumn(
                "value",
                F.when(F.col(value_col).isNotNull(),
                       F.col(value_col).cast("long"))
                .when(F.col("__p").isNotNull() & F.col("__n").isNotNull()
                      & (span > 0), interp.cast("long")))
            .withColumn("is_interpolated",
                        F.col(value_col).isNull()
                        & F.col("value").isNotNull())
            .select(key_col, date_col, "value", "is_interpolated"))
