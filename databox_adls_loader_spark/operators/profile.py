"""Data-profiling operators: per-column stats, heavy-hitter (skew) keys,
and value histograms.

These are the observability ops a 100 TB ingest pipeline runs *before*
choosing a partitioning/join strategy: the column profiler reports
null/distinct density per column, the skew profiler surfaces the keys
that would overload a shuffle partition (and therefore need salting or
an AQE skew split — see `operators/scale.py`), and the histogram gives
the value distribution a bucketer/binpacker needs.

Reference parity: the reference's pipeline implicitly profiles by size
(`/root/reference/generate-file-list.py` aggregates directory sizes
before bin-packing); these operators generalize that "measure before you
shard" step to arbitrary columns.

Scale notes
-----------
* `profile_columns(exact=True)` uses one multi-`count(distinct)`
  aggregate; Catalyst compiles k distinct aggregates over one scan into
  an Expand (each row replicated k+1 times) feeding a single shuffle —
  one pass over the data, but k× shuffle volume.  At 100 TB set
  ``exact=False``: `approx_count_distinct` (HLL++) needs no Expand and
  no per-value state, one ordinary partial-agg shuffle of fixed-size
  sketches.  Everything else (counts, nulls, min/max) is map-side
  partial-agg either way.
* `skew_key_profile` is a plain partial-aggregated count per key — the
  profile itself never materializes the skew it measures (map-side
  combine collapses a hot key to one row per input partition before the
  shuffle).
* `histogram` buckets with integer `floor` math so results are exact and
  engine-portable; counts are partial-aggregated per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _minmax_str(c: Column, dtype: str) -> tuple[Column, Column]:
    """min/max rendered to an engine-portable string.

    Doubles are the trap: Spark renders `1e7` as ``1.0E7`` where DuckDB
    renders ``10000000.0`` — so doubles go through DECIMAL(18,2) first
    (the driver tables carry 2-decimal money), which both engines print
    identically.  Ints, strings, dates, and timestamps print the same in
    both engines already.
    """
    if dtype in ("double", "float"):
        c = c.cast("decimal(18,2)")
    return F.min(c).cast("string"), F.max(c).cast("string")


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    exact: bool = True) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_s, max_s).

    ``exact=True`` plans ONE single-distinct aggregate PER COLUMN and
    unions the 1-row results: multiple count_distincts in a single
    aggregate plan as an Expand ×(k+1) over every input row (the
    round-5 a8 finding — it was the slowest query in the bench), while
    per-column legs each get the map-side partial-distinct plan and a
    column-pruned scan, so the union reads the same total bytes as one
    wide scan with no row multiplication — cheaper locally AND at
    100 TB.  ``exact=False`` keeps the one-pass form with HLL
    approx_count_distinct (no Expand either) — the 100 TB default when
    exactness isn't contractual (see module docstring).
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    if exact:
        legs = []
        for c in cols:
            col = F.col(c)
            mn, mx = _minmax_str(col, dtypes[c])
            legs.append(df.select(col).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.count_distinct(col).alias("n_distinct"),
                mn.alias("min_s"), mx.alias("max_s")))
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        return out.select("col_name", "n_rows", "n_nulls", "n_distinct",
                          "min_s", "max_s")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        mn, mx = _minmax_str(col, dtypes[c])
        aggs.append(mn.alias(f"__mn_{c}"))
        aggs.append(mx.alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_s, max_s)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


def skew_key_profile(df: DataFrame, key: str | Column, top_n: int = 20) -> DataFrame:
    """Heavy-hitter profile: the ``top_n`` most frequent keys with count
    and integer parts-per-million share of all rows.

    Integer ppm (``cnt * 1_000_000 div total``) keeps the output exact
    and engine-portable — no float division anywhere.  The total-row
    count is re-aggregated from the (tiny) per-key counts relation —
    groupBy keeps a NULL-key group, so the sum is exact and the input is
    scanned exactly once — and rides along as a broadcast scalar (1-row
    cross join), not a window over the whole table.
    """
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key", "cnt",
            F.expr("cnt * 1000000L div __total").alias("share_ppm"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_n)
    )


def iqr_outlier_profile(df: DataFrame, group_col: str, value_col: str,
                        k: float = 1.5) -> DataFrame:
    """Tukey-fence outlier profile per group: exact quartiles, the
    [q1 − k·IQR, q3 + k·IQR] fences, and how many rows fall outside —
    the robust "is this column's tail garbage or signal" check run
    before trusting a mean or choosing a clip threshold (the robust
    complement of `profile_columns`' min/max).

    Two stages: (1) exact interpolated quartiles per group (one
    sort-within-group aggregate — substitute approx_percentile at
    100 TB, same shape); (2) the group→fence map is tiny (one row per
    group), so it broadcasts back onto the fact side and the outlier
    counts partial-aggregate map-side — the data shuffles once for the
    quartiles and once for the counts, both keyed by group.  Fence
    arithmetic is plain IEEE double (engine-portable given identical
    quartiles).
    """
    v = F.col(value_col)
    q = df.groupBy(group_col).agg(
        F.expr(f"percentile_cont(0.25) WITHIN GROUP (ORDER BY {value_col})")
        .alias("q1"),
        F.expr(f"percentile_cont(0.75) WITHIN GROUP (ORDER BY {value_col})")
        .alias("q3"))
    fences = q.select(
        group_col, "q1", "q3",
        (F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1"))).alias("hi"))
    return (
        df.select(group_col, value_col)
        .join(F.broadcast(fences), group_col)
        .groupBy(group_col, "q1", "q3", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"),
             F.count(F.when(v < F.col("lo"), 1)).alias("n_below"),
             F.count(F.when(v > F.col("hi"), 1)).alias("n_above"))
    )


def histogram(df: DataFrame, value: str | Column, width: float) -> DataFrame:
    """Fixed-width histogram: bucket = floor(value / width), with the
    bucket's inclusive lower bound and row count.

    `floor` over an identical IEEE double division is bit-deterministic
    across engines, so the bucket assignment (and therefore the counts)
    are exact — unlike quantile-based binning, no sampling pass needed.
    """
    v = F.col(value) if isinstance(value, str) else value
    bucket = F.floor(v.cast("double") / F.lit(float(width))).cast("bigint")
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket_lo", (F.col("bucket") * F.lit(float(width))).cast("double"))
        .select("bucket", "bucket_lo", "cnt")
        .orderBy("bucket")
    )


def equidepth_histogram(df: DataFrame, value: str, tiebreak: str,
                        k: int = 10) -> DataFrame:
    """Equi-depth histogram: k buckets with (nearly) equal row counts and
    the value range each covers — the partition-boundary / range-split
    advisor (equal-width buckets are useless under skew; equal-depth ones
    are exactly what `repartitionByRange` samples for).

    Built on `operators/windows.global_ntile`' exact NTILE (one range
    partition + map-side integer bucket math — NO single-partition
    window, and none of `global_ranks`' tie-group/dense-rank machinery,
    which NTILE doesn't need).  Exact, unlike sampled approx_percentile
    boundaries; at 100 TB the same shape works because every stage is
    the distributed form.
    """
    from .windows import global_ntile
    ranked = global_ntile(df.select(value, tiebreak),
                          [(value, "asc"), (tiebreak, "asc")], k)
    return (
        ranked.groupBy(F.col("ntile").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(value).alias("lo"),
             F.max(value).alias("hi"))
        .orderBy("bucket")
    )


def countmin_sketch(df: DataFrame, key_col: str, depth: int = 3,
                    width: int = 64) -> DataFrame:
    """Count-min sketch (public technique: Cormode & Muthukrishnan 2005)
    built relationally: ``depth`` portable md5 hash rows × ``width``
    buckets → (row_i, bucket, cnt).

    The sketch relation is depth×width rows regardless of input size —
    the fixed-memory frequency summary a 100 TB stream ships to the
    driver (or merges across days: counts are additive, so daily
    sketches UNION+sum into the monthly one).  Deterministic md5 bucket
    hashing (`dedup.md5_long` seeded per row) keeps every cell — and
    every estimate built on it — bit-reproducible in the SQL oracle,
    unlike library sketches whose internals can't be cross-checked."""
    from .dedup import md5_long

    k = F.col(key_col).cast("string")
    buckets = F.array(*[
        F.pmod(md5_long(k, seed=i), F.lit(width)) for i in range(depth)])
    return (df.select(F.posexplode(buckets).alias("row_i", "bucket"))
              .groupBy("row_i", "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))


def countmin_estimates(keys: DataFrame, sketch: DataFrame, key_col: str,
                       depth: int = 3, width: int = 64) -> DataFrame:
    """Point-frequency estimates from a `countmin_sketch` relation:
    est(k) = min over rows of cell(row_i, h_i(k)) — an OVERCOUNT by
    construction (collisions only add), never an undercount; keys whose
    bucket row is absent estimate 0 (the key was never seen).  The
    sketch side is depth×width rows → broadcast join, map-side only."""
    from .dedup import md5_long

    k = F.col(key_col).cast("string")
    buckets = F.array(*[
        F.pmod(md5_long(k, seed=i), F.lit(width)) for i in range(depth)])
    probe = keys.select(key_col, F.posexplode(buckets)
                        .alias("row_i", "bucket"))
    return (probe.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est")))


def ks_drift_cogroup(left: DataFrame, right: DataFrame, key_col: str,
                     val_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per group via
    ``groupBy().cogroup().applyInPandas`` — the distribution-shift check
    (train vs serve, yesterday vs today) run per segment.

    Integer-exact contract shared with the SQL oracle: with group sizes
    n1, n2 and cumulative counts c1(x) = |{a <= x}|, c2(x) = |{b <= x}|
    over the pooled values,

        ks_num = max over pooled x of |n2·c1(x) − n1·c2(x)|

    (the classic D statistic times n1·n2 — no division, no floats, so
    the per-group result value-hash-checks).  Groups empty on one side
    report ks_num = 0 with the counts exposing the imbalance.

    Cogroup is the right shape: both sides shuffle once on the group
    key, each group's two sorted arrays meet in ONE Arrow batch, and the
    numpy searchsorted is O((n1+n2) log) per group — no pooled-value
    join materializes.  Per-group data must fit an executor (the usual
    applyInPandas bound); pre-aggregate to (value, count) per side first
    when groups are huge."""
    import pandas as pd

    key_type = left.schema[key_col].dataType.simpleString()
    out_schema = (f"{key_col} {key_type}, n_left long, n_right long, "
                  "ks_num long")

    def ks(lpdf: "pd.DataFrame", rpdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        src = lpdf if len(lpdf) else rpdf
        key = src[key_col].iloc[0]
        a = np.sort(lpdf[val_col].to_numpy())
        b = np.sort(rpdf[val_col].to_numpy())
        n1, n2 = len(a), len(b)
        if n1 == 0 or n2 == 0:
            ks_num = 0
        else:
            pooled = np.unique(np.concatenate([a, b]))
            c1 = np.searchsorted(a, pooled, side="right").astype("int64")
            c2 = np.searchsorted(b, pooled, side="right").astype("int64")
            ks_num = int(np.max(np.abs(n2 * c1 - n1 * c2)))
        return pd.DataFrame([{key_col: key, "n_left": n1,
                              "n_right": n2, "ks_num": ks_num}])

    return (left.groupBy(key_col)
            .cogroup(right.groupBy(key_col))
            .applyInPandas(ks, out_schema))


def lorenz_skew(df: DataFrame, key_col: str) -> DataFrame:
    """Whole-distribution key-skew profile: the Gini coefficient of the
    rows-per-key distribution plus the hottest key's share — the ONE
    number that says whether a shuffle on ``key_col`` needs salting
    (`operators/scale.py`) before you pay for it.  `skew_keys` lists the
    top offenders; this scores the distribution itself (Gini 0 = every
    key equal, → 1 = one key owns the table).

    Integer-exact everywhere: ranks come from grouping the per-key
    counts BY COUNT VALUE (the Lorenz sum for a value v with
    multiplicity m and S strictly-smaller keys is v·(m·S + m(m+1)/2) —
    tie order cancels, so no tie-break is needed and the value hash is
    layout-stable), and the only division is the final Gini
    numerator/denominator, one double op rounded to 6dp.

    Plan: per-key counts (one shuffle) → counts-of-counts (tiny: ≤ max
    rows-per-key DISTINCT VALUES, hundreds even at 100 TB) → broadcast
    non-equi self-join on that tiny relation for the prefix sums → one
    global agg row.  Nothing after the first agg scales with key count,
    let alone row count."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    cc = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("m"))
    a, b = cc.alias("a"), cc.alias("b")
    pref = (
        a.join(F.broadcast(b), F.col("b.cnt") < F.col("a.cnt"), "left")
        .groupBy(F.col("a.cnt").alias("cnt"), F.col("a.m").alias("m"))
        .agg(F.coalesce(F.sum("b.m"), F.lit(0)).alias("s"))
    )
    tot = pref.agg(
        F.sum("m").cast("long").alias("n_keys"),
        F.sum(F.expr("cnt * m")).cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum(F.expr("cnt * (m * s + (m * (m + 1)) div 2)"))
        .cast("long").alias("w"),
    )
    return tot.select(
        "n_keys", "n_rows", "max_cnt",
        F.expr("max_cnt * 1000000 div n_rows").cast("long").alias("top1_ppm"),
        F.round(
            (2 * F.col("w") - (F.col("n_keys") + 1) * F.col("n_rows"))
            .cast("double")
            / (F.col("n_keys") * F.col("n_rows")).cast("double"), 6)
        .alias("gini"),
    )


def chi2_drift_buckets(df: DataFrame, value_col: str, slice_pred: Column,
                       width: float, n_buckets: int = 10) -> DataFrame:
    """Binned two-sample drift: the chi-square homogeneity statistic's
    per-bucket contributions comparing slice A (``slice_pred``) against
    the rest of ``df`` on fixed-width buckets of ``value_col`` — the
    binned complement of `ks_drift` (KS sees shape shifts; chi-square
    localizes WHICH value range drifted, the histogram a drift alert
    renders).

    The per-bucket identity (o_A·N_B − o_B·N_A)²·(N_A+N_B) /
    (N_A·N_B·(o_A+o_B)) keeps everything integer until ONE fixed-
    association double chain per bucket, rounded to 6dp — the bm25
    float discipline, so every contribution value-hashes.  Per-bucket
    rows avoid a cross-bucket float total; sum the column for the
    statistic (Σ of 6dp terms — fine for alerting; the exact per-bucket
    terms are the auditable artifact).

    Plan: one map-side bucket/flag projection, one n_buckets-group
    aggregate, a 1-row totals frame — a single scan at any scale."""
    b = F.least(F.floor(F.col(value_col) / F.lit(width)).cast("int"),
                F.lit(n_buckets - 1))
    tagged = df.select(b.alias("bucket"),
                       slice_pred.cast("int").alias("in_a"))
    counts = tagged.groupBy("bucket").agg(
        F.sum("in_a").cast("long").alias("o_a"),
        F.sum(F.expr("1 - in_a")).cast("long").alias("o_b"))
    tot = F.broadcast(counts.agg(
        F.sum("o_a").cast("long").alias("na"),
        F.sum("o_b").cast("long").alias("nb")))
    d = (F.col("o_a") * F.col("nb") - F.col("o_b") * F.col("na")) \
        .cast("double")
    contrib = F.round(
        d * d / (F.col("na") * F.col("nb")).cast("double")
        * (F.col("na") + F.col("nb")).cast("double")
        / (F.col("o_a") + F.col("o_b")).cast("double"), 6)
    return (counts.crossJoin(tot)
            .select("bucket", "o_a", "o_b",
                    contrib.alias("chi2_contrib"))
            .orderBy("bucket"))


def decile_lift(df: DataFrame, value_col: str, tiebreak: str,
                cents: Column | None = None, k: int = 10) -> DataFrame:
    """Decile (k-tile) lift table over a value column: per bucket the
    row count, exact cents total, share of total in ppm, and CUMULATIVE
    share in ppm — the 'top decile carries X% of revenue' concentration
    report (bucketed sibling of `lorenz_skew`).

    The k-tile comes from the two-phase range-partitioned rank
    machinery (`windows.global_row_number` — no single-partition
    window); ``tiebreak`` must make the order total so both engines
    bucket boundary ties identically.  The k-row cumulative frame is a
    bounded post-aggregate window."""
    from .windows import global_row_number

    v = cents if cents is not None else \
        (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    ranked, n_rows = global_row_number(
        df.select(F.col(value_col), F.col(tiebreak), v.alias("__cents")),
        order=[(value_col, "asc"), (tiebreak, "asc")], out_col="__rn")
    tot = ranked.agg(F.sum("__cents").alias("__tot"))
    per = (ranked.join(F.broadcast(tot))
           .withColumn("decile",
                       F.expr(f"CAST((__rn - 1) * {k} DIV {n_rows} "
                              "AS BIGINT) + 1"))
           .groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("__cents").cast("long").alias("sum_cents"),
                F.max("__tot").alias("__tot")))
    # k-row bounded post-aggregate frame (the documented exception to
    # the no-global-window rule — |deciles| rows, never data rows)
    return (per
            .withColumn("share_ppm", F.expr(
                "CAST(sum_cents * 1000000L DIV __tot AS BIGINT)"))
            .withColumn("cum_share_ppm", F.expr(
                "CAST(SUM(sum_cents) OVER (ORDER BY decile ROWS BETWEEN "
                "UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000L "
                "DIV __tot AS BIGINT)"))
            .select("decile", F.col("n").cast("long").alias("n"),
                    "sum_cents", "share_ppm", "cum_share_ppm"))


def group_checksum(df: DataFrame, group_cols: list[str],
                   cols: list[str]) -> DataFrame:
    """Order-independent content CHECKSUM per group — the cross-engine
    table-diff primitive: each row canonicalizes to a '\\x1f'-joined
    string (NULL as a sentinel byte), hashes through md5 to a 60-bit
    int, and the group fingerprint is (row count, BIT_XOR of hashes,
    SUM of hashes mod 1 000 003).  Two tables/engines agree on a group
    iff all three agree — xor catches substitutions sum-mod misses and
    vice versa; both are order-independent, so no sort anywhere.

    Use int/string/date columns only: float formatting differs across
    engines.  Map-side hash + one grouped aggregate — scan-shaped."""
    canon = F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
        for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (df.withColumn("__h", h)
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(__h)").cast("long").alias("xor_sig"),
                 F.sum(F.col("__h") % 1000003).cast("long")
                 .alias("sum_sig")))


def pareto_frontier_2d(df: DataFrame, max_col: str,
                       min_col: str) -> DataFrame:
    """2-D Pareto frontier (the SKYLINE operator): the distinct
    (max_col, min_col) points not STRICTLY dominated — no other point
    has max_col ≥ AND min_col ≤ with at least one strict.  Ties on both
    coordinates collapse to one point carrying its row count.

    The classic sweep, distributed: sort distinct points by
    (max_col DESC, min_col ASC) and take the exclusive running MIN of
    min_col through the two-phase machinery
    (`windows.exclusive_running_min` — no single-partition window); a
    point survives iff no strict predecessor reached an equal-or-lower
    min_col.  Among distinct points every strict predecessor dominates
    at min ≤ current, so the test is exactly `running is NULL or
    running > min_col`.  Cost: one distinct + one two-phase running
    min — no quadratic dominance join (that is the ORACLE's job)."""
    from .windows import exclusive_running_min

    pts = (df.groupBy(max_col, min_col)
           .agg(F.count(F.lit(1)).alias("n_rows")))
    swept = exclusive_running_min(
        pts, order=[(max_col, "desc"), (min_col, "asc")],
        value_col=min_col, out_col="__rm")
    return (swept.filter(F.col("__rm").isNull()
                         | (F.col("__rm") > F.col(min_col)))
            .select(max_col, min_col,
                    F.col("n_rows").cast("long").alias("n_rows")))
