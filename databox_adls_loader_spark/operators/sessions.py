"""Sessionization and funnel analysis over event streams — the
behavioral-analytics operators a training-data pipeline needs when the
corpus is interaction logs rather than documents.

Both are window/join compositions that stay entirely JVM-side:

- :func:`sessionize` — gap-based sessions via the classic island
  detection: flag rows whose gap from the previous event exceeds the
  threshold, running-sum the flags.  The window partitions by ``user_id``
  so a billion-user log sorts per-user slices in parallel — there is no
  global sort and no single-partition window anywhere.
- :func:`funnel_steps` — ordered-step funnel (reached step k only if it
  happened AFTER step k-1).  Implemented as k chained per-user min-ts
  aggregations, each a groupBy on the same ``user_id`` key — Catalyst
  reuses the partitioning, and every join is on the grouping key.

Scale: both shuffle on ``user_id`` only; skewed power users are bounded
by per-user event counts, not corpus size.  The streaming counterpart of
``sessionize`` is ``F.session_window`` (streaming/events.py) — this
module is the batch analog whose results an oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id",
               ts_col: str = "ts",
               tiebreak_col: str | None = None) -> DataFrame:
    """Assign a per-user session index to every event: a new session
    starts when the gap from the user's previous event exceeds
    ``gap_minutes``.  Returns the input plus ``session_id`` (1-based,
    per user).

    Gap math runs on microseconds (never a seconds cast — truncation
    would flip events sitting exactly on the boundary); pass
    ``tiebreak_col`` (e.g. the event id) when timestamps can collide, or
    the lag order — and thus the session split — is nondeterministic."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000),
                    1).otherwise(0)
    return (
        events.withColumn("__new", is_new)
        .withColumn("session_id", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("__new")
    )


def session_summaries(events: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id",
                      ts_col: str = "ts",
                      tiebreak_col: str | None = None) -> DataFrame:
    """One row per (user, session): start/end and event count — the
    session rollup a warehouse materializes from raw events."""
    s = sessionize(events, gap_minutes, user_col, ts_col, tiebreak_col)
    return (
        s.groupBy(user_col, "session_id")
        .agg(F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Ordered funnel: per user, the earliest timestamp of each step that
    occurs strictly AFTER the previous step's timestamp (step 1 is the
    plain minimum).  Output: one row per user with ``t_<step>`` columns,
    null from the first step the user never reached.

    k-1 self-joins on the ``user_col`` grouping key — each broadcast-able
    once aggregated (one row per user reaching the prefix)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    prev_t = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(cur.select(user_col, prev_t), user_col)
            .filter(F.col("__ts") > F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{step}"))
        )
        cur = cur.join(nxt, user_col, "left")
        prev_t = f"t_{step}"
    return cur


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """The funnel report: how many users reached each step in order.
    One row per step, monotonically non-increasing ``n_users``."""
    per_user = funnel_steps(events, steps, user_col, type_col, ts_col)
    counts = per_user.agg(*[
        F.count(F.col(f"t_{s}")).alias(f"t_{s}") for s in steps])
    # unpivot to (step, n_users) keeping funnel order via the step index
    pairs = F.array(*[
        F.struct(F.lit(i).alias("step_no"), F.lit(s).alias("step"),
                 F.col(f"t_{s}").alias("n_users"))
        for i, s in enumerate(steps, 1)])
    return (
        counts.select(F.explode(pairs).alias("x"))
        .select("x.step_no", "x.step", "x.n_users")
        .orderBy("step_no")
    )


def top_session_paths(events: DataFrame, n: int = 3, k: int = 10,
                      gap_minutes: int = 30,
                      user_col: str = "user_id",
                      ts_col: str = "ts",
                      type_col: str = "event_type",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Most common length-``n`` event-type paths WITHIN sessions — the
    behavioral n-gram mining behind funnel discovery ("which 3-step
    journeys actually happen?").

    Per-session lead windows extract consecutive type n-grams (windows
    partition by (user, session): bounded frames, shuffles on the
    user key only), then a map-side-combined global count and TakeOrdered
    cap.  Paths never cross a session boundary — that is the difference
    from a naive lead over the raw user stream, where an overnight gap
    would fabricate a journey."""
    # NULL event types would vanish inside concat_ws, silently shrinking
    # a "length-n" path — drop them up front (the oracle filters alike)
    s = sessionize(events.filter(F.col(type_col).isNotNull()),
                   gap_minutes, user_col, ts_col, tiebreak_col)
    w = (Window.partitionBy(user_col, "session_id")
         .orderBy(ts_col, tiebreak_col))
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)]
    grams = (s.select(F.concat_ws(">", *steps).alias("path"),
                      steps[-1].isNotNull().alias("complete"))
             .filter(F.col("complete")))
    return (grams.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("path")).limit(k))


def funnel_counts_within(events: DataFrame, steps: list[str],
                         max_gap_minutes: int,
                         user_col: str = "user_id",
                         type_col: str = "event_type",
                         ts_col: str = "ts") -> DataFrame:
    """Time-CONSTRAINED funnel: a user advances to step k only when it
    happens strictly after step k-1 AND within ``max_gap_minutes`` of it
    — the conversion-window form every growth dashboard actually uses
    (an unconstrained funnel credits a purchase months after the view).
    Output: (step_no, step, n_users), non-increasing.

    Timestamps compare as integer microseconds (`unix_micros`) so the
    strict-after and within-gap edges are exact and oracle-portable.
    Same scale shape as `funnel_steps`: k-1 joins all shuffling on the
    one ``user_col`` key, each prefix frame one row per surviving user."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    gap_us = int(max_gap_minutes) * 60_000_000
    us = F.unix_micros(F.col(ts_col))
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(user_col)
           .agg(F.min(us).alias(f"t_{steps[0]}")))
    prev_t = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (events.filter(F.col(type_col) == step)
               .select(user_col, us.alias("__us"))
               .join(cur.select(user_col, prev_t), user_col)
               .filter((F.col("__us") > F.col(prev_t)) &
                       (F.col("__us") <= F.col(prev_t) + F.lit(gap_us)))
               .groupBy(user_col)
               .agg(F.min("__us").alias(f"t_{step}")))
        cur = cur.join(nxt, user_col, "left")
        prev_t = f"t_{step}"
    counts = cur.agg(*[F.count(F.col(f"t_{s}")).alias(f"t_{s}")
                       for s in steps])
    pairs = F.array(*[
        F.struct(F.lit(i).alias("step_no"), F.lit(s).alias("step"),
                 F.col(f"t_{s}").alias("n_users"))
        for i, s in enumerate(steps, 1)])
    return (counts.select(F.explode(pairs).alias("x"))
            .select("x.step_no", "x.step", "x.n_users")
            .orderBy("step_no"))


def last_touch_attribution(events: DataFrame, conversion: str,
                           channels: list[str],
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           tiebreak_col: str | None = None) -> DataFrame:
    """Last-touch marketing attribution: each ``conversion`` event is
    credited to the user's most recent STRICTLY-PRECEDING event whose
    type is in ``channels``; conversions with no prior touch credit
    'direct'.  Returns (channel, n_conversions).

    One per-user ordered window carrying the last channel forward
    (rows-frame ending at 1 PRECEDING, so a conversion can never credit
    itself) + one small aggregate — no joins, shuffles on ``user_col``
    only, so a billion-user log attributes in parallel per user."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (Window.partitionBy(user_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.last(
        F.when(F.col(type_col).isin(*channels), F.col(type_col)),
        ignorenulls=True).over(w)
    return (events
            .withColumn("__touch", touch)
            .filter(F.col(type_col) == conversion)
            .groupBy(F.coalesce("__touch", F.lit("direct"))
                     .alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_conversions")))


def activity_streaks(events: DataFrame,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Longest consecutive-DAY activity streak per user, reported as a
    distribution (streak_days, n_users) — the classic gaps-and-islands
    detection: distinct active days per user, island key = day minus
    row_number days (consecutive days share it), island length = count.

    All integer/date arithmetic (no float), per-user windows only."""
    days = (events.select(F.col(user_col).alias("u"),
                          F.col(ts_col).cast("date").alias("day"))
            .distinct())
    w = Window.partitionBy("u").orderBy("day")
    islands = (days
               .withColumn("__k", F.date_sub(
                   F.col("day"), F.row_number().over(w)))
               .groupBy("u", "__k")
               .agg(F.count(F.lit(1)).alias("len")))
    longest = islands.groupBy("u").agg(F.max("len").alias("streak_days"))
    return (longest.groupBy("streak_days")
            .agg(F.count(F.lit(1)).alias("n_users")))


def event_cooccurrence(events: DataFrame,
                       user_col: str = "user_id",
                       type_col: str = "event_type") -> DataFrame:
    """Per event-type pair (a < b): how many users performed both, and
    the conditional reach P(b|a) / P(a|b) in exact ppm (integral DIV) —
    the co-occurrence matrix behind 'users who did X also did Y'.

    The self-join runs on the (user, type)-DISTINCT frame, so per-user
    fan-out is bounded by |types|² (a handful), never by event count;
    the per-type totals broadcast."""
    ut = (events.select(F.col(user_col).alias("u"),
                        F.col(type_col).alias("t"))
          .distinct())
    per_type = ut.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    both = (a.join(b, "u")
            .filter(F.col("a.t") < F.col("b.t"))
            .groupBy(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
            .agg(F.count(F.lit(1)).alias("n_both")))
    na = per_type.select(F.col("t").alias("ta"), F.col("n").alias("n_a"))
    nb = per_type.select(F.col("t").alias("tb"), F.col("n").alias("n_b"))
    return (both
            .join(F.broadcast(na), "ta").join(F.broadcast(nb), "tb")
            .select("ta", "tb",
                    F.col("n_both").cast("long").alias("n_both"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.expr("CAST(n_both * 1000000L DIV n_a AS BIGINT)")
                    .alias("p_b_given_a_ppm"),
                    F.expr("CAST(n_both * 1000000L DIV n_b AS BIGINT)")
                    .alias("p_a_given_b_ppm")))


def milestone_completion(events: DataFrame, milestones: list[str],
                         user_col: str = "user_id",
                         ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """Any-order milestone-set completion: per milestone the number of
    users who reached it, plus an 'ALL' row with the users who reached
    EVERY milestone and the median (percentile_disc — a value from the
    data, no interpolation) first-to-last completion span in exact µs.

    Two groupBys on (user, type) then (user): shuffles on the user key
    only; the final frame is |milestones|+1 rows."""
    firsts = (events.filter(F.col(type_col).isin(*milestones))
              .groupBy(F.col(user_col).alias("u"),
                       F.col(type_col).alias("t"))
              .agg(F.min(F.unix_micros(F.col(ts_col))).alias("first_us")))
    per_m = (firsts.groupBy("t")
             .agg(F.count(F.lit(1)).alias("n_users"))
             .select(F.col("t").alias("milestone"), "n_users",
                     F.lit(None).cast("long").alias("p50_span_us")))
    per_u = (firsts.groupBy("u")
             .agg(F.count(F.lit(1)).alias("k"),
                  (F.max("first_us") - F.min("first_us")).alias("span")))
    done = (per_u.filter(F.col("k") == len(milestones))
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.expr("percentile_disc(0.5) WITHIN GROUP "
                        "(ORDER BY span)").cast("long")
                 .alias("p50_span_us"))
            .select(F.lit("ALL").alias("milestone"), "n_users",
                    "p50_span_us"))
    return per_m.unionByName(done)


def position_attribution(events: DataFrame, conversion: str,
                         channels: list[str],
                         user_col: str = "user_id",
                         ts_col: str = "ts",
                         type_col: str = "event_type",
                         tiebreak_col: str = "event_id") -> DataFrame:
    """Position-based (U-shaped) attribution at the user level: the
    channel touches STRICTLY BEFORE a user's first ``conversion`` split
    that conversion's 1 000 000 ppm of credit as 40% to the first
    touch, 40% to the last, and 20% evenly across the middles (integer
    DIV; single touch → 100%, two touches → 50/50, none → 'direct').
    Returns (channel, credit_ppm, n_users_touched) summed over
    converting users — the standard corrective to last-touch's
    recency bias.

    Shape: one per-user min-conversion aggregate, one (user-keyed)
    touch aggregate with struct-min/max picking first/last
    deterministically via the tiebreak, then a per-channel rollup —
    shuffles on the user key only."""
    conv = (events.filter(F.col(type_col) == conversion)
            .groupBy(F.col(user_col).alias("u"))
            .agg(F.min(F.struct(F.col(ts_col).alias("t"),
                                F.col(tiebreak_col).alias("k")))
                 .alias("__c")))
    touches = (events.filter(F.col(type_col).isin(*channels))
               .select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("ch"),
                       F.struct(F.col(ts_col).alias("t"),
                                F.col(tiebreak_col).alias("k"))
                       .alias("__e"))
               .join(conv, "u")
               .filter(F.col("__e") < F.col("__c")))
    per_user = (touches.groupBy("u")
                .agg(F.count(F.lit(1)).alias("m"),
                     F.min("__e").alias("__first"),
                     F.max("__e").alias("__last")))
    credited = (touches.join(per_user, "u")
                .withColumn("credit_ppm", F.expr(
                    "CASE WHEN m = 1 THEN 1000000L "
                    "WHEN __e = __first THEN "
                    "  CASE WHEN m = 2 THEN 500000L ELSE 400000L END "
                    "WHEN __e = __last THEN "
                    "  CASE WHEN m = 2 THEN 500000L ELSE 400000L END "
                    "ELSE 200000L DIV (m - 2) END"))
                .groupBy(F.col("ch").alias("channel"))
                .agg(F.sum("credit_ppm").cast("long").alias("credit_ppm"),
                     F.count_distinct("u").alias("n_users_touched")))
    direct = (conv.join(touches.select("u").distinct(), "u", "left_anti")
              .agg((F.count(F.lit(1)) * 1_000_000).cast("long")
                   .alias("credit_ppm"),
                   F.count(F.lit(1)).alias("n_users_touched"))
              .select(F.lit("direct").alias("channel"), "credit_ppm",
                      F.col("n_users_touched").cast("long")
                      .alias("n_users_touched"))
              .filter(F.col("n_users_touched") > 0))
    return (credited.select("channel", "credit_ppm",
                            F.col("n_users_touched").cast("long")
                            .alias("n_users_touched"))
            .unionByName(direct))
