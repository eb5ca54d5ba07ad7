"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row, attach the latest right row with the same key and
``right_ts <= left_ts``.  The naive formulation is a range join
(`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark plans as a
broadcast-nested-loop or an exploding theta join — O(n·m) per key.

Spark-first formulation: UNION the two sides, window per key ordered by
(ts, side) with ``last(right_payload, ignorenulls)`` over the preceding
frame, keep left rows.  One shuffle per side on the key, linear work,
no range explosion — survives 100 TB where the range join dies.
Right-at-equal-ts sorts before left (side 0 < 1) so the match is
inclusive, matching DuckDB's ASOF JOIN (the oracle for
`asof_latest_purchase` in plans/queries_tpch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before its timestamp (same key).  Right payload columns come back
    null-filled when no match exists (or the match is older than
    ``tolerance_seconds``, if given).

    The right payload travels as ONE struct so the carried match is always
    a single atomic right row — per-column carries would back-fill a NULL
    field of the matched row from an older row (franken-row bug)."""
    rpayload = [c for c in right.columns if c not in (key, right_ts)]
    rtypes = dict(right.dtypes)
    r_struct_type = ("struct<" + ",".join(
        [f"{c}:{rtypes[c]}" for c in rpayload] + [f"__rts:{rtypes[right_ts]}"])
        + ">")
    l_cols = [c for c in left.columns if c not in (key, left_ts)]
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        F.struct(*[F.col(c) for c in rpayload],
                 F.col(right_ts).alias("__rts")).alias("__r"),
    )
    w = (Window.partitionBy(key).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__m"))
    out = carried.filter(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance_seconds is not None:
        # exact MICROSECOND arithmetic (cast-to-long truncates to whole
        # seconds, which silently widens the horizon by up to 1 s and
        # diverges from interval semantics on sub-second timestamps)
        stale = (F.unix_micros(F.col("__ts"))
                 - F.unix_micros(F.col("__m.__rts"))
                 > tolerance_seconds * 1_000_000)
        match = F.when(stale, F.lit(None).cast(r_struct_type)) \
            .otherwise(F.col("__m"))
        out = out.withColumn("__m", match)
    return out.select(
        F.col(key),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in l_cols],
        *[F.col(f"__m.{c}").alias(f"right_{c}") for c in rpayload],
        F.col("__m.__rts").alias(f"right_{right_ts}"),
    )


def asof_forward_join(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str = "ts", right_ts: str = "ts",
                      tolerance_seconds: int | None = None) -> DataFrame:
    """Forward as-of join: every left row, plus the EARLIEST right row
    at or after its timestamp (same key) — the "next event" direction
    (next purchase after a click, next reading after a fault), with an
    optional ``tolerance_seconds`` horizon beyond which the match
    null-fills.

    Same union + keyed-window formulation as `asof_join`, mirrored: the
    carried value is ``first(right_payload, ignorenulls)`` over the
    FOLLOWING frame, ordered by (ts, side) with left side 0 < right 1 so
    a right row at the exact left timestamp is inside the frame
    (inclusive match, DuckDB ``ASOF ... ON r.ts >= l.ts`` semantics).
    One shuffle per side on the key, linear — never a range join."""
    rpayload = [c for c in right.columns if c not in (key, right_ts)]
    rtypes = dict(right.dtypes)
    r_struct_type = ("struct<" + ",".join(
        [f"{c}:{rtypes[c]}" for c in rpayload] + [f"__rts:{rtypes[right_ts]}"])
        + ">")
    l_cols = [c for c in left.columns if c not in (key, left_ts)]
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        F.struct(*[F.col(c) for c in rpayload],
                 F.col(right_ts).alias("__rts")).alias("__r"),
    )
    w = (Window.partitionBy(key).orderBy("__ts", "__side")
         .rowsBetween(0, Window.unboundedFollowing))
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.first("__r", ignorenulls=True).over(w).alias("__m"))
    out = carried.filter(F.col("__side") == 0)
    if tolerance_seconds is not None:
        # exact microseconds — see asof_join's tolerance note
        stale = (F.unix_micros(F.col("__m.__rts"))
                 - F.unix_micros(F.col("__ts"))
                 > tolerance_seconds * 1_000_000)
        out = out.withColumn(
            "__m", F.when(stale, F.lit(None).cast(r_struct_type))
                    .otherwise(F.col("__m")))
    return out.select(
        F.col(key),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in l_cols],
        *[F.col(f"__m.{c}").alias(f"right_{c}") for c in rpayload],
        F.col("__m.__rts").alias(f"right_{right_ts}"),
    )


def asof_nearest_join(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str = "ts", right_ts: str = "ts",
                      tolerance_seconds: int | None = None) -> DataFrame:
    """NEAREST as-of join: every left row, plus the right row closest in
    time in EITHER direction (same key), ties to the earlier (backward)
    match — sensor-alignment semantics (pandas merge_asof
    direction='nearest'), where the backward and forward forms are the
    attribution semantics.

    Composition of the two one-direction operators (each one shuffle per
    side, keyed windows): both candidate matches join back on the full
    left row, and ONE side is chosen per row — every right_* column
    switches on the same condition, so the match stays an atomic right
    row (no franken-rows mixing directions).  ``direction`` reports
    which side won ('backward'/'forward', NULL on no match).

    Contract: left rows must be unique on their full column set (give
    rows an id — the event tables' shape); distances compare as
    whole-second longs, ties → backward."""
    b = asof_join(left, right, key, left_ts, right_ts, tolerance_seconds)
    f = asof_forward_join(left, right, key, left_ts, right_ts,
                          tolerance_seconds)
    lcols = left.columns
    rcols = [c for c in b.columns if c not in lcols]
    rts = f"right_{right_ts}"
    f2 = f.select(*lcols, *[F.col(c).alias(f"__f_{c}") for c in rcols])
    # NULL-SAFE re-join on the left row: plain equi-join equality is
    # null-rejecting, so a left row with a NULL payload column would
    # silently vanish — violating the family's every-left-row contract
    bb, ff = b.alias("__b"), f2.alias("__f")
    cond = None
    for c in lcols:
        e = F.col(f"__b.{c}").eqNullSafe(F.col(f"__f.{c}"))
        cond = e if cond is None else cond & e
    j = bb.join(ff, cond).select(
        *[F.col(f"__b.{c}") for c in lcols],
        *[F.col(f"__b.{c}") for c in rcols],
        *[F.col(f"__f.__f_{c}") for c in rcols])
    # exact microsecond distances — truncated-second compares let the
    # wrong side win within a 1 s band (and diverge from the oracle's
    # interval comparison on sub-second data)
    dt_b = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(rts))
    dt_f = F.unix_micros(F.col(f"__f_{rts}")) - F.unix_micros(F.col(left_ts))
    use_b = F.col(rts).isNotNull() & (
        F.col(f"__f_{rts}").isNull() | (dt_b <= dt_f))
    picked = [F.when(use_b, F.col(c)).otherwise(F.col(f"__f_{c}"))
              .alias(c) for c in rcols]
    direction = (F.when(use_b, F.lit("backward"))
                 .when(F.col(f"__f_{rts}").isNotNull(), F.lit("forward"))
                 .otherwise(F.lit(None).cast("string")))
    return j.select(*lcols, *picked, direction.alias("direction"))


def scd2_intervals(updates: DataFrame, key: str, ts_col: str,
                   attrs: list[str],
                   tiebreak_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history from an update stream:
    collapse each key's ordered attribute updates into validity
    intervals — (key, attrs..., valid_from, valid_to) with half-open
    [valid_from, valid_to) semantics and ``valid_to`` NULL on the
    current version.  Consecutive updates with IDENTICAL attributes are
    no-ops and do NOT open a new version (the dedup that keeps a chatty
    upstream from exploding dimension history).

    Pair with `asof_join` on ``valid_from`` (or a BETWEEN filter on the
    intervals) to resolve facts against the dimension version in force
    at fact time — the standard warehouse temporal-join pair.

    Per-key windows only: change detection is a lag over the key
    partition, interval close a lead over the surviving rows."""
    order = [F.col(ts_col)] + \
        ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(a).eqNullSafe(F.lag(a).over(w))
    changed = (updates
               .withColumn("__keep",
                           F.lag(ts_col).over(w).isNull() | ~same)
               .filter(F.col("__keep")))
    w2 = Window.partitionBy(key).orderBy(*order)
    return (changed
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w2))
            .select(key, *attrs, "valid_from", "valid_to"))
