"""Materialized-view catalog + aggregate-rewrite: answer a groupBy-agg
query FROM a pre-aggregated view instead of the base fact table.

This is the read-side twin of the incremental-maintenance queries
(`ivm_daily_event_rollup`, `ivm_join_delta_orders`): IVM keeps a rollup
cheap to REFRESH (join/aggregate only the delta); the rewriter here
makes it cheap to USE — a monthly-revenue question over a 100 TB fact
becomes a re-aggregation of the few-thousand-row daily rollup, because
SUM and COUNT are decomposable aggregates (sum-of-sums, sum-of-counts;
MIN/MAX likewise).  AVG is answered as SUM/COUNT by the caller.

The catalog is declarative and the coverage check is total:
`covers()` admits a rewrite only when every requested grouping column
is one of the MV's stored dimensions (optionally through a WHITELISTED
rollup derivation — month/year of a stored day dim: coarser groupings
of a stored dim are always answerable) and every requested measure is
stored with the SAME aggregate class.  `choose_mv()` picks the
smallest covering view.  Anything else falls back to the base table —
a wrong rewrite is a silent-corruption bug, so the check refuses
rather than guesses (see tests/test_mv.py for the rejection matrix).

MVs persist as manifest-versioned tables (`sinks/versioned.py`), so a
view carries its own version history/freshness and inherits the store's
object-store-portable I/O, optimistic-concurrency commits, and data
skipping; `refresh()` commits a new version (full rebuild here; the IVM
delta rule is how production refreshes the big ones).

Reference parity: beyond-reference capability (the reference has no
query engine); the pattern is public lakehouse practice (e.g. the
summary-table rewrites of Goldstein & Larson, "Optimizing queries using
materialized views", SIGMOD 2001 — dims-subset + decomposable-measure
matching is the textbook sufficient condition).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import versioned as V

# stored aggregate class -> the aggregate that re-combines partials
_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

# whitelisted dim derivations: coarser rollups of a stored dimension.
# identity is implicit; anything not listed is NOT coverable (e.g. you
# cannot ask for day-of-week from a month dim).
_DIM_FNS: dict[str, "callable"] = {
    "month": lambda c: F.date_trunc("month", F.col(c)).cast("date"),
    "year": lambda c: F.date_trunc("year", F.col(c)).cast("date"),
}


class MVRewriteError(ValueError):
    """The requested aggregate is not answerable from this view."""


@dataclass(frozen=True)
class MVSpec:
    """Declared shape of one materialized view.

    dims: stored grouping columns.
    measures: (agg_class, stored_alias) for each pre-aggregated column —
      agg_class ∈ {sum, count, min, max}; a count measure stores the
      group's row count (re-aggregated by SUM on rollup).
    rows_hint: approximate stored row count — `choose_mv` prefers the
      smallest covering view (the cost model: re-agg cost ∝ MV size).
    table_dir: versioned-table location once materialized ('' = not yet).
    """

    name: str
    dims: tuple[str, ...]
    measures: tuple[tuple[str, str], ...]
    rows_hint: int = 0
    table_dir: str = field(default="", compare=False)
    # optional declared dim types ("date", "string", ...) parallel to
    # ``dims`` — lets `covers` reject a month/year derivation on a
    # non-temporal dim statically; `rewrite_aggregate` enforces the same
    # rule against the view's ACTUAL schema either way
    dim_types: tuple[str, ...] = ()


def _parse_group(g: str | tuple[str, str, str]) -> tuple[str, str, str]:
    """Normalize a grouping request to (out_name, fn, stored_dim).

    Accepts a bare stored-dim name (identity) or an explicit
    (out_name, fn, stored_dim) triple with fn ∈ _DIM_FNS.
    """
    if isinstance(g, str):
        return (g, "identity", g)
    out, fn, dim = g
    if fn != "identity" and fn not in _DIM_FNS:
        raise MVRewriteError(f"unknown dim derivation {fn!r}")
    return (out, fn, dim)


def covers(mv: MVSpec, group_by: list, measures: list[tuple[str, str, str]]) -> bool:
    """True iff ``mv`` can answer groupBy(group_by).agg(measures)
    exactly: every grouping column is a stored dim (or a whitelisted
    rollup of one) and every (agg, src, out) measure is stored under
    ``src`` with the same aggregate class."""
    try:
        groups = [_parse_group(g) for g in group_by]
    except MVRewriteError:
        return False
    stored = {alias: agg for agg, alias in mv.measures}
    types = dict(zip(mv.dims, mv.dim_types)) if mv.dim_types else {}
    for _, fn, dim in groups:
        if dim not in mv.dims:
            return False
        # month/year only roll up temporal dims; with declared types we
        # can refuse statically (rewrite_aggregate re-checks the actual
        # schema regardless)
        if fn != "identity" and types and \
                types.get(dim) not in ("date", "timestamp"):
            return False
    return all(stored.get(src) == agg for agg, src, _ in measures)


def choose_mv(candidates: list[MVSpec], group_by: list,
              measures: list[tuple[str, str, str]]) -> MVSpec | None:
    """The smallest (rows_hint) candidate that covers the request, or
    None — the caller then runs against the base table."""
    fits = [mv for mv in candidates if covers(mv, group_by, measures)]
    return min(fits, key=lambda mv: mv.rows_hint) if fits else None


def rewrite_aggregate(mv_df: DataFrame, mv: MVSpec, group_by: list,
                      measures: list[tuple[str, str, str]]) -> DataFrame:
    """The rewritten plan: re-aggregate the (already partially
    aggregated) view.  Validates coverage again — rewrite is only ever
    correct under `covers`, so it refuses rather than returning a
    plausible wrong answer.

    measures: (agg, stored_alias, out_name) triples; sums/counts cast
    to long so the rewritten schema is layout-stable.

    Scale: the shuffle is on the MV's own (tiny) dim keys — the base
    fact is never touched; that's the entire point."""
    if not covers(mv, group_by, measures):
        raise MVRewriteError(
            f"view {mv.name!r} (dims={mv.dims}) cannot answer "
            f"group_by={group_by} measures={measures}")
    dtypes = dict(mv_df.dtypes)
    gcols: list[Column] = []
    for out, fn, dim in (_parse_group(g) for g in group_by):
        if fn != "identity" and \
                dtypes.get(dim) not in ("date", "timestamp"):
            # date_trunc on a non-temporal column yields NULL for every
            # row — all groups silently collapse into one; refuse
            raise MVRewriteError(
                f"derivation {fn!r} needs a date/timestamp dim; "
                f"{dim!r} is {dtypes.get(dim)!r} in view {mv.name!r}")
        col = F.col(dim) if fn == "identity" else _DIM_FNS[fn](dim)
        gcols.append(col.alias(out))
    aggs = []
    for agg, src, out in measures:
        a = _REAGG[agg](F.col(src))
        if agg in ("sum", "count"):
            a = a.cast("long")
        aggs.append(a.alias(out))
    return mv_df.groupBy(*gcols).agg(*aggs)


# surrogate merge key: the dim tuple as one string column, so the
# versioned store's single-key scoped MERGE can upsert view groups.
# \x1f (unit separator) never appears in the dim domains here; a general
# deployment would hash the tuple instead.
MV_KEY = "__mv_key"


def _with_key(df: DataFrame, mv: MVSpec) -> DataFrame:
    return df.withColumn(
        MV_KEY,
        F.concat_ws("\x1f", *[F.col(d).cast("string") for d in mv.dims]))


def refresh(build: DataFrame, table_dir: str,
            mv: MVSpec | None = None) -> int:
    """Commit a (re)build of the view as a new version of its versioned
    table and return the committed version — full rebuild, so the
    commit is a LOGICAL OVERWRITE (append mode would carry the previous
    rebuild's files into the new manifest and double every group —
    silent corruption; old versions remain readable via time travel
    until vacuum).  Pass ``mv`` to also store the surrogate dim key
    `refresh_incremental` merges on (harmless extra column for readers;
    the rewriter groups by dims and never selects it)."""
    if mv is not None:
        build = _with_key(build, mv)
    return V.write_snapshot(build, table_dir, mode="overwrite")


def refresh_incremental(spark: SparkSession, table_dir: str, mv: MVSpec,
                        delta_build: DataFrame) -> int:
    """IVM delta refresh of a stored view: ``delta_build`` is the SAME
    aggregate computed over ONLY the new base rows; stored partials and
    delta partials combine per dim group (sum/count add, min/max take
    least/greatest — the decomposability that makes the view
    maintainable without touching old base data), and the combined rows
    upsert through the versioned store's scoped MERGE — so a refresh
    rewrites O(touched files) of the view, never the view, and never
    the base table.  Groups the delta doesn't touch ride along
    untouched; groups new to the delta insert.

    This is `ivm_daily_event_rollup`'s delta rule composed with
    `merge_into_snapshot`'s scoped rewrite: the full IVM read/refresh
    loop, machine-checked end to end by `mv_incremental_refresh_daily`
    (incrementally-refreshed view ≡ full-rebuild oracle under the
    value hash)."""
    if not all(agg in _REAGG for agg, _ in mv.measures):
        raise MVRewriteError(f"non-decomposable measure in {mv.name!r}")
    on = list(mv.dims)
    cur = read(spark, table_dir)
    # only the touched groups join + merge; the touched-dims frame is
    # small by the premise of incremental refresh (it IS the delta)
    touched_cur = cur.join(
        F.broadcast(delta_build.select(*on).distinct()), on, "left_semi")
    updates = _with_key(_combine(touched_cur, delta_build, mv), mv)
    return V.merge_into_snapshot(spark, table_dir, updates, key=MV_KEY)


def _combine(cur: DataFrame, delta: DataFrame, mv: MVSpec) -> DataFrame:
    """Stored partials ⊕ delta partials per dim group (full-outer on the
    dims: sum/count add, min/max least/greatest — which skip NULLs, so a
    group present on one side only keeps its value)."""
    on = list(mv.dims)
    j = cur.alias("c").join(delta.alias("d"), on, "full_outer")
    combined = []
    for agg, alias in mv.measures:
        c, d = F.col(f"c.{alias}"), F.col(f"d.{alias}")
        if agg in ("sum", "count"):
            expr = (F.coalesce(c, F.lit(0)) + F.coalesce(d, F.lit(0))) \
                .cast("long")
        elif agg == "min":
            expr = F.least(c, d)
        else:
            expr = F.greatest(c, d)
        combined.append(expr.alias(alias))
    return j.select(*on, *combined)


def maintain_stream_batch(batch_df: DataFrame, batch_id: int,
                          table_dir: str, mv: MVSpec, delta_agg) -> bool:
    """Exactly-once STREAMING maintenance of a materialized view: the
    foreachBatch sink that keeps a rollup MV current as micro-batches
    arrive.  ``delta_agg(batch_df)`` computes the view's aggregate over
    just the batch; the result combines with the stored partials
    (`_combine` — the same delta rule `refresh_incremental` uses) and
    the whole new state commits through `commit_stream_batch`'s
    batch-id ledger, so Structured Streaming's crash-replay of a batch
    is detected and skipped — at-least-once delivery, exactly-once view
    contents (the `streaming/sketches.py` maintainer shape, applied to
    the MV layer).

    Use: ``stream.writeStream.foreachBatch(lambda df, bid:
    maintain_stream_batch(df, bid, table_dir, mv, delta_agg))``.

    Scale: state committed per batch is the ROLLUP (|dim groups| rows),
    not the stream; for views too large to rewrite per batch, route
    through `refresh_incremental`'s scoped MERGE extended with the
    ledger ids instead of the whole-state overwrite."""
    if int(batch_id) in V.committed_batch_ids(table_dir):
        return False               # replayed batch — contents already in
    delta = delta_agg(batch_df)
    if V.latest_version(table_dir) is None:
        combined = delta
    else:
        combined = _combine(read(batch_df.sparkSession, table_dir),
                            delta, mv)
    return V.commit_stream_batch(_with_key(combined, mv), batch_id,
                                 table_dir, mode="overwrite")


def read(spark: SparkSession, table_dir: str,
         version: int | None = None) -> DataFrame:
    """Read a view at a version (default: latest — the freshness the
    catalog vouches for is whatever version the last `refresh` wrote)."""
    return V.read_version(spark, table_dir, version=version)
