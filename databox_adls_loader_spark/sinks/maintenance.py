"""Maintenance surface for versioned tables: a health advisor (what to
compact, what to cluster) and a token inverted index (file skipping for
text-search predicates, where min/max bounds can never prune).

Both read only MANIFEST metadata or dedicated index tables — neither
scans the data to give an answer, which is what makes them runnable
against a 100 TB table from a laptop.

Reference parity: beyond-reference capability; the techniques are public
lakehouse practice (small-file compaction advisors; inverted-file skip
indexes as in search-optimized table formats).
"""

from __future__ import annotations

import bisect

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import versioned as V


def _interval_overlap_fraction(bounds: list[tuple]) -> float:
    """Fraction of file PAIRS whose [min, max] ranges overlap — the
    clustering-quality number: 0.0 = perfectly disjoint files (every
    range predicate prunes to few files), → 1.0 = every file spans the
    whole key space (bounds prune nothing; cluster/Z-order first).
    Sweep over intervals sorted by min with a sorted list of active
    maxes — O(F log F), driver-side over file COUNT only."""
    n = len(bounds)
    if n < 2:
        return 0.0
    ivs = sorted(bounds)
    maxes: list = []                  # sorted maxes of files seen so far
    overlaps = 0
    for mn, mx in ivs:
        # pairs with an earlier file whose max >= this min
        overlaps += len(maxes) - bisect.bisect_left(maxes, mn)
        bisect.insort(maxes, mx)
    return overlaps / (n * (n - 1) / 2)


def table_health(table_dir: str, version: int | None = None,
                 small_file_rows: int = 10_000,
                 overlap_threshold: float = 0.2,
                 eq_entry_threshold: int = 8) -> dict:
    """Manifest-only health report for a versioned table: file count and
    row-count distribution, small-file fraction, and per-column
    clustering quality (bounds-overlap fraction) — the numbers that
    decide WHETHER to pay for `compact_snapshot` and WHICH column to
    cluster by, before touching a byte of data.

    recommendations:
      compact      — >half the files are below ``small_file_rows``
                     (the many-small-files read-amplification smell);
      cluster_by   — columns whose bounds overlap in more than
                     ``overlap_threshold`` of file pairs (their stats
                     can't prune; clustering makes them prunable),
                     best (least-overlapping) candidate first is NOT
                     chosen here — every offender is listed, the
                     caller picks by query workload;
      compact (merge-on-read debt) — more than ``eq_entry_threshold``
                     equality-delete ENTRIES outstanding: readers pay
                     one key-set union per distinct key column per
                     read (consolidated by `_eq_anti_all`), but the
                     tombstone files themselves accumulate until a
                     compaction materializes them."""
    v = V.latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    files = V._read_manifest(table_dir, v)
    stats = V._inherited_stats(table_dir, v)
    rows = [stats[f]["num_rows"] for f in files
            if stats.get(f, {}).get("num_rows") is not None]
    per_col: dict[str, list[tuple]] = {}
    for f in files:
        for col, c in stats.get(f, {}).get("columns", {}).items():
            # serialized manifests carry bounds as plain min/max keys
            # (the in-memory has_bounds flag is not persisted)
            if "min" in c and "max" in c:
                per_col.setdefault(col, []).append((c["min"], c["max"]))
    overlap = {col: round(_interval_overlap_fraction(b), 4)
               for col, b in per_col.items() if len(b) == len(files)}
    small = sum(1 for r in rows if r < small_file_rows)
    eq = V.table_eq_deletes(table_dir, v)
    dmap, _ = V.table_delete_map(table_dir, v)
    n_dv_files = len({d for ds in dmap.values() for d in ds})
    eq_debt = len(eq) > eq_entry_threshold
    # time-travel horizon: the oldest retained manifest's commit time
    # — `read_version(as_of=ts)` answers for any ts at/after it and
    # raises for anything earlier (vacuum(older_than=...) is how an
    # operator promises "any point in the last 7 days"); pre-field
    # manifests surface None (travel by VERSION still works)
    vs = V.versions(table_dir)
    horizon = (V._read_manifest_doc(table_dir, vs[0])
               .get("committed_at") if vs else None)
    latest_at = (V._read_manifest_doc(table_dir, vs[-1])
                 .get("committed_at") if vs else None)
    return {
        "version": v,
        "retained_versions": len(vs),
        "oldest_version": vs[0] if vs else None,
        "time_travel_horizon": horizon,
        "latest_committed_at": latest_at,
        "n_files": len(files),
        "total_rows": sum(rows) if rows else None,
        "min_file_rows": min(rows) if rows else None,
        "max_file_rows": max(rows) if rows else None,
        "small_files": small,
        "small_file_fraction": round(small / len(files), 4) if files else 0.0,
        "bounds_overlap": overlap,
        "n_eq_delete_entries": len(eq),
        "n_eq_delete_cols": len({e.get("col") for e in eq}),
        "n_position_delete_files": n_dv_files,
        "recommend_compact": (bool(files)
                              and small / len(files) > 0.5) or eq_debt,
        "recommend_cluster_by": sorted(
            c for c, o in overlap.items() if o > overlap_threshold),
    }


def index_drift_report(index_df: DataFrame, baseline_df: DataFrame,
                       floor_ppm: int = 150_000) -> DataFrame:
    """Operational drift TRIGGER for a maintained code index (PQ
    codebooks, IVF cell assignments — any (sub, code) table): the
    per-subspace total-variation distance, in exact integer ppm,
    between the LIVE code histogram and the BASELINE histogram
    published with the codebook generation.  One aggregation over the
    skinny code relation (16 bytes/vector — the table the PQ family
    exists to keep hot; the float corpus is never touched) against a
    k·m-row baseline, so the answer costs an index scan, not a corpus
    scan, however large the base table.

    This is the missing wire of the round-12 lifecycle: `table_health`
    says when to compact, this says when to RETRAIN — a maintained
    index whose frozen codebooks have drifted off the corpus
    distribution reports ``retrain_recommended`` instead of silently
    decaying recall until a human notices a contract query.  The
    baseline is written at build/publish time (the histogram of the
    freshly-encoded index) and republished with each codebook
    generation, so the stat is always "drift since the books were
    trained".

    Exact arithmetic: with ``nc``/``nb`` the live/baseline totals per
    subspace, ``tv_ppm = Σ_code |n_cur·nb − n_base·nc| · 1e6 //
    (2·nc·nb)`` — int64 end to end, so the DuckDB oracle derives the
    identical integers and the trigger rides a value hash.

    Returns one row per subspace: (sub, tv_ppm, retrain_recommended).
    A freshly-published generation reports tv_ppm = 0 everywhere
    (live ≡ baseline by construction) — the "stays quiet pre-drift"
    half of the contract."""
    cur = (index_df.groupBy("sub", "code")
           .agg(F.count(F.lit(1)).alias("n_cur")))
    base = (baseline_df.groupBy("sub", "code")
            .agg(F.sum("n").cast("long").alias("n_base")))
    j = (cur.join(base, ["sub", "code"], "full_outer")
         .select("sub", "code",
                 F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
                 F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base")))
    tot = (j.groupBy("sub")
           .agg(F.sum("n_cur").alias("nc"), F.sum("n_base").alias("nb")))
    return (j.join(tot, "sub")
            .groupBy("sub", "nc", "nb")
            .agg(F.expr("CAST(sum(abs(n_cur * nb - n_base * nc))"
                        " * 1000000L DIV (2 * nc * nb) AS LONG)")
                 .alias("tv_ppm"))
            .select("sub", "tv_ppm",
                    (F.col("tv_ppm") >= F.lit(int(floor_ppm)))
                    .alias("retrain_recommended")))


def code_baseline(index_df: DataFrame, gen: int) -> DataFrame:
    """The publish-time baseline histogram for `index_drift_report`:
    (gen, sub, code, n) of a freshly-(re)encoded code table — written
    beside the codebook generation in the SAME catalog transaction, so
    a pinned reader's drift question is always answered against the
    books it resolves codes with."""
    return (index_df.groupBy("sub", "code")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.lit(int(gen)).cast("int").alias("gen"),
                    "sub", "code", "n"))


def suggest_bucket_alignment(left_dir: str, right_dir: str,
                             left_key: str, right_key: str,
                             default_buckets: int = 32) -> dict:
    """Alignment advisor for a frequently-joined table pair: reports
    whether `bucket_aligned_join` would engage on (left_key,
    right_key) and, when it would not, the exact spec to declare —
    matching the partner's bucket count when one side already has a
    layout, ``bucket(default_buckets, key)`` on both when neither
    does.  A declared-then-compacted table re-buckets on the next
    OPTIMIZE; no data rewrite is demanded up front.

    This is `table_health`'s pair-level sibling: run it over the join
    graph's hottest edges and every "declare …" line is a join that
    currently pays two full exchanges but could pay zero (broadcast
    per bucket) or 1/N each (big-big sort-merge)."""
    gl = V.bucket_file_groups(left_dir, left_key)
    gr = V.bucket_file_groups(right_dir, right_key)
    out = {
        "aligned": False,
        "left_spec": f"bucket({gl[0]},{left_key})" if gl else None,
        "right_spec": f"bucket({gr[0]},{right_key})" if gr else None,
        "recommendations": [],
    }
    if gl is not None and gr is not None:
        if gl[0] == gr[0]:
            out["aligned"] = True
            return out
        # both bucketed, counts differ: re-declare the SMALLER table
        # (cheaper rewrite) to the larger's count — sized by BYTES, not
        # file count (a small-file-heavy but row-light table must not
        # be mistaken for the bigger rewrite)
        stl, str_ = V._st(left_dir), V._st(right_dir)
        nl = sum(stl.file_size(f) for fs in gl[1].values() for f in fs)
        nr = sum(str_.file_size(f) for fs in gr[1].values() for f in fs)
        tgt, key, n = ((left_dir, left_key, gr[0]) if nl <= nr
                       else (right_dir, right_key, gl[0]))
        out["recommendations"].append(
            f"declare bucket({n},{key}) on {tgt} and OPTIMIZE")
        return out
    n = gl[0] if gl is not None else (gr[0] if gr is not None
                                      else default_buckets)
    if gl is None:
        out["recommendations"].append(
            f"declare bucket({n},{left_key}) on {left_dir} and "
            "OPTIMIZE")
    if gr is None:
        out["recommendations"].append(
            f"declare bucket({n},{right_key}) on {right_dir} and "
            "OPTIMIZE")
    return out


def build_token_index(spark: SparkSession, table_dir: str, index_dir: str,
                      text_col: str = "text",
                      version: int | None = None) -> int:
    """Build (or rebuild) the token → data-file inverted index for a
    text column, committed as its own versioned table with rows
    ``(token, file, table_version)``.  min/max bounds can never prune a
    CONTAINS-token predicate (any file's text range spans the token
    space); an inverted file index prunes it exactly — the skip index
    behind `read_with_token`.

    Scale: the index job is one scan + per-file distinct-token explode
    (map-side) + a distinct — index size is Σ per-file vocabulary,
    orders below the corpus.  Rebuild cost after a commit is bounded by
    re-running over the NEW files only (an incremental form would union
    the old index with the delta's rows; kept whole-build here for the
    stale-detection contract's simplicity)."""
    from ..operators.text import bpe_ish_tokens

    v = V.latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    # index from a RAW single-relation file scan: `_metadata.file_path`
    # is per-relation and therefore reliable, where input_file_name()
    # over read_version's multi-source DV anti-join plan is not.  Rows
    # deleted merge-on-read still index their file — a SUPERSET index is
    # always safe for skipping (the read path applies the version's
    # delete map and the residual filter), never for missing a file.
    files = V._read_manifest(table_dir, v)
    cmap, dropped = V.table_column_map(table_dir, v)
    sch = V.table_schema(table_dir, v)
    rd = spark.read.schema(sch) if sch is not None \
        else spark.read.option("mergeSchema", "true")
    raw = (rd.parquet(*sorted(files))
           .withColumn("__file", F.col("_metadata.file_path")))
    df = V._apply_column_map(raw, cmap, dropped, keep=["__file"])
    inv = (df.select(F.col("__file").alias("file"),
                     F.explode(F.array_distinct(bpe_ish_tokens(text_col)))
                     .alias("token"))
           .distinct()
           .withColumn("table_version", F.lit(v)))
    return V.write_snapshot(inv, index_dir, mode="overwrite")


def read_with_token(spark: SparkSession, table_dir: str, index_dir: str,
                    token: str, text_col: str = "text") -> DataFrame:
    """Token-predicate read through the inverted index: list exactly the
    data files whose vocabulary contains ``token`` (index lookup —
    bounded by file count, no data pages), read only those, and STILL
    apply the residual row filter, so results never depend on index
    precision.  A stale index (table committed past the indexed
    version) falls back to the always-correct full scan — correctness
    never rides on maintenance having kept up.  An up-to-date index
    with no entry proves NO file contains the token: an empty frame
    with the full schema, zero data pages read."""
    from ..operators.text import bpe_ish_tokens

    residual = F.array_contains(bpe_ish_tokens(text_col), token)
    cur = V.latest_version(table_dir)
    try:
        idx = V.read_version(spark, index_dir)
        meta = idx.agg(F.max("table_version").alias("iv")).collect()[0]
        fresh = meta["iv"] == cur
        files = [r["file"] for r in
                 idx.filter(F.col("token") == token)
                 .select("file").distinct().collect()] if fresh else []
    except FileNotFoundError:
        fresh = False
        files = []
    if not fresh:
        return V.read_version(spark, table_dir, cur).filter(residual)
    if not files:
        # full schema, provably-zero rows, no data pages
        return (V.read_version(spark, table_dir, cur)
                .filter(F.lit(False)).filter(residual))
    # read the selected files THROUGH the version's merge-on-read state:
    # the raw-parquet shortcut would resurrect DV-deleted rows (the
    # residual token filter can't remove them) and surface renamed
    # columns under physical names.  Index entries are `_metadata` URIs;
    # map them back onto manifest paths — any miss means the index and
    # manifest disagree on spelling, so take the always-correct fallback.
    st = V._st(table_dir, spark)
    manifest = V._read_manifest(table_dir, cur)
    by_canon = {st.canon(f): f for f in manifest}
    sel = sorted({by_canon[u] for u in (st.uri_canon(x) for x in files)
                  if u in by_canon})
    if len(sel) != len({st.uri_canon(x) for x in files}):
        return V.read_version(spark, table_dir, cur).filter(residual)
    dmap, _ = V.table_delete_map(table_dir, cur)
    df = V._read_files(spark, sel, dmap,
                       schema=V.table_schema(table_dir, cur),
                       eq=V.table_eq_deletes(table_dir, cur))
    df = V._apply_column_map(df, *V.table_column_map(table_dir, cur))
    return df.filter(residual)
