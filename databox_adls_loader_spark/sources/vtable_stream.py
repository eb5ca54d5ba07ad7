"""Structured Streaming SOURCE over a manifest-versioned table — the
"table as an append log" consumption shape (public technique: the
Delta/Iceberg streaming-source contract): a consumer tails the table's
commit history, each micro-batch covering the data files APPENDED
between two versions, with offsets = version numbers so a restart
resumes exactly where the checkpoint left off.

    spark.dataSource.register(VTableStreamDataSource)
    (spark.readStream.format("vtable_stream")
          .option("path", table_dir).load()
          .writeStream...)

Semantics and scale:
  * offsets are MANIFEST VERSIONS — `latestOffset` is one tiny JSON
    read; nothing scans data to discover progress;
  * a batch's partitions are the files in manifest(end) that are not in
    manifest(start): one InputPartition per parquet file, read
    EXECUTOR-side via pyarrow and yielded as Arrow RecordBatches (the
    Python DSv2 fast path — no per-row Python);
  * append-only contract: a rewrite commit (compaction, merge,
    overwrite) removes files from the manifest; the source detects that
    (files(start) ⊄ files(end)) and raises rather than silently
    re-emitting rewritten rows.  ``.option("ignorechanges", "true")``
    opts into Delta-style ignoreChanges (new files only, rewritten rows
    may be re-delivered);
  * the stream surfaces the files' PHYSICAL schema; merge-on-read
    delete vectors and column-mapping renames are READ-side overlays
    (`sinks/versioned.read_version`) and do not rewrite history — an
    append-log consumer sees rows as they were committed;
  * ``startingversion`` (default 0) skips history: 0 = everything,
    N = only commits after version N;
  * ``maxversionspertrigger`` (default 0 = unlimited) rate-limits a
    RUNNING stream: once the first micro-batch establishes the
    position, each later batch advances at most K commits — so a burst
    of upstream commits drains in bounded bites instead of one giant
    batch.  The FIRST batch of any run is uncapped (Python DSv2 has no
    engine ReadLimit hook, and the engine asks for the latest offset
    before telling the source where the checkpoint stands — capping
    blind would regress offsets).  Starting a NEW consumer against
    deep history is ``startingversion``'s job, not this cap's.

CHANGE-FEED MODE — ``.option("readchangefeed", "true")`` switches the
stream from the append-log view to a row-level CHANGE stream (the
Delta `readChangeFeed` / Iceberg changelog-scan consumption shape):
each micro-batch emits the rows that changed in the covered commits,
tagged ``_change_type`` ∈ {insert, delete} + ``_commit_version`` +
``_commit_timestamp``, under the table's LOGICAL schema (renames/drops
applied).  Per commit:

  * APPENDED files → their rows as ``insert`` (MOR overlays attached
    to the file only by LATER commits are later delete events, so the
    file is emitted whole);
  * new POSITION-DELETE overlays / EQUALITY tombstones → the newly-dead
    rows of the affected files as ``delete`` (old image), rows already
    dead before the commit excluded — so a second delete never re-emits;
  * a merge-on-read UPDATE commit (DV + append) therefore streams as
    delete(old) + insert(new) — the unpacked CDF convention;
  * a REWRITE commit (compaction / copy-on-write MERGE, i.e. the
    manifest REMOVED files) is refused: its row-level delta needs a key
    join across commits, which is the batch
    `sinks.versioned.changes_between(incremental=True)` job, not a
    per-file stream task.  ``ignorechanges=true`` skips such commits
    (data-neutral compactions stream through; actual rewrites are
    silently dropped — same hazard contract as Delta's flag).

Everything stays out of per-row Python: the planner ships each task a
file plus its overlay deltas; executors read Arrow batches and compute
the newly-dead mask with numpy run-membership (position runs) and
`pyarrow.compute.is_in` (equality keys).

Reference parity: beyond-reference (the reference has no streaming);
this closes the loop with `sinks/versioned.commit_stream_batch` — one
job streams INTO the table exactly-once, another streams OUT of it,
and with `sinks/cdc.apply_cdc_batch` the pair forms a CDC-in →
CDF-out incremental pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)


@dataclass
class _FileSlice(InputPartition):
    path: str


@dataclass
class _InsertSlice(InputPartition):
    """CDF task: every row of an appended file is an ``insert``."""
    path: str
    version: int
    cmap: tuple = ()                 # ((physical, logical), ...)
    dropped: tuple = ()
    ts_us: int = 0                   # commit time, epoch microseconds


@dataclass
class _DeleteSlice(InputPartition):
    """CDF task: the rows of ``path`` newly killed by this commit's
    overlay deltas (minus rows already dead before it)."""
    path: str
    version: int
    cmap: tuple = ()
    dropped: tuple = ()
    ts_us: int = 0                   # commit time, epoch microseconds
    prior_dv: tuple = ()             # DV parquet paths applying before
    delta_dv: tuple = ()             # DV parquet paths added by commit
    prior_eq: tuple = ()             # ((phys col, (tombstone files)), ..)
    delta_eq: tuple = ()


def _open_parquet(path: str):
    """Open a manifest data-file path as a `pyarrow.parquet.ParquetFile`
    on ANY scheme — bare/`file:` paths open locally, everything else
    resolves through `pyarrow.fs` (`sinks/storage.arrow_fs_for`).
    Executors and DSv2 workers have no JVM gateway, so the Hadoop seam
    is unavailable here; pyarrow.fs is its JVM-free twin."""
    import pyarrow.parquet as pq

    from ..sinks.storage import arrow_fs_for

    filesystem, fs_path = arrow_fs_for(path)
    return pq.ParquetFile(filesystem.open_input_file(fs_path))


def _manifest_files(table_dir: str, version: int) -> list[str]:
    if version <= 0:
        return []
    from ..sinks.versioned import _read_manifest
    return _read_manifest(table_dir, version)


def _iso_to_us(raw: str | None) -> int:
    """Manifest ``committed_at`` ISO string → epoch microseconds (0 for
    manifests predating the field)."""
    if not raw:
        return 0
    import datetime

    at = datetime.datetime.fromisoformat(raw)
    if at.tzinfo is None:
        at = at.replace(tzinfo=datetime.timezone.utc)
    return int(at.timestamp() * 1_000_000)


# -- executor-side CDF mask helpers (no SparkSession, no per-row Python)


def _dv_runs_for(dv_paths, data_path):
    """Delete runs in ``dv_paths`` targeting ``data_path`` →
    ``(starts, lens)`` int64 numpy arrays sorted by start.  DV files are
    O(runs) on disk (run-length encoding) so reading them whole is the
    bounded part; legacy position-list rows count as runs of length 1.
    Spellings differ between scan-reported ``__file`` URIs and manifest
    keys — `storage.path_key` is the one comparison key (the round-7
    row-lineage lesson, applied here from day one)."""
    import numpy as np

    from ..sinks.storage import path_key

    want = path_key(data_path)
    starts: list[int] = []
    lens: list[int] = []
    for p in dv_paths:
        t = _open_parquet(p).read()
        names = set(t.schema.names)
        files = t.column("__file").to_pylist()
        st_col = t.column("__start").to_pylist() if "__start" in names \
            else [None] * len(files)
        ln_col = t.column("__len").to_pylist() if "__len" in names \
            else [None] * len(files)
        pos_col = t.column("__pos").to_pylist() if "__pos" in names \
            else [None] * len(files)
        for f, s, n, pos in zip(files, st_col, ln_col, pos_col):
            if path_key(f) != want:
                continue
            if s is not None:
                starts.append(int(s))
                lens.append(int(n))
            elif pos is not None:
                starts.append(int(pos))
                lens.append(1)
    if not starts:
        return (np.empty(0, dtype="int64"), np.empty(0, dtype="int64"))
    order = np.argsort(np.asarray(starts, dtype="int64"))
    return (np.asarray(starts, dtype="int64")[order],
            np.asarray(lens, dtype="int64")[order])


def _run_member(starts, lens, pos):
    """Vectorized membership of positions in disjoint runs.  Deletes
    only ever target LIVE rows (`_scan_live_meta` enforces it at commit
    time), so runs across commits never overlap and nearest-left lookup
    is exact."""
    import numpy as np

    if starts.size == 0:
        return np.zeros(pos.shape, dtype=bool)
    idx = np.searchsorted(starts, pos, side="right") - 1
    ok = idx >= 0
    idx = np.clip(idx, 0, None)
    return ok & (pos < starts[idx] + lens[idx])


def _eq_hit(batch, eq_sets):
    """Boolean numpy mask of batch rows whose key column value appears
    in any (column, value-set) equality tombstone pair."""
    import numpy as np
    import pyarrow.compute as pc

    mask = np.zeros(batch.num_rows, dtype=bool)
    for col, vals in eq_sets:
        if col not in batch.schema.names:
            continue
        c = batch.column(col)
        if vals.type != c.type:
            vals = vals.cast(c.type)
        hit = pc.is_in(c, value_set=vals)
        mask |= hit.fill_null(False).to_numpy(zero_copy_only=False)
    return mask


def _read_eq_values(files):
    """Tombstone key values (the ``__val`` column) as one Arrow array."""
    import pyarrow as pa

    chunks = []
    for p in sorted(files):
        chunks.append(_open_parquet(p).read().column("__val"))
    return pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in chunks]) if chunks else pa.array([])


class VTableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema=None):
        self._schema = schema          # StructType; fixes batch shape
        self._table_dir = options.get("path")
        if not self._table_dir:
            raise ValueError("vtable_stream needs .option('path', ...)")
        self._start = int(options.get("startingversion", "0"))
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true")
        self._cdf = (
            str(options.get("readchangefeed", "false")).lower() == "true")
        # burst rate limit (Delta's maxFilesPerTrigger, by VERSION):
        # after the first batch of a run establishes the position
        # (partitions/commit callbacks), each later batch advances at
        # most K commits.  The first batch is structurally uncappable:
        # the engine calls latestOffset BEFORE initialOffset and never
        # passes the checkpoint, so a blind cap could return an offset
        # BEHIND the checkpoint and regress it (verified call order on
        # PySpark 4.1.2).
        self._max_versions = int(options.get("maxversionspertrigger",
                                             "0"))
        self._seen: int | None = None

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        self._seen = self._start
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from ..sinks.versioned import latest_version
        cur = latest_version(self._table_dir)
        # never move backwards past the configured start (e.g. an empty
        # table polls at the start offset until the first commit lands)
        end = max(self._start, cur or 0)
        if self._max_versions > 0 and self._seen is not None:
            end = min(end, self._seen + self._max_versions)
        return {"version": end}

    # -- planning -----------------------------------------------------
    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        self._seen = max(self._seen or 0, v1)   # rate-limit high-water
        if self._cdf:
            return self._cdf_partitions(v0, v1)
        old = set(_manifest_files(self._table_dir, v0))
        new = _manifest_files(self._table_dir, v1)
        removed = old - set(new)
        if removed and not self._ignore_changes:
            raise ValueError(
                f"vtable_stream: versions {v0}->{v1} of "
                f"{self._table_dir} removed {len(removed)} file(s) — a "
                "rewrite commit (compaction/merge/overwrite) broke the "
                "append-only contract.  Restart from the current "
                "version, or .option('ignorechanges','true') to accept "
                "possible re-delivery of rewritten rows.")
        # equality deletes are RETROACTIVE row mutations on files this
        # stream may already have emitted — an append-only tail cannot
        # represent them, and skipping the commit silently would be the
        # Delta `ignoreChanges` hazard in its worst form (rows the
        # downstream consumed are now logically dead upstream).  Same
        # opt-out as rewrites.
        from ..sinks.versioned import table_eq_deletes
        eq0 = {tuple(sorted(e.get("files", [])))
               for e in (table_eq_deletes(self._table_dir, v0)
                         if v0 > 0 else [])}
        eq1 = {tuple(sorted(e.get("files", [])))
               for e in (table_eq_deletes(self._table_dir, v1)
                         if v1 > 0 else [])}
        if (eq1 - eq0) and not self._ignore_changes:
            raise ValueError(
                f"vtable_stream: versions {v0}->{v1} of "
                f"{self._table_dir} added {len(eq1 - eq0)} equality-"
                "delete commit(s) — retroactive deletes break the "
                "append-only contract.  Restart from the current "
                "version, or .option('ignorechanges','true') to keep "
                "tailing appends only (already-emitted rows are NOT "
                "retracted).")
        appended = [f for f in new if f not in old]
        # an empty batch still needs zero partitions, not an error
        return [_FileSlice(p) for p in sorted(appended)]

    def _cdf_partitions(self, v0: int, v1: int):
        """One planning pass PER COMMIT in (v0, v1] so every emitted row
        carries its true ``_commit_version`` — manifest JSON reads only,
        no data I/O on the driver."""
        from ..sinks.versioned import (_eq_entry_key, _read_manifest_doc,
                                       table_column_map, table_delete_map,
                                       table_eq_deletes)
        out: list[InputPartition] = []
        # renames are metadata-only (physical file columns never change),
        # so history replays under the WINDOW-END logical names — the
        # Delta-CDF convention; the executor keeps the physical spelling
        # as a conform fallback so a rename landing mid-stream (after
        # the advertised schema froze) keeps serving values under the
        # name the consumer subscribed to
        cmap, dropped = table_column_map(self._table_dir, v1) \
            if v1 > 0 else ({}, [])
        cmap_t = tuple(sorted(cmap.items()))
        drop_t = tuple(sorted(dropped))
        for v in range(max(v0, 0) + 1, v1 + 1):
            prev = _manifest_files(self._table_dir, v - 1)
            cur = _manifest_files(self._table_dir, v)
            removed = set(prev) - set(cur)
            if removed:
                if self._ignore_changes:
                    continue         # rewrite commit skipped, documented
                raise ValueError(
                    f"vtable_stream[cdf]: version {v} of "
                    f"{self._table_dir} removed {len(removed)} file(s) — "
                    "a rewrite commit's row-level delta needs a key join "
                    "across commits; use changes_between(..., "
                    "incremental=True) for that window, or "
                    ".option('ignorechanges','true') to skip rewrite "
                    "commits entirely.")
            ts_us = _iso_to_us(
                _read_manifest_doc(self._table_dir, v)
                .get("committed_at"))
            prev_set = set(prev)
            for f in sorted(f for f in cur if f not in prev_set):
                out.append(_InsertSlice(f, v, cmap_t, drop_t, ts_us))
            dm_prev, _ = table_delete_map(self._table_dir, v - 1) \
                if v > 1 else ({}, {})
            dm_cur, _ = table_delete_map(self._table_dir, v)
            eq_prev = table_eq_deletes(self._table_dir, v - 1) \
                if v > 1 else []
            eq_cur = table_eq_deletes(self._table_dir, v)
            seen = {_eq_entry_key(e) for e in eq_prev}
            delta_eq = [e for e in eq_cur if _eq_entry_key(e) not in seen]
            for f in prev:
                d_dv = tuple(d for d in dm_cur.get(f, [])
                             if d not in set(dm_prev.get(f, [])))
                d_eq = tuple((e["col"], tuple(sorted(e["files"])))
                             for e in delta_eq
                             if f in e.get("applies_to", []))
                if not d_dv and not d_eq:
                    continue
                p_eq = tuple((e["col"], tuple(sorted(e["files"])))
                             for e in eq_prev
                             if f in e.get("applies_to", []))
                out.append(_DeleteSlice(
                    f, v, cmap_t, drop_t, ts_us,
                    prior_dv=tuple(dm_prev.get(f, [])), delta_dv=d_dv,
                    prior_eq=p_eq, delta_eq=d_eq))
        return out

    # -- execution (executor-side) ------------------------------------
    def read(self, partition):
        if isinstance(partition, (_InsertSlice, _DeleteSlice)):
            yield from self._read_cdf(partition)
            return
        yield from self._read_append(partition)

    def _read_cdf(self, part):
        """Arrow batches of the slice's change rows, conformed to the
        advertised CDF schema (logical names + _change_type +
        _commit_version).  Masks are numpy/pyarrow-vectorized."""
        import numpy as np
        import pyarrow as pa

        if self._schema is None:
            # the engine always hands DataSourceStreamReader the
            # advertised schema; a None here means the reader was
            # constructed outside the engine path — fail loudly rather
            # than TypeError-ing on `for fld in None` executor-side
            raise RuntimeError(
                "vtable_stream CDF read requires the advertised stream "
                "schema; reader was constructed without one")
        from pyspark.sql.pandas.types import to_arrow_schema
        target = to_arrow_schema(self._schema)
        change = ("insert" if isinstance(part, _InsertSlice)
                  else "delete")
        prior_dv = delta_dv = prior_eq = delta_eq = None
        if change == "delete":
            prior_dv = _dv_runs_for(part.prior_dv, part.path)
            delta_dv = _dv_runs_for(part.delta_dv, part.path)
            prior_eq = [(c, _read_eq_values(fs)) for c, fs in part.prior_eq]
            delta_eq = [(c, _read_eq_values(fs)) for c, fs in part.delta_eq]
        cmap = dict(part.cmap)
        dropped = set(part.dropped)
        f = _open_parquet(part.path)
        off = 0
        for batch in f.iter_batches():
            n = batch.num_rows
            if change == "delete":
                pos = np.arange(off, off + n, dtype="int64")
                newly = (_run_member(*delta_dv, pos)
                         | _eq_hit(batch, delta_eq))
                dead = (_run_member(*prior_dv, pos)
                        | _eq_hit(batch, prior_eq))
                keep = newly & ~dead
                off += n
                if not keep.any():
                    continue
                batch = batch.filter(pa.array(keep))
                n = batch.num_rows
            # physical -> logical names; dropped columns vanish; the
            # physical spelling stays as a fallback key so a schema
            # advertised BEFORE a mid-stream rename still finds values
            cols = {}
            for nm in batch.schema.names:
                if nm in dropped:
                    continue
                cols[cmap.get(nm, nm)] = batch.column(nm)
            for nm in batch.schema.names:
                if nm not in dropped:
                    cols.setdefault(nm, batch.column(nm))
            arrays = []
            for fld in target:
                if fld.name == "_change_type":
                    arrays.append(pa.repeat(
                        pa.scalar(change, type=fld.type), n))
                elif fld.name == "_commit_version":
                    arrays.append(pa.repeat(
                        pa.scalar(part.version, type=fld.type), n))
                elif fld.name == "_commit_timestamp":
                    import numpy as np
                    arrays.append(pa.array(
                        np.full(n, part.ts_us, dtype="int64"))
                        .cast(fld.type))
                elif fld.name in cols:
                    arrays.append(cols[fld.name].cast(fld.type))
                else:
                    arrays.append(pa.nulls(n, fld.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)

    def _read_append(self, partition: _FileSlice):
        import pyarrow as pa

        # arrow batches straight through — no per-row Python.  Batches
        # are conformed to the schema the driver advertised at stream
        # start, so files written before/after an ADD COLUMN evolution
        # still fit the fixed stream schema (missing -> nulls, extras
        # dropped).
        target = None
        if self._schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema
            target = to_arrow_schema(self._schema)
        f = _open_parquet(partition.path)
        for batch in f.iter_batches():
            if target is not None and batch.schema != target:
                names = set(batch.schema.names)
                arrays = [
                    batch.column(fld.name).cast(fld.type)
                    if fld.name in names
                    else pa.nulls(batch.num_rows, fld.type)
                    for fld in target]
                batch = pa.RecordBatch.from_arrays(arrays, schema=target)
            yield batch

    def commit(self, end: dict) -> None:
        # checkpointing is the engine's job; only the rate-limit
        # high-water mark advances here
        self._seen = max(self._seen or 0, int(end["version"]))

    def stop(self) -> None:
        pass


class VTableStreamDataSource(DataSource):
    """`spark.readStream.format("vtable_stream")` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "vtable_stream"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("vtable_stream needs .option('path', ...)")
        from ..sinks.versioned import latest_version
        cur = latest_version(table_dir)
        if cur is None:
            raise ValueError(
                f"vtable_stream: no snapshots in {table_dir} — commit "
                "one first (the schema comes from the table's files)")
        from ..sinks.versioned import table_schema
        stored = table_schema(table_dir, cur)
        if stored is None:
            files = _manifest_files(table_dir, cur)
            stored = from_arrow_schema(_open_parquet(files[0]).schema_arrow)
        if str(self.options.get("readchangefeed", "false")
               ).lower() != "true":
            # manifest-declared schema: widened columns advertise the
            # wide type; the reader's conform step casts narrow
            # old-file batches up at read
            return stored
        # CDF mode surfaces the LOGICAL view (renames applied, dropped
        # columns gone) + the change-tracking columns — what a
        # downstream incremental consumer keys on
        from pyspark.sql import types as T

        from ..sinks.versioned import table_column_map
        cmap, dropped = table_column_map(table_dir, cur)
        fields = [T.StructField(cmap.get(f.name, f.name), f.dataType, True)
                  for f in stored.fields if f.name not in dropped]
        return T.StructType(fields + [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_commit_version", T.LongType(), True),
            T.StructField("_commit_timestamp", T.TimestampType(), True)])

    def streamReader(self, schema) -> VTableStreamReader:
        return VTableStreamReader(self.options, schema)


def register_vtable_stream(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(VTableStreamDataSource)
