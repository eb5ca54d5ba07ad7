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
    N = only commits after version N.

Reference parity: beyond-reference (the reference has no streaming);
this closes the loop with `sinks/versioned.commit_stream_batch` — one
job streams INTO the table exactly-once, another streams OUT of it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)


@dataclass
class _FileSlice(InputPartition):
    path: str


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


class VTableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema=None):
        self._schema = schema          # StructType; fixes batch shape
        self._table_dir = options.get("path")
        if not self._table_dir:
            raise ValueError("vtable_stream needs .option('path', ...)")
        self._start = int(options.get("startingversion", "0"))
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true")

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from ..sinks.versioned import latest_version
        cur = latest_version(self._table_dir)
        # never move backwards past the configured start (e.g. an empty
        # table polls at the start offset until the first commit lands)
        return {"version": max(self._start, cur or 0)}

    # -- planning -----------------------------------------------------
    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
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

    # -- execution (executor-side) ------------------------------------
    def read(self, partition: _FileSlice):
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
        pass                       # checkpointing is the engine's job

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
        if stored is not None:
            # manifest-declared schema: widened columns advertise the
            # wide type; the reader's conform step casts narrow
            # old-file batches up at read
            return stored
        files = _manifest_files(table_dir, cur)
        return from_arrow_schema(_open_parquet(files[0]).schema_arrow)

    def streamReader(self, schema) -> VTableStreamReader:
        return VTableStreamReader(self.options, schema)


def register_vtable_stream(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(VTableStreamDataSource)
