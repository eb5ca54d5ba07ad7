"""DSv2 BATCH reader over a manifest-versioned table —
``spark.read.format("vtable").option("path", dir).load()`` wrapping the
full read contract of `sinks/versioned.read_version` (manifest pinning,
stats/Bloom file pruning, merge-on-read delete vectors, column-mapping
renames/drops) behind Spark's own reader interface, so the table
composes with arbitrary downstream DataFrame/SQL code without importing
this library:

    from databox_adls_loader_spark.sources.vtable_batch import \
        register_vtable
    register_vtable(spark)
    df = (spark.read.format("vtable").option("path", table_dir)
          .load().filter("o_orderkey < 1000"))

Semantics and scale:
  * options: ``path`` (table dir), ``version`` (pin a snapshot),
    ``as_of`` (TIMESTAMP AS OF, ISO-8601) — default latest;
  * FILE PRUNING reaches the reader through ``pushFilters``: sargable
    conjuncts (=, <, <=, >, >=, IS NULL-free) on top-level columns
    feed `sinks/versioned.prune_files`, so partitions() plans only
    files whose manifest stats/Blooms may match.  Every filter is
    RETURNED as residual — pruning is a superset guarantee, Spark
    re-applies the predicate, results never depend on stats precision
    (same contract as ``read_version(predicates=...)``);
  * one InputPartition per surviving data file, read EXECUTOR-side via
    pyarrow (`arrow_fs_for` — any scheme) and yielded as Arrow
    RecordBatches; delete vectors (run-length or legacy position-list)
    apply as a vectorized numpy mask over each batch's file-row range;
    column mapping applies per batch (physical → logical, drops
    hidden);
  * the planner runs in a Python worker with no JVM gateway — manifest
    reads route through the storage seam's Arrow/local impls.

The WRITE path mirrors it: ``df.write.format("vtable").mode("append"|
"overwrite").option("path", dir).save()`` — per-task Arrow→parquet
files + one atomic rebase-retried manifest commit (`VTableWriter`;
task retries orphan files at worst, visibility is the manifest swap
alone).

Trade-off vs `read_version`: this path is per-file Python/Arrow (no
whole-stage codegen on the scan, no vectorized JVM parquet reader) —
the price of composing through the format API.  Analytics queries in
`plans/` keep using `read_version`; this reader exists so EXTERNAL
DataFrame code can mount the table without the library.

Reference parity: beyond-reference (the reference reads a live ADLS
tree); public technique: Delta/Iceberg DataSource relations.

Known upstream limitation — ``CREATE TABLE ... USING vtable`` (catalog
tables): re-verified on PySpark 4.1.2 (2026-08): at CREATE time the
catalog instantiates the source with full options (``path``,
``option.*``, ``location``, ...) and `schema()` succeeds, but at
SELECT time it instantiates a FRESH DataSource with EMPTY options
(``{}``), so `reader()` cannot locate the table.  Minimal repro: any
Python DataSource whose reader raises ``repr(dict(self.options))``
shows ``{}`` under ``SELECT * FROM t`` after a successful
``CREATE TABLE t USING <source> OPTIONS (path '/x')``.  Until the
catalog path forwards stored options, SQL access goes through a temp
view: ``spark.read.format("vtable").option("path", d).load()
.createOrReplaceTempView("t")``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader,
                                    DataSourceStreamArrowWriter, EqualTo,
                                    GreaterThan, GreaterThanOrEqual,
                                    InputPartition, LessThan,
                                    LessThanOrEqual, WriterCommitMessage)

from .vtable_stream import _open_parquet


@dataclass
class _VPart(InputPartition):
    path: str
    dvs: tuple            # this file's position-delete files
    # equality-delete entries applying to this file:
    # ((physical col, (key-value parquet files, ...)), ...)
    eqs: tuple = ()


_OPS = {EqualTo: "=", LessThan: "<", LessThanOrEqual: "<=",
        GreaterThan: ">", GreaterThanOrEqual: ">="}


def _resolve_version(table_dir: str, options) -> int:
    from ..sinks import versioned as V

    if options.get("version") is not None and \
            options.get("as_of") is not None:
        raise ValueError("vtable: pass version OR as_of, not both")
    if options.get("version") is not None:
        return int(options["version"])
    if options.get("as_of") is not None:
        return V.version_at_timestamp(table_dir, options["as_of"])
    cur = V.latest_version(table_dir)
    if cur is None:
        raise ValueError(f"vtable: no snapshots in {table_dir}")
    return cur


def _logical_arrow_schema(table_dir: str, version: int):
    """The version's LOGICAL Arrow schema: merged field set of the
    first+last manifest files (additive evolution appends columns in
    later batch dirs, which sort last), renames applied, drops hidden.
    Bounded: two footer reads, no data pages."""
    from ..sinks import versioned as V

    import pyarrow as pa

    cmap, dropped = V.table_column_map(table_dir, version)
    stored = V.table_schema(table_dir, version)
    if stored is not None:
        # manifest-DECLARED schema (type-widening aware): no footer
        # read at all, and widened columns advertise the wide type —
        # `_conform` casts narrow old-file batches up at scan time
        from pyspark.sql.pandas.types import to_arrow_schema
        fields = list(to_arrow_schema(stored))
    else:
        files = V._read_manifest(table_dir, version)
        fields = list(_open_parquet(files[0]).schema_arrow)
        if len(files) > 1:
            seen = {f.name for f in fields}
            fields += [f for f in _open_parquet(files[-1]).schema_arrow
                       if f.name not in seen]
    out = [f.with_name(cmap.get(f.name, f.name))
           for f in fields if f.name not in set(dropped)]
    return pa.schema(out)


class VTableBatchReader(DataSourceReader):
    def __init__(self, options, schema):
        from ..sinks import versioned as V

        self._schema = schema
        self._table_dir = options.get("path")
        if not self._table_dir:
            raise ValueError("vtable needs .option('path', ...)")
        self._version = _resolve_version(self._table_dir, options)
        doc = V._read_manifest_doc(self._table_dir, self._version)
        self._files = doc["files"]
        self._dmap = doc.get("delete_files", {})
        self._eq = doc.get("eq_deletes", [])
        self._cmap = doc.get("column_map", {})
        self._dropped = doc.get("dropped_cols", [])
        # hidden-partitioning state for transform-space pruning (the
        # same composition prune_files does JVM-side — the DSv2 path
        # must honor the layout contract too)
        self._spec = doc.get("partition_spec", [])
        self._parts = doc.get("partitions", {}) if self._spec else {}
        self._specs = doc.get("partition_specs") or (
            {"0": self._spec} if self._spec else {})
        self._spec_id = doc.get("partition_spec_id", "0")
        self._spec_ids = doc.get("partition_spec_ids", {})
        self._preds: list[tuple] = []

    # -- pushdown -----------------------------------------------------
    def pushFilters(self, filters):
        from ..sinks.versioned import _to_physical

        for f in filters:
            op = _OPS.get(type(f))
            # only sargable single-column comparisons against plain
            # literals feed the manifest pruner; predicates name
            # LOGICAL columns — resolve to physical for the stats keys
            if (op is not None and len(f.attribute) == 1
                    and isinstance(f.value, (int, float, str, bool))):
                self._preds.append(
                    (_to_physical(self._cmap, f.attribute[0]), op, f.value))
        # EVERY filter stays residual: file pruning is a superset
        # guarantee; Spark re-applies the full predicate
        return filters

    # -- planning -----------------------------------------------------
    def partitions(self):
        from ..sinks import partitioning
        from ..sinks import versioned as V

        stats = V._read_manifest_doc(
            self._table_dir, self._version).get("stats", {})
        kept = [f for f in self._files
                if V._file_matches(stats.get(f), self._preds)
                and partitioning.file_matches(
                    self._specs.get(self._spec_ids.get(f, self._spec_id),
                                    self._spec),
                    self._parts.get(f), self._preds)]
        return [_VPart(f, tuple(self._dmap.get(f, ())),
                       tuple((e["col"], tuple(e["files"]))
                             for e in self._eq
                             if f in set(e.get("applies_to", ()))))
                for f in kept]

    # -- execution (executor-side) ------------------------------------
    def read(self, partition: _VPart):
        import numpy as np
        import pyarrow as pa

        starts, ends = _deleted_ranges(partition, _path_key)
        eq_sets = _eq_value_sets(partition)
        target = None
        if self._schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema
            target = to_arrow_schema(self._schema)
        f = _open_parquet(partition.path)
        offset = 0
        for batch in f.iter_batches():
            n = batch.num_rows
            if starts is not None and n:
                idx = np.arange(offset, offset + n)
                j = np.searchsorted(starts, idx, side="right") - 1
                dead = (j >= 0) & (idx < ends[np.clip(j, 0, None)])
                if dead.any():
                    batch = batch.filter(pa.array(~dead))
            offset += n
            batch = _apply_eq_deletes(batch, eq_sets)
            if target is not None:
                batch = _conform(batch, target, self._cmap, self._dropped)
            if batch.num_rows:
                yield batch


def _path_key(u: str) -> str:
    """DV `_metadata` URIs vs manifest paths: one comparison key
    (see `sinks/storage.path_key`)."""
    from ..sinks.storage import path_key

    return path_key(u)


def _eq_value_sets(partition: _VPart) -> list[tuple[str, object]]:
    """This file's equality-delete key sets as ``(physical col, Arrow
    value array)`` — loaded once per partition (key files are tombstone
    batches, tiny by contract)."""
    import pyarrow as pa

    out = []
    for col, files in partition.eqs or ():
        chunks = [_open_parquet(p).read(columns=["__val"]).column("__val")
                  for p in files]
        arr = pa.chunked_array([c for ch in chunks for c in ch.chunks]) \
            if chunks else None
        if arr is not None and len(arr):
            out.append((col, arr.combine_chunks()))
    return out


def _apply_eq_deletes(batch, eq_sets):
    """Drop rows whose key column value is in an equality-delete set.
    NULL keys never match (`is_in` on null is false), matching the
    SQL ``DELETE WHERE col IN (...)`` contract and the JVM-side
    `_eq_anti` join.  A file written before the key column existed has
    no such column — nothing to delete there."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for col, vals in eq_sets:
        i = batch.schema.get_field_index(col)
        if i < 0 or not batch.num_rows:
            continue
        arr = batch.column(i)
        if vals.type != arr.type:
            try:
                vals = vals.cast(arr.type)
            except pa.lib.ArrowInvalid:
                arr = arr.cast(vals.type)
        mask = pc.is_in(arr, value_set=vals)
        if pc.any(mask).as_py():
            batch = batch.filter(pc.invert(
                pc.fill_null(mask, False)))
    return batch


def _deleted_ranges(partition: _VPart, canon):
    """This file's deleted row positions as merged, sorted
    (starts, ends) numpy arrays — run-length delete files contribute
    O(runs) entries, legacy position-lists one entry per position."""
    if not partition.dvs:
        return None, None
    import numpy as np

    target = canon(partition.path)
    ranges: list[tuple[int, int]] = []
    for d in partition.dvs:
        t = _open_parquet(d).read()
        names = set(t.schema.names)
        files = t.column("__file").to_pylist()
        ss = t.column("__start").to_pylist() if "__start" in names \
            else [None] * len(files)
        ls = t.column("__len").to_pylist() if "__len" in names \
            else [None] * len(files)
        ps = t.column("__pos").to_pylist() if "__pos" in names \
            else [None] * len(files)
        for fi, s, ln, p in zip(files, ss, ls, ps):
            if canon(fi) != target:
                continue
            if s is not None:
                ranges.append((int(s), int(s) + int(ln)))
            elif p is not None:
                ranges.append((int(p), int(p) + 1))
    if not ranges:
        return None, None
    ranges.sort()
    merged = [list(ranges[0])]
    for s, e in ranges[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    arr = np.asarray(merged, dtype=np.int64)
    return arr[:, 0].copy(), arr[:, 1].copy()


def _conform(batch, target, cmap, dropped):
    """Physical-schema Arrow batch → the advertised LOGICAL schema:
    drops hidden columns, surfaces renames, fills evolution gaps with
    nulls, casts to the advertised types."""
    import pyarrow as pa

    if batch.schema == target:
        return batch
    by_logical = {}
    drop = set(dropped)
    for name in batch.schema.names:
        if name in drop:
            continue
        by_logical[cmap.get(name, name)] = batch.column(name)
    arrays = []
    for fld in target:
        col = by_logical.get(fld.name)
        if col is None:
            arrays.append(pa.nulls(batch.num_rows, fld.type))
        elif col.type != fld.type:
            arrays.append(col.cast(fld.type))
        else:
            arrays.append(col)
    return pa.RecordBatch.from_arrays(arrays, schema=target)


@dataclass
class _WroteFiles(WriterCommitMessage):
    paths: tuple


class VTableWriter(DataSourceArrowWriter):
    """DSv2 WRITE path: ``df.write.format("vtable").mode("append"|
    "overwrite").option("path", dir).save()`` — each task streams its
    Arrow batches into ONE parquet file under the table's data dir
    (any scheme, via pyarrow.fs); the driver-side commit collects the
    task manifests, computes footer stats, and lands one atomic
    rebase-retried manifest commit (`versioned.commit_data_files`) —
    Spark's task retries can only ever produce orphan files (reclaimed
    by vacuum), never a torn table, because visibility is the manifest
    swap alone.  ``abort`` deletes everything the tasks reported.

    Refused on tables with stored CHECK constraints: the DSv2 commit
    hook runs in a Python worker with no SparkSession, so the checks
    cannot be evaluated there — `write_snapshot` is the full-contract
    path.  Appends into a column-mapped table land in PHYSICAL names
    (the rename inverse applies per batch, executor-side)."""

    def __init__(self, options, schema, overwrite: bool):
        from ..sinks import versioned as V

        self._table_dir = options.get("path")
        if not self._table_dir:
            raise ValueError("vtable needs .option('path', ...)")
        self._mode = "overwrite" if overwrite else "append"
        checks = V.table_checks(self._table_dir)
        if checks:
            raise ValueError(
                f"vtable writer: table declares CHECK constraints "
                f"{checks}; the DSv2 commit hook cannot evaluate them "
                "— write through sinks.versioned.write_snapshot")
        spec = V.table_partition_spec(self._table_dir)
        if spec:
            # same refusal write_snapshot makes for an un-partitioned
            # append into a partitioned table: DSv2 tasks stream one
            # file each with no partition tuple, which would silently
            # dilute the layout GUARANTEE hidden partitioning sells
            raise ValueError(
                f"vtable writer: table declares hidden partitioning "
                f"{spec}; the DSv2 task writer does not lay files out "
                "under the spec — write through "
                "sinks.versioned.write_snapshot")
        cmap, dropped = ({}, []) if overwrite \
            else V.table_column_map(self._table_dir)
        self._back = {logical: phys for phys, logical in cmap.items()}
        # schema contract enforced DRIVER-side before any task runs:
        # the (physical-named) write schema must merge into the stored
        # one — wider/conflicting batch types fail the job here, and
        # the merged schema lands with the manifest commit so
        # type-widening state survives DSv2 writes too
        if schema is None:                # e.g. direct construction in
            self._schema_json = None      # tests: inherit stored schema
        else:
            from pyspark.sql import types as T
            phys = T.StructType(
                [T.StructField(self._back.get(f.name, f.name),
                               f.dataType, True) for f in schema.fields])
            self._schema_json = V._merge_append_schema(
                V.table_schema(self._table_dir) if not overwrite
                else None, phys).jsonValue()
        import uuid
        self._out_dir = self._join(
            self._table_dir, "data", f"w-{uuid.uuid4().hex[:8]}")

    @staticmethod
    def _join(*parts):
        out = parts[0].rstrip("/")
        for p in parts[1:]:
            out += "/" + p.strip("/")
        return out

    # -- executor-side ------------------------------------------------
    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = self._join(self._out_dir,
                          f"part-{uuid.uuid4().hex}.parquet")
        writer = None
        fs = out = None
        try:
            for batch in iterator:
                if self._back:
                    batch = pa.RecordBatch.from_arrays(
                        list(batch.columns),
                        names=[self._back.get(n, n)
                               for n in batch.schema.names])
                if writer is None:
                    from ..sinks.storage import arrow_fs_for
                    fs, p = arrow_fs_for(path)
                    fs.create_dir(p.rsplit("/", 1)[0], recursive=True)
                    out = fs.open_output_stream(p)
                    writer = pq.ParquetWriter(out, batch.schema)
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
            if out is not None:
                out.close()
        if writer is None:
            return _WroteFiles(())        # empty task: no file
        return _WroteFiles((path,))

    # -- driver-side (Python worker) ----------------------------------
    def commit(self, messages):
        from ..sinks import versioned as V
        from ..sinks.storage import storage_for

        st = storage_for(self._table_dir)
        files = sorted(st.canon(p) for m in messages if m is not None
                       for p in m.paths)
        if not files and self._mode == "append":
            return                        # nothing written: no version
        bloom = V.table_bloom_cols(self._table_dir)
        stats = {f: V._file_stats(f, st, bloom) for f in files}
        V.commit_data_files(self._table_dir, files, self._mode, stats,
                            bloom_cols=bloom,
                            schema=self._schema_json)

    def abort(self, messages):
        from ..sinks.storage import storage_for

        st = storage_for(self._table_dir)
        for m in messages:
            if m is not None:
                for p in m.paths:
                    st.delete(p)


class VTableStreamWriter(VTableWriter, DataSourceStreamArrowWriter):
    """Streaming twin: ``stream.writeStream.format("vtable")
    .option("path", dir).option("checkpointLocation", ...)`` — the
    native-format alternative to the foreachBatch
    `versioned.commit_stream_batch` sink, with the SAME exactly-once
    contract: every commit records the micro-batch id in the manifest
    ledger, and a crash-replayed batch is detected there — its
    re-written files are deleted and no version lands.  ``overwrite``
    mode commits each batch as the table's new whole state (the
    complete-output aggregate-maintainer shape)."""

    def commit(self, messages, batchId: int) -> None:
        from ..sinks import versioned as V
        from ..sinks.storage import storage_for

        st = storage_for(self._table_dir)
        files = sorted(st.canon(p) for m in messages if m is not None
                       for p in m.paths)
        if int(batchId) in V.committed_batch_ids(self._table_dir):
            for p in files:               # replay: drop the rewrite
                st.delete(p)
            return
        if not files and self._mode == "append":
            return
        bloom = V.table_bloom_cols(self._table_dir)
        stats = {f: V._file_stats(f, st, bloom) for f in files}
        V.commit_data_files(self._table_dir, files, self._mode, stats,
                            bloom_cols=bloom,
                            batch_ids={int(batchId)},
                            schema=self._schema_json)

    def abort(self, messages, batchId: int) -> None:
        VTableWriter.abort(self, messages)


class VTableDataSource(DataSource):
    """`spark.read.format("vtable")` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "vtable"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("vtable needs .option('path', ...)")
        v = _resolve_version(table_dir, self.options)
        return from_arrow_schema(_logical_arrow_schema(table_dir, v))

    def reader(self, schema) -> VTableBatchReader:
        return VTableBatchReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> VTableWriter:
        return VTableWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> VTableStreamWriter:
        return VTableStreamWriter(self.options, schema, overwrite)


def register_vtable(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(VTableDataSource)
