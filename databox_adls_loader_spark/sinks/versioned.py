"""Minimal manifest-versioned parquet table: atomic snapshot commits,
time travel, compaction, and vacuum — the table-format primitives
(public technique: snapshot-manifest logs, cf. the Iceberg/Delta papers)
a 100 TB pipeline needs so readers never see a half-written rewrite.

Layout (all inside one table directory):

    <table>/data/b<N>-.../part-*.parquet   immutable data files
    <table>/_manifests/v<N>.json           ordered file list per version
    <table>/_manifests/_latest.json        pointer to the current version

Invariants:
  * data files are immutable once a manifest references them — append,
    logical overwrite, and compaction all write NEW files + a NEW
    manifest, so concurrent readers of any pinned version are isolated;
  * the only mutation is the `_latest` pointer swap, done with
    `os.replace` (atomic on POSIX).  On an object store the same design
    uses a conditional put of the pointer object — single-writer commit,
    many-reader isolation, no locks;
  * time travel = read any retained manifest; `vacuum` deletes data
    files referenced ONLY by dropped manifests.

Reference parity note: the reference copies into a live ADLS tree with
no snapshot isolation (copy-acls.py applies in place); this layer is the
beyond-reference upgrade a repeated 100 TB migration needs to be
re-runnable while consumers keep reading.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession


def _mdir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_mdir(table_dir), f"v{version:05d}.json")


def versions(table_dir: str) -> list[int]:
    """All retained snapshot versions, ascending."""
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(_mdir(table_dir), "v*.json")))


def latest_version(table_dir: str) -> int | None:
    ptr = os.path.join(_mdir(table_dir), "_latest.json")
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        return int(json.load(f)["version"])


def _read_manifest(table_dir: str, version: int) -> list[str]:
    with open(_manifest_path(table_dir, version), encoding="utf-8") as f:
        return json.load(f)["files"]


def _commit(table_dir: str, files: list[str], version: int,
            batch_ids: set[int] | None = None) -> None:
    """Write manifest v<version> then atomically swap the pointer.

    The streaming batch-id ledger is carried forward into EVERY manifest
    (not only stream commits): otherwise a compaction or merge would
    write a ledger-free latest manifest, `vacuum` could then drop the
    only manifests holding the ids, and a crash-replayed micro-batch
    would double-commit."""
    inherited = committed_batch_ids(table_dir)
    if batch_ids:
        inherited |= {int(b) for b in batch_ids}
    os.makedirs(_mdir(table_dir), exist_ok=True)
    doc = {"version": version, "files": sorted(files)}
    if inherited:
        doc["batch_ids"] = sorted(inherited)
    with open(_manifest_path(table_dir, version), "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1)
    tmp = os.path.join(_mdir(table_dir), "_latest.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, os.path.join(_mdir(table_dir), "_latest.json"))


def _new_data_files(df: DataFrame, table_dir: str, batch_tag: str) -> list[str]:
    out = os.path.join(table_dir, "data", batch_tag)
    df.write.mode("error").parquet(out)
    return [p for p in glob.glob(os.path.join(out, "part-*.parquet"))]


def write_snapshot(df: DataFrame, table_dir: str,
                   mode: str = "append") -> int:
    """Commit ``df`` as a new snapshot; returns the new version number.

    ``append`` keeps the previous version's files in the new manifest;
    ``overwrite`` references only the new files (LOGICAL overwrite — the
    old files stay on disk for time travel until `vacuum`)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    cur = latest_version(table_dir)
    new_version = 1 if cur is None else cur + 1
    files = _new_data_files(df, table_dir, f"b{new_version:05d}")
    if mode == "append" and cur is not None:
        files = _read_manifest(table_dir, cur) + files
    _commit(table_dir, files, new_version)
    return new_version


def read_version(spark: SparkSession, table_dir: str,
                 version: int | None = None) -> DataFrame:
    """Read a pinned snapshot (default: latest).  The returned plan lists
    exactly the manifest's files — a concurrent commit or compaction
    cannot change what this reader sees.

    Reads with ``mergeSchema`` so ADD-COLUMN schema evolution works: an
    appended batch may carry extra columns; files written before the
    column existed surface it as NULL (the standard additive-evolution
    contract — renames/drops still require a rewrite commit)."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    files = _read_manifest(table_dir, v)
    return spark.read.option("mergeSchema", "true").parquet(*files)


def compact_snapshot(spark: SparkSession, table_dir: str,
                     n_files: int = 1) -> int:
    """Rewrite the latest snapshot into ``n_files`` files as a NEW
    version (small-file compaction).  Readers of older versions are
    untouched; rows are bit-identical."""
    cur = latest_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    df = read_version(spark, table_dir, cur).repartition(n_files)
    new_version = cur + 1
    files = _new_data_files(df, table_dir, f"b{new_version:05d}")
    _commit(table_dir, files, new_version)
    return new_version


def vacuum(table_dir: str, keep_versions: int = 2) -> int:
    """Drop all but the newest ``keep_versions`` manifests and delete
    data files no retained manifest references.  Returns the number of
    data files deleted.  (At 100 TB this is the storage-reclaim job; it
    must never run concurrently with a reader pinned to a dropped
    version — retention windows are the standard guard.)"""
    vs = versions(table_dir)
    keep = set(vs[-keep_versions:]) if keep_versions > 0 else set()
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(table_dir, v))
    deleted = 0
    for v in vs:
        if v not in keep:
            os.remove(_manifest_path(table_dir, v))
    for p in glob.glob(os.path.join(table_dir, "data", "*", "part-*.parquet")):
        if p not in referenced:
            os.remove(p)
            deleted += 1
    return deleted


def merge_into_snapshot(spark: SparkSession, table_dir: str,
                        updates: DataFrame, key: str) -> int:
    """MERGE INTO for the versioned table: collapse the latest snapshot
    with ``updates`` (updates win on key collision, unmatched rows from
    both sides survive) and commit the result as a new OVERWRITE
    snapshot.  Snapshot isolation makes the rewrite safe under
    concurrent readers; at 100 TB pair with `cdc_latest_per_key` to
    collapse the update stream before the merge, and partition the
    rewrite so only touched partitions' files are replaced."""
    from ..operators.scale import merge_upsert

    merged = merge_upsert(read_version(spark, table_dir), updates, key)
    return write_snapshot(merged, table_dir, mode="overwrite")


def committed_batch_ids(table_dir: str) -> set[int]:
    """Streaming batch ids recorded by `commit_stream_batch` across ALL
    retained manifests (replay detection must survive compaction and
    logical overwrite, so ids accumulate monotonically in each commit)."""
    out: set[int] = set()
    for v in versions(table_dir):
        with open(_manifest_path(table_dir, v), encoding="utf-8") as f:
            out.update(json.load(f).get("batch_ids", []))
    return out


def commit_stream_batch(batch_df: DataFrame, batch_id: int,
                        table_dir: str) -> bool:
    """Idempotent foreachBatch sink: append the micro-batch as a new
    snapshot UNLESS ``batch_id`` was already committed — Structured
    Streaming replays the last batch after a crash-restart, and this
    check turns at-least-once delivery into exactly-once table contents.
    Returns True when the batch was committed, False on a skipped replay.

    Use: ``stream.writeStream.foreachBatch(
        lambda df, bid: commit_stream_batch(df, bid, table_dir))``."""
    if batch_id in committed_batch_ids(table_dir):
        return False
    cur = latest_version(table_dir)
    new_version = 1 if cur is None else cur + 1
    files = _new_data_files(batch_df, table_dir, f"b{new_version:05d}")
    if cur is not None:
        files = _read_manifest(table_dir, cur) + files
    _commit(table_dir, files, new_version, batch_ids={int(batch_id)})
    return True
