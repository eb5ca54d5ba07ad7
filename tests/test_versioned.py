"""Manifest-versioned table: atomic commits, time travel, compaction,
vacuum (sinks/versioned.py)."""

from __future__ import annotations

import glob
import os

import pytest

from databox_adls_loader_spark.sinks import versioned as V


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_append_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, s: string")
    b2 = spark.createDataFrame([(3, "c")], "id: long, s: string")
    assert V.write_snapshot(b1, t) == 1
    assert V.write_snapshot(b2, t) == 2
    assert V.versions(t) == [1, 2] and V.latest_version(t) == 2
    assert _rows(V.read_version(spark, t)) == {(1, "a"), (2, "b"), (3, "c")}
    # time travel: v1 still sees only the first batch
    assert _rows(V.read_version(spark, t, 1)) == {(1, "a"), (2, "b")}


def test_logical_overwrite_keeps_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame([(9,)], "id: long"), t,
                     mode="overwrite")
    assert _rows(V.read_version(spark, t)) == {(9,)}
    assert _rows(V.read_version(spark, t, 1)) == {(1,)}  # history intact


def test_compact_preserves_rows_and_old_readers(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i,) for i in range(50)], "id: long")
    V.write_snapshot(df.repartition(8), t)
    before = _rows(V.read_version(spark, t))
    v = V.compact_snapshot(spark, t, n_files=1)
    assert _rows(V.read_version(spark, t, v)) == before
    assert _rows(V.read_version(spark, t, 1)) == before  # pinned reader OK
    files = V._read_manifest(t, v)
    assert len(files) == 1 and len(V._read_manifest(t, 1)) == 8


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame([(2,)], "id: long"), t,
                     mode="overwrite")
    V.write_snapshot(spark.createDataFrame([(3,)], "id: long"), t)
    n = V.vacuum(t, keep_versions=2)
    assert n >= 1                       # v1's files referenced by nothing kept
    assert V.versions(t) == [2, 3]
    assert _rows(V.read_version(spark, t)) == {(2,), (3,)}
    # every remaining data file is referenced
    remaining = set(glob.glob(os.path.join(t, "data", "*", "part-*.parquet")))
    referenced = set(V._read_manifest(t, 2)) | set(V._read_manifest(t, 3))
    assert remaining == referenced


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, str(tmp_path / "none"))


def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        V.write_snapshot(spark.range(1), str(tmp_path / "t"), mode="replace")
