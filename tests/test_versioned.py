"""Manifest-versioned table: atomic commits, time travel, compaction,
vacuum (sinks/versioned.py)."""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.sinks import versioned as V
from databox_adls_loader_spark.sinks.storage import storage_for


@pytest.fixture(params=["local", "hadoop"])
def troot(request, tmp_path):
    """Table root under BOTH storage impls: a bare POSIX path
    (LocalStorage) and the same directory as a ``file:`` URI routed
    through the JVM Hadoop FileSystem (HadoopStorage) — the full
    versioned-table suite must hold on each."""
    if request.param == "local":
        return str(tmp_path)
    return f"file://{tmp_path}"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_append_versions_and_time_travel(spark, troot):
    t = troot + "/tbl"
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, s: string")
    b2 = spark.createDataFrame([(3, "c")], "id: long, s: string")
    assert V.write_snapshot(b1, t) == 1
    assert V.write_snapshot(b2, t) == 2
    assert V.versions(t) == [1, 2] and V.latest_version(t) == 2
    assert _rows(V.read_version(spark, t)) == {(1, "a"), (2, "b"), (3, "c")}
    # time travel: v1 still sees only the first batch
    assert _rows(V.read_version(spark, t, 1)) == {(1, "a"), (2, "b")}


def test_logical_overwrite_keeps_history(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame([(9,)], "id: long"), t,
                     mode="overwrite")
    assert _rows(V.read_version(spark, t)) == {(9,)}
    assert _rows(V.read_version(spark, t, 1)) == {(1,)}  # history intact


def test_compact_preserves_rows_and_old_readers(spark, troot):
    t = troot + "/tbl"
    df = spark.createDataFrame([(i,) for i in range(50)], "id: long")
    V.write_snapshot(df.repartition(8), t)
    before = _rows(V.read_version(spark, t))
    v = V.compact_snapshot(spark, t, n_files=1)
    assert _rows(V.read_version(spark, t, v)) == before
    assert _rows(V.read_version(spark, t, 1)) == before  # pinned reader OK
    files = V._read_manifest(t, v)
    assert len(files) == 1 and len(V._read_manifest(t, 1)) == 8


def test_vacuum_deletes_only_unreferenced_files(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame([(2,)], "id: long"), t,
                     mode="overwrite")
    V.write_snapshot(spark.createDataFrame([(3,)], "id: long"), t)
    n = V.vacuum(t, keep_versions=2)
    assert n >= 1                       # v1's files referenced by nothing kept
    assert V.versions(t) == [2, 3]
    assert _rows(V.read_version(spark, t)) == {(2,), (3,)}
    # every remaining data file is referenced (canon both sides — the
    # hadoop impl lists Path.toString forms, manifests store canon URIs)
    st = storage_for(t, spark)
    remaining = {st.canon(p) for p in st.list_glob(
        st.join(t, "data", "*", "part-*.parquet"))}
    referenced = {st.canon(f) for f in
                  V._read_manifest(t, 2) + V._read_manifest(t, 3)}
    assert remaining == referenced


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, str(tmp_path / "none"))


def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        V.write_snapshot(spark.range(1), str(tmp_path / "t"), mode="replace")


def test_merge_into_snapshot_upserts(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "old"), (2, "keep")], "id: long, s: string"), t)
    v = V.merge_into_snapshot(spark, t, spark.createDataFrame(
        [(1, "new"), (3, "ins")], "id: long, s: string"), key="id")
    assert _rows(V.read_version(spark, t, v)) == {
        (1, "new"), (2, "keep"), (3, "ins")}
    # pre-merge snapshot still readable
    assert _rows(V.read_version(spark, t, 1)) == {(1, "old"), (2, "keep")}


def test_commit_stream_batch_is_idempotent(spark, troot):
    t = troot + "/tbl"
    b0 = spark.createDataFrame([(0, "a")], "id: long, s: string")
    b1 = spark.createDataFrame([(1, "b")], "id: long, s: string")
    assert V.commit_stream_batch(b0, 0, t) is True
    assert V.commit_stream_batch(b1, 1, t) is True
    # crash-restart replays the last micro-batch: must be a no-op
    assert V.commit_stream_batch(b1, 1, t) is False
    assert V.latest_version(t) == 2
    assert _rows(V.read_version(spark, t)) == {(0, "a"), (1, "b")}
    assert V.committed_batch_ids(t) == {0, 1}


def test_stream_to_versioned_table_exactly_once(spark, troot, tmp_path):
    """End to end: a real Structured Streaming query writing through
    commit_stream_batch — table contents equal the source exactly."""
    src = str(tmp_path / "src")
    t = troot + "/tbl"
    spark.createDataFrame([(i, f"s{i}") for i in range(6)],
                          "id: long, s: string").write.parquet(src)
    stream = spark.readStream.schema("id long, s string").parquet(src)
    q = (stream.writeStream
         .foreachBatch(lambda df, bid: V.commit_stream_batch(df, bid, t))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _rows(V.read_version(spark, t)) == {
        (i, f"s{i}") for i in range(6)}


def test_batch_ledger_survives_compaction_and_vacuum(spark, troot):
    t = troot + "/tbl"
    for bid in range(3):
        V.commit_stream_batch(
            spark.createDataFrame([(bid,)], "id: long"), bid, t)
    V.compact_snapshot(spark, t, n_files=1)   # non-stream commit
    V.vacuum(t, keep_versions=1)              # drops every stream manifest
    # the ledger rode the compaction manifest: replays stay no-ops
    assert V.committed_batch_ids(t) == {0, 1, 2}
    assert V.commit_stream_batch(
        spark.createDataFrame([(2,)], "id: long"), 2, t) is False
    assert _rows(V.read_version(spark, t)) == {(0,), (1,), (2,)}


def test_additive_schema_evolution(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame(
        [(2, "x")], "id: long, s: string"), t)  # batch adds a column
    latest = V.read_version(spark, t)
    assert set(latest.columns) == {"id", "s"}
    got = {(r["id"], r["s"]) for r in latest.collect()}
    assert got == {(1, None), (2, "x")}  # old files surface NULL
    # the pinned pre-evolution snapshot still has the narrow schema
    assert V.read_version(spark, t, 1).columns == ["id"]


def test_manifest_stats_recorded_per_file(spark, troot):
    t = troot + "/tbl"
    df = spark.createDataFrame([(i, f"s{i:03d}") for i in range(100)],
                               "id: long, s: string")
    V.write_snapshot(df.repartition(4), t)
    doc = V._read_manifest_doc(t, 1)
    assert set(doc["stats"]) == set(doc["files"])
    for st in doc["stats"].values():
        c = st["columns"]["id"]
        assert 0 <= c["min"] <= c["max"] <= 99 and c["null_count"] == 0
        assert st["num_rows"] > 0


def test_data_skipping_prunes_files_and_stays_exact(spark, troot):
    t = troot + "/tbl"
    df = spark.createDataFrame([(i, i % 7) for i in range(1000)],
                               "id: long, grp: long")
    V.write_snapshot(df.repartition(8), t)
    v = V.compact_snapshot(spark, t, n_files=4, cluster_by=["id"])
    # point read: clustered layout → exactly one file survives pruning
    kept, total = V.prune_files(t, v, [("id", "=", 5)])
    assert total == 4 and len(kept) == 1
    got = V.read_version(spark, t, v, predicates=[("id", "=", 5)])
    assert set(got.inputFiles()) == {f"file://{p}" for p in kept} or \
        len(got.inputFiles()) == 1
    assert _rows(got) == {(5, 5)}
    # range read prunes to the covering files and matches the full scan
    pred = [("id", ">=", 600), ("id", "<", 700)]
    kept, _ = V.prune_files(t, v, pred)
    assert 1 <= len(kept) <= 2
    want = {(i, i % 7) for i in range(600, 700)}
    assert _rows(V.read_version(spark, t, v, predicates=pred)) == want


def test_data_skipping_is_superset_safe_without_clustering(spark, troot):
    # files written unclustered: stats overlap, nothing prunes, but the
    # residual filter still returns exactly the right rows
    t = troot + "/tbl"
    V.write_snapshot(spark.range(100).repartition(5), t)
    kept, total = V.prune_files(t, 1, [("id", "=", 42)])
    assert len(kept) >= 1
    assert _rows(V.read_version(spark, t, predicates=[("id", "=", 42)])) \
        == {(42,)}


def test_data_skipping_empty_result_keeps_schema(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1, "a")], "id: long, s: string"), t)
    got = V.read_version(spark, t, predicates=[("id", "=", 999)])
    assert got.columns == ["id", "s"] and got.count() == 0


def test_data_skipping_all_null_file_pruned_for_equality(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(None,), (None,)], "id: long").coalesce(1), t)
    V.write_snapshot(spark.createDataFrame([(7,)], "id: long").coalesce(1), t)
    kept, total = V.prune_files(t, 2, [("id", "=", 7)])
    assert total == 2 and len(kept) == 1
    assert _rows(V.read_version(spark, t, predicates=[("id", "=", 7)])) == {(7,)}


def test_data_skipping_evolved_column_never_prunes_old_files(spark, troot):
    # files written before a column existed have no stats for it: they
    # must be KEPT (their rows surface NULL, which the residual filter
    # then drops) — absent stats may never mean "prune"
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long").coalesce(1), t)
    V.write_snapshot(spark.createDataFrame(
        [(2, 10)], "id: long, extra: long").coalesce(1), t)
    kept, total = V.prune_files(t, 2, [("extra", ">=", 0)])
    assert total == 2 and len(kept) == 2
    got = V.read_version(spark, t, predicates=[("extra", ">=", 0)])
    assert {(r["id"], r["extra"]) for r in got.collect()} == {(2, 10)}


def test_zorder_compaction_prunes_both_dimensions(spark, troot):
    # 32×32 grid; after Z-order clustering a small (x, y) rectangle must
    # prune most files — and x-only or y-only ranges must ALSO prune,
    # which a linear sort on x alone cannot deliver for y
    t = troot + "/tbl"
    pts = [(x, y, x * 32 + y) for x in range(32) for y in range(32)]
    V.write_snapshot(spark.createDataFrame(
        pts, "x: long, y: long, v: long").repartition(8), t)
    v = V.compact_snapshot(spark, t, n_files=16, zorder_by=("x", "y"))
    assert "__zorder_key" not in V.read_version(spark, t, v).columns
    rect = [("x", ">=", 4), ("x", "<", 8), ("y", ">=", 4), ("y", "<", 8)]
    kept, total = V.prune_files(t, v, rect)
    assert total == 16 and len(kept) <= 4
    want = {(x, y, x * 32 + y) for x in range(4, 8) for y in range(4, 8)}
    assert _rows(V.read_version(spark, t, v, predicates=rect)) == want
    for dim in ("x", "y"):
        kept_d, _ = V.prune_files(t, v, [(dim, ">=", 28)])
        assert len(kept_d) < 16, f"{dim}-only range did not prune"


def test_changes_between_insert_update_delete(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id: long, s: string"), t)
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id: long, s: string"), t,
        mode="overwrite")
    got = {tuple(r) for r in V.changes_between(spark, t, 1, 2, "id").collect()}
    assert got == {(2, "B", "update_postimage"),
                   (3, "c", "delete"),
                   (4, "d", "insert")}


def test_changes_between_null_update_not_resurrected(spark, troot):
    # an update that sets a column to NULL must surface NULL, not the
    # old value
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1, "x")], "id: long, s: string"), t)
    V.write_snapshot(spark.createDataFrame([(1, None)], "id: long, s: string"),
                     t, mode="overwrite")
    got = {tuple(r) for r in V.changes_between(spark, t, 1, 2, "id").collect()}
    assert got == {(1, None, "update_postimage")}


def test_scoped_merge_rewrites_only_touched_files(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id: long, s: string"), t)
    v = V.compact_snapshot(spark, t, n_files=4, cluster_by=["id"])
    before = V._read_manifest(t, v)
    # updates hit keys 0..9 (one clustered file) + one insert
    ups = spark.createDataFrame(
        [(i, f"NEW{i}") for i in range(10)] + [(999, "ins")],
        "id: long, s: string")
    v2 = V.merge_into_snapshot(spark, t, ups, key="id")
    after = V._read_manifest(t, v2)
    carried = set(before) & set(after)
    assert len(carried) == 3          # 3 of 4 clustered files untouched
    want = {(i, f"NEW{i}") for i in range(10)} \
        | {(i, f"v{i}") for i in range(10, 100)} | {(999, "ins")}
    assert _rows(V.read_version(spark, t, v2)) == want
    # untouched files kept their stats in the new manifest
    doc = V._read_manifest_doc(t, v2)
    assert carried <= set(doc["stats"])
    # pre-merge snapshot unchanged
    assert _rows(V.read_version(spark, t, v)) == {
        (i, f"v{i}") for i in range(100)}


def test_scoped_merge_insert_only_touches_nothing(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, s: string").coalesce(1), t)
    before = V._read_manifest(t, 1)
    v2 = V.merge_into_snapshot(spark, t, spark.createDataFrame(
        [(50, "new")], "id: long, s: string"), key="id")
    after = V._read_manifest(t, v2)
    assert set(before) <= set(after)  # nothing rewritten, pure append
    assert _rows(V.read_version(spark, t, v2)) == {
        (1, "a"), (2, "b"), (50, "new")}


def test_unscoped_merge_still_full_rewrite(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, s: string"), t)
    before = V._read_manifest(t, 1)
    v2 = V.merge_into_snapshot(spark, t, spark.createDataFrame(
        [(1, "A")], "id: long, s: string"), key="id", scoped=False)
    assert not set(before) & set(V._read_manifest(t, v2))
    assert _rows(V.read_version(spark, t, v2)) == {(1, "A"), (2, "b")}


def test_history_reports_files_rows_and_ledger(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.range(10).coalesce(2), t)
    V.commit_stream_batch(spark.range(5).coalesce(1), 7, t)
    h = V.history(t)
    assert [e["version"] for e in h] == [1, 2]
    assert h[0]["n_files"] == 2 and h[0]["n_rows"] == 10
    assert h[1]["n_files"] == 3 and h[1]["n_rows"] == 15
    assert h[1]["batch_ids"] == [7] and h[1]["is_latest"]
    assert not h[0]["is_latest"]


def test_rollback_restores_rows_without_rewriting_data(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,), (2,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame([(99,)], "id: long"), t,
                     mode="overwrite")           # the bad commit
    v3 = V.rollback(t, 1)
    assert v3 == 3 and V.latest_version(t) == 3
    assert _rows(V.read_version(spark, t)) == {(1,), (2,)}
    # no new data files: v3 references exactly v1's files
    assert V._read_manifest(t, 3) == V._read_manifest(t, 1)
    # bad version still time-travelable; stats carried for skipping
    assert _rows(V.read_version(spark, t, 2)) == {(99,)}
    assert set(V._read_manifest_doc(t, 3)["stats"]) == set(V._read_manifest(t, 1))
    with pytest.raises(FileNotFoundError):
        V.rollback(t, 42)


def test_concurrent_commit_never_overwrites_a_manifest(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    files = V._read_manifest(t, 1)
    V._commit(t, files, 2)                    # writer A wins version 2
    with pytest.raises(V.ConcurrentCommitError):
        V._commit(t, files, 2)                # writer B must NOT clobber
    assert V._read_manifest(t, 2) == files    # A's manifest intact


def test_append_rebases_over_interleaved_commit(spark, troot):
    # a concurrent writer publishes v2 while our append is in flight:
    # the append must land at v3 and include BOTH commits' rows
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)

    real_commit = V._commit
    raced = {"done": False}

    def racing_commit(table_dir, files, version, **kw):
        if not raced["done"]:
            raced["done"] = True
            other = V._new_data_files(
                spark.createDataFrame([(2,)], "id: long"), t, "b-race")
            real_commit(t, V._read_manifest(t, 1) + other, 2,
                        stats=V._stats_for(t, other))
        return real_commit(table_dir, files, version, **kw)

    V._commit = racing_commit
    try:
        v = V.write_snapshot(spark.createDataFrame([(3,)], "id: long"), t)
    finally:
        V._commit = real_commit
    assert v == 3
    assert _rows(V.read_version(spark, t)) == {(1,), (2,), (3,)}


def test_latest_version_survives_stale_pointer(spark, troot):
    import json as _json
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long"), t)
    V.write_snapshot(spark.createDataFrame([(2,)], "id: long"), t)
    # out-of-order pointer swap: pointer left behind at v1
    st = storage_for(t, spark)
    st.replace_text(st.join(t, "_manifests", "_latest.json"),
                    _json.dumps({"version": 1}))
    assert V.latest_version(t) == 2           # manifest set is authoritative
    assert _rows(V.read_version(spark, t)) == {(1,), (2,)}


def test_pruned_empty_read_resolves_evolved_column(spark, troot):
    # all files pruned by an id predicate; the residual filter references
    # a column only NEWER files carry -> must return empty, not raise
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "id: long").coalesce(1), t)
    V.write_snapshot(spark.createDataFrame(
        [(2, 5)], "id: long, extra: long").coalesce(1), t)
    got = V.read_version(spark, t, predicates=[("id", "=", 999),
                                               ("extra", "=", 5)])
    assert set(got.columns) == {"id", "extra"} and got.count() == 0


def test_scoped_merge_with_relative_table_dir(spark, tmp_path, monkeypatch):
    # manifest paths are stored absolute, so a relative table_dir cannot
    # desync the touched-file probe into duplicating updated rows
    monkeypatch.chdir(tmp_path)
    t = "reltbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, s: string").coalesce(1), t)
    v2 = V.merge_into_snapshot(spark, t, spark.createDataFrame(
        [(1, "A")], "id: long, s: string"), key="id")
    rows = sorted(tuple(r) for r in V.read_version(spark, t, v2).collect())
    assert rows == [(1, "A"), (2, "b")]      # no duplicate id=1


def test_bloom_skipping_prunes_unsorted_point_lookups(spark, troot):
    # random (unclustered) layout: every file's [min,max] spans the key
    # space, so bounds prune NOTHING — the per-file bloom does
    t = troot + "/tbl"
    import random
    ids = list(range(1000))
    random.Random(7).shuffle(ids)
    df = spark.createDataFrame([(i,) for i in ids], "id: long")
    V.write_snapshot(df.repartition(8), t, bloom_cols=["id"])
    bounds_only, total = V.prune_files(t, 1, [("id", ">=", 0)])
    assert total == 8 and len(bounds_only) == 8
    kept, _ = V.prune_files(t, 1, [("id", "=", 5)])
    assert 1 <= len(kept) <= 2               # bloom: the containing file (+FPs)
    assert _rows(V.read_version(spark, t, predicates=[("id", "=", 5)])) \
        == {(5,)}
    # a value that never existed: bloom can prune to zero files, and the
    # empty-result path still returns the right schema
    kept_absent, _ = V.prune_files(t, 1, [("id", "=", 10**9)])
    assert len(kept_absent) <= 1
    got = V.read_version(spark, t, predicates=[("id", "=", 10**9)])
    assert got.columns == ["id"] and got.count() == 0


def test_bloom_never_false_negative(spark, troot):
    t = troot + "/tbl"
    vals = [f"k{i:03d}" for i in range(200)]
    V.write_snapshot(spark.createDataFrame(
        [(v,) for v in vals], "k: string").repartition(4), t,
        bloom_cols=["k"])
    for v in vals[::17]:                     # sample of present values
        assert _rows(V.read_version(spark, t, predicates=[("k", "=", v)])) \
            == {(v,)}


def test_bloom_cols_are_table_metadata_surviving_rewrites(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(i, f"s{i}") for i in range(50)], "id: long, s: string")
        .coalesce(1), t, bloom_cols=["id"])
    assert V.table_bloom_cols(t) == ["id"]
    # merge rewrite: new files must carry blooms without re-passing
    v2 = V.merge_into_snapshot(spark, t, spark.createDataFrame(
        [(1, "NEW")], "id: long, s: string"), key="id")
    doc = V._read_manifest_doc(t, v2)
    assert doc["bloom_cols"] == ["id"]
    assert all("bloom" in st["columns"]["id"] for st in doc["stats"].values())
    # stream append likewise
    V.commit_stream_batch(spark.createDataFrame(
        [(99, "z")], "id: long, s: string").coalesce(1), 0, t)
    doc = V._read_manifest_doc(t, V.latest_version(t))
    assert doc["bloom_cols"] == ["id"]
    assert all("bloom" in st["columns"]["id"] for st in doc["stats"].values())


def test_bloom_probe_is_type_canonical(spark, troot):
    # the bounds path tolerates cross-type numeric predicates; the bloom
    # path must too — 5.0 against a long column may not false-prune
    t = troot + "/tbl"
    V.write_snapshot(spark.range(100).coalesce(1), t, bloom_cols=["id"])
    kept, _ = V.prune_files(t, 1, [("id", "=", 5.0)])
    assert len(kept) == 1
    assert _rows(V.read_version(spark, t, predicates=[("id", "=", 5.0)])) \
        == {(5,)}
    # non-integral float can prune (no long equals 5.5) but the read is
    # still exact either way
    assert V.read_version(spark, t,
                          predicates=[("id", "=", 5.5)]).count() == 0


def test_canon_uri_normalizes_all_spellings():
    """Every spelling of the same file URI must canonicalize equal —
    `Path.toString()` prints file:/x, `input_file_name()` prints
    file:///x with percent-escapes; a mismatch here is exactly the bug
    class the vacuum/scoped-merge comparisons guard against."""
    from databox_adls_loader_spark.sinks.storage import _canon_uri

    want = "file:///tmp/a b/x.parquet"
    assert _canon_uri("file:/tmp/a b/x.parquet") == want
    assert _canon_uri("file:///tmp/a%20b/x.parquet") == want
    assert _canon_uri("file://tmp/../tmp/a b/x.parquet") != want  # authority kept
    # scheme+authority preserved for remote stores
    assert _canon_uri("hdfs://nn:8020/data/t/p.parquet") == \
        "hdfs://nn:8020/data/t/p.parquet"
    assert _canon_uri("abfss://c@acct.dfs.core.windows.net/t/p%231.parquet") \
        == "abfss://c@acct.dfs.core.windows.net/t/p#1.parquet"
    # bare local path -> abspath
    import os
    assert _canon_uri("rel/x.parquet") == os.path.abspath("rel/x.parquet")


def test_storage_for_scheme_dispatch(spark):
    from databox_adls_loader_spark.sinks.storage import (
        HadoopStorage, LocalStorage, storage_for)

    assert isinstance(storage_for("/tmp/t"), LocalStorage)
    assert isinstance(storage_for("relative/dir"), LocalStorage)
    assert isinstance(storage_for("file:///tmp/t", spark), HadoopStorage)
    assert isinstance(storage_for("hdfs://nn/t", spark), HadoopStorage)


def test_distributed_stats_match_footer_stats(spark, tmp_path):
    """Commits with many files collect stats as ONE distributed job
    (grouped by `_metadata.file_path`); the manifest must be
    indistinguishable from the driver-side footer path — same
    num_rows/min/max/null_count, same Bloom bitmaps (the executor-side
    md5 position family is bit-identical to `_bloom_positions`), and
    identical pruning behavior."""
    t = str(tmp_path / "tbl")
    n_files = V._DISTRIBUTED_STATS_MIN_FILES + 3
    df = spark.createDataFrame(
        [(i, f"s{i:04d}", i % 5 == 0, None if i % 7 == 0 else i * 10)
         for i in range(400)],
        "id: long, s: string, flag: boolean, v: long")
    V.write_snapshot(df.repartition(n_files), t, bloom_cols=["id", "s"])
    doc = V._read_manifest_doc(t, 1)
    assert len(doc["files"]) == n_files
    # rebuild every file's stats through the driver-side footer path and
    # compare field by field
    st = V._st(t)
    for f in doc["files"]:
        want = V._file_stats(f, st, bloom_cols=["id", "s"])
        got = doc["stats"][f]
        assert got["num_rows"] == want["num_rows"]
        for c in ("id", "s", "flag", "v"):
            w, g = want["columns"][c], got["columns"][c]
            assert g.get("min") == w.get("min"), (f, c)
            assert g.get("max") == w.get("max"), (f, c)
            assert g["null_count"] == w["null_count"], (f, c)
        for c in ("id", "s"):
            assert got["columns"][c]["bloom"] == want["columns"][c]["bloom"], \
                (f, c)
    # pruning works end-to-end off the distributed stats
    kept, total = V.prune_files(t, 1, [("id", "=", 123)])
    assert total == n_files and 1 <= len(kept) <= 3
    assert {tuple(r) for r in V.read_version(
        spark, t, predicates=[("id", "=", 123)]).collect()} \
        == {(123, "s0123", False, 1230)}


def test_small_commits_keep_driver_side_stats_path(spark, tmp_path):
    # below the threshold the footer path runs (no Spark job per commit)
    t = str(tmp_path / "tbl")
    V.write_snapshot(spark.range(10).coalesce(2), t, bloom_cols=["id"])
    doc = V._read_manifest_doc(t, 1)
    assert len(doc["files"]) == 2
    for f in doc["files"]:
        assert "bloom" in doc["stats"][f]["columns"]["id"]


class TestCheckConstraints:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v long")

    def test_declared_once_enforced_on_later_writes(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        d = str(tmp_path / "t")
        ok = self._mk(spark, [(1, 10), (2, 20)])
        assert V.write_snapshot(ok, d, checks=["v > 0", "k IS NOT NULL"]) == 1
        assert sorted(V.table_checks(d)) == ["k IS NOT NULL", "v > 0"]
        # later write inherits the declared checks from the manifest
        bad = self._mk(spark, [(3, -5)])
        with pytest.raises(V.ConstraintViolation, match=r"v > 0"):
            V.write_snapshot(bad, d)
        # violating write left NO new version and the table intact
        assert V.latest_version(d) == 1
        assert V.read_version(spark, d).count() == 2
        # a clean later write still passes and carries the checks on
        assert V.write_snapshot(self._mk(spark, [(3, 5)]), d) == 2
        assert sorted(V.table_checks(d)) == ["k IS NOT NULL", "v > 0"]

    def test_null_predicate_counts_as_violation(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        d = str(tmp_path / "t")
        df = spark.createDataFrame([(1, None)], "k long, v long")
        with pytest.raises(V.ConstraintViolation):
            V.write_snapshot(df, d, checks=["v > 0"])

    def test_unique_check(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        d = str(tmp_path / "t")
        dup = self._mk(spark, [(1, 10), (1, 11)])
        with pytest.raises(V.ConstraintViolation, match="unique:k"):
            V.write_snapshot(dup, d, checks=["unique:k"])
        assert V.write_snapshot(
            self._mk(spark, [(1, 10), (2, 11)]), d, checks=["unique:k"]) == 1

    def test_stream_batch_enforces_table_checks(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        d = str(tmp_path / "t")
        V.write_snapshot(self._mk(spark, [(1, 1)]), d, checks=["v > 0"])
        assert V.commit_stream_batch(self._mk(spark, [(2, 2)]), 0, d)
        with pytest.raises(V.ConstraintViolation):
            V.commit_stream_batch(self._mk(spark, [(3, -1)]), 1, d)
        assert V.latest_version(d) == 2
        assert 1 not in V.committed_batch_ids(d)

    def test_scoped_merge_enforces_checks(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        d = str(tmp_path / "t")
        V.write_snapshot(self._mk(spark, [(1, 1), (2, 2)]), d,
                         checks=["v > 0"])
        with pytest.raises(V.ConstraintViolation):
            V.merge_into_snapshot(spark, d, self._mk(spark, [(1, -9)]), "k")
        assert V.latest_version(d) == 1
        v = V.merge_into_snapshot(spark, d, self._mk(spark, [(1, 9)]), "k")
        assert v == 2
        got = {r["k"]: r["v"] for r in V.read_version(spark, d).collect()}
        assert got == {1: 9, 2: 2}


class TestDeletionVectors:
    """Merge-on-read DELETE: position-delete files, read-path anti join,
    compaction materialization, vacuum reclaim (versioned.delete_where)."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v long")

    def test_delete_marks_rows_without_rewriting_data(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(i, i * 10) for i in range(10)]), t)
        before_files = V._read_manifest(t, 1)
        v, n = V.delete_where(spark, t, "k >= 7")
        assert (v, n) == (2, 3)
        # data files untouched — the delete commit references the SAME files
        assert V._read_manifest(t, v) == before_files
        assert _rows(V.read_version(spark, t)) == {
            (i, i * 10) for i in range(7)}
        # time travel: the pre-delete version still sees every row
        assert len(_rows(V.read_version(spark, t, 1))) == 10

    def test_delete_is_cumulative_and_idempotent(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(i, i) for i in range(6)]), t)
        _, n1 = V.delete_where(spark, t, "k = 0")
        _, n2 = V.delete_where(spark, t, "k <= 1")   # k=0 already deleted
        assert (n1, n2) == (1, 1)
        v, n3 = V.delete_where(spark, t, "k <= 1")   # nothing new: no-op
        assert n3 == 0 and v == V.latest_version(t)
        assert _rows(V.read_version(spark, t)) == {(i, i) for i in (2, 3, 4, 5)}

    def test_append_after_delete_keeps_delete_state(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 1), (2, 2)]), t)
        V.delete_where(spark, t, "k = 1")
        V.write_snapshot(self._mk(spark, [(3, 3)]), t)      # append
        assert _rows(V.read_version(spark, t)) == {(2, 2), (3, 3)}

    def test_compaction_materializes_deletes(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(
            self._mk(spark, [(i, i) for i in range(20)]).repartition(4), t)
        V.delete_where(spark, t, "k % 2 = 1")
        v = V.compact_snapshot(spark, t, n_files=1)
        dmap, drows = V.table_delete_map(t, v)
        assert dmap == {} and drows == {}            # delete-free manifest
        assert _rows(V.read_version(spark, t, v)) == {
            (i, i) for i in range(0, 20, 2)}

    def test_scoped_merge_applies_and_carries_deletes(self, spark, troot):
        t = troot + "/tbl"
        a = self._mk(spark, [(1, 1), (2, 2)])
        b = self._mk(spark, [(3, 3), (4, 4)])
        V.write_snapshot(a.coalesce(1), t)
        V.write_snapshot(b.coalesce(1), t)            # two data files
        V.delete_where(spark, t, "k = 2 OR k = 4")    # one delete per file
        v = V.merge_into_snapshot(
            spark, t, self._mk(spark, [(1, 99)]), key="k")
        # file A was rewritten (delete materialized there); file B is
        # untouched and must keep its delete state
        assert _rows(V.read_version(spark, t, v)) == {(1, 99), (3, 3)}
        dmap, _ = V.table_delete_map(t, v)
        assert len(dmap) == 1                         # only B still mapped

    def test_vacuum_reclaims_unreferenced_delete_files(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 1), (2, 2)]), t)
        V.delete_where(spark, t, "k = 1")
        V.compact_snapshot(spark, t, n_files=1)       # materialize
        V.write_snapshot(self._mk(spark, [(9, 9)]), t)
        V.vacuum(t, keep_versions=2)                  # drops v1, v2
        st = storage_for(t, spark)
        assert st.list_glob(st.join(t, "deletes", "*", "part-*.parquet")) \
            == []                                     # DV files reclaimed
        assert _rows(V.read_version(spark, t)) == {(2, 2), (9, 9)}

    def test_history_reports_live_rows_and_deletes(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(i, i) for i in range(10)]), t)
        V.delete_where(spark, t, "k < 4")
        h = {e["version"]: e for e in V.history(t)}
        assert h[1]["n_rows"] == 10 and h[1]["n_deleted"] == 0
        assert h[2]["n_rows"] == 6 and h[2]["n_deleted"] == 4

    def test_delete_with_predicates_prunes_scan_but_stays_exact(
            self, spark, troot):
        t = troot + "/tbl"
        df = self._mk(spark, [(i, i) for i in range(100)])
        V.write_snapshot(df, t)
        V.compact_snapshot(spark, t, n_files=4, cluster_by=["k"])
        v, n = V.delete_where(spark, t, "k >= 90",
                              predicates=[("k", ">=", 90)])
        assert n == 10
        assert _rows(V.read_version(spark, t)) == {
            (i, i) for i in range(90)}

    def test_changes_between_sees_dv_delete(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 1), (2, 2)]), t)
        v, _ = V.delete_where(spark, t, "k = 2")
        ch = {(r["k"], r["_change_type"])
              for r in V.changes_between(spark, t, 1, v, key="k").collect()}
        assert ch == {(2, "delete")}

    def test_stream_append_carries_delete_state(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 1), (2, 2)]), t)
        V.delete_where(spark, t, "k = 1")
        assert V.commit_stream_batch(self._mk(spark, [(5, 5)]), 0, t)
        assert _rows(V.read_version(spark, t)) == {(2, 2), (5, 5)}

    def test_pruned_read_composes_with_deletes(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(i, i) for i in range(100)]), t)
        V.compact_snapshot(spark, t, n_files=4, cluster_by=["k"])
        V.delete_where(spark, t, "k = 5")
        got = _rows(V.read_version(spark, t, predicates=[("k", "<", 10)]))
        assert got == {(i, i) for i in range(10) if i != 5}


class TestReferentialConstraints:
    """fk:col=ref_col@ref_path write-time constraints."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v long")

    def _dim(self, spark, tmp_path, keys):
        p = str(tmp_path / "dim")
        spark.createDataFrame([(k,) for k in keys], "id long") \
            .write.mode("overwrite").parquet(p)
        return p

    def test_fk_valid_and_orphan(self, spark, tmp_path):
        dim = self._dim(spark, tmp_path, [1, 2, 3])
        t = str(tmp_path / "t")
        fk = f"fk:v=id@{dim}"
        assert V.write_snapshot(
            self._mk(spark, [(10, 1), (11, 3)]), t, checks=[fk]) == 1
        with pytest.raises(V.ConstraintViolation, match="2 orphan"):
            V.write_snapshot(self._mk(spark, [(12, 7), (13, 8)]), t)
        assert V.latest_version(t) == 1      # violating write left nothing

    def test_fk_null_key_passes(self, spark, tmp_path):
        dim = self._dim(spark, tmp_path, [1])
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, None)], "k long, v long")
        assert V.write_snapshot(df, t, checks=[f"fk:v=id@{dim}"]) == 1

    def test_fk_against_versioned_dim_follows_latest(self, spark, tmp_path):
        dim = str(tmp_path / "dim")
        V.write_snapshot(spark.createDataFrame([(1,)], "id long"), dim)
        t = str(tmp_path / "t")
        fk = f"fk:v=id@{dim}"
        with pytest.raises(V.ConstraintViolation):
            V.write_snapshot(self._mk(spark, [(10, 2)]), t, checks=[fk])
        # the dim grows; the same write is now valid — FK reads LATEST
        V.write_snapshot(spark.createDataFrame([(2,)], "id long"), dim)
        assert V.write_snapshot(
            self._mk(spark, [(10, 2)]), t, checks=[fk]) == 1

    def test_fk_enforced_on_merge_and_stream(self, spark, tmp_path):
        dim = self._dim(spark, tmp_path, [1, 2])
        t = str(tmp_path / "t")
        V.write_snapshot(self._mk(spark, [(10, 1)]), t,
                         checks=[f"fk:v=id@{dim}"])
        with pytest.raises(V.ConstraintViolation):
            V.merge_into_snapshot(spark, t, self._mk(spark, [(10, 9)]), "k")
        with pytest.raises(V.ConstraintViolation):
            V.commit_stream_batch(self._mk(spark, [(11, 9)]), 0, t)
        assert V.latest_version(t) == 1

    def test_malformed_fk_spec_raises(self, spark, tmp_path):
        with pytest.raises(V.ConstraintViolation, match="malformed"):
            V.check_constraints(self._mk(spark, [(1, 1)]), ["fk:nonsense"])

    def test_fk_missing_ref_column_raises(self, spark, tmp_path):
        dim = self._dim(spark, tmp_path, [1])
        with pytest.raises(V.ConstraintViolation, match="not in referenced"):
            V.check_constraints(self._mk(spark, [(1, 1)]),
                                [f"fk:v=nope@{dim}"])


class TestIncrementalCompaction:
    """compact_small_files: OPTIMIZE that rewrites only sub-target
    files, leaving big files (and their stats) untouched."""

    def test_coalesces_only_small_files(self, spark, troot):
        t = troot + "/tbl"
        big = spark.range(0, 20_000).selectExpr("id as k")
        V.write_snapshot(big.coalesce(1), t)
        for i in range(4):                       # four tiny commits
            V.write_snapshot(
                spark.createDataFrame([(100_000 + i,)], "k long")
                .coalesce(1), t)
        before = V._read_manifest(t, V.latest_version(t))
        assert len(before) == 5
        big_file = V._read_manifest(t, 1)[0]
        v = V.compact_small_files(spark, t, target_bytes=64 * 1024)
        after = V._read_manifest(t, v)
        assert big_file in after                  # big file untouched
        assert len(after) < len(before)
        assert _rows(V.read_version(spark, t, v)) == \
            _rows(V.read_version(spark, t, v - 1))
        # the untouched file kept its manifest stats verbatim
        doc_b = V._read_manifest_doc(t, v - 1)
        doc_a = V._read_manifest_doc(t, v)
        assert doc_a["stats"][big_file] == doc_b["stats"][big_file]

    def test_noop_below_min_files(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(
            spark.createDataFrame([(1,)], "k long").coalesce(1), t)
        assert V.compact_small_files(spark, t, target_bytes=1 << 20) is None
        assert V.latest_version(t) == 1           # no empty commit

    def test_applies_deletes_on_small_keeps_on_big(self, spark, troot):
        t = troot + "/tbl"
        big = spark.range(0, 20_000).selectExpr("id as k")
        V.write_snapshot(big.coalesce(1), t)
        V.write_snapshot(
            spark.createDataFrame([(-1,), (-2,)], "k long").coalesce(1), t)
        V.write_snapshot(
            spark.createDataFrame([(-3,)], "k long").coalesce(1), t)
        V.delete_where(spark, t, "k = -2 OR k = 5")   # small + big file hit
        v = V.compact_small_files(spark, t, target_bytes=64 * 1024)
        dmap, _ = V.table_delete_map(t, v)
        big_file = V._read_manifest(t, 1)[0]
        assert set(dmap) == {big_file}            # big keeps its DV
        rows = {r["k"] for r in V.read_version(spark, t, v).collect()}
        assert -2 not in rows and 5 not in rows and -1 in rows and -3 in rows


class TestColumnMapping:
    """Metadata-only RENAME/DROP COLUMN (column mapping): no data file
    is rewritten; readers see the logical schema, writers keep landing
    files in the physical schema; compaction materializes."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v long")

    def test_rename_is_metadata_only(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10), (2, 20)]), t)
        before = V._read_manifest(t, 1)
        v = V.rename_column(t, "v", "amount")
        assert V._read_manifest(t, v) == before      # no rewrite
        got = V.read_version(spark, t)
        assert got.columns == ["k", "amount"]
        assert {tuple(r) for r in got.collect()} == {(1, 10), (2, 20)}
        # time travel: the pre-rename version still reads as 'v'
        assert V.read_version(spark, t, 1).columns == ["k", "v"]

    def test_append_after_rename_lands_physical(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10)]), t)
        V.rename_column(t, "v", "amount")
        batch = spark.createDataFrame([(2, 20)], "k long, amount long")
        V.write_snapshot(batch, t)                   # logical-named batch
        got = V.read_version(spark, t)
        assert got.columns == ["k", "amount"]
        assert {tuple(r) for r in got.collect()} == {(1, 10), (2, 20)}
        # the new file's parquet schema uses the PHYSICAL name, so all
        # files stay mergeable
        import pyarrow.parquet as pq
        newest = sorted(V._read_manifest(t, V.latest_version(t)))
        names = set()
        for f in newest:
            names.update(pq.ParquetFile(f.removeprefix("file:")).schema_arrow.names)
        assert names == {"k", "v"}

    def test_drop_column_hides_without_rewrite(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10)]), t)
        before = V._read_manifest(t, 1)
        v = V.drop_column(t, "v")
        assert V._read_manifest(t, v) == before
        assert V.read_version(spark, t).columns == ["k"]
        assert V.read_version(spark, t, 1).columns == ["k", "v"]

    def test_rename_then_skipping_predicates_use_logical(self, spark, troot):
        t = troot + "/tbl"
        df = self._mk(spark, [(i, i * 10) for i in range(100)])
        V.write_snapshot(df, t)
        V.compact_snapshot(spark, t, n_files=4, cluster_by=["k"])
        V.rename_column(t, "k", "key")
        kept, total = V.prune_files(t, V.latest_version(t),
                                    [("key", "<", 10)])
        assert len(kept) < total                      # pruning still works
        got = V.read_version(spark, t, predicates=[("key", "<", 10)])
        assert {r["key"] for r in got.collect()} == set(range(10))

    def test_scoped_merge_on_renamed_key(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10), (2, 20)]).coalesce(1), t)
        V.write_snapshot(self._mk(spark, [(3, 30)]).coalesce(1), t)
        V.rename_column(t, "k", "key")
        ups = spark.createDataFrame([(1, 99), (4, 44)],
                                    "key long, v long")
        v = V.merge_into_snapshot(spark, t, ups, key="key")
        got = {r["key"]: r["v"] for r in
               V.read_version(spark, t, v).collect()}
        assert got == {1: 99, 2: 20, 3: 30, 4: 44}

    def test_delete_where_uses_logical_names(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10), (2, 20)]), t)
        V.rename_column(t, "v", "amount")
        _, n = V.delete_where(spark, t, "amount = 20")
        assert n == 1
        assert {tuple(r) for r in V.read_version(spark, t).collect()} == \
            {(1, 10)}

    def test_compaction_materializes_mapping(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10), (2, 20)]), t)
        V.rename_column(t, "v", "amount")
        V.drop_column(t, "k")
        v = V.compact_snapshot(spark, t, n_files=1)
        cmap, dropped = V.table_column_map(t, v)
        assert cmap == {} and dropped == []           # identity again
        got = V.read_version(spark, t, v)
        assert got.columns == ["amount"]
        assert {tuple(r) for r in got.collect()} == {(10,), (20,)}

    def test_rename_conflicts_rejected(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10)]), t)
        with pytest.raises(ValueError, match="already exists"):
            V.rename_column(t, "v", "k")
        V.drop_column(t, "v")
        with pytest.raises(ValueError, match="dropped"):
            V.rename_column(t, "v", "w")

    def test_rename_survives_rollback_and_stream(self, spark, troot):
        t = troot + "/tbl"
        V.write_snapshot(self._mk(spark, [(1, 10)]), t)
        v2 = V.rename_column(t, "v", "amount")
        batch = spark.createDataFrame([(2, 22)], "k long, amount long")
        assert V.commit_stream_batch(batch, 0, t)
        assert {tuple(r) for r in V.read_version(spark, t).collect()} == \
            {(1, 10), (2, 22)}
        v4 = V.rollback(t, v2)
        assert V.read_version(spark, t, v4).columns == ["k", "amount"]


class TestTimestampTimeTravel:
    """TIMESTAMP AS OF: version_at_timestamp + read_version(as_of=...)."""

    def test_resolves_to_newest_at_or_before(self, spark, tmp_path):
        import json

        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1,)], "k long"), t)
        V.write_snapshot(spark.createDataFrame([(2,)], "k long"), t)
        # pin deterministic commit times (test controls the clock)
        st = storage_for(t, spark)
        for v, at in [(1, "2024-01-01T00:00:00+00:00"),
                      (2, "2024-06-01T00:00:00+00:00")]:
            p = V._manifest_path(st, t, v)
            doc = json.loads(st.read_text(p))
            doc["committed_at"] = at
            st.delete(p)
            st.create_exclusive(p, json.dumps(doc))
        assert V.version_at_timestamp(t, "2024-03-01") == 1
        assert V.version_at_timestamp(t, "2024-06-01T00:00:00+00:00") == 2
        assert V.version_at_timestamp(t, "2030-01-01") == 2
        with pytest.raises(FileNotFoundError):
            V.version_at_timestamp(t, "2020-01-01")
        got = {r["k"] for r in
               V.read_version(spark, t, as_of="2024-03-01").collect()}
        assert got == {1}

    def test_version_and_as_of_mutually_exclusive(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1,)], "k long"), t)
        with pytest.raises(ValueError):
            V.read_version(spark, t, version=1, as_of="2030-01-01")

    def test_every_commit_path_records_timestamp(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1, 2)], "k long, v long"), t)
        V.merge_into_snapshot(
            spark, t, spark.createDataFrame([(1, 9)], "k long, v long"), "k")
        V.compact_snapshot(spark, t, n_files=1)
        V.rename_column(t, "v", "w")
        for v in V.versions(t):
            assert V._read_manifest_doc(t, v).get("committed_at")


class TestConstraintSchemaEvolutionGuard:
    """Renaming/dropping a column a stored constraint references is
    refused loudly (stored exprs name the old logical — later writes
    would fail analysis confusingly, or worse silently skip)."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v long")

    def test_rename_checked_column_refused(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(self._mk(spark, [(1, 1)]), t, checks=["v > 0"])
        with pytest.raises(ValueError, match="referenced by stored"):
            V.rename_column(t, "v", "amount")
        # re-declaring the check under the new name unblocks the rename
        V.write_snapshot(self._mk(spark, [(2, 2)]), t, checks=["k > 0"])
        assert V.rename_column(t, "v", "amount") == 3

    def test_drop_unique_or_fk_column_refused(self, spark, tmp_path):
        dim = str(tmp_path / "dim")
        spark.createDataFrame([(1,)], "id long").write.parquet(dim)
        t = str(tmp_path / "t")
        V.write_snapshot(self._mk(spark, [(1, 1)]), t,
                         checks=["unique:k", f"fk:v=id@{dim}"])
        with pytest.raises(ValueError, match="unique:k"):
            V.drop_column(t, "k")
        with pytest.raises(ValueError, match="fk:v"):
            V.rename_column(t, "v", "w")

    def test_unrelated_column_still_evolves(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(self._mk(spark, [(1, 1)]), t, checks=["v > 0"])
        assert V.rename_column(t, "k", "key") == 2


class TestRound7Fixes:
    """Round-7 defect fixes: NaN max in distributed stats, batched FK
    probes, bloom_cols=[] clearing through the stream sink, and the
    rename guard seeing stats-less (struct) columns."""

    def test_distributed_stats_drop_bounds_on_nan_max(self, spark, tmp_path):
        # Spark's max() returns NaN whenever ANY value is NaN (NaN sorts
        # greatest) even while min() is finite — the manifest must drop
        # BOTH bounds for that file's column, exactly like the footer
        # path, or pruning silently drops files that contain matches.
        from pyspark.sql import functions as F

        t = str(tmp_path / "t")
        n_files = V._DISTRIBUTED_STATS_MIN_FILES
        n_rows = n_files * 10
        df = (spark.range(n_rows)
              .withColumn("x", F.when(F.col("id") == 5,
                                      F.lit(float("nan")))
                          .otherwise(F.col("id").cast("double"))))
        V.write_snapshot(df.repartition(n_files), t)
        doc = V._read_manifest_doc(t, 1)
        assert len(doc["files"]) == n_files
        dropped_bounds = 0
        for f, stt in doc["stats"].items():
            c = stt["columns"]["x"]
            mx = c.get("max")
            assert not (isinstance(mx, float) and mx != mx), f
            if "min" not in c:
                dropped_bounds += 1
        assert dropped_bounds >= 1           # the NaN file lost its bounds
        # under the bug the NaN file pruned away on any x predicate
        # (NaN >= 0.0 is False in Python) and its rows went missing;
        # in Spark's ordering NaN is greatest, so x >= 0 keeps ALL rows
        got = V.read_version(spark, t, predicates=[("x", ">=", 0.0)])
        assert got.count() == n_rows

    def test_multi_fk_probes_share_one_batch_scan(self, spark, tmp_path):
        # 3 FK constraints must cost ONE probe job over the batch (plus
        # the per-dim reference reads), not one anti-join job per FK —
        # and report the same per-constraint orphan counts.
        dims = {}
        for name in ("d1", "d2", "d3"):
            p = str(tmp_path / name)
            spark.createDataFrame([(k,) for k in (1, 2, 3)], "id long") \
                .write.parquet(p)
            dims[name] = p
        df = spark.createDataFrame(
            [(1, 1, 2, 3), (2, 3, 1, 9), (3, 2, None, 8)],
            "k long, a long, b long, c long")
        checks = [f"fk:a=id@{dims['d1']}", f"fk:b=id@{dims['d2']}",
                  f"fk:c=id@{dims['d3']}"]
        sc = spark.sparkContext
        sc.setJobGroup("fkprobe-r7", "batched fk probe")
        try:
            with pytest.raises(V.ConstraintViolation) as ei:
                V.check_constraints(df, checks)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        msg = str(ei.value)
        assert "fk:c=id" in msg and "2 orphan" in msg
        assert "fk:a=id" not in msg and "fk:b=id" not in msg  # NULL passes
        batched = len(sc.statusTracker().getJobIdsForGroup("fkprobe-r7"))
        # relative gate: replay the OLD serial shape (one anti-join
        # count job per FK) under its own group — the batched path must
        # cost strictly fewer Spark jobs, because the k orphan counts
        # collapse into one aggregate over one batch scan
        from pyspark.sql import functions as F
        sc.setJobGroup("fkprobe-r7-serial", "serial fk probe")
        try:
            for spec in checks:
                col, ref_col, ref_path = V._parse_fk(spec)
                ref = V._read_fk_ref(spark, ref_path)
                (df.select(F.col(col).alias("__k")).na.drop()
                 .join(F.broadcast(ref.select(F.col(ref_col).alias("__k"))
                                   .distinct()), "__k", "left_anti")
                 .count())
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        serial = len(sc.statusTracker().getJobIdsForGroup(
            "fkprobe-r7-serial"))
        assert batched < serial, (batched, serial)

    def test_stream_commit_empty_bloom_cols_clears(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(10).coalesce(1), t, bloom_cols=["id"])
        assert V.table_bloom_cols(t) == ["id"]
        # [] must CLEAR (write_snapshot semantics), not re-inherit
        assert V.commit_stream_batch(spark.range(5).coalesce(1), 0, t,
                                     bloom_cols=[])
        assert V.table_bloom_cols(t) == []
        # and None still inherits (now: nothing)
        assert V.commit_stream_batch(spark.range(3).coalesce(1), 1, t)
        assert V.table_bloom_cols(t) == []

    def test_rename_collision_with_stats_less_column_refused(
            self, spark, tmp_path):
        from pyspark.sql import functions as F

        t = str(tmp_path / "t")
        df = spark.range(3).select(
            "id", F.struct(F.lit(1).alias("a")).alias("meta"))
        V.write_snapshot(df.coalesce(1), t)
        # struct columns never get footer-stats entries; the guard must
        # still see `meta` via the file schema and refuse the collision
        with pytest.raises(ValueError, match="already exists"):
            V.rename_column(t, "id", "meta")


class TestRunLengthDeleteVectors:
    """Round-7: delete files are run-length (file, start, len) ranges —
    O(runs) on disk for contiguous mass deletes, written per-file (no
    repartition(1) funnel) — while legacy position-list files and mixed
    tables keep reading correctly."""

    def test_contiguous_mass_delete_is_o_runs(self, spark, tmp_path):
        t = str(tmp_path / "t")
        n = 200_000
        V.write_snapshot(spark.range(n).coalesce(2), t)
        v, n_del = V.delete_where(spark, t, f"id < {n // 2}")
        assert (v, n_del) == (2, n // 2)
        st = V._st(t)
        dmap, drows = V.table_delete_map(t)
        dvs = sorted({d for ds in dmap.values() for d in ds})
        assert sum(drows[d] for d in dvs) == n // 2
        # the artifact stores RUNS, not positions: a 100k-row contiguous
        # delete over 2 files is a handful of rows and a few KB
        import pyarrow.parquet as pq
        total_rows = sum(
            pq.ParquetFile(st.parquet_source(d)).metadata.num_rows
            for d in dvs)
        assert total_rows <= 8, total_rows
        assert sum(st.file_size(d) for d in dvs) < 64 * 1024
        # read-back correctness
        out = V.read_version(spark, t)
        assert out.count() == n - n // 2
        assert out.agg({"id": "min"}).collect()[0][0] == n // 2

    def test_scattered_delete_round_trips(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(1000).coalesce(3), t)
        V.delete_where(spark, t, "id % 7 = 0")
        got = sorted(r["id"] for r in
                     V.read_version(spark, t).collect())
        assert got == [i for i in range(1000) if i % 7]
        # second delete excludes already-deleted positions exactly
        v, n2 = V.delete_where(spark, t, "id % 14 = 0")
        assert n2 == 0 and v == 2            # no-op: all already gone

    def test_legacy_position_list_files_still_read(self, spark, tmp_path):
        from pyspark.sql import functions as F

        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(100).coalesce(1), t)
        st = V._st(t)
        f = V._read_manifest(t, 1)[0]
        # hand-write an OLD-format (__file, __pos) delete file and
        # commit it through the manifest, as a pre-run-length table
        # would have left it
        legacy_dir = st.join(t, "deletes", "legacy")
        # real DVs store the _metadata.file_path URI spelling
        # (Path.toString form: file:/abs, single slash)
        f_uri = "file:" + f
        (spark.range(10).select(
            F.lit(f_uri).alias("__file"), F.col("id").alias("__pos"))
         .coalesce(1).write.parquet(legacy_dir))
        legacy = sorted(st.canon(p) for p in st.list_glob(
            st.join(legacy_dir, "part-*.parquet")))
        V._commit(t, [f], 2, stats=V._inherited_stats(t, 1),
                  delete_files={f: legacy},
                  delete_rows={legacy[0]: 10})
        assert sorted(r["id"] for r in
                      V.read_version(spark, t).collect()) == list(range(10, 100))
        # a NEW run-length delete on top of the legacy state composes
        v, n = V.delete_where(spark, t, "id >= 90")
        assert (v, n) == (3, 10)
        assert sorted(r["id"] for r in V.read_version(spark, t).collect()) \
            == list(range(10, 90))


class TestStringBoundsAndDistributedAttribution:
    """Round-7: manifest string bounds are truncated (≤64 chars, still
    valid), and the distributed stats job attributes rows to files on
    bare-path tables (the file:/-vs-abspath key mismatch silently
    demoted it to per-file driver footer reads)."""

    def test_truncate_str_bounds_validity(self):
        big_a, big_b = "a" * 100, "b" * 100
        lo, hi = V._truncate_str_bounds(big_a, big_b)
        assert lo <= big_a and hi >= big_b
        assert len(lo) <= 64 and len(hi) <= 64
        # short strings pass through untouched
        assert V._truncate_str_bounds("abc", "abd") == ("abc", "abd")
        # non-strings untouched
        assert V._truncate_str_bounds(3, 9) == (3, 9)
        # all-maximal max: no short upper bound exists
        assert V._truncate_str_bounds("a", chr(0x10FFFF) * 70) is None
        # surrogate gap skipped on the bump
        mx = "x" + chr(0xD7FF) * 70
        lo2, hi2 = V._truncate_str_bounds("a" * 70, mx)
        assert hi2 >= mx and all(not 0xD800 <= ord(c) <= 0xDFFF
                                 for c in hi2)

    def test_distributed_stats_attribute_files_on_bare_paths(
            self, spark, tmp_path):
        # >4KB strings make the regression observable: parquet footers
        # drop their stats entirely, so bounds can only come from the
        # distributed job having matched `_metadata` URIs onto manifest
        # paths — before the fix, no text bounds appeared at all
        t = str(tmp_path / "t")
        n_files = V._DISTRIBUTED_STATS_MIN_FILES
        df = spark.createDataFrame(
            [(i, f"{i:06d}" + "x" * 5000) for i in range(200)],
            "id long, text string")
        V.write_snapshot(df.repartition(n_files), t)
        doc = V._read_manifest_doc(t, 1)
        assert len(doc["files"]) == n_files
        for f in doc["files"]:
            c = doc["stats"][f]["columns"]["text"]
            assert "min" in c, f
            assert len(c["min"]) <= 64 and len(c["max"]) <= 64
        # manifest stays small despite 5KB strings
        st = V._st(t)
        assert st.file_size(V._manifest_path(st, t, 1)) < 64 * 1024

    def test_truncated_bounds_still_prune_exactly(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rows = [(i, ("a" if i < 50 else "z") * 100 + f"{i:04d}")
                for i in range(100)]
        df = spark.createDataFrame(rows, "id long, text string")
        V.write_snapshot(df.filter("id < 50").coalesce(1), t)
        V.write_snapshot(df.filter("id >= 50").coalesce(1), t)
        target = "z" * 100 + "0099"
        kept, total = V.prune_files(t, 2, [("text", "=", target)])
        assert total == 2 and len(kept) == 1
        got = V.read_version(spark, t,
                             predicates=[("text", "=", target)]).collect()
        assert [r["id"] for r in got] == [99]


class TestVacuumRetentionAndClone:
    """Round-7: age-based vacuum retention and zero-copy shallow
    clones."""

    def test_age_based_retention_keeps_recent_and_latest(
            self, spark, tmp_path):
        import datetime as dtm
        import json

        t = str(tmp_path / "t")
        for i in range(2):
            V.write_snapshot(spark.createDataFrame([(i,)], "id long")
                             .coalesce(1), t)
        # v3 overwrites, so v1/v2's files become reclaimable history
        V.write_snapshot(spark.createDataFrame([(2,)], "id long")
                         .coalesce(1), t, mode="overwrite")
        V.write_snapshot(spark.createDataFrame([(3,)], "id long")
                         .coalesce(1), t)
        # age v1/v2 artificially into the past
        st = V._st(t)
        for v in (1, 2):
            p = V._manifest_path(st, t, v)
            doc = json.loads(st.read_text(p))
            doc["committed_at"] = "2000-01-01T00:00:00+00:00"
            st.replace_text(p, json.dumps(doc))
        cutoff = (dtm.datetime.now(dtm.timezone.utc)
                  - dtm.timedelta(days=1)).isoformat()
        deleted = V.vacuum(t, older_than=cutoff)
        assert V.versions(t) == [3, 4]
        assert deleted >= 1              # v1/v2-only files reclaimed
        assert {r["id"] for r in V.read_version(spark, t).collect()} \
            == {2, 3}                    # latest content intact

    def test_age_retention_never_drops_latest(self, spark, tmp_path):
        import json

        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(2).coalesce(1), t)
        st = V._st(t)
        p = V._manifest_path(st, t, 1)
        doc = json.loads(st.read_text(p))
        doc["committed_at"] = "2000-01-01T00:00:00+00:00"
        st.replace_text(p, json.dumps(doc))
        V.vacuum(t, older_than="2020-01-01T00:00:00+00:00")
        assert V.versions(t) == [1]      # ancient but latest: retained
        assert V.read_version(spark, t).count() == 2

    def test_time_travel_horizon_composes_with_as_of(self, spark,
                                                     tmp_path):
        """Round-9 (verdict #6): vacuum(older_than=...) + TIMESTAMP AS
        OF give the operator a travel-horizon promise — AS-OF works at
        any point inside the horizon, raises a clear error past it,
        and `table_health` reports the horizon."""
        import json

        from databox_adls_loader_spark.sinks.maintenance import \
            table_health

        t = str(tmp_path / "t")
        for i in range(4):
            V.write_snapshot(spark.createDataFrame([(i,)], "id long")
                             .coalesce(1), t,
                             mode="overwrite" if i == 2 else "append")
        # age v1/v2 into the past; v3/v4 keep real (recent) stamps
        st = V._st(t)
        for v, day in ((1, "01"), (2, "02")):
            p = V._manifest_path(st, t, v)
            doc = json.loads(st.read_text(p))
            doc["committed_at"] = f"2000-01-{day}T00:00:00+00:00"
            st.replace_text(p, json.dumps(doc))
        v3_at = V._read_manifest_doc(t, 3)["committed_at"]
        V.vacuum(t, older_than="2020-01-01T00:00:00+00:00")
        assert V.versions(t) == [3, 4]
        h = table_health(t)
        assert h["retained_versions"] == 2
        assert h["oldest_version"] == 3
        assert h["time_travel_horizon"] == v3_at
        assert h["latest_committed_at"] == \
            V._read_manifest_doc(t, 4)["committed_at"]
        # inside the horizon: AS-OF at v3's exact stamp reads v3
        got = V.read_version(spark, t, as_of=v3_at)
        assert {r["id"] for r in got.collect()} == {2}
        # past the horizon: a clear refusal, not a wrong answer
        with pytest.raises(FileNotFoundError, match="no retained"):
            V.read_version(spark, t, as_of="2010-01-01T00:00:00+00:00")
        # travel to now still answers with the latest
        assert {r["id"] for r in
                V.read_version(spark, t,
                               as_of=h["latest_committed_at"])
                .collect()} == {2, 3}

    def test_shallow_clone_zero_copy_then_diverges(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        V.write_snapshot(spark.range(100).coalesce(2), src)
        V.delete_where(spark, src, "id >= 90")
        V.clone_shallow(src, dst)
        # clone == source snapshot, including merge-on-read state,
        # without a single data file under the clone's tree
        assert {r["id"] for r in V.read_version(spark, dst).collect()} \
            == set(range(90))
        st = V._st(dst)
        assert st.list_glob(st.join(dst, "data", "*",
                                    "part-*.parquet")) == []
        # divergence: writes to the clone never touch the source
        V.write_snapshot(spark.createDataFrame([(1000,)], "id long")
                         .coalesce(1), dst)
        V.delete_where(spark, dst, "id < 10")
        assert V.read_version(spark, dst).count() == 81
        assert {r["id"] for r in V.read_version(spark, src).collect()} \
            == set(range(90))
        # the clone's vacuum reclaims only its own tree
        V.compact_snapshot(spark, dst, n_files=1)
        V.vacuum(dst, keep_versions=1)
        assert V.read_version(spark, dst).count() == 81
        assert {r["id"] for r in V.read_version(spark, src).collect()} \
            == set(range(90))            # source files survived

    def test_clone_refuses_existing_target_and_carries_checks(
            self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        V.write_snapshot(spark.createDataFrame([(1,)], "id long"),
                         src, checks=["id > 0"])
        V.clone_shallow(src, dst)
        assert V.table_checks(dst) == ["id > 0"]
        with pytest.raises(FileExistsError):
            V.clone_shallow(src, dst)
        with pytest.raises(V.ConstraintViolation):
            V.write_snapshot(spark.createDataFrame([(-5,)], "id long"),
                             dst)


class TestHistoryCommittedAt:
    """Round-8: `history()` exposes each version's commit timestamp —
    the DESCRIBE HISTORY column TIMESTAMP-AS-OF consumers resolve
    against (`version_at_timestamp` itself predates this round)."""

    def test_history_committed_at_resolves_versions(self, spark,
                                                    tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1,)], "id long"), t)
        V.write_snapshot(spark.createDataFrame([(2,)], "id long"), t)
        h = {r["version"]: r["committed_at"] for r in V.history(t)}
        assert all(h.values())            # every version carries one
        assert h[1] <= h[2]               # ISO strings order correctly
        # the exposed timestamps round-trip through AS-OF resolution
        assert V.version_at_timestamp(t, h[1]) == 1
        assert V.version_at_timestamp(t, h[2]) == 2
        assert V.read_version(spark, t, as_of=h[1]).count() == 1
