"""Equality deletes (delete-by-key, O(keys) commit) and merge-on-read
UPDATE on the versioned table (sinks/versioned.py: delete_where_keys,
update_where, _eq_anti/_eq_groups read path).

Contract under test (the Iceberg v2 equality-delete semantics):
  * commit cost is metadata + one key file — NO data file is rewritten
    and NO data scan runs at delete time;
  * the delete applies only to files present at commit time (sequence
    semantics) — re-inserting a deleted key later resurrects it;
  * every reader agrees: read_version, the DSv2 batch format, scans
    through delete_where/update_where, compaction (which materializes),
    CDF, rollback/clone/branch restoration.
"""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.sinks import versioned as V


@pytest.fixture(params=["local", "hadoop"])
def troot(request, tmp_path):
    if request.param == "local":
        return str(tmp_path)
    return f"file://{tmp_path}"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _tbl(spark, troot, rows=((1, "a"), (2, "b"), (3, "c"), (4, "d"))):
    t = troot + "/tbl"
    V.write_snapshot(
        spark.createDataFrame(list(rows), "id: long, s: string"), t)
    return t


# -- basic semantics ---------------------------------------------------------

def test_eq_delete_basic_and_no_data_rewrite(spark, troot):
    t = _tbl(spark, troot)
    files_before = V._read_manifest(t, 1)
    v, n = V.delete_where_keys(spark, t, "id", [2, 4, 99])
    assert v == 2 and n == 3          # keys counted, not rows
    # metadata-only: the data-file list is byte-identical
    assert V._read_manifest(t, 2) == files_before
    assert _rows(V.read_version(spark, t)) == {(1, "a"), (3, "c")}
    # time travel unaffected
    assert len(_rows(V.read_version(spark, t, 1))) == 4


def test_eq_delete_empty_and_null_keys_are_noops(spark, troot):
    t = _tbl(spark, troot)
    assert V.delete_where_keys(spark, t, "id", []) == (1, 0)
    assert V.delete_where_keys(spark, t, "id", [None]) == (1, 0)
    assert V.latest_version(t) == 1


def test_eq_delete_null_column_values_survive(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(
        spark.createDataFrame([(1, "a"), (None, "n")],
                              "id: long, s: string"), t)
    V.delete_where_keys(spark, t, "id", [1])
    # NULL never matches an IN-list: the NULL-keyed row survives
    assert _rows(V.read_version(spark, t)) == {(None, "n")}


def test_eq_delete_sequence_semantics_reinsert_survives(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])
    # CDC replay shape: delete(k) then insert(k) — the insert must live
    V.write_snapshot(
        spark.createDataFrame([(2, "b2")], "id: long, s: string"), t)
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (3, "c"), (4, "d"), (2, "b2")}
    # and the older file's key-2 row stays deleted
    assert (2, "b") not in _rows(V.read_version(spark, t))


def test_eq_delete_dataframe_values(spark, troot):
    t = _tbl(spark, troot)
    keys = spark.createDataFrame([(1,), (3,), (None,)], "k: long")
    v, n = V.delete_where_keys(spark, t, "id", keys)
    assert n == 2
    assert _rows(V.read_version(spark, t)) == {(2, "b"), (4, "d")}


def test_eq_delete_stats_pruning_scopes_applies_to(spark, troot):
    t = troot + "/tbl"
    df = spark.createDataFrame([(i, str(i)) for i in range(100)],
                               "id: long, s: string")
    V.write_snapshot(df, t)
    V.compact_snapshot(spark, t, n_files=4, cluster_by=["id"])
    v, n = V.delete_where_keys(spark, t, "id", [5])
    entry = V.table_eq_deletes(t)[0]
    # clustered stats prove 3 of 4 files can't hold key 5
    assert len(entry["applies_to"]) < len(V._read_manifest(t, v))
    assert (5, "5") not in _rows(V.read_version(spark, t))
    assert len(_rows(V.read_version(spark, t))) == 99


def test_eq_delete_then_position_delete_on_same_table(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [1])
    v, n = V.delete_where(spark, t, "id >= 3")
    assert n == 2
    assert _rows(V.read_version(spark, t)) == {(2, "b")}
    # and the other order: position first, then equality
    t2 = troot + "/tbl2"
    V.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                              "id: long, s: string"), t2)
    V.delete_where(spark, t2, "id = 1")
    V.delete_where_keys(spark, t2, "id", [3])
    assert _rows(V.read_version(spark, t2)) == {(2, "b")}


def test_position_delete_does_not_recount_eq_deleted_rows(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])
    # the WHERE matches rows 2,3,4 but row 2 is already eq-dead
    v, n = V.delete_where(spark, t, "id >= 2")
    assert n == 2


def test_eq_delete_unknown_column_raises(spark, troot):
    t = _tbl(spark, troot)
    with pytest.raises(ValueError, match="unknown column"):
        V.delete_where_keys(spark, t, "nope", [1])


# -- interactions with table evolution --------------------------------------

def test_eq_delete_survives_rename(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [1])
    V.rename_column(t, "id", "ident")
    got = _rows(V.read_version(spark, t))
    assert got == {(2, "b"), (3, "c"), (4, "d")}
    # and a delete issued AGAINST the renamed logical name works
    V.delete_where_keys(spark, t, "ident", [3])
    assert _rows(V.read_version(spark, t)) == {(2, "b"), (4, "d")}


def test_compact_materializes_eq_deletes(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])
    v = V.compact_snapshot(spark, t, n_files=1)
    assert V.table_eq_deletes(t, v) == []      # state gone
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (3, "c"), (4, "d")}


def test_incremental_optimize_materializes_small_keeps_big(spark, troot):
    t = troot + "/tbl"
    big = spark.createDataFrame([(i, "x" * 200) for i in range(2000)],
                                "id: long, s: string").coalesce(1)
    V.write_snapshot(big, t)
    small = spark.createDataFrame([(9000, "s1"), (9001, "s2")],
                                  "id: long, s: string").coalesce(1)
    V.write_snapshot(small, t)
    V.delete_where_keys(spark, t, "id", [0, 9000])
    st = V._st(t)
    sizes = {f: st.file_size(f) for f in V._read_manifest(t, 3)}
    target = max(s for s in sizes.values())    # big file rides
    v = V.compact_small_files(spark, t, target_bytes=target, min_files=1)
    assert v is not None
    eqs = V.table_eq_deletes(t, v)
    # the big file still carries the entry; the small rewrite dropped it
    assert len(eqs) == 1
    assert all(sizes.get(f, 0) == target for f in eqs[0]["applies_to"])
    got = _rows(V.read_version(spark, t))
    assert (0, "x" * 200) not in got and (9000, "s1") not in got
    assert (9001, "s2") in got and len(got) == 2000


def test_merge_materializes_eq_on_touched_files(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])
    ups = spark.createDataFrame([(3, "C")], "id: long, s: string")
    V.merge_into_snapshot(spark, t, ups, "id")
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (3, "C"), (4, "d")}


def test_overwrite_clears_eq_state(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])
    V.write_snapshot(spark.createDataFrame([(2, "z")],
                                           "id: long, s: string"),
                     t, mode="overwrite")
    assert V.table_eq_deletes(t) == []
    assert _rows(V.read_version(spark, t)) == {(2, "z")}


def test_rollback_restores_eq_state_both_ways(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])          # v2
    V.write_snapshot(spark.createDataFrame([(5, "e")],
                                           "id: long, s: string"), t)  # v3
    # roll back past the delete: key 2 returns
    V.rollback(t, 1)                                   # v4
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    # roll forward onto the deleted state: key 2 gone again
    V.rollback(t, 2)                                   # v5
    assert (2, "b") not in _rows(V.read_version(spark, t))


def test_clone_and_branch_carry_eq_state(spark, troot, tmp_path_factory):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [1])
    dst = str(tmp_path_factory.mktemp("clone")) + "/c"
    V.clone_shallow(t, dst)
    assert (1, "a") not in _rows(V.read_version(spark, dst))
    V.create_branch(t, "audit")
    assert (1, "a") not in _rows(
        V.read_version(spark, t, ref="audit"))


def test_vacuum_retains_then_reclaims_eq_files(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [2])          # v2
    st = V._st(t)
    eq_files = V.table_eq_deletes(t)[0]["files"]
    # retained: v2 still references the key file
    V.vacuum(t, keep_versions=1)
    assert all(st.exists(p) for p in eq_files)
    assert (2, "b") not in _rows(V.read_version(spark, t))
    # compact (materializes), then vacuum down to the compacted version
    V.compact_snapshot(spark, t, n_files=1)           # v3
    V.vacuum(t, keep_versions=1)
    assert not any(st.exists(p) for p in eq_files)
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (3, "c"), (4, "d")}


def test_cdf_reports_eq_deletes(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [4])
    ch = V.changes_between(spark, t, 1, 2, "id")
    got = {(r["id"], r["_change_type"]) for r in ch.collect()}
    assert got == {(4, "delete")}


# -- alternate readers -------------------------------------------------------

def test_dsv2_batch_reader_applies_eq_deletes(spark, troot):
    from databox_adls_loader_spark.sources.vtable_batch import \
        register_vtable

    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [1, 3])
    register_vtable(spark)
    df = spark.read.format("vtable").option("path", t).load()
    assert _rows(df) == {(2, "b"), (4, "d")}
    # time travel through the format path still sees v1 complete
    df1 = (spark.read.format("vtable").option("path", t)
           .option("version", "1").load())
    assert len(_rows(df1)) == 4


def test_stream_refuses_eq_delete_commits(spark, troot):
    from databox_adls_loader_spark.sources.vtable_stream import \
        VTableStreamReader

    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [1])
    r = VTableStreamReader({"path": t, "startversion": "0"})
    with pytest.raises(ValueError, match="equality-delete"):
        r.partitions({"version": 1}, {"version": 2})
    # opt-out keeps tailing appends only
    r2 = VTableStreamReader({"path": t, "startversion": "0",
                             "ignorechanges": "true"})
    assert r2.partitions({"version": 1}, {"version": 2}) == []


def test_token_index_read_applies_eq_deletes(spark, troot):
    from databox_adls_loader_spark.sinks import maintenance as M

    t = troot + "/tbl"
    V.write_snapshot(
        spark.createDataFrame([(1, "alpha beta"), (2, "alpha gamma")],
                              "id: long, text: string"), t)
    idx = troot + "/idx"
    M.build_token_index(spark, t, idx, text_col="text")
    V.delete_where_keys(spark, t, "id", [1])
    M.build_token_index(spark, t, idx, text_col="text")
    got = _rows(M.read_with_token(spark, t, idx, "alpha",
                                  text_col="text"))
    assert got == {(2, "alpha gamma")}


def test_history_surfaces_eq_keys(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [1, 2])
    h = {e["version"]: e for e in V.history(t)}
    assert h[2]["n_eq_delete_keys"] == 2
    assert h[2]["n_rows"] is None          # unknowable without a scan
    assert h[1]["n_rows"] == 4


# -- merge-on-read UPDATE ----------------------------------------------------

def test_update_where_basic(spark, troot):
    t = _tbl(spark, troot)
    files_before = V._read_manifest(t, 1)
    v, n = V.update_where(spark, t, "id >= 3",
                          {"s": "upper(s)"})
    assert v == 2 and n == 2
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (2, "b"), (3, "C"), (4, "D")}
    # MOR: the original files all ride; only new files appended
    assert set(files_before) <= set(V._read_manifest(t, 2))
    # old version untouched
    assert _rows(V.read_version(spark, t, 1)) == \
        {(1, "a"), (2, "b"), (3, "c"), (4, "d")}


def test_update_where_set_references_pre_update_row(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1, 10), (2, 20)],
                                           "id: long, x: long"), t)
    # swap-style: both expressions see the PRE-update row
    v, n = V.update_where(spark, t, "id = 1",
                          {"id": "x", "x": "id"})
    assert n == 1
    assert _rows(V.read_version(spark, t)) == {(10, 1), (2, 20)}


def test_update_where_no_match_is_noop(spark, troot):
    t = _tbl(spark, troot)
    assert V.update_where(spark, t, "id > 100", {"s": "'z'"}) == (1, 0)
    assert V.latest_version(t) == 1


def test_update_where_unknown_column_raises(spark, troot):
    t = _tbl(spark, troot)
    with pytest.raises(ValueError, match="unknown column"):
        V.update_where(spark, t, "id = 1", {"nope": "'z'"})


def test_update_where_respects_checks(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1, 10)], "id: long, x: long"),
                     t, checks=["x > 0"])
    with pytest.raises(V.ConstraintViolation):
        V.update_where(spark, t, "id = 1", {"x": "-5"})
    assert V.latest_version(t) == 1


def test_update_where_skips_eq_deleted_rows(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where_keys(spark, t, "id", [3])
    v, n = V.update_where(spark, t, "id >= 3", {"s": "upper(s)"})
    assert n == 1                               # only row 4 is live
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (2, "b"), (4, "D")}


def test_update_where_after_rename(spark, troot):
    t = _tbl(spark, troot)
    V.rename_column(t, "s", "name")
    v, n = V.update_where(spark, t, "id = 1", {"name": "'A'"})
    assert n == 1
    assert _rows(V.read_version(spark, t)) == \
        {(1, "A"), (2, "b"), (3, "c"), (4, "d")}


def test_update_where_hidden_partitioned_layout(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(
        spark.createDataFrame([(1, "x", 5), (2, "y", 6)],
                              "id: long, s: string, grp: long"),
        t, partition_by=["identity(grp)"])
    v, n = V.update_where(spark, t, "id = 1", {"s": "'X'"})
    assert n == 1
    assert _rows(V.read_version(spark, t)) == {(1, "X", 5), (2, "y", 6)}
    # new file landed with a partition tuple under the current spec
    doc = V._read_manifest_doc(t, v)
    new_files = [f for f in doc["files"]
                 if f not in set(V._read_manifest(t, 1))]
    assert new_files and all(f in doc.get("partitions", {})
                             for f in new_files)


def test_update_then_compact_then_vacuum_roundtrip(spark, troot):
    t = _tbl(spark, troot)
    V.update_where(spark, t, "id = 2", {"s": "'B'"})
    V.compact_snapshot(spark, t, n_files=1)
    V.vacuum(t, keep_versions=1)
    assert _rows(V.read_version(spark, t)) == \
        {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


# -- metadata inspection tables ----------------------------------------------

def test_files_df_and_snapshots_df(spark, troot):
    t = _tbl(spark, troot)
    V.delete_where(spark, t, "id = 1")                 # v2: position
    V.delete_where_keys(spark, t, "id", [2])           # v3: equality
    V.create_tag(t, "audited")
    fd = V.files_df(spark, t).collect()
    assert len(fd) == len(V._read_manifest(t, 3))
    by_file = {r["file"]: r for r in fd}
    # every file has size + rows + bounds from footer stats
    assert all(r["size_bytes"] > 0 and r["num_rows"] is not None
               for r in fd)
    assert sum(r["n_deleted_positions"] for r in fd) == 1
    assert sum(r["n_eq_entries"] for r in fd) >= 1
    sd = {r["version"]: r for r in V.snapshots_df(spark, t).collect()}
    assert sd[3]["is_latest"] and not sd[1]["is_latest"]
    assert sd[3]["n_eq_delete_keys"] == 1
    assert sd[3]["n_deleted_positions"] == 1
    assert sd[3]["tags"] == ["audited"]
    assert sd[1]["n_rows"] == 4


def test_files_df_partitioned_table(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(
        spark.createDataFrame([(1, 5), (2, 6)], "id: long, grp: long"),
        t, partition_by=["identity(grp)"])
    fd = V.files_df(spark, t).collect()
    assert all(r["partition_json"] is not None
               and r["partition_spec_id"] is not None for r in fd)


def test_many_eq_delete_commits_consolidate_to_one_join_per_col(
        spark, tmp_path):
    """50 tombstone commits on the same key column must cost the reader
    ONE key-set anti join, not 50 (`_eq_anti_all`) — the CDC
    steady-state read shape; and `table_health` must flag the
    accumulated entries as compaction debt."""
    from databox_adls_loader_spark.sinks.maintenance import table_health

    t = str(tmp_path / "t")
    V.write_snapshot(
        spark.createDataFrame([(i, f"s{i}") for i in range(200)],
                              "id: long, s: string"), t)
    for k in range(50):
        V.delete_where_keys(spark, t, "id", [k])
    df = V.read_version(spark, t)
    assert _rows(df) == {(i, f"s{i}") for i in range(50, 200)}
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_anti = plan.count("LeftAnti")
    assert n_anti == 1, f"expected 1 consolidated anti join, saw {n_anti}"
    h = table_health(t, small_file_rows=1)   # isolate the eq-debt signal
    assert h["n_eq_delete_entries"] == 50
    assert h["n_eq_delete_cols"] == 1
    assert h["recommend_compact"] is True
    # compaction materializes: debt cleared, recommendation drops
    V.compact_snapshot(spark, t, n_files=1)
    h2 = table_health(t, small_file_rows=1)
    assert h2["n_eq_delete_entries"] == 0
    assert h2["recommend_compact"] is False


def test_eq_delete_two_cols_two_joins(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(
        spark.createDataFrame([(i, f"s{i}") for i in range(20)],
                              "id: long, s: string"), t)
    for k in (1, 2, 3):
        V.delete_where_keys(spark, t, "id", [k])
    for sv in ("s5", "s6"):
        V.delete_where_keys(spark, t, "s", [sv])
    df = V.read_version(spark, t)
    assert _rows(df) == {(i, f"s{i}") for i in range(20)
                         if i not in (1, 2, 3, 5, 6)}
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") == 2
