"""Row lineage on the versioned table (sinks/versioned.py:
enable_row_lineage / read_version_with_row_ids): stable per-row ids
that survive appends, merge-on-read DELETE/UPDATE, compaction (which
materializes them into a hidden physical column), and restoration
paths — with next_row_id monotone so ids are never reused."""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.sinks import versioned as V


@pytest.fixture(params=["local", "hadoop"])
def troot(request, tmp_path):
    if request.param == "local":
        return str(tmp_path)
    return f"file://{tmp_path}"


def _ids(spark, t, version=None):
    """{payload tuple -> _row_id} for the current (or pinned) view."""
    df = V.read_version_with_row_ids(spark, t, version)
    cols = [c for c in df.columns if c != "_row_id"]
    return {tuple(r[c] for c in cols): r["_row_id"]
            for r in df.collect()}


def _tbl(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                              "id: long, s: string"), t)
    V.enable_row_lineage(t)
    return t


def test_ids_assigned_distinct_and_stable_across_appends(spark, troot):
    t = _tbl(spark, troot)
    got = _ids(spark, t)
    assert len(got) == 3 and len(set(got.values())) == 3
    V.write_snapshot(spark.createDataFrame([(4, "d")],
                                           "id: long, s: string"), t)
    after = _ids(spark, t)
    # old rows keep their ids; the new row gets a fresh, higher one
    assert all(after[k] == v for k, v in got.items())
    assert after[(4, "d")] not in set(got.values())
    assert after[(4, "d")] >= max(got.values())


def test_requires_opt_in(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1, "a")],
                                           "id: long, s: string"), t)
    with pytest.raises(ValueError, match="row lineage"):
        V.read_version_with_row_ids(spark, t)


def test_ids_survive_position_delete_and_update(spark, troot):
    t = _tbl(spark, troot)
    before = _ids(spark, t)
    V.delete_where(spark, t, "id = 2")
    after = _ids(spark, t)
    assert set(after) == {(1, "a"), (3, "c")}
    assert after == {k: before[k] for k in after}
    V.update_where(spark, t, "id = 3", {"s": "'C'"})
    upd = _ids(spark, t)
    assert upd[(1, "a")] == before[(1, "a")]
    # the updated image is a NEW row identity
    assert upd[(3, "C")] not in set(before.values())


def test_ids_survive_eq_delete(spark, troot):
    t = _tbl(spark, troot)
    before = _ids(spark, t)
    V.delete_where_keys(spark, t, "id", [1])
    after = _ids(spark, t)
    assert set(after) == {(2, "b"), (3, "c")}
    assert all(after[k] == before[k] for k in after)


def test_compaction_materializes_and_preserves_ids(spark, troot):
    t = _tbl(spark, troot)
    V.write_snapshot(spark.createDataFrame([(4, "d")],
                                           "id: long, s: string"), t)
    before = _ids(spark, t)
    v = V.compact_snapshot(spark, t, n_files=2, cluster_by=["id"])
    assert _ids(spark, t) == before
    st = V.table_row_state(t, v)
    assert st["materialized_row_ids"] and not st["row_ids"]
    # the physical column stays hidden from the logical view
    assert "_row_id" not in V.read_version(spark, t).columns
    # and appends after compaction keep working: map-assigned ids for
    # the new file coexist with the materialized column
    V.write_snapshot(spark.createDataFrame([(5, "e")],
                                           "id: long, s: string"), t)
    final = _ids(spark, t)
    assert final[(5, "e")] >= st["next_row_id"] - 1 or \
        final[(5, "e")] not in set(before.values())
    assert all(final[k] == v for k, v in before.items())


def test_incremental_optimize_preserves_ids(spark, troot):
    t = troot + "/tbl"
    big = spark.createDataFrame([(i, "x" * 200) for i in range(500)],
                                "id: long, s: string").coalesce(1)
    V.write_snapshot(big, t)
    V.enable_row_lineage(t)
    V.write_snapshot(spark.createDataFrame([(9000, "s1")],
                                           "id: long, s: string")
                     .coalesce(1), t)
    V.write_snapshot(spark.createDataFrame([(9001, "s2")],
                                           "id: long, s: string")
                     .coalesce(1), t)
    before = _ids(spark, t)
    st0 = V._st(t)
    target = max(st0.file_size(f)
                 for f in V._read_manifest(t, V.latest_version(t)))
    v = V.compact_small_files(spark, t, target_bytes=target, min_files=1)
    assert v is not None
    assert _ids(spark, t) == before
    # big file kept its map entry; small rewrites are materialized
    st = V.table_row_state(t, v)
    assert st["row_ids"] and st["materialized_row_ids"]


def test_compaction_after_rename_keeps_ids(spark, troot):
    t = _tbl(spark, troot)
    before = _ids(spark, t)
    V.rename_column(t, "s", "name")
    assert _ids(spark, t) == before       # rename is metadata-only
    V.compact_snapshot(spark, t, n_files=1)
    assert _ids(spark, t) == before


def test_rollback_never_reuses_ids(spark, troot):
    t = _tbl(spark, troot)                                  # v1, v2
    V.write_snapshot(spark.createDataFrame([(4, "d")],
                                           "id: long, s: string"), t)
    ids4 = _ids(spark, t)[(4, "d")]
    V.rollback(t, 2)                       # drop row 4 again
    V.write_snapshot(spark.createDataFrame([(5, "e")],
                                           "id: long, s: string"), t)
    got = _ids(spark, t)
    assert (4, "d") not in got
    # the new row's id is strictly beyond the rolled-back row's
    assert got[(5, "e")] > ids4


def test_clone_and_branch_carry_row_state(spark, troot,
                                          tmp_path_factory):
    t = _tbl(spark, troot)
    before = _ids(spark, t)
    dst = str(tmp_path_factory.mktemp("rlclone")) + "/c"
    V.clone_shallow(t, dst)
    assert _ids(spark, dst) == before
    V.create_branch(t, "audit")
    assert _ids(spark, V.branch_path(t, "audit")) == before


def test_merge_keeps_untouched_ids(spark, troot):
    t = _tbl(spark, troot)
    V.compact_snapshot(spark, t, n_files=3, cluster_by=["id"])
    before = _ids(spark, t)
    ups = spark.createDataFrame([(2, "B")], "id: long, s: string")
    V.merge_into_snapshot(spark, t, ups, "id")
    after = _ids(spark, t)
    # rows in untouched files keep their ids; only touched-file rows
    # (rewritten by the merge) get fresh identities
    assert after[(1, "a")] == before[(1, "a")] or \
        after[(3, "c")] == before[(3, "c")]
    assert (2, "B") in after


def test_cross_spelling_clone_both_directions(spark, tmp_path_factory):
    """Round-7 regression: a clone destination spelled differently from
    the source (bare path vs file:// URI) inherits the source's
    manifest row-id keys — LocalStorage.canon must collapse the file:
    scheme so the spelling join still matches (it used to cwd-join the
    URI into garbage and return NULL _row_id for every row)."""
    for src_spell, dst_spell in [("file://{}", "{}"), ("{}", "file://{}")]:
        base = tmp_path_factory.mktemp("rlx")
        t = src_spell.format(base) + "/tbl"
        V.write_snapshot(
            spark.createDataFrame([(1, "a"), (2, "b")],
                                  "id: long, s: string"), t)
        V.enable_row_lineage(t)
        before = _ids(spark, t)
        assert set(before.values()) == {0, 1}
        dst = dst_spell.format(tmp_path_factory.mktemp("rlxc")) + "/c"
        V.clone_shallow(t, dst)
        assert _ids(spark, dst) == before


def test_mapping_failure_raises_not_null(spark, tmp_path):
    """A live row whose file matches no row-id spelling must raise, not
    silently surface NULL _row_id (the silent-corruption channel the
    round-7 advice flagged)."""
    import json

    t = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1, "a")],
                                           "id: long, s: string"), t)
    V.enable_row_lineage(t)
    # corrupt the row-id state: re-key every entry to a path that no
    # scan spelling can ever produce
    st = V._st(t, spark)
    v = V.latest_version(t)
    mpath = V._manifest_path(st, t, v)
    doc = json.loads(st.read_text(mpath))
    doc["row_ids"] = {"/nonexistent/spelling.parquet": val
                      for val in doc["row_ids"].values()}
    st.replace_text(mpath, json.dumps(doc))
    with pytest.raises(Exception, match="row lineage|RAISE_ERROR|no _row_id"):
        V.read_version_with_row_ids(spark, t).collect()
