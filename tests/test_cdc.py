"""CDC apply onto the versioned table (sinks/cdc.py): collapse, upsert
via scoped MERGE, delete via equality tombstones, exactly-once replay
through the phase-scoped batch ledger."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from databox_adls_loader_spark.sinks import cdc as C
from databox_adls_loader_spark.sinks import versioned as V

SCHEMA = "id: long, s: string, op: string, seq: long"


def _rows(spark, t):
    return {tuple(r) for r in V.read_version(spark, t).collect()}


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_first_batch_creates_table(spark, tmp_path):
    t = str(tmp_path / "t")
    out = C.apply_cdc_batch(
        _batch(spark, [(1, "a", "c", 1), (2, "b", "c", 2)]),
        t, key="id", seq_col="seq")
    assert out["n_upserts"] == 2 and out["n_deletes"] == 0
    assert _rows(spark, t) == {(1, "a"), (2, "b")}


def test_mixed_batch_upserts_and_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1), (2, "b", "c", 1),
                                     (3, "c", "c", 1)]),
                      t, key="id", seq_col="seq")
    out = C.apply_cdc_batch(
        _batch(spark, [(1, "A", "u", 2),      # update
                       (2, None, "d", 2),     # delete
                       (4, "d4", "i", 2)]),   # insert
        t, key="id", seq_col="seq")
    assert out["n_deletes"] == 1 and out["n_upserts"] == 2
    assert _rows(spark, t) == {(1, "A"), (3, "c"), (4, "d4")}
    # the delete landed as an equality tombstone, not a rewrite
    assert any(V.table_eq_deletes(t, v)
               for v in V.versions(t))


def test_collapse_latest_change_wins(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1)]),
                      t, key="id", seq_col="seq")
    # out-of-order feed: u@5 then d@3 for key 1 — the update wins
    out = C.apply_cdc_batch(
        _batch(spark, [(1, None, "d", 3), (1, "A5", "u", 5)]),
        t, key="id", seq_col="seq")
    assert out["n_deletes"] == 0 and out["n_upserts"] == 1
    assert _rows(spark, t) == {(1, "A5")}
    # same-seq tie: the delete wins (ops sort 'u' < 'd' descending)
    out = C.apply_cdc_batch(
        _batch(spark, [(1, "A7", "u", 7), (1, None, "d", 7)]),
        t, key="id", seq_col="seq")
    assert out["n_deletes"] == 1
    assert _rows(spark, t) == set()


def test_delete_then_reinsert_across_batches(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1)]),
                      t, key="id", seq_col="seq")
    C.apply_cdc_batch(_batch(spark, [(1, None, "d", 2)]),
                      t, key="id", seq_col="seq")
    assert _rows(spark, t) == set()
    # sequence semantics: the re-insert lands in a NEW file, which the
    # earlier tombstone does not apply to
    C.apply_cdc_batch(_batch(spark, [(1, "a2", "i", 3)]),
                      t, key="id", seq_col="seq")
    assert _rows(spark, t) == {(1, "a2")}


def test_replay_is_exactly_once(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1), (2, "b", "c", 1)]),
                      t, key="id", seq_col="seq", batch_id=0)
    b1 = _batch(spark, [(1, "A", "u", 2), (2, None, "d", 2)])
    out1 = C.apply_cdc_batch(b1, t, key="id", seq_col="seq", batch_id=1)
    v_after = V.latest_version(t)
    # foreachBatch crash-replay: same batch id, no new commits
    out2 = C.apply_cdc_batch(b1, t, key="id", seq_col="seq", batch_id=1)
    assert out2["skipped"] == ["deletes", "upserts"]
    assert out2["versions"] == []
    assert V.latest_version(t) == v_after
    assert _rows(spark, t) == {(1, "A")}
    assert out1["versions"] and len(out1["versions"]) == 2


def test_no_seq_col_requires_unique_keys(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", "c"), (1, "b", "u")],
                               "id: long, s: string, op: string")
    with pytest.raises(ValueError, match="seq_col"):
        C.apply_cdc_batch(df, t, key="id")
    ok = spark.createDataFrame([(1, "a", "c")],
                               "id: long, s: string, op: string")
    C.apply_cdc_batch(ok, t, key="id")
    assert _rows(spark, t) == {(1, "a")}


def test_unknown_op_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    with pytest.raises(ValueError, match="unknown op"):
        C.apply_cdc_batch(_batch(spark, [(1, "a", "x", 1)]),
                          t, key="id", seq_col="seq")


def test_foreachbatch_end_to_end(spark, tmp_path):
    """The documented wiring: a file-source stream of CDC rows applied
    through foreachBatch with checkpointed batch ids."""
    import json
    import os

    src = tmp_path / "src"
    src.mkdir()
    t, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    rows = [{"id": 1, "s": "a", "op": "c", "seq": 1},
            {"id": 2, "s": "b", "op": "c", "seq": 1},
            {"id": 1, "s": None, "op": "d", "seq": 2}]
    with open(src / "b0.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    stream = (spark.readStream
              .schema("id long, s string, op string, seq long")
              .json(str(src)))
    q = (stream.writeStream
         .foreachBatch(lambda df, bid: C.apply_cdc_batch(
             df, t, key="id", seq_col="seq", batch_id=bid))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _rows(spark, t) == {(2, "b")}
    assert os.path.isdir(t)


# ---------------------------------------------------------------------------
# incremental CDF (versioned.changes_between(..., incremental=True))
# ---------------------------------------------------------------------------

def _mk_keyed(spark, t, n=400):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 5)).alias("tag"))
    V.write_snapshot(df, t)
    V.compact_snapshot(spark, t, n_files=4, cluster_by=["k"])
    return V.latest_version(t)


def _cdf_sets(spark, t, v0, v1):
    full = {tuple(r) for r in
            V.changes_between(spark, t, v0, v1, "k").collect()}
    inc = {tuple(r) for r in
           V.changes_between(spark, t, v0, v1, "k",
                             incremental=True).collect()}
    return full, inc


def test_incremental_cdf_matches_full_and_reads_less(spark, tmp_path):
    from databox_adls_loader_spark.sinks.storage import path_key

    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t)
    V.delete_where(spark, t, "k < 30", predicates=[("k", "<", 30)])
    V.update_where(spark, t, "k >= 30 AND k < 60", {"v": "v + 1000"},
                   predicates=[("k", ">=", 30), ("k", "<", 60)])
    V.delete_where_keys(spark, t, "k", [70, 75, 80])
    V.write_snapshot(spark.createDataFrame(
        [(1000, 1, "new"), (1001, 2, "new")], "k: long, v: long, "
        "tag: string"), t)
    v1 = V.latest_version(t)
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full and len(full) == 30 + 30 + 3 + 2
    # the incremental plan engages and reads strictly fewer baseline
    # data files than the manifest holds (only the overlay-affected
    # clustered file + appends + tombstones)
    d = V._changes_incremental(spark, t, v0, v1, "k")
    assert d is not None
    base = {path_key(f) for f in V._read_manifest(t, v0)}
    read = {path_key(u) for u in d.inputFiles()}
    assert read & base and len(read & base) < len(base)


def test_incremental_cdf_survives_compaction(spark, tmp_path):
    """Round-9: a compaction inside the window no longer forces the
    full-outer fallback — removed files scan at their v_from live
    state, rewritten rows cancel against their v_to twins in the key
    diff, and the deletes the compaction materialized away stay
    exact."""
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=100)
    V.delete_where(spark, t, "k < 10", predicates=[("k", "<", 10)])
    V.compact_snapshot(spark, t, n_files=2, cluster_by=["k"])
    v1 = V.latest_version(t)
    inc_df = V._changes_incremental(spark, t, v0, v1, "k")
    assert inc_df is not None            # derivation no longer refuses
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full and len(full) == 10
    assert all(r[-1] == "delete" for r in inc)


def test_incremental_cdf_across_optimize_skips_untouched(spark,
                                                         tmp_path):
    """Round-9 'Done =' for the verdict's #1 item: a window bracketing
    an incremental OPTIMIZE (`compact_small_files`) stays
    manifest-derived, hash-matches the full diff, and its plan never
    reads the untouched clustered baseline files."""
    from databox_adls_loader_spark.sinks.storage import path_key

    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=4000)       # 4 clustered files
    base_files = V._read_manifest(t, v0)
    st = V._st(t, spark)
    target = min(st.file_size(f) for f in base_files)
    # window: DV on the lowest file, three tiny appends, OPTIMIZE
    # (coalesces only the tiny files), then a post-OPTIMIZE tombstone
    # killing one in-window insert (must cancel) and one baseline key
    V.delete_where(spark, t, "k < 10", predicates=[("k", "<", 10)])
    for ks in ([10_000, 10_001], [10_002], [10_003]):
        V.write_snapshot(spark.createDataFrame(
            [(k, k * 3, "new") for k in ks],
            "k: long, v: long, tag: string").coalesce(1), t)
    assert V.compact_small_files(spark, t, target_bytes=target,
                                 min_files=2) is not None
    V.delete_where_keys(spark, t, "k", [10_003, 500])
    v1 = V.latest_version(t)
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full
    by_type = {}
    for r in full:
        by_type.setdefault(r[-1], set()).add(r[0])
    assert by_type["insert"] == {10_000, 10_001, 10_002}
    assert by_type["delete"] == set(range(10)) | {500}
    d = V._changes_incremental(spark, t, v0, v1, "k")
    assert d is not None                   # engaged across the rewrite
    base = {path_key(f) for f in base_files}
    read = {path_key(u) for u in d.inputFiles()}
    # only the overlay-affected clustered files enter the plan; with
    # k<10 and k=500 both landing in low files, at least two of the
    # four baseline files stay untouched AND unread
    assert len(read & base) < len(base)
    untouched = base - read
    assert untouched and untouched <= base


def test_incremental_cdf_insert_delete_materialized_away(spark,
                                                         tmp_path):
    """Rows inserted, tombstoned, and then MATERIALIZED AWAY by an
    in-window OPTIMIZE (their file enters and leaves the manifest
    inside the window with zero survivors) must emit NOTHING — the
    two-endpoint contract, with no trace of them in any endpoint
    manifest."""
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=2000)
    st = V._st(t, spark)
    target = min(st.file_size(f) for f in V._read_manifest(t, v0))
    for ks in ([20_000, 20_001], [20_002]):
        V.write_snapshot(spark.createDataFrame(
            [(k, k, "ephemeral") for k in ks],
            "k: long, v: long, tag: string").coalesce(1), t)
    V.delete_where_keys(spark, t, "k", [20_000, 20_001, 20_002])
    assert V.compact_small_files(spark, t, target_bytes=target,
                                 min_files=2) is not None
    v1 = V.latest_version(t)
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full == set()
    assert V._changes_incremental(spark, t, v0, v1, "k") is not None


def test_incremental_cdf_logical_overwrite_window(spark, tmp_path):
    """A logical OVERWRITE inside the window (removed = everything,
    appended = the new table) routes through the same generalized
    derivation and still equals the full diff — cost degenerates to
    the fallback's, correctness never does."""
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=50)
    # overwrite: keys 0..9 keep identical values, 10..19 change v,
    # 100..104 are new — everything else disappears
    new = spark.createDataFrame(
        [(k, k * 3, f"s{k % 5}") for k in range(10)]
        + [(k, k * 3 + 1, f"s{k % 5}") for k in range(10, 20)]
        + [(k, 1, "new") for k in range(100, 105)],
        "k: long, v: long, tag: string")
    V.write_snapshot(new, t, mode="overwrite")
    v1 = V.latest_version(t)
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full
    types = {}
    for r in full:
        types.setdefault(r[-1], set()).add(r[0])
    assert types["insert"] == set(range(100, 105))
    assert types["update_postimage"] == set(range(10, 20))
    assert types["delete"] == set(range(20, 50))
    assert V._changes_incremental(spark, t, v0, v1, "k") is not None


def test_incremental_cdf_cow_update_window(spark, tmp_path):
    """A copy-on-write MERGE inside the window (files rewritten, rows
    changed in place) also stays manifest-derived: rewritten-unchanged
    rows cancel, rewritten-changed rows emit update images."""
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=200)
    # CoW merge: update v for keys 50..59, insert 9000
    upd = spark.createDataFrame(
        [(k, k * 3 + 7, "upd") for k in range(50, 60)]
        + [(9000, 1, "ins")], "k: long, v: long, tag: string")
    V.merge_into_snapshot(spark, t, upd, key="k")
    v1 = V.latest_version(t)
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full
    types = sorted(r[-1] for r in full)
    assert types.count("update_postimage") == 10
    assert types.count("insert") == 1
    assert V._changes_incremental(spark, t, v0, v1, "k") is not None


def test_incremental_cdf_carries_rename_drop_and_widen(spark, tmp_path):
    """Rename/drop and type widen are metadata-only commits in this
    store, so the incremental derivation carries THROUGH them
    (round-10): the diff stays manifest-derived, renders under
    WINDOW-END names (deleted rows surface the renamed column's VALUES,
    never NULL; a dropped column never enters the output), and the dead
    side scans narrow pre-widen files WITH the widened type.  Both
    paths — incremental and full — must agree row-for-row."""
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=30)
    V.rename_column(t, "tag", "label")
    V.drop_column(t, "v")
    V.delete_where(spark, t, "k = 1")
    v1 = V.latest_version(t)
    inc = V._changes_incremental(spark, t, v0, v1, "k")
    assert inc is not None
    assert set(inc.columns) == {"k", "label", "_change_type"}
    rows = {tuple(r) for r in inc.collect()}
    # the delete carries the renamed column's VALUE under the new name
    assert rows == {(1, "s1", "delete")}
    full = {tuple(r) for r in
            V.changes_between(spark, t, v0, v1, "k",
                              incremental=False).collect()}
    assert rows == full

    t2 = str(tmp_path / "t2")
    V.write_snapshot(spark.createDataFrame(
        [(1, 10), (2, 20)], "k: int, v: int").coalesce(1), t2)
    w0 = V.latest_version(t2)
    V.delete_where(spark, t2, "k = 2")
    V.widen_column(t2, "v", "bigint")
    V.write_snapshot(spark.createDataFrame(
        [(3, 1 << 40)], "k: int, v: long").coalesce(1), t2)
    w1 = V.latest_version(t2)
    inc2 = V._changes_incremental(spark, t2, w0, w1, "k")
    assert inc2 is not None
    got2 = {(r["k"], r["v"], r["_change_type"]) for r in inc2.collect()}
    assert got2 == {(2, 20, "delete"), (3, 1 << 40, "insert")}
    full2 = {(r["k"], r["v"], r["_change_type"]) for r in
             V.changes_between(spark, t2, w0, w1, "k",
                               incremental=False).collect()}
    assert got2 == full2


def test_incremental_cdf_dropped_key_falls_back_and_raises(spark,
                                                           tmp_path):
    """Dropping the diff KEY is a genuine shape break: the incremental
    derivation refuses (returns None) and the public API's full path
    raises the proper error."""
    import pytest

    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=10)
    V.drop_column(t, "k")
    v1 = V.latest_version(t)
    assert V._changes_incremental(spark, t, v0, v1, "k") is None
    with pytest.raises(ValueError, match="must exist in both"):
        V.changes_between(spark, t, v0, v1, "k",
                          incremental=True).collect()


def test_incremental_cdf_delete_reinsert_identical_is_no_change(
        spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=50)
    V.delete_where_keys(spark, t, "k", [7, 8])
    # reinsert k=7 with IDENTICAL values, k=8 with a changed value
    V.write_snapshot(spark.createDataFrame(
        [(7, 21, "s2"), (8, 999, "s3")], "k: long, v: long, "
        "tag: string"), t)
    v1 = V.latest_version(t)
    full, inc = _cdf_sets(spark, t, v0, v1)
    assert inc == full
    by_key = {r[0]: r for r in inc}
    assert 7 not in by_key                     # identical reinsert
    assert by_key[8][-1] == "update_postimage"


def test_incremental_cdf_empty_window(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = _mk_keyed(spark, t, n=20)
    full, inc = _cdf_sets(spark, t, v0, v0)
    assert inc == full == set()


def test_collapse_equal_seq_upserts_deterministic(spark, tmp_path):
    """Two upserts sharing (key, seq) must collapse to the SAME winner
    on every run/replay (payload-hash tiebreak), not an arbitrary
    partition-order-dependent one."""
    rows = [(1, "x", "u", 5), (1, "y", "u", 5), (1, "z", "u", 4)]
    winners = set()
    for _ in range(3):
        got = C.collapse_changes(
            spark.createDataFrame(rows, SCHEMA).repartition(8),
            "id", seq_col="seq").collect()
        assert len(got) == 1 and got[0]["seq"] == 5
        winners.add(got[0]["s"])
    assert len(winners) == 1


# ---------------------------------------------------------------------------
# round-8: merge-on-read CDC apply (mode="mor") and the CDC-in → CDF-out loop
# ---------------------------------------------------------------------------


def test_upsert_mor_single_commit_no_rewrite(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(spark.createDataFrame(
        [(k, f"r{k}") for k in range(1, 6)], "k long, v string")
        .coalesce(1), t)
    v = V.upsert_mor(spark, t, spark.createDataFrame(
        [(2, "R2"), (9, "r9")], "k long, v string").coalesce(1), "k")
    assert v == 2                                     # ONE commit
    assert _rows(spark, t) == {(1, "r1"), (2, "R2"), (3, "r3"),
                               (4, "r4"), (5, "r5"), (9, "r9")}
    # every v1 data file survives (no copy-on-write), one eq entry whose
    # applies_to excludes the appended images (sequence semantics)
    f1, f2 = set(V._read_manifest(t, 1)), set(V._read_manifest(t, 2))
    assert f1 <= f2
    (entry,) = V.table_eq_deletes(t)
    assert set(entry["applies_to"]) == f1


def test_upsert_mor_duplicate_keys_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(spark.createDataFrame(
        [(1, "a")], "k long, v string"), t)
    with pytest.raises(ValueError, match="collapse"):
        V.upsert_mor(spark, t, spark.createDataFrame(
            [(1, "x"), (1, "y")], "k long, v string"), "k")


def test_apply_cdc_mor_mode_matches_cow(spark, tmp_path):
    """Same CDC feed through both modes → identical table contents;
    the MOR table never rewrites a committed file."""
    feed = [
        [(1, "a", "c", 1), (2, "b", "c", 1), (3, "c", "c", 1)],
        [(1, "A", "u", 2), (2, None, "d", 2), (4, "d4", "i", 2)],
        [(4, "D4", "u", 3), (3, None, "d", 3), (5, "e5", "c", 3)],
    ]
    tc, tm = str(tmp_path / "cow"), str(tmp_path / "mor")
    for b, rows in enumerate(feed):
        C.apply_cdc_batch(_batch(spark, rows), tc, key="id",
                          seq_col="seq", batch_id=b)
        C.apply_cdc_batch(_batch(spark, rows), tm, key="id",
                          seq_col="seq", batch_id=b, mode="mor")
    assert _rows(spark, tc) == _rows(spark, tm) == \
        {(1, "A"), (4, "D4"), (5, "e5")}
    # MOR: manifests only ever grow
    prev: set = set()
    for v in V.versions(tm):
        cur = set(V._read_manifest(tm, v))
        assert prev <= cur
        prev = cur
    # replay of the last batch is a no-op in both modes
    out = C.apply_cdc_batch(_batch(spark, feed[-1]), tm, key="id",
                            seq_col="seq", batch_id=2, mode="mor")
    assert set(out["skipped"]) == {"deletes", "upserts"}
    assert _rows(spark, tm) == {(1, "A"), (4, "D4"), (5, "e5")}


def test_cdc_mor_window_stays_incremental(spark, tmp_path):
    """The whole point of mode="mor": after any number of CDC batches,
    changes_between(incremental=True) still derives from manifests."""
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(k, f"r{k}", "c", 1)
                                     for k in range(1, 20)]),
                      t, key="id", seq_col="seq", mode="mor")
    v0 = V.latest_version(t)
    C.apply_cdc_batch(_batch(spark, [(2, "R2", "u", 2),
                                     (7, None, "d", 2)]),
                      t, key="id", seq_col="seq", mode="mor")
    C.apply_cdc_batch(_batch(spark, [(2, None, "d", 3),
                                     (30, "r30", "i", 3)]),
                      t, key="id", seq_col="seq", mode="mor")
    v1 = V.latest_version(t)
    inc = V._changes_incremental(spark, t, v0, v1, "id")
    assert inc is not None                     # never fell back
    got = {tuple(r) for r in inc.collect()}
    assert got == {(2, "r2", "delete"), (7, "r7", "delete"),
                   (30, "r30", "insert")}


def test_cdc_mor_feeds_cdf_stream(spark, tmp_path):
    """End-to-end incremental pipeline: CDC batches land merge-on-read,
    the change-feed STREAM tails them — upserts unpack to
    delete(old)+insert(new), nothing is refused, nothing re-emitted."""
    from databox_adls_loader_spark.sources.vtable_stream import \
        register_vtable_stream

    t, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1), (2, "b", "c", 1)]),
                      t, key="id", seq_col="seq", mode="mor")
    C.apply_cdc_batch(_batch(spark, [(1, "A", "u", 2),
                                     (3, "c3", "i", 2)]),
                      t, key="id", seq_col="seq", mode="mor")
    C.apply_cdc_batch(_batch(spark, [(3, None, "d", 3)]),
                      t, key="id", seq_col="seq", mode="mor")
    register_vtable_stream(spark)
    rows: list = []
    q = (spark.readStream.format("vtable_stream").option("path", t)
         .option("readchangefeed", "true").load()
         .writeStream
         .foreachBatch(lambda df, bid:
                       rows.extend(tuple(r) for r in df.collect()))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert {(r[0], r[1], r[2]) for r in rows} == {
        (1, "a", "insert"), (2, "b", "insert"),     # bootstrap
        (1, "a", "delete"), (1, "A", "insert"),     # MOR upsert
        (3, "c3", "insert"),
        (3, "c3", "delete"),                        # eq tombstone
    }
    # replaying the stream's view forward reproduces the table
    # (within a commit: retract old images before applying new ones —
    # the standard CDF consumption order for an unpacked upsert)
    live: dict = {}
    for r in sorted(rows, key=lambda r: (r[3], r[2] != "delete")):
        if r[2] == "insert":
            live[r[0]] = r[1]
        else:
            live.pop(r[0], None)
    assert set(live.items()) == _rows(spark, t)


def test_upsert_mor_rebase_covers_concurrent_append(spark, tmp_path):
    """The rebase branch of the one-commit MOR upsert: a concurrent
    append lands BETWEEN the upsert's file writes and its manifest
    commit.  The tombstone's applies_to is recomputed against the
    rebased base, so the concurrent file's images of the same keys are
    covered (they predate the upsert commit) while the upsert's own
    appended images stay alive."""
    t = str(tmp_path / "t")
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string").coalesce(1), t)

    # stage the upsert's artifacts exactly as write_snapshot would...
    ups = spark.createDataFrame([(2, "B2")], "k long, v string") \
        .coalesce(1)
    new_files = V._new_data_files(ups, t, "race")
    stats = V._stats_for(t, new_files, [], spark=spark)
    st = V._st(t, spark)
    out = st.canon(st.join(t, "eqdeletes", "race-keys"))
    (ups.select(F.col("k").alias("__val")).coalesce(1)
     .write.mode("error").parquet(out))
    eq_files = sorted(st.canon(p)
                      for p in st.list_glob(st.join(out, "part-*.parquet")))
    # ...then a CONCURRENT append beats it to the manifest with its own
    # image of key 2
    V.write_snapshot(spark.createDataFrame(
        [(2, "stale2"), (3, "c")], "k long, v string").coalesce(1), t)
    v = V.commit_data_files(
        t, new_files, "append", stats,
        schema=ups.schema.jsonValue(),
        eq_entry={"files": eq_files, "col": "k", "rows": 1})
    assert v == 3
    # the tombstone covers BOTH pre-commit files' images of key 2
    (entry,) = V.table_eq_deletes(t)
    assert set(entry["applies_to"]) == set(V._read_manifest(t, 2))
    got = {tuple(r) for r in V.read_version(spark, t).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c")}


def test_upsert_mor_respects_hidden_partitioning(spark, tmp_path):
    """Composition: MOR upsert onto a hidden-partitioned table — the
    appended images are laid out under the stored spec (every file in
    the new manifest carries partition tuples), so transform pruning
    keeps working across CDC history."""
    t = str(tmp_path / "t")
    V.write_snapshot(spark.createDataFrame(
        [(k, k * 10) for k in range(8)], "k long, v long").coalesce(1),
        t, partition_by=["bucket(4,k)"])
    v = V.upsert_mor(spark, t, spark.createDataFrame(
        [(1, 99), (20, 1)], "k long, v long").coalesce(1), "k")
    doc = V._read_manifest_doc(t, v)
    assert set(doc.get("partitions", {})) == set(doc["files"])
    got = {tuple(r) for r in V.read_version(spark, t).collect()}
    assert (1, 99) in got and (20, 1) in got and (1, 10) not in got
