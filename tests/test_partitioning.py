"""Hidden partitioning (partition transforms) on the versioned table
(sinks/partitioning.py + the write/prune integration in
sinks/versioned.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.sinks import partitioning as P
from databox_adls_loader_spark.sinks import versioned as V


@pytest.fixture(params=["local", "hadoop"])
def troot(request, tmp_path):
    if request.param == "local":
        return str(tmp_path)
    return f"file://{tmp_path}"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _orders(spark):
    rows = []
    for i in range(200):
        d = datetime.date(1995, 1, 1) + datetime.timedelta(days=(i * 7) % 365)
        rows.append((i, i % 17, d, f"c{i % 5}-{i}"))
    return spark.createDataFrame(
        rows, "id: long, k: long, d: date, name: string")


# -- spec parsing -----------------------------------------------------------

def test_parse_spec_forms_and_errors():
    assert P.parse_spec("month(d)").spec == "month(d)"
    assert P.parse_spec(" bucket( 8 , k ) ").spec == "bucket(8,k)"
    assert P.parse_spec("truncate(4,name)").n == 4
    for bad in ("mod(3,k)", "bucket(k)", "month(2,d)", "bucket(0,k)", "d"):
        with pytest.raises(P.PartitionSpecError):
            P.parse_spec(bad)


def test_bind_rejects_wrong_dtype(spark):
    df = _orders(spark)
    with pytest.raises(P.PartitionSpecError):
        P.parse_spec("month(k)").bind(df.schema)      # long has no months
    with pytest.raises(P.PartitionSpecError):
        P.parse_spec("bucket(4,d)").bind(df.schema)   # date not bucketable
    with pytest.raises(P.PartitionSpecError):
        P.parse_spec("month(nope)").bind(df.schema)


# -- write + prune + read correctness --------------------------------------

def test_partitioned_write_prunes_and_reads_exactly(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    v = V.write_snapshot(df, t, partition_by=["month(d)", "bucket(4,k)"])
    spec = V.table_partition_spec(t)
    assert spec == ["month(d)", "bucket(4,k)"]
    parts = V.table_partitions(t)
    files = V._read_manifest(t, v)
    assert set(parts) == set(files)          # every file has its tuple
    assert all(len(pv) == 2 for pv in parts.values())

    # month range prunes to a strict subset, rows exactly match a plain
    # filter over the source frame
    preds = [("d", ">=", datetime.date(1995, 3, 1)),
             ("d", "<", datetime.date(1995, 4, 1))]
    kept, total = V.prune_files(t, v, preds)
    assert 0 < len(kept) < total
    exp = _rows(df.filter((F.col("d") >= F.lit("1995-03-01"))
                          & (F.col("d") < F.lit("1995-04-01"))))
    assert _rows(V.read_version(spark, t, predicates=preds)) == exp

    # bucket equality prunes to ~1/4 of the files and loses no rows
    kept2, _ = V.prune_files(t, v, [("k", "=", 11)])
    assert len(kept2) <= (total + 3) // 4 + 1
    assert _rows(V.read_version(spark, t, predicates=[("k", "=", 11)])) \
        == _rows(df.filter(F.col("k") == 11))


def test_truncate_and_identity_transforms(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark).withColumn("grp", F.col("id") % 3)
    V.write_snapshot(df, t,
                     partition_by=["truncate(2,name)", "truncate(50,id)",
                                   "identity(grp)"])
    v = V.latest_version(t)
    # string prefix equality predicate prunes by the truncate transform
    kept, total = V.prune_files(t, v, [("name", "=", "c2-52")])
    assert 0 < len(kept) < total
    assert _rows(V.read_version(spark, t,
                                predicates=[("name", "=", "c2-52")])) \
        == _rows(df.filter(F.col("name") == "c2-52"))
    # integer range predicate prunes by the floor-50 transform
    kept2, _ = V.prune_files(t, v, [("id", ">=", 150)])
    assert 0 < len(kept2) < total
    assert _rows(V.read_version(spark, t, predicates=[("id", ">=", 150)])) \
        == _rows(df.filter(F.col("id") >= 150))
    # identity equality
    assert _rows(V.read_version(spark, t, predicates=[("grp", "=", 1)])) \
        == _rows(df.filter(F.col("grp") == 1))


def test_null_partition_values_survive(spark, troot):
    t = troot + "/tbl"
    df = spark.createDataFrame(
        [(1, datetime.date(2020, 1, 5)), (2, None), (3, None),
         (4, datetime.date(2020, 3, 9))], "id: long, d: date")
    V.write_snapshot(df, t, partition_by=["month(d)"])
    v = V.latest_version(t)
    parts = V.table_partitions(t)
    assert any(pv == [None] for pv in parts.values())  # HIVE null dir
    # a date predicate must not prune away... the null file stays
    # (its rows are then removed by the residual filter)
    got = _rows(V.read_version(
        spark, t, predicates=[("d", "=", datetime.date(2020, 1, 5))]))
    assert got == {(1, datetime.date(2020, 1, 5))}
    assert _rows(V.read_version(spark, t)) == _rows(df)


def test_cross_type_literal_never_false_prunes(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["identity(k)"])
    v = V.latest_version(t)
    # string literal probing the long identity column: Python's
    # `5 != "5"` is True with no TypeError, so identity pruning must
    # DECLINE cross-type equality instead of false-pruning every file
    kept, total = V.prune_files(t, v, [("k", "=", "11")])
    assert len(kept) == total
    # bucket, by contrast, canonicalizes through the same string form
    # the writer hashed (`_bloom_key` convention) — int and str
    # literals agree and prune CORRECTLY
    t2 = troot + "/tbl2"
    V.write_snapshot(df, t2, partition_by=["bucket(4,k)"])
    k_int, tot2 = V.prune_files(t2, V.latest_version(t2),
                                [("k", "=", 11)])
    k_str, _ = V.prune_files(t2, V.latest_version(t2),
                             [("k", "=", "11")])
    assert sorted(k_int) == sorted(k_str) and len(k_int) < tot2
    assert _rows(V.read_version(spark, t2, predicates=[("k", "=", 11)])) \
        == _rows(df.filter(F.col("k") == 11))


# -- spec lifecycle ---------------------------------------------------------

def test_append_inherits_and_mismatch_refused(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["month(d)"])
    V.write_snapshot(df.limit(10), t)            # inherits
    assert V.table_partition_spec(t) == ["month(d)"]
    assert len(V.table_partitions(t)) == len(V._read_manifest(
        t, V.latest_version(t)))                 # appended files tupled too
    with pytest.raises(P.PartitionSpecError):
        V.write_snapshot(df.limit(1), t, partition_by=["day(d)"])
    # overwrite may change the spec; [] clears it
    V.write_snapshot(df.limit(5), t, mode="overwrite",
                     partition_by=["day(d)"])
    assert V.table_partition_spec(t) == ["day(d)"]
    V.write_snapshot(df.limit(5), t, mode="overwrite", partition_by=[])
    assert V.table_partition_spec(t) == []


def test_rename_drop_of_partition_source_refused(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(_orders(spark), t, partition_by=["bucket(4,k)"])
    with pytest.raises(ValueError, match="partition source"):
        V.rename_column(t, "k", "kk")
    with pytest.raises(ValueError, match="partition source"):
        V.drop_column(t, "k")
    # other columns still evolve freely
    V.rename_column(t, "name", "label")
    assert "label" in V.read_version(spark, t).columns


def test_rollback_and_clone_carry_layout(spark, troot, tmp_path):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["month(d)"])
    n1 = len(V.table_partitions(t))
    V.write_snapshot(df.limit(5), t, mode="overwrite", partition_by=[])
    assert V.table_partition_spec(t) == []
    v = V.rollback(t, 1)
    assert V.table_partition_spec(t, v) == ["month(d)"]
    assert len(V.table_partitions(t, v)) == n1
    dst = str(tmp_path / "clone")
    V.clone_shallow(t, dst, version=v)
    assert V.table_partition_spec(dst) == ["month(d)"]
    assert len(V.table_partitions(dst)) == n1


def test_vacuum_reclaims_partitioned_orphans(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["month(d)"])
    V.write_snapshot(df.limit(3), t, mode="overwrite")
    deleted = V.vacuum(t, keep_versions=1)
    assert deleted > 0                      # nested v1 files swept
    assert _rows(V.read_version(spark, t)) == _rows(df.limit(3))


def test_compaction_preserves_partition_layout(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    # three small commits -> several files per partition tuple
    V.write_snapshot(df.filter(F.col("id") % 3 == 0), t,
                     partition_by=["month(d)"])
    V.write_snapshot(df.filter(F.col("id") % 3 == 1), t)
    V.write_snapshot(df.filter(F.col("id") % 3 == 2), t)
    n_before = len(V._read_manifest(t, V.latest_version(t)))
    v = V.compact_snapshot(spark, t, cluster_by=["id"])
    files = V._read_manifest(t, v)
    parts = V.table_partitions(t, v)
    # compaction rewrote WITHIN the layout: every file re-tupled, one
    # file per populated partition, pruning still exact
    assert set(parts) == set(files)
    assert len(files) == len({tuple(pv) for pv in parts.values()})
    assert len(files) < n_before
    preds = [("d", ">=", datetime.date(1995, 6, 1))]
    kept, total = V.prune_files(t, v, preds)
    assert 0 < len(kept) < total
    assert _rows(V.read_version(spark, t, predicates=preds)) \
        == _rows(df.filter(F.col("d") >= F.lit("1995-06-01")))
    assert V.table_partition_spec(t, v) == ["month(d)"]


def test_incremental_optimize_preserves_layout(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df.filter(F.col("id") < 100), t,
                     partition_by=["bucket(4,k)"])
    V.write_snapshot(df.filter(F.col("id") >= 100), t)
    v = V.compact_small_files(spark, t, target_bytes=1 << 30)
    assert v is not None
    files = V._read_manifest(t, v)
    parts = V.table_partitions(t, v)
    assert set(parts) == set(files)
    assert _rows(V.read_version(spark, t, predicates=[("k", "=", 5)])) \
        == _rows(df.filter(F.col("k") == 5))
    kept, total = V.prune_files(t, v, [("k", "=", 5)])
    assert 0 < len(kept) < total


def test_stream_commit_honors_spec(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df.limit(0), t, partition_by=["bucket(4,k)"])
    assert V.commit_stream_batch(df.limit(40), 0, t)
    assert not V.commit_stream_batch(df.limit(40), 0, t)   # replay skip
    parts = V.table_partitions(t)
    files = V._read_manifest(t, V.latest_version(t))
    assert set(parts) == set(files) and len(files) > 0
    assert _rows(V.read_version(spark, t, predicates=[("k", "=", 3)])) \
        == _rows(df.limit(40).filter(F.col("k") == 3))


def test_delete_where_keeps_partition_tuples(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["bucket(4,k)"])
    n = len(V.table_partitions(t))
    V.delete_where(spark, t, "id < 20")
    assert len(V.table_partitions(t)) == n   # metadata rode through
    assert _rows(V.read_version(spark, t, predicates=[("k", "=", 3)])) \
        == _rows(df.filter((F.col("k") == 3) & (F.col("id") >= 20)))


# -- partition-spec evolution ----------------------------------------------

def test_spec_evolution_dual_era_pruning(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df.filter(F.col("id") < 100), t,
                     partition_by=["month(d)"])
    era1 = set(V._read_manifest(t, V.latest_version(t)))
    V.set_partition_spec(t, ["day(d)"])
    assert V.table_partition_spec(t) == ["day(d)"]
    V.write_snapshot(df.filter(F.col("id") >= 100), t)
    v = V.latest_version(t)
    specs = V.table_partition_specs(t)
    ids = V.table_partition_spec_ids(t)
    assert sorted(specs.values()) == [["day(d)"], ["month(d)"]]
    # each era tagged with its own spec id
    month_id = next(k for k, sp in specs.items() if sp == ["month(d)"])
    day_id = next(k for k, sp in specs.items() if sp == ["day(d)"])
    assert all(ids[f] == month_id for f in era1)
    assert all(ids[f] == day_id for f in set(ids) - era1)
    # a date predicate prunes BOTH eras, each under its own transform,
    # and the read is exact
    preds = [("d", ">=", datetime.date(1995, 6, 1)),
             ("d", "<", datetime.date(1995, 6, 15))]
    kept, total = V.prune_files(t, v, preds)
    assert 0 < len(kept) < total
    assert len(set(kept) & era1) < len(era1)         # old era pruned too
    assert _rows(V.read_version(spark, t, predicates=preds)) == _rows(
        df.filter((F.col("d") >= F.lit("1995-06-01"))
                  & (F.col("d") < F.lit("1995-06-15"))))


def test_spec_evolution_unpartition_forward(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["bucket(4,k)"])
    V.set_partition_spec(t, [])
    assert V.table_partition_spec(t) == []
    V.write_snapshot(df.limit(5), t)                 # plain files now
    assert _rows(V.read_version(spark, t, predicates=[("k", "=", 3)])) \
        == _rows(df.unionByName(df.limit(5)).filter(F.col("k") == 3))


def test_rename_refused_across_spec_eras(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["bucket(4,k)"])
    V.set_partition_spec(t, ["month(d)"])
    # k is no longer in the CURRENT spec, but era-1 files still prune
    # under bucket(4,k) — rename must refuse across ALL registered eras
    with pytest.raises(ValueError, match="partition source"):
        V.rename_column(t, "k", "kk")
    with pytest.raises(ValueError, match="partition source"):
        V.drop_column(t, "d")


def test_compaction_converges_to_current_spec(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df.filter(F.col("id") < 100), t,
                     partition_by=["month(d)"])
    V.set_partition_spec(t, ["bucket(4,k)"])
    V.write_snapshot(df.filter(F.col("id") >= 100), t)
    v = V.compact_snapshot(spark, t)
    ids = V.table_partition_spec_ids(t, v)
    specs = V.table_partition_specs(t, v)
    cur_id = next(k for k, sp in specs.items() if sp == ["bucket(4,k)"])
    assert ids and all(i == cur_id for i in ids.values())
    assert _rows(V.read_version(spark, t, predicates=[("k", "=", 2)])) \
        == _rows(df.filter(F.col("k") == 2))


def test_set_spec_validates(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(_orders(spark), t)
    with pytest.raises(P.PartitionSpecError):
        V.set_partition_spec(t, ["month(k)"])        # long has no months
    with pytest.raises(P.PartitionSpecError):
        V.set_partition_spec(t, ["bucket(0,k)"])
    V.rename_column(t, "k", "kk")
    with pytest.raises(ValueError, match="renamed column"):
        V.set_partition_spec(t, ["bucket(4,kk)"])


def test_calendar_transform_tz_aware_binds_but_never_prunes(spark):
    """year/month/day over a TZ-AWARE timestamp column BIND (tables
    declared before the tz audit keep appending — no migration break)
    but NEVER PRUNE: the write expression evaluates in the session
    timezone while literal pruning uses naive calendar fields, so a
    session-tz change between write and read could false-prune a
    file.  apply_literal therefore returns None for every literal —
    placement only, every file read.  timestamp_ntz still prunes."""
    df = spark.createDataFrame(
        [(1, datetime.datetime(2020, 1, 1, 12))], "k: long, ts: timestamp")
    t = P.parse_spec("month(ts)").bind(df.schema)
    assert t.dtype == "timestamp"
    # NO literal prunes against a tz-aware-bound calendar transform —
    # naive, tz-aware, or string
    for lit in (datetime.datetime(2020, 1, 1),
                datetime.datetime(2020, 1, 1,
                                  tzinfo=datetime.timezone.utc),
                "2020-01-01"):
        assert t.apply_literal(lit) is None
    # and a write through the bound spec round-trips (no hard break
    # for existing tables declaring this transform)
    rows = [(i, datetime.datetime(2020, 1 + i, 1, 12)) for i in range(3)]
    d = spark.createDataFrame(rows, "k: long, ts: timestamp")
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        tdir = td + "/t"
        V.write_snapshot(d, tdir, partition_by=["month(ts)"])
        got = V.read_version(
            spark, tdir,
            predicates=[("ts", "=", datetime.datetime(2020, 2, 1, 12))])
        assert _rows(got) == _rows(
            d.filter(F.col("ts") == datetime.datetime(2020, 2, 1, 12)))


def test_tz_aware_literal_never_prunes():
    """A tz-aware predicate literal maps to no transform value — the
    file is kept (superset-safe), never false-pruned by a boundary
    shift."""
    t = P.parse_spec("day(d)")
    aware = datetime.datetime(2020, 1, 1, 0, 30,
                              tzinfo=datetime.timezone.utc)
    assert t.apply_literal(aware) is None
    assert P.file_matches(["day(d)"], [18262],
                          [("d", "=", aware)]) is True


# -- bucket-aligned join (layout-level SPJ) ---------------------------------

def _bucketed(spark, path, col, rows, n=4):
    df = spark.createDataFrame(rows, f"{col}: long, v: string")
    V.write_snapshot(df, path, partition_by=[f"bucket({n},{col})"])
    return path


def test_bucket_aligned_join_matches_plain_and_no_shuffle(spark, tmp_path):
    l = _bucketed(spark, str(tmp_path / "l"), "k",
                  [(i, f"l{i}") for i in range(40)])
    r = _bucketed(spark, str(tmp_path / "r"), "j",
                  [(i, f"r{i}") for i in range(0, 40, 2)])
    j = V.bucket_aligned_join(spark, l, r, "k", "j")
    assert j is not None
    got = {tuple(row) for row in j.collect()}
    exp = {(i, f"l{i}", i, f"r{i}") for i in range(0, 40, 2)}
    assert got == exp
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_bucket_aligned_join_applies_mor_overlays(spark, tmp_path):
    l = _bucketed(spark, str(tmp_path / "l"), "k",
                  [(i, f"l{i}") for i in range(20)])
    r = _bucketed(spark, str(tmp_path / "r"), "j",
                  [(i, f"r{i}") for i in range(20)])
    V.delete_where_keys(spark, l, "k", [3, 4])
    V.update_where(spark, r, "j = 5", {"v": "'R5'"})
    j = V.bucket_aligned_join(spark, l, r, "k", "j")
    got = {tuple(row) for row in j.collect()}
    assert (3, "l3", 3, "r3") not in got and (4, "l4", 4, "r4") not in got
    assert (5, "l5", 5, "R5") in got
    assert len(got) == 18


def test_bucket_aligned_join_refuses_misaligned(spark, tmp_path):
    # different bucket counts
    l = _bucketed(spark, str(tmp_path / "l"), "k",
                  [(i, "x") for i in range(10)], n=4)
    r = _bucketed(spark, str(tmp_path / "r"), "j",
                  [(i, "y") for i in range(10)], n=8)
    assert V.bucket_aligned_join(spark, l, r, "k", "j") is None
    # unpartitioned table
    u = str(tmp_path / "u")
    V.write_snapshot(spark.createDataFrame([(1, "z")],
                                           "j: long, v: string"), u)
    assert V.bucket_aligned_join(spark, l, u, "k", "j") is None
    # compaction REWRITES UNDER THE SPEC (write paths never dilute the
    # layout), so alignment survives it
    V.compact_snapshot(spark, l, n_files=2)
    g = V.bucket_file_groups(l, "k")
    assert g is not None and g[0] == 4


def test_bucket_aligned_join_skips_null_key_files(spark, tmp_path):
    l = str(tmp_path / "l")
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (None, "ln")], "k: long, v: string"), l,
        partition_by=["bucket(4,k)"])
    r = str(tmp_path / "r")
    V.write_snapshot(spark.createDataFrame(
        [(1, "b"), (None, "rn")], "j: long, v: string"), r,
        partition_by=["bucket(4,j)"])
    j = V.bucket_aligned_join(spark, l, r, "k", "j")
    assert {tuple(row) for row in j.collect()} == {(1, "a", 1, "b")}
