"""Named refs on the versioned table: tags, branches, and the
write-audit-publish flow (sinks/versioned.py refs section)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.sinks import versioned as V


@pytest.fixture(params=["local", "hadoop"])
def troot(request, tmp_path):
    if request.param == "local":
        return str(tmp_path)
    return f"file://{tmp_path}"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _orders(spark, lo=0, hi=200):
    rows = []
    for i in range(lo, hi):
        d = datetime.date(1995, 1, 1) + datetime.timedelta(days=(i * 7) % 365)
        rows.append((i, i % 17, d, f"c{i % 5}-{i}"))
    return spark.createDataFrame(
        rows, "id: long, k: long, d: date, name: string")


# -- tags -------------------------------------------------------------------

def test_tag_create_resolve_drop(spark, troot):
    t = troot + "/tbl"
    df1 = _orders(spark, 0, 100)
    V.write_snapshot(df1, t)
    V.create_tag(t, "rel-1.0")
    V.write_snapshot(_orders(spark, 100, 200), t)
    assert V.list_tags(t) == {"rel-1.0": 1}
    # the tag reads the PINNED version, not the head
    assert _rows(V.read_version(spark, t, ref="rel-1.0")) == _rows(df1)
    assert len(_rows(V.read_version(spark, t))) == 200
    with pytest.raises(FileExistsError, match="immutable"):
        V.create_tag(t, "rel-1.0")                    # tags never move
    assert V.drop_tag(t, "rel-1.0")
    assert not V.drop_tag(t, "rel-1.0")               # already gone
    with pytest.raises(KeyError):
        V.read_version(spark, t, ref="rel-1.0")


def test_tag_validation(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(_orders(spark), t)
    with pytest.raises(ValueError, match="invalid ref name"):
        V.create_tag(t, "a/b")
    with pytest.raises(FileNotFoundError):
        V.create_tag(t, "v9", version=9)
    with pytest.raises(ValueError, match="not both"):
        V.read_version(spark, t, version=1, ref="x")


def test_tag_pins_vacuum(spark, troot):
    t = troot + "/tbl"
    df1 = _orders(spark, 0, 50)
    V.write_snapshot(df1, t)
    V.create_tag(t, "audited")
    V.write_snapshot(_orders(spark, 50, 100), t, mode="overwrite")
    V.write_snapshot(_orders(spark, 100, 150), t, mode="overwrite")
    V.vacuum(t, keep_versions=1)
    # v2 (untagged, retired) is gone; v1 survives via the tag
    assert V.versions(t) == [1, 3]
    assert _rows(V.read_version(spark, t, ref="audited")) == _rows(df1)
    V.drop_tag(t, "audited")
    V.vacuum(t, keep_versions=1)                      # now reclaimable
    assert V.versions(t) == [3]


# -- branches: write-audit-publish -----------------------------------------

def test_branch_wap_publish(spark, troot):
    t = troot + "/tbl"
    base = _orders(spark, 0, 100)
    V.write_snapshot(base, t)
    bdir = V.create_branch(t, "audit")
    assert V.list_branches(t)["audit"]["forked_at_version"] == 1
    # the fork reads the parent snapshot zero-copy
    assert _rows(V.read_version(spark, bdir)) == _rows(base)
    staged = _orders(spark, 100, 160)
    V.write_snapshot(staged, bdir)
    # isolation: main's readers never see the staged write
    assert _rows(V.read_version(spark, t)) == _rows(base)
    assert _rows(V.read_version(spark, t, ref="audit")) \
        == _rows(base.unionByName(staged))
    v = V.fast_forward(t, "audit")
    assert v == 2
    assert _rows(V.read_version(spark, t)) == _rows(base.unionByName(staged))


def test_publish_refuses_divergence(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(_orders(spark, 0, 100), t)
    bdir = V.create_branch(t, "audit")
    V.write_snapshot(_orders(spark, 100, 160), bdir)
    V.write_snapshot(_orders(spark, 160, 200), t)     # main moves on
    with pytest.raises(V.ConcurrentCommitError, match="re-fork"):
        V.fast_forward(t, "audit")


def test_drop_branch_keeps_published_files(spark, troot):
    t = troot + "/tbl"
    base = _orders(spark, 0, 100)
    staged = _orders(spark, 100, 160)
    V.write_snapshot(base, t)
    V.create_branch(t, "audit")
    V.write_snapshot(staged, V.branch_path(t, "audit"))
    V.fast_forward(t, "audit")
    deleted = V.drop_branch(t, "audit")
    assert deleted == 0                               # all published
    assert V.list_branches(t) == {}
    assert _rows(V.read_version(spark, t)) == _rows(base.unionByName(staged))
    with pytest.raises(FileNotFoundError):
        V.drop_branch(t, "audit")


def test_drop_abandoned_branch_reclaims_staged_files(spark, troot):
    t = troot + "/tbl"
    base = _orders(spark, 0, 100)
    V.write_snapshot(base, t)
    V.create_branch(t, "bad")
    V.write_snapshot(_orders(spark, 100, 160), V.branch_path(t, "bad"))
    deleted = V.drop_branch(t, "bad")                 # audit failed: abandon
    assert deleted > 0                                # staged files reclaimed
    assert _rows(V.read_version(spark, t)) == _rows(base)


def test_branch_pins_parent_vacuum(spark, troot):
    t = troot + "/tbl"
    old = _orders(spark, 0, 50)
    V.write_snapshot(old, t)
    V.create_branch(t, "pinned")                      # forked at v1
    V.write_snapshot(_orders(spark, 50, 100), t, mode="overwrite")
    V.write_snapshot(_orders(spark, 100, 150), t, mode="overwrite")
    V.vacuum(t, keep_versions=1)
    # v1's manifest is retired on MAIN, but its files survive because a
    # live branch references them — the branch keeps reading
    assert _rows(V.read_version(spark, V.branch_path(t, "pinned"))) \
        == _rows(old)
    V.drop_branch(t, "pinned")
    assert V.vacuum(t, keep_versions=1) > 0           # now reclaimable


def test_branch_carries_table_state(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t, partition_by=["month(d)"],
                     checks=["id >= 0"])
    bdir = V.create_branch(t, "wap")
    # the fork carries the partition registry: a pruned read on the
    # branch skips files, and the CHECK gate still enforces
    preds = [("d", ">=", datetime.date(1995, 6, 1)),
             ("d", "<", datetime.date(1995, 7, 1))]
    kept, total = V.prune_files(bdir, 1, preds)
    assert 0 < len(kept) < total
    with pytest.raises(V.ConstraintViolation):
        V.write_snapshot(
            spark.createDataFrame(
                [(-1, 1, datetime.date(1995, 1, 1), "x")],
                "id: long, k: long, d: date, name: string"), bdir)
    # a partitioned branch write publishes its partition tuples back
    staged = _orders(spark, 200, 260)
    V.write_snapshot(staged, bdir)
    V.fast_forward(t, "wap")
    assert _rows(V.read_version(spark, t, predicates=preds)) == _rows(
        df.unionByName(staged).filter(
            (F.col("d") >= F.lit("1995-06-01"))
            & (F.col("d") < F.lit("1995-07-01"))))
    parts = V.table_partitions(t)
    assert len(parts) == len(V._read_manifest(t, V.latest_version(t)))


def test_branch_delete_where_publishes(spark, troot):
    t = troot + "/tbl"
    df = _orders(spark)
    V.write_snapshot(df, t)
    bdir = V.create_branch(t, "gdpr")
    V.delete_where(spark, bdir, "k = 3")
    assert _rows(V.read_version(spark, t)) == _rows(df)   # main untouched
    V.fast_forward(t, "gdpr")
    assert _rows(V.read_version(spark, t)) == _rows(df.filter("k <> 3"))
    V.drop_branch(t, "gdpr")
    # the published DELETE's position-delete files survived the drop
    assert _rows(V.read_version(spark, t)) == _rows(df.filter("k <> 3"))


def test_branch_name_collision_and_meta(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(_orders(spark), t)
    V.create_branch(t, "x")
    with pytest.raises(FileExistsError, match="already exists"):
        V.create_branch(t, "x")
    with pytest.raises(ValueError, match="invalid ref name"):
        V.create_branch(t, "../escape")
    assert V.branch_meta(t, "x")["forked_at_version"] == 1
    # tag wins a ref-name collision deterministically
    V.create_tag(t, "x")
    assert V.resolve_ref(t, "x")[0] == "tag"
