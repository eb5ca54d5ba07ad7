"""Real-filesystem listing sources (S1/S2/S9 real form) against a local
file:// tree — the JVM FileSystem gateway and the distributed pyarrow
lister must agree with each other and with the ground truth on disk."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.sources.hadoop_fs import (
    content_summary_jvm,
    fs_inventory,
    list_files_jvm,
    list_status_jvm,
    list_tree_distributed,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Deterministic 3-level tree: 2 top dirs x 2 subdirs x 2 files plus
    2 root-level files; file sizes are distinct so totals are checkable."""
    root = tmp_path_factory.mktemp("fstree")
    sizes = {}
    for i, top in enumerate(["alpha", "beta"]):
        for j, sub in enumerate(["x", "y"]):
            d = root / top / sub
            d.mkdir(parents=True)
            for k in range(2):
                f = d / f"f{k}.txt"
                n = 100 * (i + 1) + 10 * (j + 1) + (k + 1)
                f.write_bytes(b"a" * n)
                sizes[str(f)] = n
    for k in range(2):
        f = root / f"root{k}.bin"
        n = 7 + k
        f.write_bytes(b"b" * n)
        sizes[str(f)] = n
    return str(root), sizes


def test_list_files_jvm_matches_disk(spark, tree):
    root, sizes = tree
    got = {r["path"]: r["length"]
           for r in list_files_jvm(spark, root).collect()}
    assert got == sizes
    df = list_files_jvm(spark, root)
    assert df.filter(F.col("is_dir")).count() == 0
    assert df.filter(F.col("mtime_ms") <= 0).count() == 0


def test_list_status_jvm_one_level(spark, tree):
    root, _ = tree
    rows = list_status_jvm(spark, root).collect()
    names = {os.path.basename(r["path"]): r["is_dir"] for r in rows}
    assert names == {"alpha": True, "beta": True,
                     "root0.bin": False, "root1.bin": False}


def test_content_summary_matches_du(spark, tree):
    root, sizes = tree
    cs = content_summary_jvm(spark, root)
    assert cs["length"] == sum(sizes.values())
    assert cs["file_count"] == len(sizes)
    # root + alpha,beta + 4 subdirs
    assert cs["directory_count"] == 7


@pytest.mark.parametrize("fanout_depth", [1, 2, 5])
def test_distributed_lister_agrees_with_jvm(spark, tree, fanout_depth):
    """The executor-fanned pyarrow lister and the driver-side JVM lister
    must produce the same file set at every fanout split point (including
    depth 5 > tree depth: pure driver-side fallback)."""
    root, sizes = tree
    dist = list_tree_distributed(spark, root, fanout_depth=fanout_depth)
    files = {r["path"]: r["length"]
             for r in dist.filter(~F.col("is_dir")).collect()}
    assert files == sizes
    dirs = sorted(r["path"] for r in dist.filter(F.col("is_dir")).collect())
    assert len(dirs) == len(set(dirs)) == 6  # alpha,beta + 4 subdirs, no dups


def test_fs_inventory_relative_names(spark, tree):
    root, sizes = tree
    inv = fs_inventory(list_files_jvm(spark, root), root)
    names = {r["name"] for r in inv.collect()}
    assert f"alpha{os.sep}x/f0.txt".replace(os.sep, "/") in names
    assert all(not n.startswith("/") for n in names)
    assert inv.filter(F.col("is_folder")).count() == 0


def test_generate_filelists_from_real_tree(spark, tree, tmp_path):
    """§3.1 end-to-end on a REAL local tree: every file lands in exactly
    one unit's filelist and per-unit totals respect capacity."""
    from databox_adls_loader_spark.plans.pipelines import (
        generate_filelists_from_path,
    )
    root, sizes = tree
    out = str(tmp_path / "units")
    alloc = generate_filelists_from_path(
        spark, root, out, capacity=700, depth=1)
    rows = alloc.collect()
    assert {r["unit"] for r in rows if r["unit"] > 0}  # some unit assigned
    # coverage: the packed entries partition the file bytes exactly
    total = sum(r["size"] for r in rows)
    assert total == sum(sizes.values())


def test_distributed_lister_special_char_dirnames(spark, tmp_path):
    """Directory names with spaces/%/# are legal on HDFS and local fs;
    the distributed lister must not crash parsing them as URIs (subtree
    roots ship as plain paths, the FileSystem builds from one encoded
    base URI)."""
    root = tmp_path / "tree"
    for d in ["a b", "pct%40", "ha#sh"]:
        sub = root / d / "inner"
        sub.mkdir(parents=True)
        (sub / "f.txt").write_bytes(b"x" * 11)
    # fanout_depth=2 makes each special-named dir (level 1) a parent of
    # an executor-listed subtree root (level 2: 'inner')
    dist = list_tree_distributed(spark, str(root), fanout_depth=2)
    files = {r["path"]: r["length"]
             for r in dist.filter(~F.col("is_dir")).collect()}
    assert files == {str(root / d / "inner" / "f.txt"): 11
                     for d in ["a b", "pct%40", "ha#sh"]}


def test_scan_acls_jvm_real_tree(spark, tmp_path):
    """S4 real boundary: ACL records from the live FileSystem API — base
    triple reflects actual chmod bits, owner/group are the real ones, and
    the records feed acl_pipeline's generate-map mode unchanged."""
    import os
    root = tmp_path / "acltree"
    (root / "sub").mkdir(parents=True)
    f1 = root / "a.txt"; f1.write_bytes(b"hi")
    f2 = root / "sub" / "b.txt"; f2.write_bytes(b"hello")
    os.chmod(f1, 0o640)
    os.chmod(root / "sub", 0o750)

    from databox_adls_loader_spark.sources.acl_scan import scan_acls_jvm
    recs = {r["file"]: r for r in scan_acls_jvm(spark, str(root)).collect()}
    assert set(recs) == {str(f1), str(root / "sub"), str(f2)}
    assert recs[str(f1)]["acl"][:3] == ["user::rw-", "group::r--",
                                        "other::---"]
    assert recs[str(root / "sub")]["acl"][0] == "user::rwx"
    assert all(r["owner"] and r["group"] for r in recs.values())

    # §3.2 generate-map mode directly over the scanned records
    from databox_adls_loader_spark.plans.pipelines import acl_pipeline
    idents = acl_pipeline(scan_acls_jvm(spark, str(root)), None,
                          mode="generate-map")
    kinds = {(r["type"], r["source"]) for r in idents.collect()}
    assert ("user", recs[str(f1)]["owner"]) in kinds
