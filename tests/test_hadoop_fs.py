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
