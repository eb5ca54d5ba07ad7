"""Deterministic migration-domain fixtures (FIXTURES.md §A).

The driver tables cover the relational surface; the migration-domain
operators (usage-line parsing, multi-line ACL assembly, identity remap,
bin-packing) need filesystem-shaped inputs.  These generators are pure
functions of a seed so every test run sees identical data — mirroring the
record types at /root/reference/adls_copy_utils.py:66-94 and
/root/reference/copy-acls.sh:64 without copying any code.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import DataFrame, SparkSession

from .schemas import (
    ACL_RECORD_SCHEMA,
    BLOB_LISTING_SCHEMA,
    FILE_INVENTORY_SCHEMA,
    IDENTITY_MAP_SCHEMA,
)

_USERS = ["alice", "bob", "carol", "dave", "erin", "hdfs", "yarn", "hive"]
_GROUPS = ["devs", "analysts", "ops", "hadoop", "finance"]


def _tree(seed: int, n_dirs: int, files_per_dir: int):
    """A 3-5 level directory tree with heavy-tailed file sizes and one
    oversized subtree (exercises X2 oversize recursion)."""
    rng = random.Random(seed)
    dirs = ["data"]
    for i in range(n_dirs - 1):
        parent = rng.choice(dirs)
        if parent.count("/") >= 4:
            parent = "data"
        dirs.append(f"{parent}/d{i:03d}")
    files = []
    for d in dirs:
        for j in range(files_per_dir):
            # log-uniform sizes: many small, few large
            size = int(10 ** rng.uniform(1, 8))
            files.append((f"{d}/f{j:02d}.dat", size))
    # one oversized file so its subtree exceeds small pack capacities
    files.append(("data/d000/huge.bin", 50_000_000_000))
    return dirs, files


def blob_listing(spark: SparkSession, seed: int = 42, n_dirs: int = 40,
                 files_per_dir: int = 5) -> DataFrame:
    """Raw blob-listing rows (pre-P1): what `az storage blob list --include m`
    would emit (adls_copy_utils.py:66-75) — name + metadata map (with the
    hdi_permission JSON and hdi_isfolder marker) + properties.contentLength."""
    rng = random.Random(seed + 1)
    dirs, files = _tree(seed, n_dirs, files_per_dir)
    rows = []
    for d in dirs:
        perm = json.dumps({"owner": rng.choice(_USERS),
                           "group": rng.choice(_GROUPS),
                           "permissions": "rwxr-x---"})
        rows.append((d, {"hdi_isfolder": "true", "hdi_permission": perm},
                     (0,)))
    for path, size in files:
        perm = json.dumps({"owner": rng.choice(_USERS),
                           "group": rng.choice(_GROUPS),
                           "permissions": rng.choice(["rw-r-----", "rw-rw-r--", "rwxr-x---"])})
        meta = {"hdi_permission": perm}
        if rng.random() < 0.4:
            meta["dept"] = rng.choice(["eng", "sales"])
        if rng.random() < 0.2:
            meta["tier"] = "hot"
        rows.append((path, meta, (size,)))
    rows.sort(key=lambda r: r[0])  # listing order = lexicographic, parents first
    return spark.createDataFrame(rows, BLOB_LISTING_SCHEMA)


def file_inventory(spark: SparkSession, seed: int = 42, **kw) -> DataFrame:
    """The post-P1 inventory (SURVEY §1.1a) derived from blob_listing via the
    real projection operator — so tests exercise P1 itself."""
    from .sources.inventory import project_inventory
    return project_inventory(blob_listing(spark, seed, **kw))


def acl_records(spark: SparkSession, seed: int = 42, n_files: int = 120) -> DataFrame:
    """Per-file ACL records ({file, owner, group, acl[]}) mixing 3- and
    4-field entries and empty-id unnamed entries (copy-acls.py:15-18),
    including one empty-string row for the filesystem root
    (copy-acls.py:30-31 normalizes it to '/')."""
    rng = random.Random(seed + 2)
    rows = [("", "hdfs", "hadoop", ["user::rwx", "group::r-x", "other::r-x"])]
    for i in range(n_files):
        owner = rng.choice(_USERS)
        group = rng.choice(_GROUPS)
        acl = ["user::rwx", f"group::{rng.choice(['r-x', 'r--'])}", "other::---"]
        for _ in range(rng.randrange(3)):
            acl.append(f"user:{rng.choice(_USERS)}:{rng.choice(['rw-', 'r--'])}")
        if rng.random() < 0.3:
            acl.append(f"group:{rng.choice(_GROUPS)}:r-x")
        if rng.random() < 0.25:  # 4-field default-scope entries
            acl.append(f"default:user:{rng.choice(_USERS)}:rwx")
            acl.append("default:mask::rwx")
        rows.append((f"dir{i % 7}/file{i:03d}.dat", owner, group, acl))
    return spark.createDataFrame(rows, ACL_RECORD_SCHEMA)


def identity_map(spark: SparkSession, seed: int = 42) -> DataFrame:
    """source→target identity dimension; ~20% targets empty and two users
    deliberately absent so the J1 fallback path (coalesce to original id,
    adls_copy_utils.py:96-104) is exercised."""
    rng = random.Random(seed + 3)
    rows = []
    for u in _USERS[:-2]:                       # hive, yarn absent → fallback
        tgt = "" if rng.random() < 0.2 else f"{u}@corp.example.com"
        rows.append(("user", u, tgt))
    for g in _GROUPS[:-1]:                      # finance absent → fallback
        tgt = "" if rng.random() < 0.2 else f"grp-{g}@corp.example.com"
        rows.append(("group", g, tgt))
    return spark.createDataFrame(rows, IDENTITY_MAP_SCHEMA)


def du_lines(spark: SparkSession, seed: int = 42, three_column: bool = True,
             n_dirs: int = 40, files_per_dir: int = 5) -> DataFrame:
    """`hadoop fs -du -x` text output for the fixture tree: immediate-child
    rollup per directory.  Both the 2-column (`<size> <path>`) and 3-column
    (`<size> <disk-usage> <path>`) variants the tolerant parser must accept
    (generate-file-list.py:8-12)."""
    dirs, files = _tree(seed, n_dirs, files_per_dir)
    total: dict[str, int] = {d: 0 for d in dirs}
    for path, size in files:
        # charge the file to every ancestor (du reports recursive totals)
        parts = path.split("/")
        for i in range(1, len(parts)):
            anc = "/".join(parts[:i])
            if anc in total:
                total[anc] += size
    lines = []
    for d in sorted(total):
        if three_column:
            lines.append((f"{total[d]}  {total[d] * 3}  /{d}",))
        else:
            lines.append((f"{total[d]}  /{d}",))
    return spark.createDataFrame(lines, "value: string")


def getfacl_text(seed: int = 42, n_files: int = 30) -> list[str]:
    """Multi-line `hadoop fs -getfacl -R` output (copy-acls.sh:22-44 input
    format): `# file:` / `# owner:` / `# group:` comments, then ACL entry
    lines (some with trailing `#effective:` annotations), blank separators."""
    rng = random.Random(seed + 4)
    out: list[str] = []
    for i in range(n_files):
        owner, group = rng.choice(_USERS), rng.choice(_GROUPS)
        out.append(f"# file: /data/dir{i % 5}/file{i:03d}.dat")
        out.append(f"# owner: {owner}")
        out.append(f"# group: {group}")
        out.append("user::rwx")
        if rng.random() < 0.5:
            out.append(f"user:{rng.choice(_USERS)}:rw-\t#effective:r--")
        out.append(f"group::r-x")
        if rng.random() < 0.25:
            out.append(f"default:user:{rng.choice(_USERS)}:rwx")
        out.append("other::---")
        out.append("")
    return out
