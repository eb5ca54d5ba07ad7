"""The three end-to-end pipelines of SURVEY §3, as thin compositions of
the operator modules — each is the Spark-first restatement of one
reference entry point.

  generate_filelists   §3.1  generate-file-list.py   scan→agg→pack→write
  acl_pipeline         §3.2  copy-acls.sh|py         scan→parse→{map|apply}
  copy_pipeline        §3.3  copy-to-adls.py         inventory→dirs→files
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.acl_rewrite import extract_identities, normalize_root, rewrite_acls
from ..operators.aggregates import subtree_sizes
from ..operators.joins import remap_owner_group
from ..operators.packing import DEFAULT_CAPACITY, pack_directories
from ..sinks.rest import apply_acl_sink, copy_files_sink, create_directories_ordered
from ..sinks.writers import write_unit_filelists


def generate_filelists(inventory: DataFrame, out_dir: str,
                       capacity: int = DEFAULT_CAPACITY,
                       depth: int = 1) -> DataFrame:
    """§3.1: distributed subtree rollup (A1) → driver-side first-fit pack
    (X1) at directory level ``depth`` → partitioned filelist write (K1).

    Oversized dirs at the pack level are recursed by packing their
    children instead (X2) — implemented set-at-a-time: one extra rollup
    pass per depth level, not one `du` fork per directory like the
    reference (generate-file-list.py:44-46).
    Returns the allocation DataFrame (path, size, unit).
    """
    files = inventory.filter(~F.col("is_folder"))
    dir_sizes = subtree_sizes(files)  # one shuffle, every ancestor
    # `du` lists file children too (generate-file-list.py parses both) —
    # a file directly inside an oversized dir must be packed itself when
    # recursion descends past it, or it would fall out of coverage
    file_sizes = files.select(F.col("name").alias("path"),
                              F.col("length").alias("size"))
    pdepth = F.size(F.split(F.col("path"), "/"))

    def level_entries(d: int, prefixes: list[str] | None):
        dirs = dir_sizes.filter(pdepth == d)
        fs = file_sizes.filter(pdepth == d)
        out = dirs.unionAll(fs)
        if prefixes is not None:
            cond = None
            for p in prefixes:
                c = F.col("path").startswith(p + "/")
                cond = c if cond is None else (cond | c)
            out = out.filter(cond)
        return out

    frontier = level_entries(depth, None)
    # files shallower than the pack depth belong to no depth-`depth` entry
    # and can never be reached by recursion — pack them directly or they
    # silently fall out of coverage
    packed_input = file_sizes.filter(pdepth < depth)
    max_rounds = 20
    for rounds_left in range(max_rounds, 0, -1):
        over = frontier.filter(F.col("size") > capacity)
        fit = frontier.filter(F.col("size") <= capacity)
        packed_input = packed_input.unionAll(fit)
        # only directories can be recursed into; an oversized *file* can't
        # be split — it stays in the allocation as unit=0 (the reference's
        # never-fitting entries keep unit=0, generate-file-list.py:30-31)
        over_files = over.join(file_sizes.select("path"), "path", "left_semi")
        packed_input = packed_input.unionAll(over_files)
        over_dir_rows = over.join(file_sizes.select("path"), "path", "left_anti")
        over_dirs = [r["path"] for r in over_dir_rows.select("path").collect()]
        if not over_dirs:
            break
        if rounds_left == 1:
            # depth budget exhausted: keep the still-oversized dirs visible
            # as unit=0 allocations rather than dropping them silently
            packed_input = packed_input.unionAll(over_dir_rows)
            break
        depth += 1
        frontier = level_entries(depth, over_dirs)
    alloc = pack_directories(packed_input, capacity)
    write_unit_filelists(alloc, out_dir)
    return alloc


def generate_filelists_from_path(spark: SparkSession, root: str,
                                 out_dir: str,
                                 capacity: int = DEFAULT_CAPACITY,
                                 depth: int = 1,
                                 distributed: bool = False) -> DataFrame:
    """§3.1 against a REAL filesystem tree (file://, hdfs://, abfs://):
    list via the Hadoop FileSystem API (S2 real form — no CLI fork like
    generate-file-list.py:22-25), adapt to inventory shape, then the same
    rollup→pack→write pipeline as :func:`generate_filelists`.

    ``distributed=True`` switches to the executor-fanned pyarrow lister
    for trees too large to enumerate from the driver."""
    from ..sources.hadoop_fs import (
        fs_inventory,
        list_files_jvm,
        list_tree_distributed,
    )
    listing = (list_tree_distributed(spark, root) if distributed
               else list_files_jvm(spark, root))
    inventory = fs_inventory(listing, root)
    return generate_filelists(inventory, out_dir, capacity, depth)


def acl_pipeline(acls: DataFrame, identity_map: DataFrame | None,
                 mode: str = "apply",
                 sender: Callable[[dict], None] | None = None,
                 effects_dir: str | None = None) -> DataFrame | None:
    """§3.2: either emit the identity-map skeleton (mode='generate-map',
    copy-acls.py:84-104) or remap+apply ACLs (mode='apply',
    copy-acls.py:107-120).

    apply mode: owner/group J1 remaps + per-entry P2 rewrites, then the
    tolerant K5 sink (partition parallelism replaces the 10-thread
    WorkQueue).
    """
    acls = normalize_root(acls)
    if mode == "generate-map":
        return extract_identities(acls)
    if identity_map is None:
        raise ValueError("apply mode needs an identity map")
    from ..operators.joins import lookup_identity
    remapped = rewrite_acls(acls, identity_map)
    remapped = lookup_identity(remapped, identity_map, "owner", "user")
    remapped = lookup_identity(remapped, identity_map, "group", "group")
    if sender is not None:
        apply_acl_sink(remapped, sender, effects_dir)
        return None
    return remapped


def copy_pipeline(inventory: DataFrame, identity_map: DataFrame,
                  creator: Callable[[str], None],
                  copier: Callable[[str, int], None],
                  parallelism: int | None = None) -> dict:
    """§3.3: inventory → owner/group remap (P4) → ordered directory
    creation (K3: parents first, explicit depth sort) → distributed file
    copy (K4).  Two actions with an ordering barrier between them, exactly
    the reference's dirs-before-files contract (copy-to-adls.py:117-132).
    """
    remapped = remap_owner_group(inventory, identity_map)
    n_dirs = create_directories_ordered(remapped, creator)
    copy_files_sink(remapped, copier, parallelism)
    return {"directories": n_dirs}
