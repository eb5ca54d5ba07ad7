"""A1-A5 aggregations.

Reference:
  A1 directory-size rollup — delegated to `hadoop fs -du`
     (/root/reference/generate-file-list.py:22-25)
  A2 distinct identities — see operators/acl_rewrite.extract_identities
  A3 group-by-unit filelist collection (/root/reference/generate-file-list.py:69-72)
  A4 group-by-type pivot — see sources/identity.pivot_identity_map
  A5 counts / size accounting

Spark supplies partial (map-side) aggregation automatically; the rollups
here shuffle once on the grouping key.  The full-subtree rollup is the
interesting one: the reference gets recursive totals from `du` itself, so
the Spark version derives every (file, ancestor) pair and aggregates — at
100 TB that is |files|×depth rows, still linear, and the explode happens
map-side before the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def directory_sizes(inv: DataFrame, path_col: str = "name",
                    size_col: str = "length") -> DataFrame:
    """A1 (immediate form): bytes per parent directory — one shuffle."""
    return (
        inv.groupBy(F.col("parent_directory").alias("path"))
        .agg(F.sum(size_col).alias("size"))
    )


def subtree_sizes(inv: DataFrame, path_col: str = "name",
                  size_col: str = "length") -> DataFrame:
    """A1 (recursive form): total bytes under every ancestor directory —
    what `hadoop fs -du` reports per directory.

    Each file row is exploded to its ancestor chain map-side (depth is
    small, ≤ ~20), then a single groupBy(ancestor) sum.  Equivalent SQL for
    the oracle uses prefix matching.
    """
    # guard single-segment paths: sequence(1, 0) is the DESCENDING [1, 0]
    # in Spark, which would fabricate the file itself and '' as ancestors
    ancestors = F.expr(
        f"CASE WHEN size(split({path_col}, '/')) > 1 THEN "
        f"transform(sequence(1, size(split({path_col}, '/')) - 1), "
        f"i -> array_join(slice(split({path_col}, '/'), 1, i), '/')) "
        f"ELSE array() END"
    )
    return (
        inv.select(F.col(size_col), F.explode(ancestors).alias("path"))
        .groupBy("path")
        .agg(F.sum(size_col).alias("size"))
    )


def filelists_by_unit(alloc: DataFrame) -> DataFrame:
    """A3: one ordered path-list per assigned unit (F2 filter + sort-based
    grouping of generate-file-list.py:69-72)."""
    return (
        alloc.filter(F.col("unit") != 0)
        .groupBy("unit")
        .agg(F.array_sort(F.collect_list(F.struct("path"))).alias("__s"))
        .select("unit", F.transform("__s", lambda s: s["path"]).alias("paths"))
        .orderBy("unit")
    )
