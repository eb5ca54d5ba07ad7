"""J1 identity-lookup join and J2 existence checks.

Reference:
  J1: lookupIdentity (/root/reference/adls_copy_utils.py:96-104) — dict
      lookup `map[type][id]` with pass-through fallback on miss; used for
      owners, groups and every ACL-entry id (copy-acls.py:19,41-42,
      copy-to-adls.py:12,37-38, identity-mapper.py:15-16).
  J2: per-path `hadoop fs -test -e` existence probe
      (distcp-to-databox.sh:22-23).

Spark-first: J1 is a *broadcast* hash left-outer join against the tiny
identity dimension, with `coalesce(target, original)` for the fallback — the
dimension is unique users+groups, always far below the broadcast threshold,
so the fact side never shuffles.  J2 is a left-semi/left-anti join against
the destination inventory: one distributed probe instead of one process fork
per path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_identity(fact: DataFrame, dim: DataFrame, id_col: str,
                    identity_type: str, out_col: str | None = None) -> DataFrame:
    """J1: remap ``fact[id_col]`` through the identity dimension.

    Semantics match lookupIdentity exactly: if (type, id) is present in the
    map the target is used *even if blank*; only an absent key falls back to
    the original id (adls_copy_utils.py:98-104).
    """
    out_col = out_col or id_col
    d = (
        dim.filter(F.col("type") == identity_type)
        .select(F.col("source").alias("__src"), F.col("target").alias("__tgt"))
    )
    joined = fact.join(F.broadcast(d), fact[id_col] == d["__src"], "left")
    return (
        joined
        .withColumn(out_col,
                    F.when(F.col("__src").isNotNull(), F.col("__tgt"))
                    .otherwise(F.col(id_col)))
        .drop("__src", "__tgt")
    )


def remap_owner_group(inv: DataFrame, dim: DataFrame) -> DataFrame:
    """P4: apply J1 to permissions.owner (as user) and permissions.group
    (as group) on the inventory (identity-mapper.py:15-16), rebuilding the
    struct with `withField` — no struct explosion."""
    step = inv.withColumn("__owner", F.col("permissions.owner")) \
              .withColumn("__group", F.col("permissions.group"))
    step = lookup_identity(step, dim, "__owner", "user")
    step = lookup_identity(step, dim, "__group", "group")
    return (
        step.withColumn("permissions",
                        F.col("permissions")
                        .withField("owner", F.col("__owner"))
                        .withField("group", F.col("__group")))
        .drop("__owner", "__group")
    )


def exists_in(paths: DataFrame, dest: DataFrame, on: str = "path",
              keep_existing: bool = True) -> DataFrame:
    """J2: set-membership of ``paths`` against a destination inventory —
    left-semi (exists) or left-anti (missing)."""
    how = "left_semi" if keep_existing else "left_anti"
    return paths.join(dest.select(F.col(on)), on=on, how=how)
