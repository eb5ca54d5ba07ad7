"""P2 ACL-entry rewrite + P3 lookup fallback + A2 distinct-identity
extraction + O4 synthetic owner entries.

Reference:
  map_acl_entry (/root/reference/copy-acls.py:14-20): split entry on ':',
  positional by length — 3 fields `type:id:perms`, 4 fields
  `scope:type:id:perms` — remap id through the identity map, re-join.
  Identity extraction (/root/reference/copy-acls.py:87-94): explode every
  entry, keep user (resp. group) entries with non-empty ids, union the
  owner/group injected as synthetic `user:<owner>:` entries, distinct.

Spark-first: the array-of-entries rewrite with a join inside is done as
**explode → broadcast join → regroup** (SURVEY §7 "plan-friendly default"):
`posexplode` keeps entry order, the identity join is J1 (broadcast, no
shuffle of the fact side beyond the regroup), and `collect_list` over the
position restores the array.  An all-column-expression variant would need
the map as a literal; the join form scales to identity maps of any size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import GROUP_IDENTITY_TYPE, USER_IDENTITY_TYPE


def parse_acl_entry(entry: Column):
    """Split `[scope:]type:id:perms` positionally by field count
    (copy-acls.py:16-18).  Returns (scope, type, id, perms) columns."""
    p = F.split(entry, ":")
    four = F.size(p) >= 4
    return (
        F.when(four, p[0]).otherwise(F.lit(None)).alias("scope"),
        F.when(four, p[1]).otherwise(p[0]).alias("type"),
        F.when(four, p[2]).otherwise(p[1]).alias("id"),
        F.when(four, p[3]).otherwise(p[2]).alias("perms"),
    )


def rewrite_acls(acls: DataFrame, dim: DataFrame, acl_col: str = "acl") -> DataFrame:
    """P2×J1: remap the id of every user/group entry in the ``acl`` array
    through the identity dimension; other entry types (other/mask) and
    empty ids pass through untouched (empty id is absent from the map ⇒
    fallback, matching copy-acls.py:19 + adls_copy_utils.py:98-104).

    explode → broadcast-join → regroup; original entry order restored via
    the explode position.
    """
    scope, etype, eid, perms = parse_acl_entry(F.col("__entry"))
    exploded = (
        acls.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__was_null", F.col(acl_col).isNull())
        .select("*", F.posexplode_outer(F.col(acl_col)).alias("__pos", "__entry"))
        .withColumn("__scope", scope)
        .withColumn("__type", etype)
        .withColumn("__id", eid)
        .withColumn("__perms", perms)
    )
    d = dim.select(F.col("type").alias("__dtype"), F.col("source").alias("__src"),
                   F.col("target").alias("__tgt"))
    joined = exploded.join(
        F.broadcast(d),
        (F.col("__type") == F.col("__dtype")) & (F.col("__id") == F.col("__src")),
        "left",
    )
    new_id = F.when(F.col("__src").isNotNull(), F.col("__tgt")).otherwise(F.col("__id"))
    rebuilt = F.when(
        F.col("__entry").isNull(), F.lit(None)
    ).when(
        F.col("__scope").isNotNull(),
        F.concat_ws(":", F.col("__scope"), F.col("__type"), new_id, F.col("__perms")),
    ).otherwise(
        F.concat_ws(":", F.col("__type"), new_id, F.col("__perms"))
    )
    group_cols = [c for c in acls.columns if c != acl_col]
    regrouped = (
        joined.withColumn("__rewritten", rebuilt)
        .groupBy("__rid")
        .agg(
            *[F.first(c, ignorenulls=False).alias(c) for c in group_cols],
            F.first("__was_null").alias("__was_null"),
            # posexplode_outer emits one null-pos row for null/empty arrays
            # — filter it out of the regroup and restore null/[] explicitly
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__pos").isNotNull(),
                           F.struct(F.col("__pos"), F.col("__rewritten"))))
            ).alias("__ordered"),
        )
        .select(
            *group_cols,
            F.when(F.col("__was_null"), F.lit(None).cast("array<string>"))
            .otherwise(
                F.transform(F.col("__ordered"), lambda s: s["__rewritten"]))
            .alias(acl_col),
        )
    )
    return regrouped


def extract_identities(acls: DataFrame) -> DataFrame:
    """A2+O4: distinct (type, source) identities referenced anywhere — every
    named user/group ACL entry id plus the file owner (as user) and owning
    group (as group), exactly the synthetic-entry trick of copy-acls.py:89,93.
    Returns the identity-map *skeleton* (target empty) of copy-acls.py:95-104.
    """
    scope, etype, eid, _ = parse_acl_entry(F.col("entry"))
    from_entries = (
        acls.select(F.explode(F.col("acl")).alias("entry"))
        .select(etype, eid)
        .filter(F.col("type").isin(USER_IDENTITY_TYPE, GROUP_IDENTITY_TYPE)
                & (F.col("id") != ""))
        .select(F.col("type"), F.col("id").alias("source"))
    )
    owners = acls.select(F.lit(USER_IDENTITY_TYPE).alias("type"),
                         F.col("owner").alias("source"))
    groups = acls.select(F.lit(GROUP_IDENTITY_TYPE).alias("type"),
                         F.col("group").alias("source"))
    return (
        from_entries.union(owners).union(groups)
        .filter(F.col("source").isNotNull() & (F.col("source") != ""))
        .distinct()
        .withColumn("target", F.lit(""))
    )


def normalize_root(acls: DataFrame, file_col: str = "file") -> DataFrame:
    """Root-path normalization (copy-acls.py:30-31): the empty relative path
    becomes '/'."""
    return acls.withColumn(
        file_col, F.when(F.col(file_col) == "", F.lit("/")).otherwise(F.col(file_col))
    )


def rewrite_acls_udf(acls: DataFrame, dim: DataFrame,
                     acl_col: str = "acl") -> DataFrame:
    """The broadcast-dict variant of `rewrite_acls` (SURVEY §2.4 J1 names
    both forms): collect the identity dimension to `{(type, id): target}`,
    broadcast it to executors, rewrite each entry array in one Arrow batch
    — no explode/regroup, array order trivially preserved.

    Tradeoff vs the join form: the whole map must fit in executor memory
    and updates require re-broadcast, but a wide fact row never leaves its
    partition.  Row-identical to `rewrite_acls` (equivalence-tested)."""
    from pyspark.sql.functions import pandas_udf

    mapping = {(r["type"], r["source"]): r["target"] for r in dim.collect()}
    bmap = acls.sparkSession.sparkContext.broadcast(mapping)

    def rewrite_one(entry: str) -> str:
        # mirrors parse_acl_entry + concat_ws exactly, including entries
        # with fewer than 3 fields (out-of-bounds ⇒ None, concat_ws skips)
        parts = entry.split(":")
        def at(i):
            return parts[i] if i < len(parts) else None
        four = len(parts) >= 4
        scope = at(0) if four else None
        etype = at(1) if four else at(0)
        eid = at(2) if four else at(1)
        perms = at(3) if four else at(2)
        eid = bmap.value.get((etype, eid), eid)
        fields = [x for x in (scope, etype, eid, perms) if x is not None]
        return ":".join(fields)

    @pandas_udf("array<string>")
    def rewrite(batch: pd.Series) -> pd.Series:
        return batch.map(
            lambda arr: None if arr is None else [rewrite_one(e) for e in arr])

    return acls.withColumn(acl_col, rewrite(F.col(acl_col)))
