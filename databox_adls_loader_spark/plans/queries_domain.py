"""Migration-domain operators as oracle-checked queries.

The domain operators (multi-line assembly, ACL rewrite, collision adjust,
metadata merge) run on filesystem-shaped records; the driver's DuckDB
oracle only sees the ten driver tables — so each query here first derives
a deterministic domain-shaped input FROM a driver table (both engines
construct the identical input), then runs the real operator.  The oracle
side transcribes the operator's semantics in ANSI SQL — mismatches mean
the Spark operator, not the fixture, is wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, dsum_expr
from .queries import _t, register


@register(
    "s5_multiline_assembly",
    oracle=r"""
    WITH lines AS (
      SELECT c_custkey * 10 + i AS line_no,
             CASE i
               WHEN 0 THEN '# file: /data/c' || CAST(c_custkey AS VARCHAR)
               WHEN 1 THEN '# owner: o' || CAST(c_custkey % 20 AS VARCHAR)
               WHEN 2 THEN '# group: g' || CAST(c_custkey % 5 AS VARCHAR)
               WHEN 3 THEN 'user::rwx'
               WHEN 4 THEN 'user:u' || CAST(c_custkey % 7 AS VARCHAR) || ':rw- #effective:r--'
               ELSE 'other::---'
             END AS value
      FROM customer, range(6) r(i)
    ), tagged AS (
      SELECT line_no, value,
        last_value(CASE WHEN value LIKE '# file:%'
                        THEN trim(substr(value, 8)) END IGNORE NULLS)
          OVER (ORDER BY line_no ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS file
      FROM lines
    )
    SELECT regexp_replace(file, '^/[^/]*/?', '') AS file,
           max(CASE WHEN value LIKE '# owner:%' THEN trim(substr(value, 9)) END) AS owner,
           max(CASE WHEN value LIKE '# group:%' THEN trim(substr(value, 9)) END) AS grp,
           string_agg(CASE WHEN value NOT LIKE '#%' AND trim(value) <> ''
                      THEN regexp_replace(split_part(value, '#', 1), '^\s+|\s+$', '', 'g') END,
                      ',' ORDER BY line_no) AS acl_joined
    FROM tagged WHERE file IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    tags=["S4", "S5", "P6", "P7", "P9", "F6"],
)
def s5_multiline_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: the real multi-line record assembler run over getfacl-style text
    deterministically derived from customer (6 lines per record: file/
    owner/group headers + 3 entries, one with a '#effective' annotation)."""
    from ..sources.acl_scan import assemble_acl_records
    (customer,) = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lines = customer.select(
        F.posexplode(F.array(
            F.concat(F.lit("# file: /data/c"), k.cast("string")),
            F.concat(F.lit("# owner: o"), (k % 20).cast("string")),
            F.concat(F.lit("# group: g"), (k % 5).cast("string")),
            F.lit("user::rwx"),
            F.concat(F.lit("user:u"), (k % 7).cast("string"),
                     F.lit(":rw- #effective:r--")),
            F.lit("other::---"),
        )).alias("i", "value"),
        (k * 10 + F.col("i")).alias("line_no"),
    ).select("line_no", "value")
    return (
        assemble_acl_records(lines, strip_prefix_components=1)
        .select("file",
                "owner",
                F.col("group").alias("grp"),
                F.array_join("acl", ",").alias("acl_joined"))
        .orderBy("file")
    )


@register(
    "p2_acl_rewrite_join",
    oracle="""
    WITH acls AS (
      SELECT s_suppkey,
             ['user::rwx',
              'user:' || n_name || ':rw-',
              'group:' || n_name || ':r-x',
              'default:user:' || n_name || ':rwx',
              'other::---'] AS acl
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ), dim AS (
      SELECT 'user' AS dtype, n_name AS source, 'aad-' || n_name AS target
      FROM nation WHERE n_nationkey % 2 = 0
    ), exploded AS (
      SELECT a.s_suppkey, i, a.acl[i] AS entry FROM acls a, range(1, 6) r(i)
    ), parsed AS (
      SELECT s_suppkey, i, entry,
             CASE WHEN len(string_split(entry, ':')) >= 4
                  THEN string_split(entry, ':')[1] END AS scope,
             string_split(entry, ':')[CASE WHEN len(string_split(entry, ':')) >= 4 THEN 2 ELSE 1 END] AS etype,
             string_split(entry, ':')[CASE WHEN len(string_split(entry, ':')) >= 4 THEN 3 ELSE 2 END] AS eid,
             string_split(entry, ':')[CASE WHEN len(string_split(entry, ':')) >= 4 THEN 4 ELSE 3 END] AS perms
      FROM exploded
    ), rewritten AS (
      SELECT p.s_suppkey, p.i,
             CASE WHEN p.scope IS NOT NULL
                  THEN p.scope || ':' || p.etype || ':' || COALESCE(d.target, p.eid) || ':' || p.perms
                  ELSE p.etype || ':' || COALESCE(d.target, p.eid) || ':' || p.perms
             END AS entry
      FROM parsed p
      LEFT JOIN dim d ON p.etype = d.dtype AND p.eid = d.source
    )
    SELECT s_suppkey, string_agg(entry, ',' ORDER BY i) AS acl_joined
    FROM rewritten GROUP BY s_suppkey ORDER BY s_suppkey
    """,
    tags=["P2", "P3", "J1"],
)
def p2_acl_rewrite_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2×J1: the real explode→broadcast-join→regroup ACL rewrite over
    entries derived from supplier⋈nation, with a half-covering identity
    dim (even nation keys) so both remap and fallback paths execute."""
    from ..operators.acl_rewrite import rewrite_acls
    supplier, nation = _t(spark, sf_dir, "supplier", "nation")
    acls = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            F.array(
                F.lit("user::rwx"),
                F.concat(F.lit("user:"), F.col("n_name"), F.lit(":rw-")),
                F.concat(F.lit("group:"), F.col("n_name"), F.lit(":r-x")),
                F.concat(F.lit("default:user:"), F.col("n_name"), F.lit(":rwx")),
                F.lit("other::---"),
            ).alias("acl"),
        )
    )
    dim = (
        nation.filter(F.col("n_nationkey") % 2 == 0)
        .select(F.lit("user").alias("type"), F.col("n_name").alias("source"),
                F.concat(F.lit("aad-"), F.col("n_name")).alias("target"))
    )
    return (
        rewrite_acls(acls, dim)
        .select("s_suppkey", F.array_join("acl", ",").alias("acl_joined"))
        .orderBy("s_suppkey")
    )


@register(
    "p5_metadata_merge",
    oracle="""
    SELECT c_custkey,
           to_json(struct_pack(owner := 'o' || CAST(c_custkey % 20 AS VARCHAR),
                               "group" := c_mktsegment,
                               permissions := 'rwxr-x---')) AS perm_json,
           'x-ms-meta-dept=eng;x-ms-meta-hdi_permission=' ||
             to_json(struct_pack(owner := 'o' || CAST(c_custkey % 20 AS VARCHAR),
                                 "group" := c_mktsegment,
                                 permissions := 'rwxr-x---')) AS headers
    FROM customer ORDER BY c_custkey
    """,
    tags=["P5", "P10"],
)
def p5_metadata_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: re-serialize a permissions struct to JSON, merge into the
    metadata map, and prefix every key x-ms-meta- (identity-mapper.py:
    17-28) — emitted as sorted k=v pairs for engine-neutral hashing."""
    (customer,) = _t(spark, sf_dir, "customer")
    perm = F.to_json(F.struct(
        F.concat(F.lit("o"), (F.col("c_custkey") % 20).cast("string")).alias("owner"),
        F.col("c_mktsegment").alias("group"),
        F.lit("rwxr-x---").alias("permissions"),
    ))
    meta = F.map_concat(
        F.create_map(F.lit("dept"), F.lit("eng")),
        F.create_map(F.lit("hdi_permission"), perm),
    )
    prefixed = F.transform_keys(meta, lambda k, _v: F.concat(F.lit("x-ms-meta-"), k))
    headers = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(prefixed)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ";")
    return customer.select(
        "c_custkey", perm.alias("perm_json"), headers.alias("headers"),
    ).orderBy("c_custkey")


@register(
    "p8_dest_collision_adjust",
    oracle="""
    WITH src AS (
      SELECT p_partkey, '/src/' || p_brand || '/' || p_name AS path FROM part
    ), dest AS (
      SELECT DISTINCT '/src/' || p_brand || '/' || p_name AS path
      FROM part WHERE p_size > 25
    )
    SELECT s.p_partkey,
           CASE WHEN d.path IS NOT NULL
                THEN regexp_replace(s.path, '/[^/]*$', '') || '/'
                ELSE s.path END AS dest_path
    FROM src s LEFT JOIN dest d ON s.path = d.path
    ORDER BY s.p_partkey
    """,
    tags=["P8", "J2"],
)
def p8_dest_collision_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: if the destination already exists, retarget to the parent dir
    with a trailing slash (distcp-to-databox.sh:20-26) — the existence
    probe is a J2-shaped join against the dest inventory instead of one
    `hadoop fs -test -e` fork per path."""
    (part,) = _t(spark, sf_dir, "part")
    src = part.select(
        "p_partkey",
        F.concat(F.lit("/src/"), F.col("p_brand"), F.lit("/"), F.col("p_name")).alias("path"))
    dest = part.filter(F.col("p_size") > 25).select(
        F.concat(F.lit("/src/"), F.col("p_brand"), F.lit("/"), F.col("p_name")).alias("dpath")
    ).distinct()
    return (
        src.join(dest, src["path"] == dest["dpath"], "left")
        .select(
            "p_partkey",
            F.when(F.col("dpath").isNotNull(),
                   F.concat(F.regexp_replace("path", "/[^/]*$", ""), F.lit("/")))
            .otherwise(F.col("path")).alias("dest_path"))
        .orderBy("p_partkey")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=["A1", "F1", "tpch"],
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate pushes
    to parquet, scan reads 4 columns, no shuffle at all (single scalar)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                       " * CAST(l_discount AS DECIMAL(18,4))").alias("revenue"))
    )


@register(
    "a5_count_accounting",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
    tags=["A5"],
)
def a5_count_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: row/size accounting (queue-size logging analog) with exact
    distinct counts — Spark expands to two-stage aggregate automatically."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "o2_limit_pushdown",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS total
    FROM orders ORDER BY o_orderkey LIMIT 50
    """,
    tags=["O2"],
)
def o2_limit_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: ordered limit → TakeOrderedAndProject (the --num-results cap
    pushed to the source, adls_copy_utils.py:69)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderstatus",
                      F.col("o_totalprice").cast("double").alias("total"))
        .orderBy("o_orderkey").limit(50)
    )


@register(
    "s2_subtree_rollup",
    oracle="""
    WITH inv AS (
      SELECT '/data/b' || CAST(p_partkey % 10 AS VARCHAR)
             || '/d' || CAST(p_partkey % 100 AS VARCHAR)
             || '/f' || CAST(p_partkey AS VARCHAR) AS name,
             p_partkey * 10 AS length
      FROM part
    ), anc AS (
      SELECT length,
             unnest(list_transform(range(1, len(string_split(name, '/'))),
                    i -> array_to_string(list_slice(string_split(name, '/'), 1, i), '/')))
               AS path
      FROM inv
    )
    SELECT path, CAST(SUM(length) AS BIGINT) AS size FROM anc
    WHERE path <> '' GROUP BY path ORDER BY path
    """,
    tags=["S2", "A1"],
)
def s2_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/A1 recursive form: total bytes under EVERY ancestor directory —
    what `hadoop fs -du` reports (generate-file-list.py:22-25), computed as
    a map-side ancestor explode + one shuffle instead of one NameNode query
    per directory level.  Input paths derived deterministically from part."""
    from ..operators.aggregates import subtree_sizes
    (part,) = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    inv = part.select(
        F.concat(F.lit("/data/b"), (k % 10).cast("string"),
                 F.lit("/d"), (k % 100).cast("string"),
                 F.lit("/f"), k.cast("string")).alias("name"),
        (k * 10).alias("length"),
    )
    return (
        subtree_sizes(inv)
        .filter(F.col("path") != "")
        .orderBy("path")
    )


@register(
    "p4_owner_group_remap",
    oracle="""
    WITH inv AS (
      SELECT c_custkey,
             'u' || CAST(c_custkey % 40 AS VARCHAR) AS owner,
             'g' || CAST(c_custkey % 15 AS VARCHAR) AS grp
      FROM customer
    ), dim AS (
      SELECT 'user' AS dtype, 'u' || CAST(n_nationkey AS VARCHAR) AS source,
             'aad-u' || CAST(n_nationkey AS VARCHAR) AS target
      FROM nation
      UNION ALL
      SELECT 'group', 'g' || CAST(n_nationkey % 8 AS VARCHAR),
             'aad-g' || CAST(n_nationkey % 8 AS VARCHAR)
      FROM nation WHERE n_nationkey < 8
    )
    SELECT i.c_custkey,
           COALESCE(du.target, i.owner) AS owner,
           COALESCE(dg.target, i.grp) AS grp
    FROM inv i
    LEFT JOIN dim du ON du.dtype = 'user' AND du.source = i.owner
    LEFT JOIN dim dg ON dg.dtype = 'group' AND dg.source = i.grp
    ORDER BY i.c_custkey
    """,
    tags=["P4", "P3", "J1"],
)
def p4_owner_group_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: the real remap_owner_group operator — J1 applied to
    permissions.owner (as user) and permissions.group (as group) with
    withField struct rebuild (identity-mapper.py:15-16).  The dim covers
    only part of the key space so both remap and fallback paths run."""
    from ..operators.joins import remap_owner_group
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    k = F.col("c_custkey")
    inv = customer.select(
        "c_custkey",
        F.struct(
            F.concat(F.lit("u"), (k % 40).cast("string")).alias("owner"),
            F.concat(F.lit("g"), (k % 15).cast("string")).alias("group"),
            F.lit("rwxr-x---").alias("permissions"),
        ).alias("permissions"),
    )
    nk = F.col("n_nationkey")
    dim = (
        nation.select(F.lit("user").alias("type"),
                      F.concat(F.lit("u"), nk.cast("string")).alias("source"),
                      F.concat(F.lit("aad-u"), nk.cast("string")).alias("target"))
        .union(
            nation.filter(nk < 8)
            .select(F.lit("group").alias("type"),
                    F.concat(F.lit("g"), (nk % 8).cast("string")).alias("source"),
                    F.concat(F.lit("aad-g"), (nk % 8).cast("string")).alias("target")))
    )
    return (
        remap_owner_group(inv, dim)
        .select("c_custkey",
                F.col("permissions.owner").alias("owner"),
                F.col("permissions.group").alias("grp"))
        .orderBy("c_custkey")
    )


@register(
    "f2_assigned_only",
    oracle="""
    WITH alloc AS (
      SELECT o_orderkey AS path, o_totalprice AS size,
             CASE WHEN o_totalprice > 450000 THEN 0
                  ELSE (o_orderkey % 5) + 1 END AS unit
      FROM orders
    )
    SELECT unit, COUNT(*) AS n_dirs,
           CAST(SUM(CAST(size AS DECIMAL(18,2))) AS DOUBLE) AS bytes
    FROM alloc WHERE unit != 0
    GROUP BY unit ORDER BY unit
    """,
    tags=["F2"],
)
def f2_assigned_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: drop unassigned (unit=0, i.e. oversized/recursed) directories
    before emitting filelists (generate-file-list.py:70)."""
    (orders,) = _t(spark, sf_dir, "orders")
    alloc = orders.select(
        F.col("o_orderkey").alias("path"),
        F.col("o_totalprice").alias("size"),
        F.when(F.col("o_totalprice") > 450000, 0)
        .otherwise((F.col("o_orderkey") % 5) + 1).alias("unit"),
    )
    return (
        alloc.filter(F.col("unit") != 0)
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("n_dirs"), dsum("size").alias("bytes"))
        .orderBy("unit")
    )


@register(
    "j3_map_key_membership",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
           COUNT(*) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=["J3"],
)
def j3_map_key_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: metadata-key membership (`hdi_isfolder in metadata`,
    adls_copy_utils.py:79) — props parsed to a map, `map_contains_key`
    against the reserved key, conditional count."""
    (events,) = _t(spark, sf_dir, "events")
    meta = F.from_json("props", "map<string,string>")
    return (
        events.select("event_type",
                      F.map_contains_key(meta, "k").alias("__has"))
        .groupBy("event_type")
        .agg(F.sum(F.when(F.col("__has"), 1).otherwise(0)).alias("with_k"),
             F.count(F.lit(1)).alias("total"))
        .orderBy("event_type")
    )
