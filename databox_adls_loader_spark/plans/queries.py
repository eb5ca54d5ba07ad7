"""The oracle-checked query registry — one named entry per operator in
SURVEY.md §2 (+ the north-star extension operators), each with its
DuckDB-equivalent ANSI SQL.

Contract (driver harness, __spark_entry__.py): every Spark callable takes
(spark, sf_dir) and returns a DataFrame whose column names match the oracle
SQL exactly; value comparison is an order-insensitive hash, so aggregates
use the exact-decimal helpers in functions/exact.py and every computed
column is aliased identically on both sides.

Scale notes are inline per query: which side broadcasts, where the shuffle
is, what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import davg, dec, dsum, dsum_expr
from ..session import load_tables

QuerySpec = dict  # {"spark": Callable, "oracle": str | None, "tags": [...]}

REGISTRY: dict[str, QuerySpec] = {}

# one-time fixture build cost (versioned-table construction, stream
# stage drains) recorded by the memoized builders so `bench.py` can
# report it separately from measured query time — the bench ranks
# PLANS, not test rigs (round-8 verdict nit #2)
FIXTURE_SEC: dict[str, float] = {}


def record_fixture(name: str, sec: float) -> None:
    FIXTURE_SEC[name] = round(FIXTURE_SEC.get(name, 0.0) + sec, 4)


def fixture_seconds() -> dict[str, float]:
    return dict(FIXTURE_SEC)


def fixture_timed(name: str, threshold: float = 0.05):
    """Decorator form of `record_fixture` for memoized fixture builders:
    times every call and records the elapsed time under ``name`` when it
    exceeds ``threshold`` seconds.  A cache HIT is a dict lookup
    (microseconds), a MISS builds versioned tables / drains streams
    (hundreds of ms to seconds), so the threshold separates the two
    without threading instrumentation into each builder's miss branch —
    the round-9 ADVICE asked that `fixture_sec` cover ALL one-time rig
    cost, not just the three builders instrumented by hand."""
    import functools
    import time as _time

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            t0 = _time.perf_counter()
            out = fn(*a, **kw)
            el = _time.perf_counter() - t0
            if el >= threshold:
                record_fixture(name, el)
            return out
        return wrapped
    return deco


def register(name: str, oracle: str | None = None, tags: list[str] | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = {"spark": fn, "oracle": oracle, "tags": tags or []}
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str):
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


# ---------------------------------------------------------------------------
# Flagship + TPC-H-shaped relational core (S1, F1, J1, A1, O1 composition)
# ---------------------------------------------------------------------------

@register(
    "flagship_revenue_by_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag <> 'R'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=["flagship", "S1", "F1", "J1", "A1"],
)
def flagship_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → join → agg: revenue per order priority.

    Scale: lineitem is the 100 TB fact — the filter and the two scanned
    columns push into the parquet scan; the join shuffles both sides on
    l_orderkey (orders is too big to broadcast at scale, AQE picks SMJ);
    the agg is partial map-side on 5 groups.
    """
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return (
        lineitem.filter(F.col("l_returnflag") != "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                      " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,4))
                    * CAST(1 + l_tax AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=["A1", "A5", "tpch"],
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over the fact table.

    Scale: no join; ReadSchema is 7 columns of 11; partial aggregation
    reduces to |groups| ≈ 6 rows per task before the single tiny shuffle.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                      " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("sum_disc_price"),
            dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                      " * CAST(1 - l_discount AS DECIMAL(18,4))"
                      " * CAST(1 + l_tax AS DECIMAL(18,4))").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=["J1", "A1", "O1", "tpch"],
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → top-k.

    Scale: customer(BUILDING) broadcasts (explicit hint); the
    lineitem⋈orders join shuffles on orderkey; top-10 is a TakeOrdered —
    no global sort materialization.
    """
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .join(orders.filter(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                       " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    tags=["J1", "A1", "tpch"],
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake of broadcastable dims around the fact.

    Scale: region/nation/supplier/customer all broadcast; only
    lineitem⋈orders shuffles.  Catalyst reorders the dim joins after the
    selective region filter.
    """
    region, nation, customer, supplier, orders, lineitem = _t(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem")
    dims = (
        supplier
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(dims),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                       " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# S: scans / parsers re-expressed over the driver tables
# ---------------------------------------------------------------------------

@register(
    "s1_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    tags=["S1", "P1", "F3"],
)
def s1_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1 analog: scan with pushed-down range predicate + pruned
    projection (ReadSchema must show 6 of 11 columns, PushedFilters the
    shipdate bounds)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp")))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity",
            (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"), 4))
            .cast("double").alias("net_price"),
        )
    )


@register(
    "s3_usage_line_parse",
    oracle="""
    WITH du AS (
      SELECT CAST(o_orderkey AS VARCHAR) || '  ' || CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR)
             || '  /data/orders/' || CAST(o_custkey AS VARCHAR) AS line
      FROM orders
    ), toks AS (
      SELECT regexp_split_to_array(trim(line), '\\s+') AS t FROM du
    )
    SELECT t[len(t)] AS path, CAST(t[1] AS BIGINT) AS size, 0 AS unit
    FROM toks
    """,
    tags=["S3", "S8"],
)
def s3_usage_line_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 tolerant du-line parser, driven by synthetic 3-column `du` text
    deterministically derived from orders (so the oracle can build the
    identical input)."""
    from ..sources.usage import parse_usage_lines
    (orders,) = _t(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat(
            F.col("o_orderkey").cast("string"), F.lit("  "),
            (F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            F.lit("  /data/orders/"), F.col("o_custkey").cast("string"),
        ).alias("value")
    )
    return parse_usage_lines(lines).select(
        "path", "size", F.col("unit").cast("int").alias("unit"))


# ---------------------------------------------------------------------------
# F: filters
# ---------------------------------------------------------------------------

@register(
    "f1_file_folder_split",
    oracle="""
    SELECT l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem WHERE l_returnflag = 'A'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=["F1"],
)
def f1_file_folder_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 analog: boolean-flag split pass (is_folder ↔ returnflag) feeding
    per-branch aggregates."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_returnflag") == "A")
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty"))
        .orderBy("l_linestatus")
    )


@register(
    "f3_prefix_pushdown",
    oracle="""
    SELECT p_brand, COUNT(*) AS n
    FROM part WHERE p_name LIKE 's%'
    GROUP BY p_brand ORDER BY p_brand
    """,
    tags=["F3"],
)
def f3_prefix_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 prefix constraint: startswith pushed to the scan as
    StringStartsWith (the reference pushes --prefix into the listing call,
    adls_copy_utils.py:69-73)."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").startswith("s"))
        .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("p_brand")
    )


@register(
    "f4_exclusion_regex",
    oracle="""
    SELECT p_type, COUNT(*) AS n
    FROM part
    WHERE NOT regexp_matches(p_type, '.*(BRASS|COPPER).*')
    GROUP BY p_type ORDER BY p_type
    """,
    tags=["F4", "F7"],
)
def f4_exclusion_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 distcp-style exclusion-regex filter (README.md:94-99): keep rows
    NOT matching any exclusion pattern."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.filter(~F.col("p_type").rlike(".*(BRASS|COPPER).*"))
        .groupBy("p_type").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("p_type")
    )


@register(
    "f5_acl_type_filter",
    oracle="""
    WITH entries AS (
      SELECT unnest([
        'user:' || s_name || ':rwx',
        'group:g' || CAST(s_nationkey AS VARCHAR) || ':r-x',
        'other::r--',
        'user::rwx'
      ]) AS entry
      FROM supplier
    )
    SELECT split_part(entry, ':', 1) AS type, COUNT(*) AS n
    FROM entries
    WHERE split_part(entry, ':', 1) IN ('user','group')
      AND split_part(entry, ':', 2) <> ''
    GROUP BY 1 ORDER BY 1
    """,
    tags=["F5", "O4"],
)
def f5_acl_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: explode ACL-entry arrays, keep named user/group entries
    (copy-acls.py:87-94) — synthetic entries derived from supplier so the
    oracle sees identical input."""
    (supplier,) = _t(spark, sf_dir, "supplier")
    entries = supplier.select(
        F.explode(F.array(
            F.concat(F.lit("user:"), F.col("s_name"), F.lit(":rwx")),
            F.concat(F.lit("group:g"), F.col("s_nationkey").cast("string"), F.lit(":r-x")),
            F.lit("other::r--"),
            F.lit("user::rwx"),
        )).alias("entry")
    )
    typ = F.split(F.col("entry"), ":")[0]
    ident = F.split(F.col("entry"), ":")[1]
    return (
        entries.filter(typ.isin("user", "group") & (ident != ""))
        .select(typ.alias("type"))
        .groupBy("type").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("type")
    )


# ---------------------------------------------------------------------------
# J: joins
# ---------------------------------------------------------------------------

@register(
    "j1_identity_lookup_fallback",
    oracle="""
    WITH dim AS (
      SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey % 3 <> 0
    )
    SELECT COALESCE(d.s_name, 'raw-' || CAST(l.l_suppkey AS VARCHAR)) AS resolved,
           COUNT(*) AS n
    FROM lineitem l LEFT JOIN dim d ON l.l_suppkey = d.s_suppkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=["J1", "P3"],
)
def j1_identity_lookup_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast left-outer lookup with pass-through fallback on miss
    (coalesce), the reference's lookupIdentity semantics
    (adls_copy_utils.py:96-104) at fact scale."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    dim = supplier.filter(F.col("s_suppkey") % 3 != 0).select("s_suppkey", "s_name")
    return (
        lineitem.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"), "left")
        .select(F.coalesce(F.col("s_name"),
                           F.concat(F.lit("raw-"), F.col("l_suppkey").cast("string")))
                .alias("resolved"))
        .groupBy("resolved").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("resolved")
    )


@register(
    "j2_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    tags=["J2"],
)
def j2_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (negative form): left-anti join — destination-existence check
    inverted (distcp-to-databox.sh:22-23)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    )


@register(
    "j2_semi_exists",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    tags=["J2"],
)
def j2_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (positive form): left-semi join."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders.filter(F.col("o_totalprice") > 300000),
                      F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# A/O: aggregations, set ops, sorts
# ---------------------------------------------------------------------------

@register(
    "a1_size_rollup",
    oracle="""
    SELECT o_custkey AS grp,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM orders GROUP BY o_custkey ORDER BY grp
    """,
    tags=["A1", "A5"],
)
def a1_size_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-parent size rollup (dir → bytes becomes custkey → spend)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("grp"))
        .agg(dsum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n"))
        .orderBy("grp")
    )


@register(
    "a2_distinct_identities",
    oracle="""
    SELECT DISTINCT 'user' AS type, c_nationkey AS key FROM customer
    UNION
    SELECT DISTINCT 'group' AS type, s_nationkey AS key FROM supplier
    ORDER BY type, key
    """,
    tags=["A2", "O3"],
)
def a2_distinct_identities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+O3: union of two identity streams, then distinct — the users ∪
    groups extraction shape (copy-acls.py:87-94)."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    users = customer.select(F.lit("user").alias("type"), F.col("c_nationkey").alias("key"))
    groups = supplier.select(F.lit("group").alias("type"), F.col("s_nationkey").alias("key"))
    return users.union(groups).distinct().orderBy("type", "key")


@register(
    "a3_group_collect_ordered",
    oracle="""
    SELECT n_regionkey AS region, string_agg(n_name, ',' ORDER BY n_name) AS members
    FROM nation GROUP BY n_regionkey ORDER BY region
    """,
    tags=["A3", "K1"],
)
def a3_group_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-group ordered member collection — the one-filelist-per-unit
    shape (generate-file-list.py:69-72); emitted as a joined string so both
    engines hash identically."""
    (nation,) = _t(spark, sf_dir, "nation")
    return (
        nation.groupBy(F.col("n_regionkey").alias("region"))
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("members"))
        .orderBy("region")
    )


@register(
    "a4_map_pivot",
    oracle="""
    SELECT n_regionkey AS type,
           string_agg(n_name || '=' || CAST(n_nationkey AS VARCHAR), ';' ORDER BY n_name)
             AS mapping
    FROM nation GROUP BY n_regionkey ORDER BY type
    """,
    tags=["A4", "S6"],
)
def a4_map_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: group-by-type map pivot ({type → {source: target}},
    adls_copy_utils.py:88-94), serialized to ordered `k=v` pairs for
    engine-neutral hashing."""
    (nation,) = _t(spark, sf_dir, "nation")
    return (
        nation.groupBy(F.col("n_regionkey").alias("type"))
        .agg(F.array_join(
            F.transform(
                # sort entry structs by the source name (matches the oracle's
                # ORDER BY n_name), then serialize — sorting the concatenated
                # string instead would collate '=' against digits
                F.array_sort(F.collect_list(
                    F.struct(F.col("n_name"), F.col("n_nationkey")))),
                lambda s: F.concat(s["n_name"], F.lit("="),
                                   s["n_nationkey"].cast("string"))),
            ";").alias("mapping"))
        .orderBy("type")
    )


@register(
    "o1_topk_ordered",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice AS DOUBLE) AS price
    FROM lineitem
    ORDER BY price DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=["O1", "O2"],
)
def o1_topk_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: global sort + limit → Spark plans TakeOrderedAndProject (no
    full sort materialization at scale)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.select("l_orderkey", "l_linenumber",
                        F.col("l_extendedprice").cast("double").alias("price"))
        .orderBy(F.desc("price"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "o3_union_all_counts",
    oracle="""
    SELECT side, COUNT(*) AS n FROM (
      SELECT 'cust' AS side FROM customer
      UNION ALL
      SELECT 'supp' AS side FROM supplier
    ) GROUP BY side ORDER BY side
    """,
    tags=["O3"],
)
def o3_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: bag union (no dedup) — map-only in Spark, no shuffle until the
    count."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    u = customer.select(F.lit("cust").alias("side")).unionAll(
        supplier.select(F.lit("supp").alias("side")))
    return u.groupBy("side").agg(F.count(F.lit(1)).alias("n")).orderBy("side")


@register(
    "o4_synthetic_owner_entry",
    oracle="""
    WITH rows_ AS (
      SELECT list_append(['group:' || s_name || ':r-x', 'other::---'],
                         'user:owner' || CAST(s_suppkey AS VARCHAR) || ':') AS acl
      FROM supplier
    )
    SELECT e.entry AS entry, COUNT(*) AS n
    FROM rows_, unnest(rows_.acl) AS e(entry)
    WHERE split_part(e.entry, ':', 1) = 'user'
    GROUP BY 1 ORDER BY 1
    """,
    tags=["O4"],
)
def o4_synthetic_owner_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: append the owner as a synthetic `user:<owner>:` pseudo-entry
    before identity extraction (copy-acls.py:89,93)."""
    (supplier,) = _t(spark, sf_dir, "supplier")
    acl = F.array(
        F.concat(F.lit("group:"), F.col("s_name"), F.lit(":r-x")),
        F.lit("other::---"),
    )
    with_owner = F.concat(acl, F.array(
        F.concat(F.lit("user:owner"), F.col("s_suppkey").cast("string"), F.lit(":"))))
    return (
        supplier.select(F.explode(with_owner).alias("entry"))
        .filter(F.split(F.col("entry"), ":")[0] == "user")
        .groupBy("entry").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("entry")
    )


# ---------------------------------------------------------------------------
# X: windowed / stateful
# ---------------------------------------------------------------------------

@register(
    "x1_next_fit_units",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS DOUBLE) AS prior
      FROM orders
    )
    SELECT o_orderkey, CAST(FLOOR(prior / 1000000.0) + 1 AS INT) AS unit
    FROM c ORDER BY o_orderkey
    """,
    tags=["X1", "X3"],
)
def x1_next_fit_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 (relaxed, distributed form): next-fit bin assignment via an
    exclusive running sum — unit = floor(prior/capacity)+1
    (generate-file-list.py:27-43's windowed relaxation, SURVEY §2.6).

    Scale: the naive `Window.orderBy(...)` would single-partition the
    world; this uses the two-phase cumulative sum in operators/windows.py
    (range-partitioned local windows + tiny offset join) — bit-identical
    because the sum is exact decimal.  The exact first-fit form lives in
    operators/packing.py (driver-side, property tested)."""
    from ..operators.windows import exclusive_running_sum
    (orders,) = _t(spark, sf_dir, "orders")
    with_run = exclusive_running_sum(
        orders.select("o_orderkey", "o_totalprice"),
        "o_orderkey", dec("o_totalprice"), out_col="__prior")
    prior = F.col("__prior").cast("double")
    # the running-sum frame is ALREADY range-partitioned ascending on
    # o_orderkey and sorted within each partition (the operator's
    # documented output invariant), so the global ORDER BY needs no new
    # exchange: partitions collect in range order, a local sort per
    # partition preserves it (r14, guide §2.4 — collect min-of-5
    # 1.78 → 1.17, collected order verified identical row-by-row)
    return (
        with_run.select(
            "o_orderkey",
            (F.floor(prior / 1_000_000.0) + 1).cast("int").alias("unit"))
        .sortWithinPartitions("o_orderkey")
    )


# ---------------------------------------------------------------------------
# P: scalar projections (string/JSON surface of §2.9)
# ---------------------------------------------------------------------------

@register(
    "p1_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=["P1", "S7", "json"],
)
def p1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 analog: typed JSON field extraction (from_json on hdi_permission
    ↔ events.props)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


@register(
    "p6_line_to_struct",
    oracle="""
    WITH lines AS (
      SELECT c_name || ' owner' || CAST(c_nationkey AS VARCHAR)
             || ' grp ' || c_mktsegment || ' extra' AS line
      FROM customer
    ), toks AS (SELECT regexp_split_to_array(line, ' ') AS t FROM lines)
    SELECT t[1] AS file, t[2] AS owner, t[3] AS grp,
           array_to_string(list_slice(t, 4, len(t)), ' ') AS acl_joined
    FROM toks ORDER BY file
    """,
    tags=["P6"],
)
def p6_line_to_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: whitespace-split positional struct + tail-slice array
    (copy-acls.sh:64's jq projection)."""
    (customer,) = _t(spark, sf_dir, "customer")
    lines = customer.select(
        F.concat(F.col("c_name"), F.lit(" owner"), F.col("c_nationkey").cast("string"),
                 F.lit(" grp "), F.col("c_mktsegment"), F.lit(" extra")).alias("line"))
    t = F.split(F.col("line"), " ")
    return (
        lines.select(
            t[0].alias("file"), t[1].alias("owner"), t[2].alias("grp"),
            F.array_join(F.slice(t, 4, F.size(t) - 3), " ").alias("acl_joined"))
        .orderBy("file")
    )


@register(
    "p7_path_strip",
    oracle="""
    SELECT regexp_replace('/root/' || p_brand || '/' || p_name, '^/[^/]*', '') AS rel,
           COUNT(*) AS n
    FROM part GROUP BY 1 ORDER BY 1
    """,
    tags=["P7"],
)
def p7_path_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: leading-component strip (copy-acls.sh:11-18)."""
    (part,) = _t(spark, sf_dir, "part")
    path = F.concat(F.lit("/root/"), F.col("p_brand"), F.lit("/"), F.col("p_name"))
    return (
        part.select(F.regexp_replace(path, "^/[^/]*", "").alias("rel"))
        .groupBy("rel").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("rel")
    )


@register(
    "p9_comment_strip",
    oracle="""
    SELECT split_part(p_type || '#effective:r--', '#', 1) AS entry, COUNT(*) AS n
    FROM part GROUP BY 1 ORDER BY 1
    """,
    tags=["P9"],
)
def p9_comment_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: drop '#'-suffixed annotations (copy-acls.sh:42)."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.select(F.split_part(F.concat(F.col("p_type"), F.lit("#effective:r--")),
                                 F.lit("#"), F.lit(1)).alias("entry"))
        .groupBy("entry").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("entry")
    )


@register(
    "p10_url_construction",
    oracle="""
    SELECT 'https://acct.dfs.core.windows.net/fs/' || p_brand || '/' || p_name
           || '?action=setAccessControl' AS url
    FROM part ORDER BY url
    """,
    tags=["P10"],
)
def p10_url_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: per-row REST URL construction (copy-acls.py:35-45,
    copy-to-adls.py:20-29) — pure JVM-side string concat."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.select(F.concat(
            F.lit("https://acct.dfs.core.windows.net/fs/"), F.col("p_brand"),
            F.lit("/"), F.col("p_name"), F.lit("?action=setAccessControl"),
        ).alias("url"))
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# Events: time-window aggregation (batch form of the streaming variant)
# ---------------------------------------------------------------------------

@register(
    "w1_tumbling_window_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["streaming", "W1"],
)
def w1_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts over the events table — the batch
    equivalent of the Structured-Streaming pipeline in streaming/events.py
    (same F.window expression, same agg)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value", scale=4).alias("total_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_extensions()
    return {name: spec["spark"] for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_extensions()
    return {name: spec["oracle"] for name, spec in REGISTRY.items()
            if spec["oracle"] is not None}


def _load_extensions() -> None:
    """Import the extension registrations (deferred to avoid a cycle)."""
    from . import (queries_domain, queries_ext, queries_ops,  # noqa: F401
                   queries_round5, queries_round6, queries_round7,
                   queries_round8, queries_round9, queries_round10,
                   queries_round10b, queries_round11, queries_round12,
                   queries_round13, queries_tpch)
