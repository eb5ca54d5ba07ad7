"""TPC-H-shaped relational queries + analytic-window/session queries.

The reference's only join shape is the tiny-dimension lookup (SURVEY §2.4)
— these queries exercise the full relational surface a Spark engine gets
from Catalyst (multi-join reordering, semi/anti subqueries, grouped HAVING,
rollup, set ops, analytic windows) so the engine is usable as a general
analytics layer, not just a migration pipeline.  Every query is adapted to
the driver's TPC-H-ish schema (no partsupp / commitdate / shipmode columns;
predicates use the synthetic NATION_n / PROMO vocabularies).

Scale notes inline: which side broadcasts, where the shuffles land, what
AQE does at 100 TB.  All money aggregates are exact-decimal (functions/
exact.py) so the DuckDB value-hash comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import davg, dec, dsum, dsum_expr
from ..session import spread
from .queries import _t, register


# ---------------------------------------------------------------------------
# joins / subqueries
# ---------------------------------------------------------------------------

@register(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH m AS (
      SELECT s_nationkey, MIN(s_acctbal) AS mn FROM supplier GROUP BY s_nationkey
    )
    SELECT n_name, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier s
    JOIN m ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.mn
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY n_name, s_name
    """,
    tags=["tpch", "J1"],
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group-min correlated subquery decorrelated into
    an aggregate + join-back.  Scale: the per-nation min aggregate is 25
    rows — broadcast it; supplier never shuffles."""
    supplier, nation = _t(spark, sf_dir, "supplier", "nation")
    mins = (supplier.groupBy(F.col("s_nationkey").alias("mn_key"))
            .agg(F.min("s_acctbal").alias("mn")))
    return (
        supplier.join(F.broadcast(mins),
                      (F.col("s_nationkey") == F.col("mn_key"))
                      & (F.col("s_acctbal") == F.col("mn")))
        .join(F.broadcast(nation),
              supplier["s_nationkey"] == F.col("n_nationkey"))
        .select("n_name", "s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("n_name", "s_name")
    )


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=["tpch", "J2"],
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS → left-semi join with a non-equi conjunct.  Scale:
    the date filter prunes orders before the shuffle; the semi join
    deduplicates on the build side instead of a distinct-after-join."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    return (
        o.join(lineitem,
               (o["o_orderkey"] == lineitem["l_orderkey"])
               & (lineitem["l_shipdate"] > o["o_orderdate"]),
               "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate)::INT AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=["tpch", "J1", "A1"],
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two-nation trade volume by year.  Scale: both nation dims
    broadcast; the nation filter reaches supplier/customer *before* their
    joins to the fact (Catalyst pushes it through), so the big shuffles
    carry only matching rows."""
    lineitem, supplier, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
                | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                       " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT EXTRACT(YEAR FROM o.o_orderdate)::INT AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    tags=["tpch", "J1", "A1"],
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share within a region.  Scale: nation and
    region broadcast; conditional aggregation (no second pass over the
    fact); exact-decimal numerator/denominator so the double division is
    bit-identical across engines."""
    lineitem, supplier, orders, customer, nation, regn = _t(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation", "region")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey"))
    vol = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return (
        lineitem
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .join(F.broadcast(regn.filter(F.col("r_name") == "ASIA")),
              F.col("r_regionkey") == F.col("n2_rkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(F.when(F.col("supp_nation") == "NATION_5", vol)
                   .otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
             / F.sum(vol).cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate)::INT AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,4))
                  - CAST(p_retailprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(0.6 AS DECIMAL(4,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%g%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["tpch", "J1", "A1"],
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost ≈ 0.6·retailprice·qty — no partsupp in
    the driver schema).  Scale: the p_name filter prunes part before the
    fact join; nation broadcasts; profit algebra stays decimal-exact."""
    lineitem, part, supplier, orders, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    # single-row-group scan: the per-row work above it (join probes /
    # decimal agg / grouping-set Expand) would run one-task; spread is a
    # no-op once a scan splits (guide §2.5)
    lineitem = spread(lineitem)
    profit = (
        dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        - dec("p_retailprice") * dec("l_quantity") * F.lit(0.6).cast("decimal(4,2)")
    )
    return (
        lineitem
        .join(part.filter(F.col("p_name").like("%g%")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=["tpch", "J1", "A1", "O1"],
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue.  Scale: date
    filter prunes orders first; TakeOrderedAndProject caps the result —
    no global sort materializes."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                       " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey").limit(20)
    )


@register(
    "q12_priority_class_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=["tpch", "A1"],
)
def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts after a fact-fact join with a
    non-equi residual predicate."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, (F.col("o_orderkey") == F.col("l_orderkey"))
                    & (F.col("l_shipdate") > F.col("o_orderdate")))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=["tpch", "A1"],
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution over a left outer join (counts
    keep zero-order customers).  Scale: two shuffles (custkey, then
    c_count); the second aggregate input is one row per customer."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(1 - l_discount AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    tags=["tpch", "A1"],
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share.  Scale: the month filter cuts the
    fact before the part join; single conditional aggregate."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    vol = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0)
              * F.sum(F.when(F.col("p_type") == "PROMO", vol)
                      .otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
              / F.sum(vol).cast("double")).alias("promo_revenue"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,4))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=["tpch", "A1", "J1"],
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue.  The max is over
    *exact decimal* sums, so the equality join-back is safe.  Scale: rev is
    |suppliers| rows; the scalar max is a one-row broadcast."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(dec("l_extendedprice")
                   * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
             .alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["mx"])
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < -900)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=["tpch", "A2", "J2"],
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class with a
    NOT-IN anti join (supplier-part pairs come from lineitem — the driver
    schema has no partsupp).  Scale: the part filters broadcast-prune the
    fact; distinct-count expands to a two-stage aggregate."""
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supplier.filter(F.col("s_acctbal") < -900).select("s_suppkey")
    return (
        lineitem
        .join(part.filter(
            (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)),
            F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty
    """,
    tags=["tpch", "A1", "J1"],
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of below-half-average-quantity lineitems.  The
    per-part average is exact-decimal-sum / count → identical doubles, so
    the `< 0.5·avg` comparison can't flip between engines.  Scale: the
    correlated subquery decorrelates to an aggregate re-joined on partkey —
    same shuffle key as the main join, so AQE coalesces to one exchange."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    pa = (lineitem.groupBy(F.col("l_partkey").alias("pk"))
          .agg(davg("l_quantity").alias("avg_qty")))
    return (
        lineitem
        .join(F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 260
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS total,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY total DESC, o_orderkey LIMIT 100
    """,
    tags=["tpch", "A1", "J2", "O1"],
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-quantity orders (HAVING → semi join).  Scale: the
    HAVING aggregate and the detail join share the l_orderkey shuffle."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum(dec("l_quantity")).alias("sq"))
           .filter(F.col("sq") > 260)
           .select(F.col("l_orderkey").alias("big_key")))
    return (
        lineitem.join(big, F.col("big_key") == F.col("l_orderkey"), "left_semi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 F.col("o_totalprice").cast("double").alias("total"))
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("total"), "o_orderkey").limit(100)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=["tpch", "F4", "A1"],
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity conjuncts.  Catalyst
    extracts the common l_quantity bounds (1..40) as a pushable filter on
    the fact scan; the full disjunction evaluates post-join."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#12") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#21") & s.between(1, 35) & q.between(20, 40))
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum_expr("CAST(l_extendedprice AS DECIMAL(18,2))"
                       " * CAST(1 - l_discount AS DECIMAL(18,4))").alias("revenue"))
    )


@register(
    "q22_inactive_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=["tpch", "J2", "A1"],
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: above-average-balance customers with no urgent orders — scalar
    subquery (one-row broadcast cross join) + anti join."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = (customer.filter(F.col("c_acctbal") > 0)
               .agg(davg("c_acctbal").alias("ab")))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders.filter(F.col("o_orderpriority") == "1-URGENT"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum("c_acctbal").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# grouping sets / set ops
# ---------------------------------------------------------------------------

@register(
    "g1_rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=["A1", "rollup"],
)
def g1_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (flag, status) → (flag) → () — partial
    aggregation computes all levels in one pass over the fact."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # single-row-group scan: the per-row work above it (join probes /
    # decimal agg / grouping-set Expand) would run one-task; spread is a
    # no-op once a scan splits (guide §2.5)
    lineitem = spread(lineitem)
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_extendedprice").alias("rev"),
             F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "g2_cube_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=["A1", "rollup"],
)
def g2_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all four grouping sets in one scan."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("o_orderpriority").asc_nulls_first(),
                 F.col("o_orderstatus").asc_nulls_first())
    )


@register(
    "g3_grouping_sets",
    oracle="""
    SELECT n_name, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
    ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=["A1", "rollup"],
)
def g3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((nation), (priority), ()) — unlike
    rollup/cube the sets are hand-picked, so only 3 of the 4 possible
    aggregates are computed (DataFrame.groupingSets, Spark 4).  Nation is
    a broadcast join; exact decimal money per functions/exact.py."""
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer",
                                  "nation")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupingSets([["n_name"], ["o_orderpriority"], []],
                            "n_name", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("rev"),
             F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n_name").asc_nulls_first(),
                 F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "so1_intersect_except",
    oracle="""
    SELECT c_custkey FROM (
      (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    ) ORDER BY c_custkey
    """,
    tags=["O3", "setops"],
)
def so1_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra (urgent ∩ finished) ∖ high-value —
    Spark plans these as left-semi / left-anti aggregates."""
    (orders,) = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select(F.col("o_custkey").alias("c_custkey"))
    finished = orders.filter(F.col("o_orderstatus") == "F") \
        .select(F.col("o_custkey").alias("c_custkey"))
    big = orders.filter(F.col("o_totalprice") > 400000) \
        .select(F.col("o_custkey").alias("c_custkey"))
    return urgent.intersect(finished).exceptAll(big.distinct()).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# analytic windows / sessionization
# ---------------------------------------------------------------------------

@register(
    "w2_rank_customers_per_nation",
    oracle="""
    SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal, rk FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    ) WHERE rk <= 3 ORDER BY c_nationkey, rk
    """,
    tags=["window", "O1"],
)
def w2_rank_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by balance — partitioned window, fully
    parallel (one shuffle on the partition key), deterministic tie-break.
    Scale: WindowGroupLimit pushes the rank filter into the sort."""
    (customer,) = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        customer.select(
            "c_nationkey", "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
    )


@register(
    "w3_moving_avg_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                      AND l_shipdate <  TIMESTAMP '1997-07-01'
      GROUP BY 1
    )
    SELECT d, CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER w AS DOUBLE)
             / COUNT(rev) OVER w AS ma7
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY d
    """,
    tags=["window", "A1"],
)
def w3_moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue.  The inner frame sum stays
    decimal (exact) and divides by the frame count — identical doubles in
    both engines.  Scale: the unpartitioned window runs over |days| rows
    (post-aggregate), not the fact — a ~2k-row single partition is fine;
    the fact-table work is all in the distributed daily aggregate."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    daily = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp")))
        .groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.sum(dec("l_extendedprice")).alias("rev_dec"))
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d", F.col("rev_dec").cast("double").alias("rev"),
        (F.sum("rev_dec").over(w).cast("double")
         / F.count("rev_dec").over(w)).alias("ma7"),
    ).orderBy("d")


@register(
    "w4_dod_order_delta",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                    AND o_orderdate <  TIMESTAMP '1997-03-01'
      GROUP BY 1
    )
    SELECT d, n, n - lag(n) OVER (ORDER BY d) AS delta,
           lead(n) OVER (ORDER BY d) AS next_n
    FROM daily ORDER BY d
    """,
    tags=["window"],
)
def w4_dod_order_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day order-count delta via lag/lead (integer-exact)."""
    (orders,) = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp")))
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("d")
    return daily.select(
        "d", "n",
        (F.col("n") - F.lag("n").over(w)).alias("delta"),
        F.lead("n").over(w).alias("next_n"),
    ).orderBy("d")


@register(
    "e1_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions, COUNT(*) AS n_events
    FROM sess GROUP BY user_id ORDER BY user_id
    """,
    tags=["window", "sessionization"],
)
def e1_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) on the ONE canonical
    operator (operators/sessions.sessionize — microsecond gap math, the
    oracle's `> INTERVAL 30 MINUTE` exactly; an earlier inline copy used
    a seconds cast that diverges on sub-second boundary gaps).  Scale:
    partitioned by user_id — one shuffle, no global ordering anywhere."""
    from ..operators.sessions import sessionize
    (events,) = _t(spark, sf_dir, "events")
    sess = sessionize(events, gap_minutes=30, tiebreak_col="event_id")
    return (
        sess.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


@register(
    "e2_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             -- the built-in session_window merges only when the gap is
             -- STRICTLY under the duration ([ts, ts+gap) windows), so a
             -- new session starts at gap >= 30min — not > like the
             -- lag-based sessionize operator
             CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sess_id
    ORDER BY user_id, session_start
    """,
    tags=["window", "sessionization", "streaming"],
)
def e2_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in F.session_window (gap 30 min) in batch mode — the exact
    operator the streaming pipeline uses (streaming/events.py:
    session_window_stats), oracle-checked against the lag/cumsum
    transcription: session_end = last event + gap, start = first event."""
    from ..streaming.events import session_window_stats
    (events,) = _t(spark, sf_dir, "events")
    return (
        session_window_stats(events, gap="30 minutes")
        .orderBy("user_id", "session_start")
    )


@register(
    "w5_rank_distribution_functions",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    tags=["window"],
)
def w5_rank_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / rank / dense_rank over a global
    ordering — computed by `operators/windows.global_ranks`, the two-phase
    distributed form (range partition → parallel local ranks → broadcast
    offsets), NOT a bare Window.orderBy, which Spark executes on a single
    partition (`WindowExec: No Partition Defined` — the 100 TB cliff).
    Results are bit-identical to the native global window; the oracle and
    tests/test_profile.py::test_global_ranks_match_native_window pin it."""
    from ..operators.windows import global_ranks
    (customer,) = _t(spark, sf_dir, "customer")
    # c_custkey is the table key, so the order tuple is unique —
    # unique=True collapses the tie windows / dense pass / rank join to
    # one range shuffle (values identical by the no-peers argument;
    # noop A/B in plans/r13)
    ranked = global_ranks(customer,
                          [("c_acctbal", "desc"), ("c_custkey", "asc")],
                          ntile=4, unique=True)
    return ranked.select(
        "c_custkey",
        F.col("ntile").alias("quartile"),
        F.round("pct_rank", 6).alias("pct_rank"),
        F.round("cume_dist", 6).alias("cume"),
        F.col("rnk").cast("long").alias("rnk"),
        F.col("drnk").cast("long").alias("drnk"),
    ).orderBy("c_custkey")


@register(
    "w6_range_frame_sum",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                    AND o_orderdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT d, CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER (ORDER BY d
                               RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                         AND CURRENT ROW) AS DOUBLE)
             AS rev_7d
    FROM daily ORDER BY d
    """,
    tags=["window"],
)
def w6_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): trailing-7-calendar-day
    revenue — includes days absent from the data, unlike a ROWS frame.
    Decimal inside the frame sum, double only at the edge."""
    (orders,) = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    # rangeBetween needs an orderable numeric: order by epoch days
    w = (Window.orderBy(F.unix_date("d")).rangeBetween(-6, 0))
    return daily.select(
        "d", F.col("rev_dec").cast("double").alias("rev"),
        F.sum("rev_dec").over(w).cast("double").alias("rev_7d"),
    ).orderBy("d")


@register(
    "a6_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(median(o_totalprice), 6) AS med,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=["A1", "percentile"],
)
def a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (percentile_cont ≡ DuckDB
    quantile_cont).  Scale: exact percentiles sort within groups —
    substitute approx_percentile at 100 TB (a7_approx_distinct shows the
    sketch-side pattern)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 6).alias("med"),
             F.round(F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice)"), 6).alias("p25"),
             F.round(F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)"), 6).alias("p95"))
        .orderBy("o_orderpriority")
    )


@register(
    "a7_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=["A4", "pivot"],
)
def a7_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit value list (no extra discovery pass
    over the fact — always pass values at scale)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .select("o_orderpriority",
                F.coalesce("F", F.lit(0)).alias("f_cnt"),
                F.coalesce("O", F.lit(0)).alias("o_cnt"),
                F.coalesce("P", F.lit(0)).alias("p_cnt"))
        .orderBy("o_orderpriority")
    )


@register(
    "a8_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_within_5pct,
           TRUE AS parts_within_5pct
    FROM lineitem
    """,
    tags=["A5", "sketch"],
)
def a8_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct counts — the 100 TB substitute
    for exact countDistinct (no second shuffle, mergeable sketch).

    A sketch's VALUE is engine-specific, but its CONTRACT (estimate
    within the configured error of exact) is checkable: the query emits
    the exact counts plus a boolean per sketch asserting |approx−exact|
    ≤ 5% · exact (2.5× the rsd=2% std error).  The oracle expects TRUE —
    if Spark's HLL ever drifts out of contract, the hash check goes red
    instead of the sketch being invisible to the gate.  Accuracy is
    additionally asserted numerically in tests/test_entry.py.

    Plan shape: the two exact sides run as separate single-distinct
    aggregates (partial distinct map-side, no Expand) joined to the
    one-pass dual-HLL frame as 1-row broadcasts.  The round-4 form
    computed both exact distincts in ONE aggregate, which planned as an
    Expand ×3 over every lineitem row — 6.9 s at sf0.1 vs ~1 s for this
    shape.  (The production operator at 100 TB is the sketch-only agg;
    the exact sides exist only for the gate.)"""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    approx = lineitem.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )
    exact_orders = (lineitem.select("l_orderkey").distinct()
                    .agg(F.count(F.lit(1)).alias("exact_orders")))
    exact_parts = (lineitem.select("l_partkey").distinct()
                   .agg(F.count(F.lit(1)).alias("exact_parts")))
    wide = (approx.crossJoin(F.broadcast(exact_orders))
            .crossJoin(F.broadcast(exact_parts)))
    within = lambda a, e: (  # noqa: E731 - tiny local predicate
        F.abs(F.col(a) - F.col(e)) * 100 <= F.col(e) * 5)
    return wide.select(
        "exact_orders", "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_5pct"),
        within("approx_parts", "exact_parts").alias("parts_within_5pct"),
    )


@register(
    "asof_latest_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.ts, c.event_id,
           p.value AS right_value, p.ts AS right_ts
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    ORDER BY c.user_id, c.ts, c.event_id
    """,
    tags=["asof", "J1", "window"],
)
def asof_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the user's latest prior (or
    simultaneous) purchase — union + keyed-window formulation (operators/
    asof.py), oracle-checked against DuckDB's native ASOF JOIN.  Scale:
    one shuffle per side on user_id; never a range cross-product."""
    from ..operators.asof import asof_join
    (events,) = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id")
    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    return (
        asof_join(clicks, purchases, key="user_id")
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "range_clicks_in_purchase_window",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, ts AS ws, ts + INTERVAL 1 HOUR AS we
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT purchase_id, COUNT(*) AS n_clicks
    FROM purchases p JOIN clicks c
      ON c.click_ts >= p.ws AND c.click_ts < p.we
    GROUP BY purchase_id ORDER BY purchase_id
    """,
    tags=["rangejoin", "J2", "window"],
)
def range_clicks_in_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: clicks (any user) landing within the hour
    after each purchase — bucketed equi-join formulation (operators/
    rangejoin.py) instead of the nested-loop range join, oracle-checked
    against DuckDB's native IEJoin plan."""
    from ..operators.rangejoin import point_in_interval_join
    (events,) = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("we"))
    clicks = events.filter(F.col("event_type") == "click") \
        .select(F.col("ts").alias("click_ts"))
    return (
        point_in_interval_join(clicks, purchases, point_ts="click_ts",
                               start_col="ws", end_col="we",
                               bucket_seconds=3600)
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .orderBy("purchase_id")
    )


@register(
    "cdc_latest_per_key",
    oracle="""
    SELECT user_id, ts, event_type, value FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
    tags=["window", "cdc"],
)
def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert compaction: latest record per key (the CDC/merge-dedupe
    shape).  Deterministic tie-break on event_id.  Scale: one shuffle on
    the key; WindowGroupLimit pushes rn=1 into the sort so only one row
    per key survives each partition's sort — never a full materialized
    rank."""
    from pyspark.sql import Window
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
    ), keep AS (
      SELECT o.o_orderkey, o.o_orderstatus, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
    )
    SELECT * FROM keep UNION ALL SELECT * FROM updates
    ORDER BY o_orderkey
    """,
    tags=["cdc", "J2", "O3"],
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE/upsert: a derived update set (10% markup on every
    100th order) wins on key collision; everything else passes through —
    anti join + union (operators/scale.merge_upsert)."""
    from ..operators.scale import merge_upsert
    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus",
                         F.col("o_totalprice").cast("double").alias("o_totalprice"))
    updates = (orders.filter(F.col("o_orderkey") % 100 == 0)
               .select("o_orderkey", F.lit("X").alias("o_orderstatus"),
                       (F.col("o_totalprice") * 1.1).cast("double").alias("o_totalprice")))
    return merge_upsert(base, updates, "o_orderkey").orderBy("o_orderkey")


@register(
    "fuzzy_nation_name_pairs",
    oracle="""
    SELECT a.n_name AS a, b.n_name AS b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    ORDER BY a, b
    """,
    tags=["text", "fuzzy"],
)
def fuzzy_nation_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: name pairs within levenshtein distance 2
    (entity-resolution shape; the synthetic NATION_n names differ only in
    suffix digits so near-pairs exist).  Runs through the BLOCKED operator
    (operators/fuzzy.py): q-gram + short-length candidate equi-joins, then
    exact levenshtein verify — no all-pairs BNL even though the dim here
    is only 25 rows, so the same call scales to `documents`."""
    from ..operators.fuzzy import fuzzy_self_join
    (nation,) = _t(spark, sf_dir, "nation")
    return (
        fuzzy_self_join(nation, "n_name", "n_nationkey", max_dist=2)
        .select("a", "b", "dist")
        .orderBy("a", "b")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT s_nationkey, l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS v
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_nationkey, l_partkey
    ), nat AS (SELECT * FROM val WHERE s_nationkey = 3),
    total AS (SELECT SUM(v) AS t FROM nat)
    SELECT n.l_partkey AS p_key, CAST(n.v AS DOUBLE) AS part_value
    FROM nat n, total
    WHERE n.v > total.t * CAST(0.001 AS DECIMAL(6,4))
    ORDER BY part_value DESC, p_key
    """,
    tags=["tpch", "A1", "J1"],
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value within one nation, kept only above
    a fraction of the nation total (scalar subquery vs grouped aggregate —
    decimal throughout so the threshold comparison cannot flip).  Scale:
    the group aggregate and the scalar total share one shuffled input; the
    total is a one-row broadcast."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    val = (
        lineitem.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("s_nationkey") == 3)
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("v"))
    )
    total = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("t") * F.lit(0.001).cast("decimal(6,4)"))
        .select("p_key", F.col("v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "p_key")
    )


@register(
    "q20_part_suppliers_nested_in",
    oracle="""
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50
    )
    ORDER BY s_name, s_acctbal
    """,
    tags=["tpch", "J2", "A1"],
)
def q20_part_suppliers_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: doubly nested IN — suppliers who shipped >50 units
    of red parts in 1997.  Both INs become left-semi joins; the inner part
    filter broadcast-prunes the fact before the grouped HAVING."""
    supplier, lineitem, part = _t(spark, sf_dir, "supplier", "lineitem", "part")
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    big_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(big_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_supplier_shape",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 25
    """,
    tags=["tpch", "J2", "A1"],
)
def q21_waiting_supplier_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only supplier that shipped late on a
    multi-supplier finished order — an EXISTS and a correlated NOT EXISTS
    on the same fact (semi + anti join on l_orderkey with non-equi
    residuals)."""
    supplier, lineitem, orders = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    l1 = (
        lineitem.alias("l1")
        .join(orders.filter(F.col("o_orderstatus") == "F").alias("o"),
              F.col("l1.l_orderkey") == F.col("o.o_orderkey"))
        .filter(F.col("l1.l_shipdate") > F.col("o.o_orderdate"))
    )
    l2 = lineitem.select(F.col("l_orderkey").alias("k2"),
                         F.col("l_suppkey").alias("s2"))
    l3 = lineitem.select(F.col("l_orderkey").alias("k3"),
                         F.col("l_suppkey").alias("s3"),
                         F.col("l_shipdate").alias("d3"))
    step = l1.join(
        l2, (F.col("k2") == F.col("l1.l_orderkey"))
        & (F.col("s2") != F.col("l1.l_suppkey")), "left_semi")
    step = step.join(
        l3, (F.col("k3") == F.col("l1.l_orderkey"))
        & (F.col("s3") != F.col("l1.l_suppkey"))
        & (F.col("d3") > F.col("o.o_orderdate")), "left_anti")
    return (
        step.join(supplier, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name").limit(25)
    )
