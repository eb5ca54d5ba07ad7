"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"o_orderpriority", "revenue", "n_items"}


def test_every_query_has_registry_entry():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_queries_run_at_sf0001(spark, sf_dir):
    # every registered query must at least execute at the smallest SF
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_approx_distinct_error(spark, sf_dir):
    from databox_adls_loader_spark.plans.queries import all_queries
    from databox_adls_loader_spark.session import load_tables
    row = all_queries()["a8_approx_distinct"](spark, sf_dir).first()
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    from pyspark.sql import functions as F
    exact = li.agg(F.countDistinct("l_orderkey").alias("o"),
                   F.countDistinct("l_partkey").alias("p")).first()
    # the query itself carries the sketch contract as booleans; the exact
    # columns must equal an independent exact aggregate
    assert row["exact_orders"] == exact["o"]
    assert row["exact_parts"] == exact["p"]
    assert row["orders_within_5pct"] and row["parts_within_5pct"]


def test_events_load_in_bare_session_config(spark, sf_dir):
    # simulate a driver session missing our factory configs: the
    # nanosAsLong conf must be set defensively inside load_tables
    from databox_adls_loader_spark.session import _TABLE_CACHE, load_tables
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    # purge cached handle so the read re-executes under the unset conf
    for k in [k for k in _TABLE_CACHE if k[1].endswith("events.parquet")]:
        del _TABLE_CACHE[k]
    try:
        df = load_tables(spark, sf_dir, ["events"])["events"]
        assert df.count() > 0
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_sql_surface_over_registered_views(spark, sf_dir):
    from databox_adls_loader_spark.session import register_views
    views = register_views(spark, sf_dir)
    assert {"lineitem", "orders", "nation"} <= set(views)
    row = spark.sql("""
        SELECT n_name, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 1
    """).first()
    assert row["n"] > 0
    # SQL result feeds a DataFrame operator (mixed-API composition)
    from pyspark.sql import functions as F
    top = spark.sql("SELECT c_custkey, c_acctbal FROM customer") \
        .filter(F.col("c_acctbal") > 0).count()
    assert top > 0
