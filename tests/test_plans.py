"""Physical-plan assertions: the 100 TB contract.

Correctness says the answer is right; these tests pin the *shape* of the
plan — pushdown reached the scan, projections were pruned, small dims
broadcast, and no query smuggles in a single-partition global window.
A regression here is a query that still passes the oracle but would fall
over at scale.
"""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.plans.queries import all_queries


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir, qs):
    plan = formatted_plan(qs["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_prefix_filter_pushes_as_startswith(spark, sf_dir, qs):
    plan = formatted_plan(qs["f3_prefix_pushdown"](spark, sf_dir))
    assert "StringStartsWith(p_name,s)" in plan


def test_column_pruning_q1(spark, sf_dir, qs):
    plan = formatted_plan(qs["q1_pricing_summary"](spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # 7 of 11 lineitem columns — the scan must not read the rest
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
              "l_returnflag", "l_linestatus", "l_shipdate"):
        assert c in scan


def test_broadcast_join_on_tiny_dim(spark, sf_dir, qs):
    # nation (25 rows) must broadcast, never shuffle the fact on its key
    plan = formatted_plan(qs["q9_product_profit"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_scalar_agg_single_exchange(spark, sf_dir, qs):
    # scan → partial agg → one SinglePartition exchange → final agg
    plan = formatted_plan(qs["q6_forecast_revenue"](spark, sf_dir))
    assert plan.count("Exchange") <= 2  # formatted lists node + detail
    assert "SinglePartition" in plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir, qs):
    plan = formatted_plan(qs["q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_no_single_partition_window_in_next_fit(spark, sf_dir, qs):
    # the distributed running sum must never funnel every row through ONE
    # partition.  Round 13 removed the __pid-partitioned Window (it
    # hash-re-shuffled the range-partitioned data) in favour of a
    # per-range-partition Arrow prefix pass: the plan now has NO Window
    # node at all and no SinglePartition exchange
    plan = formatted_plan(qs["x1_next_fit_units"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_partitioned_window_shuffles_on_partition_key(spark, sf_dir, qs):
    plan = formatted_plan(qs["w2_rank_customers_per_nation"](spark, sf_dir))
    assert "hashpartitioning(c_nationkey" in plan


def test_semi_join_stays_semi(spark, sf_dir, qs):
    plan = formatted_plan(qs["q4_priority_exists"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_anti_join_stays_anti(spark, sf_dir, qs):
    plan = formatted_plan(qs["q22_inactive_customers"](spark, sf_dir))
    assert "LeftAnti" in plan
