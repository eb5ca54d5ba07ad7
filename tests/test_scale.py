"""Scale-utility tests: bucketed joins must be exchange-free; salted joins
must be row-identical to unsalted ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import scale


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    scale.write_bucketed(left, "t_left", ["k"], n_buckets=8, sort_cols=["k"])
    scale.write_bucketed(right, "t_right", ["k"], n_buckets=8, sort_cols=["k"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_left").join(spark.table("t_right"), "k")
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_salted_join_matches_unsalted(spark):
    # one hot key (0) carrying 90% of the fact rows
    fact = spark.range(0, 2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).alias("v"))
    dim = spark.createDataFrame(
        [(0, "hot"), (10, "a"), (20, "b"), (30, "c")], "k: long, label: string")
    plain = fact.join(dim, "k").select("row_id", "k", "v", "label")
    salted = scale.salted_join(fact, dim, "k", unique_col="row_id",
                               n_salts=8).select("row_id", "k", "v", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salted fact spreads the hot key across multiple sub-keys
    n_subkeys = (scale.salt_keys(fact, "k", 8, "row_id")
                 .filter(F.col("k") == 0).select("__salt").distinct().count())
    assert n_subkeys > 1


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.range(0, 100).select(
        F.col("id").alias("row_id"), (F.col("id") % 3).alias("k"))
    dim = spark.createDataFrame([(0, "zero")], "k: long, label: string")
    out = scale.salted_join(fact, dim, "k", unique_col="row_id",
                            n_salts=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("label").isNull()).count() == 66


def test_merge_upsert_semantics(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k: long, s: string, v: long")
    updates = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k: long, s: string, v: long")
    out = {r["k"]: (r["s"], r["v"])
           for r in scale.merge_upsert(existing, updates, "k").collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_compact_parquet_dir(spark, tmp_path):
    """64 tiny files → ceil(bytes/target) outputs, rows identical."""
    from databox_adls_loader_spark.operators.scale import compact_parquet_dir
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    import glob
    assert len(glob.glob(src + "/*.parquet")) == 64
    n = compact_parquet_dir(spark, src, dst, target_mb=1)
    out_files = glob.glob(dst + "/*.parquet")
    assert len(out_files) == n <= 4
    got = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert got == list(range(10_000))


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout + a partition-key filter must show
    PartitionFilters in the scan (directory pruning — the parquet-side
    analog of F3 prefix pushdown) and touch only that key's files."""
    from databox_adls_loader_spark.session import load_tables
    events = load_tables(spark, sf_dir, ["events"])["events"]
    out = str(tmp_path / "by_type")
    events.write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1)[1][:200]
    assert df.count() == events.filter(F.col("event_type") == "click").count()
