"""Property tests for X1/X2 bin packing (SURVEY §5.3)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from databox_adls_loader_spark.operators.packing import (
    first_fit,
    pack_directories,
    pack_next_fit_window,
)

CAP = 1000


@given(st.lists(st.integers(min_value=1, max_value=1500), max_size=60))
@settings(max_examples=200, deadline=None)
def test_first_fit_invariants(sizes):
    dirs = [(f"d{i:03d}", s) for i, s in enumerate(sizes)]
    res = first_fit(dirs, CAP)
    # every dir appears exactly once
    assert [a["path"] for a in res.allocations] == [p for p, _ in dirs]
    # per-unit total ≤ capacity
    per_unit: dict[int, int] = {}
    for a in res.allocations:
        if a["unit"]:
            per_unit[a["unit"]] = per_unit.get(a["unit"], 0) + a["size"]
    assert all(v <= CAP for v in per_unit.values())
    # oversized dirs never assigned; fitting dirs always assigned
    for a in res.allocations:
        assert (a["unit"] == 0) == (a["size"] > CAP)
    # first-fit determinism
    res2 = first_fit(dirs, CAP)
    assert res.allocations == res2.allocations
    # free-capacity bookkeeping consistent
    assert all(0 <= f <= CAP for f in res.units_free)


def test_first_fit_reopens_earlier_bins():
    # 600, 600 → units 1,2; then 300 fits back into unit 1 (first-fit,
    # unlike next-fit)
    res = first_fit([("a", 600), ("b", 600), ("c", 300)], CAP)
    units = [a["unit"] for a in res.allocations]
    assert units == [1, 2, 1]


def test_pack_directories_matches_first_fit(spark):
    sizes = spark.createDataFrame(
        [("a", 600), ("b", 600), ("c", 300), ("huge", 5000)],
        "path: string, size: long")
    out = {r["path"]: r["unit"] for r in pack_directories(sizes, CAP).collect()}
    assert out == {"a": 1, "b": 2, "c": 1, "huge": 0}


def test_next_fit_window_invariants(spark):
    rows = [(f"d{i:02d}", s) for i, s in
            enumerate([400, 400, 400, 900, 50, 2000, 100])]
    sizes = spark.createDataFrame(rows, "path: string, size: long")
    out = pack_next_fit_window(sizes, CAP).orderBy("path").collect()
    # oversized stays 0
    assert {r["path"]: r["unit"] for r in out}["d05"] == 0
    # next-fit: units are the running-sum buckets
    per_unit: dict[int, int] = {}
    for r in out:
        if r["unit"]:
            per_unit.setdefault(r["unit"], 0)
            per_unit[r["unit"]] += r["size"]
    # every fitting dir assigned
    assert all(r["unit"] > 0 for r in out if r["size"] <= CAP)


def test_pack_with_recursion(spark):
    from databox_adls_loader_spark.operators.packing import pack_with_recursion

    tree = {
        "/root": [("/root/a", 800), ("/root/big", 2600), ("/root/c", 300)],
        "/root/big": [("/root/big/x", 900), ("/root/big/y", 900),
                      ("/root/big/z", 800)],
    }

    def list_children(path):
        return spark.createDataFrame(tree[path], "path: string, size: long")

    out = {r["path"]: r["unit"] for r in
           pack_with_recursion(list_children, "/root", CAP).collect()}
    # oversized parent recursed, fragments assigned, parent left 0
    assert out["/root/big"] == 0
    assert all(out[p] > 0 for p in
               ["/root/a", "/root/c", "/root/big/x", "/root/big/y", "/root/big/z"])


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(st.lists(st.decimals(min_value=0, max_value=10**9, places=2),
                min_size=1, max_size=60),
       st.integers(2, 9))
def test_distributed_running_sum_matches_naive(spark, values, nparts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from databox_adls_loader_spark.operators.windows import exclusive_running_sum
    df = spark.createDataFrame(
        [(i, str(v)) for i, v in enumerate(values)], "k: long, v: string"
    ).withColumn("v", F.col("v").cast("decimal(18,2)"))
    got = {r["k"]: r["run"] for r in exclusive_running_sum(
        df, "k", F.col("v"), out_col="run", num_partitions=nparts).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    naive = {r["k"]: r["run"] for r in df.select(
        "k", F.coalesce(F.sum("v").over(w),
                        F.lit(0).cast("decimal(38,6)")).alias("run")).collect()}
    assert got == naive
