"""Range-join unit tests: bucketed equi-join must equal the naive range
join, including intervals spanning many buckets."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from databox_adls_loader_spark.operators.rangejoin import point_in_interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_bucketed_equals_naive_range_join(spark):
    points = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 {h:02d}:{m:02d}:00"))
         for i, (h, m) in enumerate([(0, 30), (1, 15), (2, 0), (5, 59), (6, 0),
                                     (11, 45), (12, 0), (23, 59)])],
        "pid: long, ts: timestamp")
    intervals = spark.createDataFrame(
        [(100, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),   # 2h
         (200, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 12:00:00")),   # 11h: many buckets
         (300, _ts("2024-01-01 23:00:00"), _ts("2024-01-02 01:00:00")),   # crosses midnight
         (400, _ts("2024-01-01 03:00:00"), _ts("2024-01-01 03:30:00"))],  # empty
        "iid: long, s: timestamp, e: timestamp")
    got = {(r["iid"], r["pid"]) for r in
           point_in_interval_join(points, intervals, point_ts="ts",
                                  start_col="s", end_col="e",
                                  bucket_seconds=3600).collect()}
    naive = {(r["iid"], r["pid"]) for r in
             intervals.join(points, (F.col("ts") >= F.col("s"))
                            & (F.col("ts") < F.col("e"))).collect()}
    assert got == naive
    assert (200, 5) in got          # multi-bucket interval matched once
    assert all(i != 400 for i, _ in got)


def test_no_duplicate_pairs_across_buckets(spark):
    # a point inside a long interval must appear exactly once
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 05:00:00"))], "pid: long, ts: timestamp")
    intervals = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iid: long, s: timestamp, e: timestamp")
    rows = point_in_interval_join(points, intervals, point_ts="ts",
                                  start_col="s", end_col="e",
                                  bucket_seconds=3600).collect()
    assert len(rows) == 1
