"""Time-series regularization: calendar fill, forward fill, and the IQR
outlier / degree-distribution profilers added alongside them."""

import datetime as dt

from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import timeseries


def test_calendar_fill_spans_per_key(spark):
    daily = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 10),
         ("a", dt.date(2024, 1, 4), 40),
         ("b", dt.date(2024, 2, 1), 7)],
        "k string, d date, v int")
    out = timeseries.calendar_fill(daily, "k", "d").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    # key a: 4 consecutive days within ITS OWN span; gaps are NULL
    a = sorted(by_key["a"], key=lambda r: r["d"])
    assert [r["d"].day for r in a] == [1, 2, 3, 4]
    assert [r["v"] for r in a] == [10, None, None, 40]
    # key b: single-day span stays a single row (no bleed from a's span)
    assert len(by_key["b"]) == 1 and by_key["b"][0]["v"] == 7


def test_gap_fill_forward_zero_and_ffill(spark):
    daily = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 2, 10.0),
         ("a", dt.date(2024, 1, 3), 1, 30.0)],
        "k string, d date, n long, rev double")
    out = (timeseries.gap_fill_forward(daily, "k", "d",
                                       ffill_cols=["rev"],
                                       zero_fill={"n": F.lit(0)})
           .orderBy("d").collect())
    assert [r["n"] for r in out] == [2, 0, 1]          # counts zero-fill
    assert [r["rev"] for r in out] == [10.0, 10.0, 30.0]  # rev carries


def test_forward_fill_leading_nulls_stay_null(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None)],
        "k string, o int, v double")
    out = (timeseries.forward_fill(df, "k", "o", ["v"])
           .orderBy("o").collect())
    assert [r["v"] for r in out] == [None, 5.0, 5.0]


def test_iqr_outlier_profile_counts(spark):
    from databox_adls_loader_spark.operators import profile
    rows = [("g", float(v)) for v in range(1, 12)] + [("g", 1000.0), ("g", -1000.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    (r,) = profile.iqr_outlier_profile(df, "grp", "v").collect()
    # 13 values: quartiles of 1..11 plus the two planted outliers
    assert r["n"] == 13
    assert r["n_below"] == 1 and r["n_above"] == 1
    assert r["lo"] < 1.0 < r["q1"] < r["q3"] < 11.0 < r["hi"]


def test_degree_distribution(spark):
    from databox_adls_loader_spark.operators.graph import degree_distribution
    # star: 1-2, 1-3, 1-4  → node 1 has degree 3, nodes 2/3/4 degree 1
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long")
    out = {r["degree"]: r["n_nodes"] for r in degree_distribution(pairs).collect()}
    assert out == {1: 3, 3: 1}


def test_rolling_zscore_flags_spike_only(spark):
    from databox_adls_loader_spark.operators.timeseries import (
        rolling_zscore_anomalies)
    import datetime as dt
    base = dt.date(2024, 1, 1)
    vals = [100, 102, 98, 101, 99, 103, 100, 500, 101, 100]
    rows = [(base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    daily = spark.createDataFrame(rows, "day: date, val: long")
    got = {r["day"].isoformat(): r["is_anomaly"]
           for r in rolling_zscore_anomalies(daily, "day", "val").collect()}
    assert got["2024-01-08"] is True                 # the 500 spike
    assert sum(got.values()) == 1                    # and nothing else
    # first rows lack min_points history -> never flagged
    assert got["2024-01-01"] is False and got["2024-01-04"] is False


def test_ewma_binary_fleet_exact_numerator_and_null_head(spark):
    import datetime

    from databox_adls_loader_spark.operators.timeseries import (
        ewma_binary_fleet)

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = [("s", datetime.date(2024, 1, 1 + i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, d date, v long")
    out = {r["d"].day: r for r in
           ewma_binary_fleet(df, "d", "v", "series", window=8).collect()}
    # rows 1..7 lack a full 8-deep history -> NULL numerator
    assert all(out[day]["ewma_x256"] is None for day in range(1, 8))
    for t in range(7, 10):            # 0-based index into vals
        num = sum(vals[t - i] * (1 << (7 - i)) for i in range(8))
        assert out[t + 1]["ewma_x256"] == num
        # num/256 is an exact dyadic that can land exactly on a 6dp
        # half; both engines round half AWAY FROM ZERO (the repo
        # convention), unlike Python's banker's round()
        import decimal
        want = float((decimal.Decimal(num) / 256).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))
        assert out[t + 1]["ewma"] == want
