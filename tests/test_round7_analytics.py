"""Round-7 analytics operators: attribution, streaks, co-occurrence,
milestones, CUSUM, MAD, TWAP, decile lift, group checksums, k-anonymity
— edge semantics the oracle gate's fixed data can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


TS = dt.datetime


class TestAttribution:
    def test_credits_last_touch_not_self_and_direct(self, spark):
        from databox_adls_loader_spark.operators.sessions import \
            last_touch_attribution

        ev = _events(spark, [
            (1, TS(2024, 1, 1, 10), 1, "click", 0.0),
            (2, TS(2024, 1, 1, 11), 1, "view", 0.0),
            (3, TS(2024, 1, 1, 12), 1, "purchase", 5.0),   # → view
            (4, TS(2024, 1, 2, 9), 2, "purchase", 2.0),    # → direct
            (5, TS(2024, 1, 2, 10), 2, "purchase", 2.0),   # → direct
        ])
        got = {r["channel"]: r["n_conversions"] for r in
               last_touch_attribution(
                   ev, "purchase", ["click", "view"],
                   tiebreak_col="event_id").collect()}
        # purchases are NOT channels here, so the second user-2 purchase
        # must not credit the first one; both stay direct
        assert got == {"view": 1, "direct": 2}

    def test_prior_conversion_can_be_channel_when_listed(self, spark):
        from databox_adls_loader_spark.operators.sessions import \
            last_touch_attribution

        ev = _events(spark, [
            (1, TS(2024, 1, 1, 10), 1, "purchase", 1.0),
            (2, TS(2024, 1, 1, 11), 1, "purchase", 1.0),
        ])
        got = {r["channel"]: r["n_conversions"] for r in
               last_touch_attribution(
                   ev, "purchase", ["purchase"],
                   tiebreak_col="event_id").collect()}
        # strictly-preceding frame: first credits direct, second the first
        assert got == {"direct": 1, "purchase": 1}


class TestStreaks:
    def test_islands_split_on_gaps_and_dedupe_days(self, spark):
        from databox_adls_loader_spark.operators.sessions import \
            activity_streaks

        d = dt.datetime
        ev = _events(spark, [
            # user 1: Jan 1,2,3 (two events on the 2nd), gap, Jan 10
            (1, d(2024, 1, 1), 1, "view", 0.0),
            (2, d(2024, 1, 2, 8), 1, "view", 0.0),
            (3, d(2024, 1, 2, 20), 1, "click", 0.0),
            (4, d(2024, 1, 3), 1, "view", 0.0),
            (5, d(2024, 1, 10), 1, "view", 0.0),
            # user 2: a single day
            (6, d(2024, 2, 1), 2, "view", 0.0),
        ])
        got = {r["streak_days"]: r["n_users"]
               for r in activity_streaks(ev).collect()}
        assert got == {3: 1, 1: 1}


class TestCusum:
    def test_level_shift_peaks_at_boundary(self, spark):
        from databox_adls_loader_spark.operators.timeseries import \
            cusum_peak

        rows = [("a", dt.date(2024, 1, i + 1), v)
                for i, v in enumerate([10, 10, 10, 20, 20, 20])]
        daily = spark.createDataFrame(rows, "k string, day date, v long")
        out = cusum_peak(daily, "k", "day", "v").collect()
        assert len(out) == 1
        r = out[0]
        # mean 15; cusum of (v−15)·6: −30,−60,−90,−60,−30,0 → peak |−90|
        # at the last pre-shift day
        assert r["peak_day"] == dt.date(2024, 1, 3)
        assert r["peak_abs_cusum"] == 90 and r["n_days"] == 6


class TestMad:
    def test_median_mad_and_hampel_flags(self, spark):
        from databox_adls_loader_spark.operators.timeseries import \
            mad_outliers

        vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "k string, v long")
        r = mad_outliers(df, "k", "v", k=3).collect()[0]
        # percentile_disc(0.5) over 10 values picks the 5th (value 5)
        assert r["med"] == 5
        # deviations: 4,3,2,1,0,1,2,3,4,995 → disc median 2
        assert r["mad"] == 2
        # |x−5| > 6 → only 1000
        assert r["n_outliers"] == 1 and r["n"] == 10


class TestTwap:
    def test_step_integral_vs_plain_avg(self, spark):
        from databox_adls_loader_spark.operators.timeseries import \
            time_weighted_avg

        d = dt.datetime
        # value 100 for 9 hours, then 3 bursty samples of 0 for 1h total
        ev = _events(spark, [
            (1, d(2024, 1, 1, 0), 1, "m", 100.0),
            (2, d(2024, 1, 1, 9), 1, "m", 0.0),
            (3, d(2024, 1, 1, 9, 30), 1, "m", 0.0),
            (4, d(2024, 1, 1, 10), 1, "m", 0.0),
        ])
        out = time_weighted_avg(
            ev, "event_type", "ts",
            (F.col("value").cast("decimal(18,4)") * 10000).cast("long"))
        r = out.collect()[0]
        # 9h at 100, 1h at 0 → TWAP 90.0 (scaled 900000); plain AVG = 25
        assert r["twap_scaled"] == 900_000
        assert r["span_us"] == 10 * 3600 * 1_000_000


class TestDecileLift:
    def test_shares_sum_and_cumulative_monotone(self, spark):
        from databox_adls_loader_spark.operators.profile import decile_lift

        df = spark.createDataFrame(
            [(float(i), i) for i in range(1, 101)], "v double, id long")
        rows = decile_lift(df, "v", "id").orderBy("decile").collect()
        assert [r["decile"] for r in rows] == list(range(1, 11))
        assert all(r["n"] == 10 for r in rows)
        assert rows[-1]["cum_share_ppm"] == 1_000_000
        cums = [r["cum_share_ppm"] for r in rows]
        assert cums == sorted(cums)
        # top decile carries 91+...+100 of 5050
        assert rows[-1]["sum_cents"] == sum(range(91, 101)) * 100


class TestGroupChecksum:
    def test_order_independent_and_change_sensitive(self, spark):
        from databox_adls_loader_spark.operators.profile import \
            group_checksum

        a = spark.createDataFrame(
            [(1, "x", "g"), (2, "y", "g"), (3, None, "g")],
            "id long, s string, grp string")
        b = spark.createDataFrame(         # same rows, different order
            [(3, None, "g"), (1, "x", "g"), (2, "y", "g")],
            "id long, s string, grp string")
        c = spark.createDataFrame(         # one value changed
            [(1, "x", "g"), (2, "z", "g"), (3, None, "g")],
            "id long, s string, grp string")
        sig = lambda df: tuple(group_checksum(
            df, ["grp"], ["id", "s"]).collect()[0])
        assert sig(a) == sig(b)
        assert sig(a) != sig(c)

    def test_null_vs_empty_string_distinct(self, spark):
        from databox_adls_loader_spark.operators.profile import \
            group_checksum

        a = spark.createDataFrame([(1, None, "g")],
                                  "id long, s string, grp string")
        b = spark.createDataFrame([(1, "", "g")],
                                  "id long, s string, grp string")
        sig = lambda df: tuple(group_checksum(
            df, ["grp"], ["id", "s"]).collect()[0])
        assert sig(a) != sig(b)


class TestKAnonymity:
    def test_flags(self, spark):
        from databox_adls_loader_spark.operators.pii import \
            k_anonymity_audit

        df = spark.createDataFrame(
            [("de", "a", 1), ("de", "a", 2), ("de", "a", 3),
             ("fr", "b", 7), ("fr", "b", 7)],
            "lang string, src string, sens long")
        got = {(r["lang"], r["src"]):
               (r["group_n"], r["l_distinct"],
                r["k_violation"], r["l_violation"])
               for r in k_anonymity_audit(
                   df, ["lang", "src"], "sens", k=3, l=2).collect()}
        assert got[("de", "a")] == (3, 3, False, False)
        # big enough group but zero diversity → l violation only
        assert got[("fr", "b")] == (2, 1, True, True)


class TestMilestones:
    def test_incomplete_users_excluded_from_all(self, spark):
        from databox_adls_loader_spark.operators.sessions import \
            milestone_completion

        d = dt.datetime
        ev = _events(spark, [
            (1, d(2024, 1, 1), 1, "signup", 0.0),
            (2, d(2024, 1, 2), 1, "view", 0.0),
            (3, d(2024, 1, 1), 2, "signup", 0.0),
        ])
        got = {r["milestone"]: (r["n_users"], r["p50_span_us"])
               for r in milestone_completion(
                   ev, ["signup", "view"]).collect()}
        assert got["signup"] == (2, None) and got["view"] == (1, None)
        assert got["ALL"] == (1, 86_400 * 1_000_000)


class TestParetoFrontier:
    def test_frontier_strict_dominance_and_ties(self, spark):
        from databox_adls_loader_spark.operators.profile import \
            pareto_frontier_2d

        # maximize x, minimize y.  (5,1) dominates (5,2) and (4,1);
        # (3,0) survives (better y); duplicate (5,1) collapses n_rows=2
        df = spark.createDataFrame(
            [(5, 1), (5, 1), (5, 2), (4, 1), (3, 0), (2, 5)],
            "x long, y long")
        got = {(r["x"], r["y"]): r["n_rows"] for r in
               pareto_frontier_2d(df, "x", "y").collect()}
        assert got == {(5, 1): 2, (3, 0): 1}

    def test_exclusive_running_min_matches_naive(self, spark):
        from pyspark.sql import Window

        from databox_adls_loader_spark.operators.windows import \
            exclusive_running_min

        df = spark.createDataFrame(
            [(i, (i * 37) % 101) for i in range(500)], "o long, v long")
        got = {r["o"]: r["rm"] for r in exclusive_running_min(
            df, [("o", "asc")], "v", out_col="rm").collect()}
        w = (Window.orderBy("o")
             .rowsBetween(Window.unboundedPreceding, -1))
        want = {r["o"]: r["rm"] for r in df.withColumn(
            "rm", F.min("v").over(w)).collect()}
        assert got == want


class TestLinearInterpolation:
    def test_interior_gaps_fill_edges_stay_null(self, spark):
        from databox_adls_loader_spark.operators.timeseries import \
            linear_interpolate

        d = dt.date
        daily = spark.createDataFrame(
            [("a", d(2024, 1, 1), 100), ("a", d(2024, 1, 4), 40),
             ("a", d(2024, 1, 6), 44)],
            "k string, day date, v long")
        got = {r["day"]: (r["value"], r["is_interpolated"]) for r in
               linear_interpolate(daily, "k", "day", "v").collect()}
        # down-slope: 100 → 40 over 3 days, magnitude-DIV: 100−20=80, 60
        assert got[d(2024, 1, 2)] == (80, True)
        assert got[d(2024, 1, 3)] == (60, True)
        assert got[d(2024, 1, 5)] == (42, True)
        assert got[d(2024, 1, 1)] == (100, False)
        assert got[d(2024, 1, 4)] == (40, False)

    def test_truncation_toward_zero_both_slopes(self, spark):
        from databox_adls_loader_spark.operators.timeseries import \
            linear_interpolate

        d = dt.date
        daily = spark.createDataFrame(
            [("u", d(2024, 1, 1), 0), ("u", d(2024, 1, 4), 10),
             ("v", d(2024, 1, 1), 10), ("v", d(2024, 1, 4), 0)],
            "k string, day date, v long")
        got = {(r["k"], r["day"]): r["value"] for r in
               linear_interpolate(daily, "k", "day", "v").collect()}
        # up: 10·1 DIV 3 = 3, 10·2 DIV 3 = 6; down mirrors: 7, 4
        assert (got[("u", d(2024, 1, 2))], got[("u", d(2024, 1, 3))]) \
            == (3, 6)
        assert (got[("v", d(2024, 1, 2))], got[("v", d(2024, 1, 3))]) \
            == (7, 4)


class TestPaddingWaste:
    def test_chunk_and_pad_math(self, spark):
        from databox_adls_loader_spark.operators.mixing import \
            padding_waste

        docs = spark.createDataFrame([(10,), (64,), (65,)], "t long")
        got = {r["max_len"]: (r["padded_tokens"], r["waste_ppm"])
               for r in padding_waste(
                   docs, F.col("t"), max_lens=[64]).collect()}
        # 10→64, 64→64, 65→128: padded 256, total 139
        assert got[64][0] == 256
        assert got[64][1] == (256 - 139) * 1_000_000 // 256


class TestPositionAttribution:
    def test_u_shape_credit_split(self, spark):
        from databox_adls_loader_spark.operators.sessions import \
            position_attribution

        d = dt.datetime
        ev = _events(spark, [
            # user 1: click, view, view, signup then purchase (m=4)
            (1, d(2024, 1, 1, 1), 1, "click", 0.0),
            (2, d(2024, 1, 1, 2), 1, "view", 0.0),
            (3, d(2024, 1, 1, 3), 1, "view", 0.0),
            (4, d(2024, 1, 1, 4), 1, "signup", 0.0),
            (5, d(2024, 1, 1, 5), 1, "purchase", 9.0),
            # user 2: no touches
            (6, d(2024, 1, 2), 2, "purchase", 1.0),
            # user 3: single touch
            (7, d(2024, 1, 3, 1), 3, "view", 0.0),
            (8, d(2024, 1, 3, 2), 3, "purchase", 1.0),
        ])
        got = {r["channel"]: r["credit_ppm"] for r in
               position_attribution(
                   ev, "purchase", ["click", "view", "signup"]).collect()}
        # user1: click 400k (first), signup 400k (last), views 100k each
        # user3: view 1_000_000
        assert got["click"] == 400_000
        assert got["signup"] == 400_000
        assert got["view"] == 100_000 * 2 + 1_000_000
        assert got["direct"] == 1_000_000


class TestMergeWhen:
    def test_three_clause_semantics(self, spark):
        from databox_adls_loader_spark.operators.scale import merge_when

        t = spark.createDataFrame(
            [(1, "keep"), (2, "del"), (3, "upd")], "k long, v string")
        u = spark.createDataFrame(
            [(2, "new2"), (3, "new3"), (4, "ins"), (5, "skip")],
            "k long, v string")
        out = {r["k"]: r["v"] for r in merge_when(
            t, u, "k",
            delete_when=F.col("e.v") == "del",
            update_when=F.col("u.v") == "new3",
            insert_when=F.col("u.v") == "ins").collect()}
        # 1 untouched, 2 deleted, 3 updated, 4 inserted, 5 refused
        assert out == {1: "keep", 3: "new3", 4: "ins"}

    def test_defaults_equal_plain_upsert(self, spark):
        from databox_adls_loader_spark.operators.scale import (
            merge_upsert, merge_when)

        t = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        u = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
        got = {tuple(r) for r in merge_when(t, u, "k").collect()}
        want = {tuple(r) for r in merge_upsert(t, u, "k").collect()}
        assert got == want == {(1, "a"), (2, "B"), (3, "C")}

    def test_delete_checked_before_update(self, spark):
        from databox_adls_loader_spark.operators.scale import merge_when

        t = spark.createDataFrame([(1, "x")], "k long, v string")
        u = spark.createDataFrame([(1, "y")], "k long, v string")
        # both clauses true -> first (DELETE) wins
        out = merge_when(t, u, "k",
                         delete_when=F.lit(True),
                         update_when=F.lit(True)).collect()
        assert out == []


class TestScd2:
    def test_noop_updates_collapse_and_intervals_chain(self, spark):
        from databox_adls_loader_spark.operators.asof import scd2_intervals

        d = dt.date
        upd = spark.createDataFrame(
            [(1, d(2024, 1, 1), 1, "A"),
             (1, d(2024, 1, 5), 2, "A"),     # no-op: same attr
             (1, d(2024, 2, 1), 3, "B"),
             (1, d(2024, 3, 1), 4, "A"),     # back to A: NEW version
             (2, d(2024, 1, 1), 5, "Z")],
            "k long, ts date, oid long, attr string")
        rows = sorted(
            (r["k"], r["attr"], r["valid_from"], r["valid_to"])
            for r in scd2_intervals(
                upd, "k", "ts", ["attr"], tiebreak_col="oid").collect())
        assert rows == [
            (1, "A", d(2024, 1, 1), d(2024, 2, 1)),
            (1, "A", d(2024, 3, 1), None),
            (1, "B", d(2024, 2, 1), d(2024, 3, 1)),
            (2, "Z", d(2024, 1, 1), None)]

    def test_null_attr_transitions(self, spark):
        from databox_adls_loader_spark.operators.asof import scd2_intervals

        d = dt.date
        upd = spark.createDataFrame(
            [(1, d(2024, 1, 1), 1, None),
             (1, d(2024, 1, 2), 2, None),    # NULL -> NULL: no-op
             (1, d(2024, 1, 3), 3, "A")],
            "k long, ts date, oid long, attr string")
        rows = sorted(
            [(r["attr"], r["valid_from"], r["valid_to"])
             for r in scd2_intervals(
                 upd, "k", "ts", ["attr"],
                 tiebreak_col="oid").collect()], key=str)
        assert rows == [("A", d(2024, 1, 3), None),
                        (None, d(2024, 1, 1), d(2024, 1, 3))]
