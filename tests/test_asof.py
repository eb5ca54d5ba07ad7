"""As-of join unit tests: hand-built frames with known matches."""

from __future__ import annotations

from datetime import datetime

from databox_adls_loader_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a"),
         (1, _ts("2024-01-01 12:00:00"), "b"),
         (2, _ts("2024-01-01 09:00:00"), "c")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 10.0),
         (1, _ts("2024-01-01 11:00:00"), 20.0),
         (2, _ts("2024-01-01 09:30:00"), 30.0)],   # after left's only row
        "k: long, ts: timestamp, v: double")
    return left, right


def test_asof_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {(r["k"], r["tag"]): r["right_v"]
           for r in asof_join(left, right, key="k").collect()}
    assert out[(1, "a")] == 10.0      # 09:30 is latest <= 10:00
    assert out[(1, "b")] == 20.0      # 11:00 is latest <= 12:00
    assert out[(2, "c")] is None      # right row is in the future


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")], "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7.0)], "k: long, ts: timestamp, v: double")
    (row,) = asof_join(left, right, key="k").collect()
    assert row["right_v"] == 7.0


def test_asof_tolerance_drops_stale_matches(spark):
    left, right = _frames(spark)
    out = {(r["k"], r["tag"]): r["right_v"]
           for r in asof_join(left, right, key="k",
                              tolerance_seconds=1800).collect()}
    assert out[(1, "a")] == 10.0      # 30 min gap: exactly at tolerance
    assert out[(1, "b")] is None      # 60 min gap: stale
    # all left rows survive (left-join semantics)
    assert len(out) == 3


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                min_size=1, max_size=30),
       st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                min_size=0, max_size=30))
def test_asof_matches_naive_python(spark, left_rows, right_rows):
    # as-of join == per-left-row python scan over right rows; right ts
    # made unique per key so the tie-free contract holds
    right_rows = [(k, t) for i, (k, t) in enumerate(
        {(k, t): None for k, t in right_rows})]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid: long, k: long, ts: long")
    right = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right_rows] or [(99, -1, 0.0)],
        "k: long, ts: long, v: double")
    got = {r["lid"]: r["right_v"]
           for r in asof_join(left, right, key="k").collect()}
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, rv) for rk, rt, rv in
                 ((rk, rt, float(rt)) for rk, rt in right_rows)
                 if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, cands)


def test_asof_matched_row_is_atomic(spark):
    # the matched right row must come back whole: a NULL field in the
    # latest right row must NOT be back-filled from an older right row
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")], "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00"), 5.0, "old"),
         (1, _ts("2024-01-01 09:00:00"), None, "new")],
        "k: long, ts: timestamp, v: double, lbl: string")
    (row,) = asof_join(left, right, key="k").collect()
    assert row["right_lbl"] == "new"
    assert row["right_v"] is None          # NOT 5.0 from the older row


def test_asof_tolerance_uses_matched_row_ts(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")], "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:59:00"), None, "fresh")],
        "k: long, ts: timestamp, v: double, lbl: string")
    (row,) = asof_join(left, right, key="k", tolerance_seconds=120).collect()
    assert row["right_lbl"] == "fresh"     # within tolerance, null v kept
    assert row["right_v"] is None


# ---------------------------------------------------------------------------
# forward as-of
# ---------------------------------------------------------------------------

from databox_adls_loader_spark.operators.asof import asof_forward_join  # noqa: E402


def test_asof_forward_picks_earliest_at_or_after(spark):
    left, right = _frames(spark)
    out = {(r["k"], r["tag"]): r["right_v"]
           for r in asof_forward_join(left, right, key="k").collect()}
    assert out[(1, "a")] == 20.0      # 11:00 is earliest >= 10:00
    assert out[(1, "b")] is None      # nothing after 12:00
    assert out[(2, "c")] == 30.0      # 09:30 is in the future, matches


def test_asof_forward_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0),
         (1, _ts("2024-01-01 10:30:00"), 7.0)],
        "k: long, ts: timestamp, v: double")
    got = asof_forward_join(left, right, key="k").collect()[0]
    assert got["right_v"] == 5.0      # simultaneous right row matches


def test_asof_forward_tolerance_boundary(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x"),
         (2, _ts("2024-01-01 10:00:00"), "y")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), 5.0),     # exactly +2h: kept
         (2, _ts("2024-01-01 12:00:01"), 7.0)],    # +2h1s: null-filled
        "k: long, ts: timestamp, v: double")
    out = {r["k"]: (r["right_v"], r["right_ts"]) for r in
           asof_forward_join(left, right, key="k",
                             tolerance_seconds=7200).collect()}
    assert out[1] == (5.0, _ts("2024-01-01 12:00:00"))
    assert out[2] == (None, None)


def test_asof_forward_matched_row_is_atomic(spark):
    # the earliest following row has v=NULL; the later one has v set —
    # a per-column carry would frankenstein the later v onto the
    # earlier row's ts
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"), None),
         (1, _ts("2024-01-01 11:00:00"), 9.0)],
        "k: long, ts: timestamp, v: double")
    got = asof_forward_join(left, right, key="k").collect()[0]
    assert got["right_ts"] == _ts("2024-01-01 10:30:00")
    assert got["right_v"] is None     # the 10:30 row's own (NULL) value


def test_asof_nearest_direction_tie_and_tolerance(spark):
    from databox_adls_loader_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "near_back"),
         (1, _ts("2024-01-01 11:59:00"), "near_fwd"),
         (1, _ts("2024-01-01 11:00:00"), "tie"),
         (2, _ts("2024-01-01 09:00:00"), "only_fwd"),
         (3, _ts("2024-01-01 09:00:00"), "too_far")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:05:00"), 10.0),
         (1, _ts("2024-01-01 12:00:00"), 20.0),
         (2, _ts("2024-01-01 09:30:00"), 30.0),
         (3, _ts("2024-01-01 12:00:00"), 40.0)],   # 3h away > tolerance
        "k: long, ts: timestamp, v: double")
    out = {r["tag"]: (r["right_v"], r["direction"]) for r in
           asof_nearest_join(left, right, key="k",
                             tolerance_seconds=3600).collect()}
    # near_back at 10:00 -> 10:05 is forward 5m (no backward match)
    assert out["near_back"] == (10.0, "forward")
    # near_fwd at 11:59 -> 12:00 fwd (1m) beats 10:05 back (114m)
    assert out["near_fwd"] == (20.0, "forward")
    # tie at 11:00: back 10:05 is 55m, fwd 12:00 is 60m -> backward
    assert out["tie"] == (10.0, "backward")
    assert out["only_fwd"] == (30.0, "forward")
    assert out["too_far"] == (None, None)


def test_asof_nearest_exact_tie_prefers_backward(spark):
    from databox_adls_loader_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 1.0),
         (1, _ts("2024-01-01 10:30:00"), 2.0)],
        "k: long, ts: timestamp, v: double")
    row = asof_nearest_join(left, right, key="k").collect()[0]
    assert (row["right_v"], row["direction"]) == (1.0, "backward")


def test_asof_nearest_subsecond_distances_and_tolerance_edge(spark):
    """Regression: distances and tolerance compare in exact MICROSECONDS.
    Truncated-second math picked the wrong side inside a 1 s band and
    widened the tolerance horizon by up to a second."""
    from datetime import datetime

    from databox_adls_loader_spark.operators.asof import (
        asof_forward_join, asof_nearest_join)

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0, 800000), "x")],
        "k: long, ts: timestamp, tag: string")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0, 200000), 1.0),    # 0.6 s back
         (1, datetime(2024, 1, 1, 10, 0, 1, 0), 2.0)],        # 0.2 s fwd
        "k: long, ts: timestamp, v: double")
    row = asof_nearest_join(left, right, key="k").collect()[0]
    assert (row["right_v"], row["direction"]) == (2.0, "forward")

    # tolerance horizon: a match 3600.7 s ahead must null-fill at 3600 s
    left2 = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0, 300000), "y")],
        "k: long, ts: timestamp, tag: string")
    right2 = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 11, 0, 1, 0), 9.0)],
        "k: long, ts: timestamp, v: double")
    out = asof_forward_join(left2, right2, key="k",
                            tolerance_seconds=3600).collect()[0]
    assert out["right_v"] is None


def test_asof_nearest_keeps_left_rows_with_null_payload(spark):
    """Regression: the backward⊕forward re-join is null-safe — a NULL
    left payload column must not drop the row."""
    from datetime import datetime

    from databox_adls_loader_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0), None),
         (1, datetime(2024, 1, 1, 11, 0, 0), "ok")],
        "k: long, ts: timestamp, note: string")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 30, 0), 5.0)],
        "k: long, ts: timestamp, v: double")
    rows = asof_nearest_join(left, right, key="k").collect()
    assert len(rows) == 2
    assert {r["note"] for r in rows} == {None, "ok"}
