"""Sessionization + funnel edge cases: exact-boundary gaps, timestamp
ties, out-of-order steps, users missing intermediate steps."""

from __future__ import annotations

from datetime import datetime

from databox_adls_loader_spark.operators.sessions import (
    funnel_counts,
    funnel_steps,
    session_summaries,
    sessionize,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, event_type: string")


def ts(m, s=0, us=0):
    return datetime(2024, 1, 1, m // 60, m % 60, s, us)


def test_gap_boundary_is_strict(spark):
    """Gap of exactly 30:00.000000 does NOT split; one microsecond more
    does — the seconds-cast truncation bug would flip the first case."""
    rows = [
        (1, ts(0), 1, "a"),
        (2, ts(30), 1, "a"),            # exactly 30 min later → same session
        (3, ts(60), 1, "a"),            # exactly 30 after #2 → same
        (4, ts(90, 0, 1), 1, "a"),      # 30 min + 1 us → NEW session
    ]
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(_ev(spark, rows), 30,
                               tiebreak_col="event_id").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2}


def test_sessions_per_user_independent(spark):
    rows = [
        (1, ts(0), 1, "a"), (2, ts(100), 1, "a"),
        (3, ts(0), 2, "a"), (4, ts(10), 2, "a"), (5, ts(200), 2, "a"),
    ]
    summ = {(r["user_id"], r["session_id"]): r["n_events"]
            for r in session_summaries(_ev(spark, rows), 30,
                                       tiebreak_col="event_id").collect()}
    assert summ == {(1, 1): 1, (1, 2): 1, (2, 1): 2, (2, 2): 1}


def test_tie_timestamps_deterministic(spark):
    """Identical timestamps: the event_id tiebreak pins lag order, so two
    runs give the same split."""
    rows = [(i, ts(0), 1, "a") for i in range(6)] + [(9, ts(99), 1, "a")]
    a = sessionize(_ev(spark, rows), 30, tiebreak_col="event_id").collect()
    b = sessionize(_ev(spark, rows), 30, tiebreak_col="event_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ids = {r["event_id"]: r["session_id"] for r in a}
    assert all(ids[i] == 1 for i in range(6)) and ids[9] == 2


def test_funnel_requires_order(spark):
    """User 2 did B before A — B must not count; user 3 lacks B entirely
    so their later C cannot count either."""
    rows = [
        (1, ts(0), 1, "A"), (2, ts(1), 1, "B"), (3, ts(2), 1, "C"),
        (4, ts(5), 2, "B"), (5, ts(6), 2, "A"),          # B precedes A
        (6, ts(0), 3, "A"), (7, ts(9), 3, "C"),          # no B
    ]
    per_user = {r["user_id"]: (r["t_A"], r["t_B"], r["t_C"])
                for r in funnel_steps(_ev(spark, rows),
                                      ["A", "B", "C"]).collect()}
    assert per_user[1][2] is not None
    assert per_user[2][1] is None                        # unordered B dropped
    assert per_user[3][1] is None and per_user[3][2] is None
    counts = {r["step"]: r["n_users"]
              for r in funnel_counts(_ev(spark, rows), ["A", "B", "C"]).collect()}
    assert counts == {"A": 3, "B": 1, "C": 1}


def test_funnel_monotone_on_real_data(spark, sf_dir):
    from databox_adls_loader_spark.session import load_tables
    events = load_tables(spark, sf_dir, ["events"])["events"]
    ns = [r["n_users"] for r in
          funnel_counts(events, ["signup", "view", "purchase"]).collect()]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] > 0
