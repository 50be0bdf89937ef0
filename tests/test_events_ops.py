"""Sessionization and as-of join vs pandas oracles."""

import datetime as dt

import pandas as pd

from olake_spark.operators.events import asof_join, session_stats, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_sessionize_gap_breaks(spark):
    rows = [
        (1, _ts(0)), (1, _ts(10)), (1, _ts(50)), (1, _ts(55)),  # 2 sessions
        (2, _ts(0)),  # 1 session
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize(ev, gap_minutes=30).orderBy("user_id", "ts").collect()
    assert [r.session_id for r in out] == [0, 0, 1, 1, 0]
    stats = {r.user_id: r for r in session_stats(ev, gap_minutes=30).collect()}
    assert stats[1].n_sessions == 2 and stats[1].n_events == 4
    assert stats[1].events_per_session == 2.0
    assert stats[2].n_sessions == 1


def test_asof_join_matches_pandas_merge_asof(spark):
    left_rows = [(i, 1, _ts(m)) for i, m in enumerate([5, 15, 25, 59])] + [
        (10, 2, _ts(30))
    ]
    right_rows = [
        (1, _ts(0), 100.0),
        (1, _ts(15), 200.0),  # exact-match tie: must be visible
        (1, _ts(40), 300.0),
        (3, _ts(0), 999.0),  # other key, never matched
    ]
    left = spark.createDataFrame(left_rows, "id int, k int, ts timestamp")
    right = spark.createDataFrame(right_rows, "k int, ts timestamp, v double")
    got = {
        r.id: r.v_asof
        for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    want_df = pd.merge_asof(
        lpdf, rpdf, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {int(r.id): (None if pd.isna(r.v) else r.v) for r in want_df.itertuples()}
    assert got == want
    assert got[1] == 200.0  # exact-timestamp right row included
    assert got[10] is None  # key 2 has no right rows -> NULL kept (left join)
