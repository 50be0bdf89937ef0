"""Streaming stateful sessionization: sessions spanning micro-batches
close correctly; state carries across batches (maxFilesPerTrigger=1
forces multi-batch processing of a multi-file feed)."""

import json
import os

from olake_spark.streaming.sessionize_stream import sessionize_stream

BASE = "2024-01-01 "


def _write_feed(d, name, rows, mtime=None):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with open(p, "w") as f:
        for uid, hhmm in rows:
            f.write(json.dumps({"user_id": uid, "ts": f"{BASE}{hhmm}:00"}) + "\n")
    if mtime is not None:
        os.utime(p, (mtime, mtime))  # file-source batches order by mtime


def test_sessions_close_on_gap_across_batches(spark, tmp_path):
    feed = str(tmp_path / "feed")
    # batch 1: u1 has two events 5 min apart (one open session);
    #          u2 has one event
    import time as _time

    now = _time.time()
    _write_feed(
        feed, "a.jsonl", [(1, "10:00"), (1, "10:05"), (2, "09:00")],
        mtime=now - 60,
    )
    # batch 2 (separate file): u1 returns 90 min later -> closes the
    # first session (state carried across batches); u2 event 10 min
    # later extends the open session (nothing emitted for u2)
    _write_feed(feed, "b.jsonl", [(1, "11:35"), (2, "09:10")], mtime=now)

    raw = (
        spark.readStream.format("json")
        .schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(feed)
    )
    out = sessionize_stream(raw, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    closed = {(r.user_id, r.session_start.strftime("%H:%M"),
               r.session_end.strftime("%H:%M"), r.n_events) for r in rows}
    # exactly one closed session: u1's 10:00-10:05 pair
    assert closed == {(1, "10:00", "10:05", 2)}


def test_single_batch_multiple_gaps(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_feed(
        feed,
        "a.jsonl",
        [(7, "08:00"), (7, "08:10"), (7, "09:30"), (7, "09:40"), (7, "12:00")],
    )
    raw = (
        spark.readStream.format("json")
        .schema("user_id long, ts timestamp")
        .load(feed)
    )
    out = sessionize_stream(raw, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sessions_out2").collect()
    closed = {(r.session_start.strftime("%H:%M"),
               r.session_end.strftime("%H:%M"), r.n_events) for r in rows}
    # two closed sessions; the 12:00 singleton stays open in state
    assert closed == {("08:00", "08:10", 2), ("09:30", "09:40", 2)}
