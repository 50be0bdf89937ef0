"""Watermarked tumbling windows: append mode emits each window at most
once and only after the watermark passes its end; windows still inside
the watermark stay open (withheld); stragglers that arrive while the
window state is live are aggregated (Spark guarantees dropping only
beyond the watermark+eviction, never inside it)."""

import json
import os
import time

from olake_spark.streaming.windows import windowed_event_counts

BASE = "2024-01-01 "


def _feed(d, name, rows, mtime=None):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with open(p, "w") as f:
        for et, hhmm in rows:
            f.write(json.dumps({"event_type": et, "ts": f"{BASE}{hhmm}:00"}) + "\n")
    if mtime is not None:
        os.utime(p, (mtime, mtime))  # file-source batches order by mtime


def _run(spark, feed, qname):
    raw = (
        spark.readStream.format("json")
        .schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(feed)
    )
    out = windowed_event_counts(raw, window="10 minutes", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {qname}").collect()


def test_closed_windows_emit_once_open_windows_withheld(spark, tmp_path):
    feed = str(tmp_path / "feed")
    now = time.time()
    _feed(feed, "a.jsonl", [
        ("click", "10:01"), ("click", "10:04"), ("view", "10:12"),
    ], mtime=now - 120)
    # advances the watermark to 11:30, closing both 10:xx windows
    _feed(feed, "b.jsonl", [("click", "12:00")], mtime=now - 60)
    # straggler: within the (not yet evicted) 10:00 window state, so it
    # is aggregated — Spark only guarantees drops beyond eviction
    _feed(feed, "c.jsonl", [("click", "10:05")], mtime=now)

    rows = _run(spark, feed, "win_out")
    got = {}
    for r in rows:
        key = (r.window_start.strftime("%H:%M"), r.event_type)
        assert key not in got, f"window {key} emitted twice in append mode"
        got[key] = r.n_events
    assert got[("10:00", "click")] == 3  # 10:01 + 10:04 + straggler 10:05
    assert got[("10:10", "view")] == 1
    # the 12:00 window end (12:10) is past the final watermark (11:30):
    # it must stay open/unemitted
    assert ("12:00", "click") not in got
    assert set(got) == {("10:00", "click"), ("10:10", "view")}


def test_single_batch_emits_nothing_until_watermark_moves(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _feed(feed, "a.jsonl", [("click", "10:01"), ("click", "10:04")])
    rows = _run(spark, feed, "win_out2")
    # watermark after one batch is 09:34; the 10:00 window isn't closed
    assert rows == []
