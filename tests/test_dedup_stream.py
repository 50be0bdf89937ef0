"""Streaming TTL dedup: duplicate deliveries within the watermark are
dropped exactly once; state expires with the watermark (a re-delivery
after expiry passes — the documented trade-off that bounds state)."""

import json
import os
import time

from olake_spark.streaming.dedup_stream import dedup_events_stream

BASE = "2024-01-01 "


def _feed(d, name, rows, mtime):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with open(p, "w") as f:
        for key, hhmm in rows:
            f.write(json.dumps({"k": key, "ts": f"{BASE}{hhmm}:00"}) + "\n")
    os.utime(p, (mtime, mtime))


def _run(spark, feed, qname):
    raw = (
        spark.readStream.format("json")
        .schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(feed)
    )
    out = dedup_events_stream(raw, key_cols=("k",), watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [
        (r.k, r.ts.strftime("%H:%M"))
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    ]


def test_duplicates_within_watermark_dropped_once(spark, tmp_path):
    feed = str(tmp_path / "feed")
    now = time.time()
    # batch 1: K, L; batch 2 re-delivers K (in-TTL dup) + new M; batch 3
    # advances the event-time high-water mark to 12:00; batch 4 is a
    # spacer — Spark applies a watermark advance in the FOLLOWING batch,
    # so K's state (expires 10:02+30min) is evicted here at watermark
    # 11:30; batch 5 re-delivers K after expiry
    _feed(feed, "a.jsonl", [("K", "10:00"), ("L", "10:01")], now - 500)
    _feed(feed, "b.jsonl", [("K", "10:02"), ("M", "10:05")], now - 400)
    _feed(feed, "c.jsonl", [("Z", "12:00")], now - 300)
    _feed(feed, "e.jsonl", [("Y", "12:00")], now - 200)
    _feed(feed, "d.jsonl", [("K", "12:01")], now - 100)
    got = _run(spark, feed, "dedup_q")
    ks = sorted(t for k, t in got if k == "K")
    # exactly one K per TTL window: the 10:02 re-delivery is dropped, the
    # post-expiry 12:01 re-delivery passes
    assert ks == ["10:00", "12:01"], got
    assert sorted(k for k, _ in got) == ["K", "K", "L", "M", "Y", "Z"], got
