"""Streaming CDC apply: decode -> micro-batch MERGE -> ack-after-commit
cursor (SURVEY.md §2.5, §3.3)."""

import json
import os

from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.sources.cdc import decode_changes
from olake_spark.streaming.cdc_stream import CdcApplier, run_cdc_stream
from olake_spark.table import Table


def _change(op, lsn, doc_id, tokens=None, source="web", ts_ms=1700000000000):
    return json.dumps(
        {
            "op": op,
            "table": "sequences",
            "lsn": lsn,
            "doc_id": doc_id,
            "tokens": tokens or [1, 2, 3],
            "n_tok": len(tokens or [1, 2, 3]),
            "source": source,
            "ts_ms": ts_ms,
        }
    )


def test_decode_changes(spark):
    lines = [
        _change("insert", 1, "a-1"),
        _change("delete", 2, "a-2"),
        json.dumps({"op": "insert", "table": "other", "lsn": 3, "doc_id": "x"}),
        "corrupt {{{",
    ]
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    out = decode_changes(raw).collect()
    assert len(out) == 2  # other-table + corrupt filtered
    by_id = {r.doc_id: r for r in out}
    assert by_id["a-1"]._cdc_deleted_at is None
    assert by_id["a-2"]._cdc_deleted_at is not None


def test_stream_apply_with_cursor(spark, tmp_path):
    base = generate_sequences(spark, 300, seed=2, max_tok=32)
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(base.repartition(4))
    victims = [r.doc_id for r in base.orderBy("doc_id").limit(2).collect()]

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "batch1.json").write_text(
        "\n".join(
            [
                _change("insert", 10, "zz-stream-1", [7, 7]),
                _change("update", 11, victims[0], [9, 9, 9]),
                _change("delete", 12, victims[1]),
                # same-key second op in one batch: higher LSN must win
                _change("update", 13, "zz-stream-1", [8, 8, 8, 8]),
            ]
        )
    )
    cursor = run_cdc_stream(
        t, str(feed), str(tmp_path / "ckpt"), bounded=True
    )
    assert cursor == 13
    cur = t.scan()
    assert cur.count() == 300  # +1 insert -1 delete
    ins = cur.filter(F.col("doc_id") == "zz-stream-1").collect()
    assert len(ins) == 1 and ins[0].tokens == [8, 8, 8, 8]  # last LSN wins
    assert cur.filter(F.col("doc_id") == victims[1]).count() == 0
    upd = cur.filter(F.col("doc_id") == victims[0]).first()
    assert upd.tokens == [9, 9, 9]

    # second bounded run with no new files: cursor unchanged, no new snapshot
    snap_before = t.current_snapshot_id
    cursor2 = run_cdc_stream(t, str(feed), str(tmp_path / "ckpt"), bounded=True)
    assert cursor2 == 13
    assert t.refresh().current_snapshot_id == snap_before


def test_applier_replay_is_idempotent(spark, tmp_path):
    """Reference semantics: at-least-once delivery + olake_id
    idempotency -> replaying a batch must not duplicate effects."""
    base = generate_sequences(spark, 200, seed=4, max_tok=32)
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(base.repartition(2))
    lines = [_change("insert", 5, "zz-replay-1", [4, 4])]
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    applier = CdcApplier(t)
    applier.apply_batch(raw, batch_id=0)
    applier.apply_batch(raw, batch_id=0)  # replay
    cur = t.scan()
    assert cur.filter(F.col("doc_id") == "zz-replay-1").count() == 1
    assert cur.count() == 201
    assert applier.current_cursor() == 5
    assert os.path.exists(applier.cursor_path)
