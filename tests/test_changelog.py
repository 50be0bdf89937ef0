"""Snapshot changelog scan: row-level insert/update/delete recovery
between copy-on-write snapshots (read-side inverse of the reference's
CDC record production, data_types.go:26-31)."""

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.changelog import CHANGE_TYPE, snapshot_changes
from olake_spark.operators.compaction import compact
from olake_spark.operators.expire import expire_snapshots
from olake_spark.operators.merge import merge_into
from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
from olake_spark.table import Table

N = 800


@pytest.fixture(scope="module")
def changelog_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("chlog")
    df = generate_sequences(spark, N, seed=5, max_tok=48)
    t = Table.create(spark, str(root / "tbl"))
    t.append(df.repartition(12))
    return t, df


def _apply_merge(spark, t, df):
    sample = df.orderBy("doc_id").limit(30).collect()
    upd = [r.doc_id for r in sample[:12]]
    dele = [r.doc_id for r in sample[12:20]]
    updates = (
        df.filter(F.col("doc_id").isin(upd))
        .select(*DATA_COLUMNS)
        .withColumn("tokens", F.expr("slice(tokens, 1, 3)"))
        .withColumn("n_tok", F.least("n_tok", F.lit(3)))
        .withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
    )
    deletes = (
        df.filter(F.col("doc_id").isin(dele))
        .select(*DATA_COLUMNS)
        .withColumn(CDC_DELETED_AT, F.current_timestamp())
    )
    inserts = spark.createDataFrame(
        [("zz-chg-01", [9, 9], 2, "web"), ("zz-chg-02", [8], 1, "books")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
    merge_into(t, updates.unionByName(deletes).unionByName(inserts))
    return set(upd), set(dele), {"zz-chg-01", "zz-chg-02"}


def test_compaction_produces_no_changes(spark, changelog_table):
    t, _ = changelog_table
    s1 = t.refresh().current_snapshot_id
    compact(t, target_file_bytes=1 << 20)
    s2 = t.refresh().current_snapshot_id
    assert s2 != s1
    # every file rewritten, yet zero row-level changes detected
    assert snapshot_changes(t, s1, s2).count() == 0


def test_merge_changes_classified_exactly(spark, changelog_table):
    t, df = changelog_table
    s2 = t.refresh().current_snapshot_id
    upd, dele, ins = _apply_merge(spark, t, df)
    s3 = t.refresh().current_snapshot_id

    ch = snapshot_changes(t, s2, s3).cache()
    got = {
        r.doc_id: r[CHANGE_TYPE]
        for r in ch.select("doc_id", CHANGE_TYPE).collect()
    }
    assert {k for k, v in got.items() if v == "insert"} == ins
    assert {k for k, v in got.items() if v == "update"} == upd
    assert {k for k, v in got.items() if v == "delete"} == dele
    # updates carry the NEW row, deletes the last OLD row
    upd_rows = ch.filter(F.col(CHANGE_TYPE) == "update").collect()
    assert all(r.n_tok <= 3 for r in upd_rows)
    del_rows = ch.filter(F.col(CHANGE_TYPE) == "delete").collect()
    assert all(r.n_tok >= 1 and r.tokens for r in del_rows)
    ch.unpersist()

    # cumulative diff across the intermediate compaction snapshot
    # collapses to the same net change set
    s1 = t.snapshots()[0].snapshot_id
    net = {
        r.doc_id: r[CHANGE_TYPE]
        for r in snapshot_changes(t, s1, s3)
        .select("doc_id", CHANGE_TYPE)
        .collect()
    }
    assert net == got


def test_expired_snapshot_raises(spark, changelog_table):
    t, _ = changelog_table
    s_old = t.snapshots()[0].snapshot_id
    expire_snapshots(t, keep_last=1)
    with pytest.raises(KeyError):
        snapshot_changes(t.refresh(), s_old)


def test_same_snapshot_empty_and_schema(spark, changelog_table):
    t, _ = changelog_table
    cur = t.refresh().current_snapshot_id
    out = snapshot_changes(t, cur, cur)
    assert out.count() == 0
    assert out.columns[-1] == CHANGE_TYPE


def test_changes_since_cursor_protocol(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "cdc_out"))
    df = generate_sequences(spark, 300, seed=9, max_tok=32)

    from olake_spark.operators.changelog import changes_since

    # empty table bootstraps to an empty insert stream, cursor stays None
    out, cur = changes_since(t, None)
    assert out.count() == 0 and cur is None

    t.append(df.repartition(6))
    out, cur = changes_since(t, None)
    assert out.count() == 300
    assert out.filter(F.col(CHANGE_TYPE) != "insert").count() == 0

    # no new snapshot -> empty diff, cursor unchanged
    out2, cur2 = changes_since(t, cur)
    assert out2.count() == 0 and cur2 == cur

    # compaction advances the cursor but emits nothing
    compact(t, target_file_bytes=1 << 20)
    out3, cur3 = changes_since(t, cur)
    assert out3.count() == 0 and cur3 == t.current_snapshot_id

    # a merge shows up as the net diff; replay from the OLD cursor is
    # identical (crash-before-ack consumer)
    dele = (
        df.orderBy("doc_id").limit(5)
        .select(*DATA_COLUMNS)
        .withColumn(CDC_DELETED_AT, F.current_timestamp())
    )
    merge_into(t, dele)
    out4, cur4 = changes_since(t, cur3)
    assert out4.filter(F.col(CHANGE_TYPE) == "delete").count() == 5
    replay, _ = changes_since(t, cur3)
    assert replay.exceptAll(out4).count() == 0


def test_changelog_tailer_ack_after_process(spark, tmp_path):
    from olake_spark.streaming.changelog_stream import ChangelogTailer

    t = Table.create(spark, str(tmp_path / "tail"))
    df = generate_sequences(spark, 200, seed=21, max_tok=24)
    t.append(df.repartition(4))

    seen = []
    tailer = ChangelogTailer(t)
    cur = tailer.run(lambda d, sid: seen.append((sid, d.count())), bounded=True)
    assert cur == t.current_snapshot_id
    assert [n for _, n in seen] == [200]  # bootstrap delivers everything

    # compaction-only snapshot: cursor advances, callback NOT invoked
    compact(t, target_file_bytes=1 << 20)
    tailer.run(lambda d, sid: seen.append((sid, d.count())), bounded=True)
    assert len(seen) == 1
    assert tailer.current_cursor() == t.current_snapshot_id

    # a crashing consumer leaves the cursor unmoved, then replays
    dele = (
        df.orderBy("doc_id").limit(3)
        .select(*DATA_COLUMNS)
        .withColumn(CDC_DELETED_AT, F.current_timestamp())
    )
    merge_into(t, dele)
    before = tailer.current_cursor()

    def boom(d, sid):
        raise RuntimeError("consumer died")

    with pytest.raises(RuntimeError):
        tailer.poll_once(boom)
    assert tailer.current_cursor() == before
    tailer.run(lambda d, sid: seen.append((sid, d.count())), bounded=True)
    assert seen[-1][1] == 3 and tailer.current_cursor() == t.current_snapshot_id


def test_expire_protects_changelog_cursor(spark, tmp_path):
    from olake_spark.operators.changelog import changes_since

    t = Table.create(spark, str(tmp_path / "protect"))
    df = generate_sequences(spark, 300, seed=31, max_tok=16)
    t.append(df.repartition(3))
    _, cursor = changes_since(t, None)  # consumer acked here
    # churn several snapshots past keep_last
    for _ in range(3):
        compact(t, target_file_bytes=1 << 20)
        dele = (
            t.scan().select(*DATA_COLUMNS).orderBy("doc_id").limit(1)
            .withColumn(CDC_DELETED_AT, F.current_timestamp())
        )
        merge_into(t, dele)

    # unprotected expiry would drop the cursor snapshot...
    res = expire_snapshots(
        t, keep_last=1, protect_snapshot_ids={cursor}
    )
    assert cursor not in res.expired_snapshots
    # ...and the consumer can still diff from it
    diff, _ = changes_since(t.refresh(), cursor)
    assert diff.filter(F.col(CHANGE_TYPE) == "delete").count() == 3


def test_tailer_rebootstraps_after_cursor_expiry(spark, tmp_path):
    from olake_spark.streaming.changelog_stream import ChangelogTailer

    t = Table.create(spark, str(tmp_path / "reboot"))
    df = generate_sequences(spark, 150, seed=51, max_tok=16)
    t.append(df.repartition(2))
    tailer = ChangelogTailer(t)
    seen = []
    tailer.run(lambda d, sid: seen.append(d.count()), bounded=True)

    # churn snapshots past retention WITHOUT protecting the cursor
    for _ in range(3):
        dele = (
            t.scan().select(*DATA_COLUMNS).orderBy("doc_id").limit(1)
            .withColumn(CDC_DELETED_AT, F.current_timestamp())
        )
        merge_into(t, dele)
    expire_snapshots(t, keep_last=1)
    with pytest.raises(KeyError):
        snapshot_changes(t.refresh(), tailer.current_cursor())

    # the tailer recovers: full re-bootstrap as inserts, cursor current
    tailer.run(lambda d, sid: seen.append(d.count()), bounded=True)
    assert seen == [150, 147]
    assert tailer.current_cursor() == t.current_snapshot_id


def test_tailer_metadata_only_rewrite_polls(spark, tmp_path, monkeypatch):
    from olake_spark.operators import changelog as chmod
    from olake_spark.streaming.changelog_stream import ChangelogTailer

    t = Table.create(spark, str(tmp_path / "meta"))
    t.append(generate_sequences(spark, 120, seed=61, max_tok=16).repartition(2))
    tailer = ChangelogTailer(t)
    tailer.run(lambda d, sid: None, bounded=True)

    # a rewrite-only snapshot must advance the cursor WITHOUT invoking
    # the changelog join at all (operation metadata short-circuit)
    compact(t, target_file_bytes=1 << 20)
    calls = []
    orig = chmod.changes_since
    monkeypatch.setattr(
        chmod, "changes_since",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
    )
    import olake_spark.streaming.changelog_stream as cs

    monkeypatch.setattr(cs, "changes_since", chmod.changes_since)
    assert tailer.poll_once(lambda d, sid: None) is True
    assert calls == []  # never computed a diff
    assert tailer.current_cursor() == t.current_snapshot_id
