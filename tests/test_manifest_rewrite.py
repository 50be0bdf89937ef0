"""rewrite_manifests (operators/manifests.py): shard-log compaction —
same file set, fewer shards, scan parity, conflict safety."""

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.manifests import rewrite_manifests
from olake_spark.table import Table
from olake_spark.table.format import CommitConflict


def _many_commit_table(spark, root, n_commits=6, rows=120):
    t = Table.create(spark, str(root))
    for i in range(n_commits):
        t.append(
            generate_sequences(spark, rows, seed=100 + i).repartition(2)
        )
    return t.refresh()


def test_driver_rewrite_compacts_and_preserves(spark, tmp_path):
    t = _many_commit_table(spark, tmp_path / "tbl")
    before_files = {f.path: f.to_dict() for f in t.files()}
    before_rows = t.scan().count()
    n_shards = len(t.snapshot().manifests)
    assert n_shards >= 6

    res = rewrite_manifests(t, target_entries=1000, distributed=False)
    assert not res.skipped
    assert res.old_shards == n_shards
    assert res.new_shards == 1
    t = t.refresh()
    snap = t.snapshot()
    assert snap.operation == "rewrite-manifests"
    assert len(snap.manifests) == 1
    after_files = {f.path: f.to_dict() for f in t.files()}
    assert after_files == before_files  # identical entries, new layout
    assert t.scan().count() == before_rows
    # totals carried from parent summary
    assert snap.summary["total-rows"] == before_rows
    assert snap.summary["added-files"] == 0

    # idempotence: a second rewrite is a no-op
    res2 = rewrite_manifests(t, target_entries=1000)
    assert res2.skipped


def test_distributed_rewrite_parity(spark, tmp_path):
    t = _many_commit_table(spark, tmp_path / "tbl", n_commits=5)
    before = {f.path: f.to_dict() for f in t.files()}
    res = rewrite_manifests(t, target_entries=4, distributed=True)
    assert not res.skipped
    t = t.refresh()
    assert len(t.snapshot().manifests) == res.new_shards
    got = {f.path: f.to_dict() for f in t.files()}
    assert got == before
    # target respected (+/- range-partition imbalance)
    assert all(
        len(t._read_manifest(m)) <= 8 for m in t.snapshot().manifests
    )


def test_rewrite_respects_target_sharding(spark, tmp_path):
    t = _many_commit_table(spark, tmp_path / "tbl", n_commits=4)
    n_files = len(t.files())
    res = rewrite_manifests(t, target_entries=3, distributed=False)
    t = t.refresh()
    assert res.new_shards == -(-n_files // 3)
    for m in t.snapshot().manifests:
        assert len(t._read_manifest(m)) <= 3


def test_conflict_cleans_up_new_shards(spark, tmp_path):
    t = _many_commit_table(spark, tmp_path / "tbl", n_commits=4)
    stale = Table.load(spark, t.root)
    # someone commits after `stale` loaded
    t.append(generate_sequences(spark, 60, seed=999).repartition(1))
    shards_before = set(stale.io.list(stale.abs_path("manifests")))
    with pytest.raises(CommitConflict):
        rewrite_manifests(stale, target_entries=1000, distributed=False)
    shards_after = set(stale.io.list(stale.abs_path("manifests")))
    assert shards_after == shards_before  # speculative shards removed


def test_old_snapshots_still_readable_then_expire_gc(spark, tmp_path):
    from olake_spark.operators.expire import expire_snapshots

    t = _many_commit_table(spark, tmp_path / "tbl", n_commits=4)
    old_sid = t.current_snapshot_id
    old_count = t.scan().count()
    rewrite_manifests(t, target_entries=1000, distributed=False)
    t = t.refresh()
    # time travel across the rewrite still works
    assert t.scan(snapshot_id=old_sid).count() == old_count
    # expiry reclaims the obsolete shard files once history is dropped
    expire_snapshots(t, keep_last=1, orphan_grace_ms=0)
    t = t.refresh()
    live = set(t.snapshot().manifests)
    on_disk = {
        f"manifests/{n}" for n in t.io.list(t.abs_path("manifests"))
    }
    assert on_disk == live


def test_maintain_cli_verb(spark, tmp_path, capsys):
    from olake_spark.cli import main as cli_main

    t = _many_commit_table(spark, tmp_path / "tbl", n_commits=4)
    rc = cli_main(
        ["maintain", "--dest", t.root, "--op", "rewrite-manifests"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert '"op": "rewrite-manifests"' in out
    t = t.refresh()
    assert t.snapshot().operation == "rewrite-manifests"
