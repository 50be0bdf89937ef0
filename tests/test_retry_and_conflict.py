"""Retry/backoff (C4) + commit-conflict semantics: transient failure
retry, exclusive metadata-version claim, and a maintenance commit that
survives a concurrent committer by refresh-and-revalidate."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.compaction import compact
from olake_spark.plans.retry import retry_on_backoff
from olake_spark.table import Table
from olake_spark.table.format import CommitConflict


def test_retry_recovers_from_transient_failure():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("transient")
        return "ok"

    out = retry_on_backoff(
        flaky, attempts=3, base_sleep_s=0.5, sleeper=sleeps.append
    )
    assert out == "ok" and calls["n"] == 2
    assert sleeps == [0.5]  # one backoff sleep before the retry


def test_retry_exhausts_and_reraises():
    def always():
        raise ValueError("permanent")

    sleeps: list[float] = []
    with pytest.raises(ValueError, match="permanent"):
        retry_on_backoff(always, attempts=3, base_sleep_s=1.0, sleeper=sleeps.append)
    assert sleeps == [1.0, 2.0]  # exponential


def test_retry_does_not_catch_other_exceptions():
    def boom():
        raise KeyError("not-retryable")

    with pytest.raises(KeyError):
        retry_on_backoff(boom, retry_on=(OSError,))


def test_version_claim_is_exclusive(tmp_path):
    """Two writers that both observed version N race to create v(N+1):
    exactly one wins, the loser gets FileExistsError (not a silent
    overwrite as with rename) — on BOTH FileIO implementations."""
    import json

    from olake_spark.table.io import FakeRemoteFileIO, LocalFileIO

    for i, io in enumerate(
        (LocalFileIO(), FakeRemoteFileIO(staging_dir=str(tmp_path / "stage")))
    ):
        path = str(tmp_path / f"v2_{i}.json")
        io.create_json(path, {"winner": 1})
        with pytest.raises(FileExistsError):
            io.create_json(path, {"winner": 2})
        with open(path) as f:
            assert json.load(f) == {"winner": 1}
    # no tmp litter left behind in the table namespace
    assert sorted(os.listdir(tmp_path)) == ["stage", "v2_0.json", "v2_1.json"]


def test_orphaned_claim_heals_on_load(spark, tmp_path, monkeypatch):
    """A committer dies after linking v{N+1}.json but before flipping
    VERSION. Without healing, every later commit loads version N, fails
    to claim the existing v{N+1}.json, and raises CommitConflict forever.
    Table.load must adopt the (complete, fsynced) orphaned claim, repair
    the pointer, and let the table make progress."""
    import json

    import olake_spark.table.format as fmt

    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(generate_sequences(spark, 100, seed=1, max_tok=16))

    orig = t.io.put_text

    def dying(path, text):
        if path.endswith("VERSION"):
            raise RuntimeError("power cut")
        orig(path, text)

    monkeypatch.setattr(t.io, "put_text", dying)
    extra = generate_sequences(spark, 30, seed=2, max_tok=16).withColumn(
        "doc_id", F.concat(F.lit("yy-"), F.col("doc_id"))
    )
    with pytest.raises(RuntimeError, match="power cut"):
        t.append(extra)
    monkeypatch.undo()

    # on-disk state is the wedge: claim exists, pointer is stale
    with open(os.path.join(t.root, "VERSION")) as f:
        stale = int(f.read().strip())
    assert os.path.exists(
        os.path.join(t.root, "metadata", f"v{stale + 1}.json")
    )

    healed = Table.load(spark, t.root)
    assert healed.version == stale + 1  # orphan adopted
    with open(os.path.join(t.root, "VERSION")) as f:
        assert int(f.read().strip()) == stale + 1  # pointer repaired
    assert healed.scan().count() == 130  # the dying commit's rows are in
    # and the table is not wedged: the next commit succeeds
    healed.append(
        generate_sequences(spark, 10, seed=3, max_tok=16).withColumn(
            "doc_id", F.concat(F.lit("zz-"), F.col("doc_id"))
        )
    )
    assert Table.load(spark, t.root).scan().count() == 140
    # metadata chain is contiguous json
    with open(os.path.join(t.root, "metadata", f"v{stale + 2}.json")) as f:
        json.load(f)


def test_commit_retries_past_concurrent_append(spark, tmp_path, monkeypatch):
    """A concurrent append lands between compaction's refresh and commit:
    the first commit attempt raises CommitConflict, the retry refreshes,
    re-validates inputs are still live, and succeeds — final table holds
    the compacted outputs PLUS the concurrently appended rows."""
    df = generate_sequences(spark, 800, seed=3, max_tok=32)
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(df.repartition(10))
    extra = generate_sequences(spark, 50, seed=99, max_tok=32).withColumn(
        "doc_id", F.concat(F.lit("xx-"), F.col("doc_id"))
    )

    orig_commit = Table.commit
    state = {"raced": False}

    def racing_commit(self, *a, **kw):
        if not state["raced"] and kw.get("summary_extra", {}).get("kind") == "compaction":
            state["raced"] = True
            rival = Table.load(spark, self.root)
            orig_commit(
                rival, "append", added=rival.write_data_files(extra.repartition(1))
            )
        return orig_commit(self, *a, **kw)

    monkeypatch.setattr(Table, "commit", racing_commit)
    res = compact(t, target_file_bytes=1 << 20)
    assert state["raced"]
    assert res.snapshot_id == t.refresh().current_snapshot_id
    assert t.scan().count() == 850  # compacted 800 + raced-in 50


def test_merge_commit_survives_concurrent_nonoverlapping_append(spark, tmp_path):
    """Serializable-MERGE validation: a concurrent append whose doc_id
    range cannot contain any change key is NOT a conflict — the merge
    commit retries and lands; an overlapping append or a rewrite of the
    merge's inputs forces a recompute."""
    import pytest
    from pyspark.sql import functions as F

    from olake_spark.datagen import generate_sequences
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.merge import commit_merge, merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.table import Table

    root = str(tmp_path / "race")
    t = Table.create(spark, root)
    df = generate_sequences(spark, 500, seed=6, max_tok=16)
    t.append(df.repartition(4))
    compact(t, target_file_bytes=1 << 20)
    planned = t.current_snapshot_id
    files = t.files()

    # stage a rewrite the way merge does: rewrite one touched file's rows
    touched = [files[0]]
    outputs = t.write_data_files(
        t.scan(files=touched).repartition(1).sortWithinPartitions("doc_id")
    )
    ids = sorted(
        r.doc_id for r in t.scan(files=touched).select("doc_id").limit(5).collect()
    )

    # concurrent append with keys far outside the change-id range
    other = Table.load(spark, root)
    extra = spark.createDataFrame(
        [("zzz-outside-1", [1], 1, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    from olake_spark.schema import with_system_columns

    other.append(with_system_columns(extra).repartition(1))

    snap = commit_merge(t, planned, touched, outputs, ids, {"kind": "merge"})
    assert snap == t.current_snapshot_id
    # rewrite landed: touched file gone, its rewritten rows + append present
    assert t.scan().count() == 501

    # overlapping concurrent append -> recompute required
    planned2 = t.current_snapshot_id
    touched2 = [f for f in t.files() if f.path != touched[0].path][:1]
    outputs2 = t.write_data_files(
        t.scan(files=touched2).repartition(1).sortWithinPartitions("doc_id")
    )
    clash = with_system_columns(
        spark.createDataFrame(
            [(ids[0], [2], 1, "web")],
            "doc_id string, tokens array<int>, n_tok int, source string",
        )
    )
    Table.load(spark, root).append(clash.repartition(1))
    with pytest.raises(RuntimeError, match="matched keys"):
        commit_merge(t, planned2, touched2, outputs2, ids, {"kind": "merge"})

    # inputs rewritten concurrently -> recompute required
    t.refresh()
    planned3 = t.current_snapshot_id
    touched3 = t.files()[:1]
    outputs3 = t.write_data_files(
        t.scan(files=touched3).repartition(1).sortWithinPartitions("doc_id")
    )
    compact(Table.load(spark, root), target_file_bytes=1 << 20)
    with pytest.raises(RuntimeError, match="rewritten concurrently"):
        commit_merge(t, planned3, touched3, outputs3, ids, {"kind": "merge"})


def test_merge_on_empty_table_conflicts_with_concurrent_overlap(
    spark, tmp_path, monkeypatch
):
    """Merge planned against an EMPTY table (planned snapshot None): a
    concurrent append of overlapping keys landing before the commit
    must force a recompute — snapshot(None) resolving to the current
    snapshot would otherwise void the shard diff and silently commit a
    duplicate key."""
    import olake_spark.operators.merge as m

    t = Table.create(spark, str(tmp_path / "tbl"))
    ch = generate_sequences(spark, 50, seed=1, max_tok=8)
    orig = Table.commit
    injected = {"done": False}

    def inject(self, *a, **kw):
        if (
            not injected["done"]
            and kw.get("summary_extra", {}).get("kind") == "merge"
        ):
            injected["done"] = True
            other = Table.load(spark, self.root)
            other.append(generate_sequences(spark, 50, seed=1, max_tok=8))
        return orig(self, *a, **kw)

    monkeypatch.setattr(Table, "commit", inject)
    with pytest.raises(RuntimeError, match="concurrently"):
        m.merge_into(t, ch)
    assert injected["done"]
