"""Table.cherry_pick (WAP publish onto a diverged main) and
Table.add_files (in-place parquet import): happy paths, sequence-number
re-stamping vs equality deletes, and every refusal guard."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.schema import CDC_DELETED_AT, with_system_columns
from olake_spark.table import Table


def _base_table(spark, root, rows=400, seed=1):
    t = Table.create(spark, str(root))
    t.append(generate_sequences(spark, rows, seed=seed).repartition(2))
    return t.refresh()


def test_cherry_pick_publishes_onto_diverged_main(spark, tmp_path):
    t = _base_table(spark, tmp_path / "t")
    t.set_ref("audit", ref_type="branch")
    staged = generate_sequences(spark, 150, seed=2).repartition(1)
    t.append(staged, branch="audit")
    t = t.refresh()
    staged_head = t.refs["audit"]["snapshot_id"]
    # main diverges -> fast-forward is impossible
    t.append(generate_sequences(spark, 100, seed=3).repartition(1))
    t = t.refresh()
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("audit")
    sid = t.cherry_pick(staged_head)
    t = t.refresh()
    snap = t.snapshot()
    assert snap.snapshot_id == sid and snap.operation == "cherrypick"
    assert snap.summary["cherry-picked-from"] == staged_head
    assert t.scan().count() == 400 + 100 + 150
    # replayed entries carry the NEW commit's sequence number
    new_files = {
        p: e
        for p, e in zip(
            [f.path for f in t.files()], t.files()
        )
        if e.sequence_number == sid
    }
    assert sum(e.record_count for e in new_files.values()) == 150


def test_cherry_pick_refusals(spark, tmp_path):
    from olake_spark.operators.compaction import compact

    t = _base_table(spark, tmp_path / "t")
    t.set_ref("audit", ref_type="branch")
    t.append(generate_sequences(spark, 50, seed=4).repartition(1),
             branch="audit")
    t = t.refresh()
    head = t.refs["audit"]["snapshot_id"]
    ancestor = t.current_snapshot_id
    with pytest.raises(ValueError, match="already an ancestor"):
        t.cherry_pick(ancestor)
    # publish once, then the second publish is refused (shards carried)
    t.cherry_pick(head)
    t = t.refresh()
    with pytest.raises(ValueError, match="already cherry-picked"):
        t.cherry_pick(head)
    # a rewrite snapshot (removes files) is not a pure append
    compact(t.refresh(), target_file_bytes=1 << 30)
    t = t.refresh()
    rewrite_sid = t.current_snapshot_id
    t.append(generate_sequences(spark, 30, seed=5).repartition(1))
    t = t.refresh()
    t.rollback_to(rewrite_sid)  # make rewrite non-current but known
    t = t.refresh()
    t.append(generate_sequences(spark, 10, seed=6).repartition(1))
    t = t.refresh()
    with pytest.raises(ValueError, match="not a pure append"):
        t.cherry_pick(rewrite_sid)


def test_cherry_pick_survives_interleaved_eq_deletes(spark, tmp_path):
    """Equality deletes that land on main between staging and publish
    must NOT kill the replayed rows (re-stamped sequence numbers)."""
    from olake_spark.operators.merge import merge_into

    t = _base_table(spark, tmp_path / "t", rows=300, seed=7)
    t.set_ref("audit", ref_type="branch")
    staged = generate_sequences(spark, 80, seed=8).repartition(1)
    staged_ids = {r[0] for r in staged.select("doc_id").collect()}
    t.append(staged, branch="audit")
    t = t.refresh()
    head = t.refs["audit"]["snapshot_id"]
    # main MoR-deletes keys that overlap the staged batch (same datagen
    # seed space: delete half the staged ids that also exist... the ids
    # don't exist on main yet, but the EQUALITY delete file still
    # records them — the exact hazard for a naive replay)
    doomed = sorted(staged_ids)[:40]
    del_batch = (
        staged.where(F.col("doc_id").isin(doomed))
        .withColumn(CDC_DELETED_AT, F.current_timestamp())
    )
    merge_into(t, del_batch, mode="mor")
    t = t.refresh()
    t.cherry_pick(head)
    t = t.refresh()
    got = {
        r[0]
        for r in t.scan().where(F.col("doc_id").isin(sorted(staged_ids)))
        .select("doc_id").collect()
    }
    # every staged row survives: the delete's sequence number is below
    # the replay commit's
    assert got == staged_ids


def test_add_files_imports_in_place(spark, tmp_path):
    t = _base_table(spark, tmp_path / "t", rows=200, seed=10)
    ext = with_system_columns(
        generate_sequences(spark, 120, seed=11).repartition(2)
    )
    out_dir = os.path.join(t.root, "data", "import1")
    ext.write.parquet(out_dir)
    paths = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    assert len(paths) >= 2
    before_files = t.total_files()
    sid = t.add_files(paths)
    t = t.refresh()
    snap = t.snapshot()
    assert snap.operation == "add-files" and snap.snapshot_id == sid
    assert snap.summary["imported-files"] == len(paths)
    assert t.scan().count() == 200 + 120
    assert t.total_files() == before_files + len(paths)
    # imported entries carry footer stats for pruning
    imported = [f for f in t.files() if f.path.startswith("data/import1")]
    assert all("doc_id" in f.stats for f in imported)
    # double-import refused
    with pytest.raises(ValueError, match="already registered"):
        t.add_files(paths)
    # expire keeps imported files (they are referenced, not orphans)
    from olake_spark.operators.expire import expire_snapshots

    expire_snapshots(t, keep_last=1, orphan_grace_ms=0)
    t = t.refresh()
    assert t.scan().count() == 320


def test_add_files_guards(spark, tmp_path):
    t = _base_table(spark, tmp_path / "t", rows=50, seed=12)
    # outside the root
    ext = with_system_columns(generate_sequences(spark, 10, seed=13))
    outside = str(tmp_path / "elsewhere")
    ext.write.parquet(outside)
    p_out = glob.glob(os.path.join(outside, "*.parquet"))
    with pytest.raises(ValueError, match="outside the table root"):
        t.add_files(p_out)
    # schema mismatch (missing columns)
    bare_dir = os.path.join(t.root, "data", "bare")
    generate_sequences(spark, 10, seed=14).select(
        "doc_id", "tokens", "n_tok"
    ).write.parquet(bare_dir)
    p_bare = glob.glob(os.path.join(bare_dir, "*.parquet"))
    with pytest.raises(ValueError, match="do not match the table schema"):
        t.add_files(p_bare)
    with pytest.raises(ValueError, match="no files to add"):
        t.add_files([])


def test_maintain_cli_cherry_pick_and_add_files(spark, tmp_path, capsys):
    import json

    from olake_spark.cli import main as cli_main

    t = _base_table(spark, tmp_path / "t", rows=100, seed=20)
    t.set_ref("audit", ref_type="branch")
    t.append(generate_sequences(spark, 40, seed=21).repartition(1),
             branch="audit")
    t = t.refresh()
    head = t.refs["audit"]["snapshot_id"]
    t.append(generate_sequences(spark, 30, seed=22).repartition(1))
    rc = cli_main(["maintain", "--dest", t.root, "--op", "cherry-pick",
                   "--to-snapshot", str(head)])
    assert rc == 0
    assert t.refresh().scan().count() == 170

    ext_dir = os.path.join(t.root, "data", "cli_import")
    generate_sequences(spark, 25, seed=23).repartition(1).write.parquet(
        ext_dir
    )
    rc = cli_main(["maintain", "--dest", t.root, "--op", "add-files",
                   "--files", os.path.join(ext_dir, "*.parquet")])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert any(m.get("op") == "add-files" for m in out)
    assert t.refresh().scan().count() == 195


def test_cherry_pick_across_schema_ddl(spark, tmp_path):
    """A snapshot staged under the OLD schema cherry-picks onto a main
    that renamed a column meanwhile: its entries keep their write-time
    schema_id, so the scan resolves the staged files by field id."""
    t = _base_table(spark, tmp_path / "t", rows=100, seed=40)
    t.set_ref("audit", ref_type="branch")
    t.append(generate_sequences(spark, 40, seed=41).repartition(1),
             branch="audit")
    t = t.refresh()
    head = t.refs["audit"]["snapshot_id"]
    expected = (
        t.scan(ref="audit").selectExpr("sum(size(tokens))").first()[0]
        - t.scan().selectExpr("sum(size(tokens))").first()[0]
    )
    t.rename_column("tokens", "toks")
    t.cherry_pick(head)
    out = t.refresh().scan()
    assert out.count() == 140
    assert "toks" in out.columns and "tokens" not in out.columns
    # the 40 replayed rows' token arrays survive under the new name
    base = t.scan(snapshot_id=1).selectExpr("sum(size(tokens))").first()[0]
    assert out.selectExpr("sum(size(toks))").first()[0] == base + expected
