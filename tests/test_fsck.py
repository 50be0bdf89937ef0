"""verify_table (lakehouse fsck): a healthy table across its whole
maintenance lifecycle reports clean; every seeded corruption class is
caught; the distributed path agrees with the driver path."""

import json
import os

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.compaction import compact
from olake_spark.operators.deletes import delete_where
from olake_spark.operators.fsck import verify_table
from olake_spark.operators.merge import merge_into
from olake_spark.schema import CDC_DELETED_AT
from olake_spark.table.format import Table


def batch(spark, lo, hi, src="a"):
    return spark.range(lo, hi).selectExpr(
        "format_string('doc-%05d', id) as doc_id",
        "array(cast(id as int), cast(id+1 as int)) as tokens",
        "cast(2 as int) as n_tok",
        f"'{src}' as source",
    )


@pytest.fixture
def healthy(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"), row_lineage=True)
    t.append(batch(spark, 0, 40, "a"))
    t.append(batch(spark, 40, 60, "b"))
    compact(t, target_file_bytes=1 << 20)
    upd = batch(spark, 0, 5).withColumn(
        CDC_DELETED_AT, F.lit(None).cast("timestamp")
    ).withColumn("n_tok", F.lit(1))
    merge_into(t.refresh(), upd, target_file_bytes=1 << 20)
    delete_where(t.refresh(), "doc_id = 'doc-00030'")
    return t.refresh()


def test_healthy_table_clean(healthy):
    rep = verify_table(healthy, check_footers=True, check_references=True)
    assert rep.ok, rep.errors
    assert rep.data_files > 0 and rep.delete_files == 1
    assert "row-lineage" in rep.checks and "file-footers" in rep.checks
    assert "delete-references" in rep.checks
    assert not rep.warnings


def test_detects_missing_and_resized_files(healthy):
    files = healthy.files()
    os.remove(healthy.abs_path(files[0].path))
    with open(healthy.abs_path(files[1].path), "ab") as f:
        f.write(b"junk")
    rep = verify_table(healthy)
    assert not rep.ok
    assert any("missing" in e for e in rep.errors)
    assert any("size" in e for e in rep.errors)
    # distributed path finds the same problems
    rep_d = verify_table(healthy, distributed=True)
    assert sorted(rep_d.errors) == sorted(rep.errors)


def test_detects_footer_mismatch(healthy):
    # corrupt a manifest's record_count so the footer check disagrees
    snap = healthy.snapshot()
    m = snap.manifests[0]
    ents = json.loads(open(healthy.abs_path(m)).read())
    ents[0]["record_count"] += 5
    # summary totals also drift — both findings must appear
    open(healthy.abs_path(m), "w").write(json.dumps(ents))
    healthy._manifest_cache.clear()
    rep = verify_table(healthy, check_footers=True)
    assert any("footer rows" in e for e in rep.errors)
    assert any("summary total-rows" in e or "total-rows" in e for e in rep.errors)


def test_detects_lineage_block_violations(healthy):
    assert len(healthy.files()) >= 2  # fixture guarantees multiple files
    snap = healthy.snapshot()
    # clone one file's block start onto another (possibly in a different
    # shard) -> overlap; also push one block past next_row_id
    edited = 0
    base_frid = None
    for m in snap.manifests:
        ents = json.loads(open(healthy.abs_path(m)).read())
        for e in ents:
            if base_frid is None:
                base_frid = e["first_row_id"]
            elif edited == 0:
                e["first_row_id"] = base_frid
                edited = 1
            elif edited == 1:
                e["first_row_id"] = 10**9
                edited = 2
        open(healthy.abs_path(m), "w").write(json.dumps(ents))
    healthy._manifest_cache.clear()
    rep = verify_table(healthy)
    assert any("blocks overlap" in e for e in rep.errors)
    if edited == 2:
        assert any("next_row_id" in e for e in rep.errors)


def test_detects_dangling_delete_reference(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 20))
    delete_where(t, "doc_id = 'doc-00003'")
    # compaction rewrites the data files; the pos-delete now references
    # a dropped path — a WARNING, not an error
    compact(t.refresh(), target_file_bytes=1 << 20)
    rep = verify_table(t.refresh(), check_references=True)
    assert rep.ok
    assert any("dangling" in w for w in rep.warnings)


def test_detects_unreadable_manifest_and_bad_ref(healthy):
    # corrupt ON DISK: verify_table refreshes, so in-memory edits vanish
    meta_path = healthy.abs_path(
        os.path.join("metadata", f"v{healthy.version}.json")
    )
    meta = json.loads(open(meta_path).read())
    meta.setdefault("refs", {})["ghost"] = {
        "type": "tag", "snapshot_id": 99999,
    }
    open(meta_path, "w").write(json.dumps(meta))
    snap = healthy.snapshot()
    os.remove(healthy.abs_path(snap.manifests[0]))
    healthy._manifest_cache.clear()
    rep = verify_table(healthy)
    assert any("unreadable" in e for e in rep.errors)
    assert any("ghost" in e for e in rep.errors)


def test_cli_fsck_exit_codes(spark, tmp_path, capsys):
    from olake_spark.cli import main

    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 10))
    dest = str(tmp_path / "tbl")
    assert main(["maintain", "--dest", dest, "--op", "fsck",
                 "--cpus", "8"]) == 0
    assert '"ok": true' in capsys.readouterr().out
    os.remove(t.abs_path(t.files()[0].path))
    assert main(["maintain", "--dest", dest, "--op", "fsck",
                 "--cpus", "8"]) == 3
    assert '"ok": false' in capsys.readouterr().out
