"""Deletion vectors (Iceberg v3 / Delta DV shape): packed position
bitmaps, one row per covered data file, applied at scan time as an
O(files) join + bit test instead of an O(deleted-rows) anti-join.

The reference has no table format at all (deletes are handed to the
destination, /root/reference/drivers/postgres/internal/cdc.go:123-131);
the DV layer is the scale path for heavy accumulated delete volume on
our own table format: 10^9 deleted positions are ~16 MB of bitmap words.
"""

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.changelog import snapshot_changes
from olake_spark.operators.compaction import compact
from olake_spark.operators.deletes import (
    delete_where,
    dv_positions_df,
    materialize_deletes,
    remove_dangling_deletes,
    write_deletion_vectors,
)
from olake_spark.table.format import (
    CONTENT_DV,
    CONTENT_POS_DELETES,
    Table,
)


def batch(spark, lo, hi, src="a", tok0=0):
    return spark.range(lo, hi).selectExpr(
        "format_string('doc-%05d', id) as doc_id",
        f"array(cast(id+{tok0} as int), cast(id+{tok0}+1 as int)) as tokens",
        "cast(2 as int) as n_tok",
        f"'{src}' as source",
    )


def visible(t, **kw):
    return {
        r.doc_id: (tuple(r.tokens), r.source)
        for r in t.scan(**kw).select("doc_id", "tokens", "source").collect()
    }


@pytest.fixture
def ltable(spark, tmp_path):
    return Table.create(spark, str(tmp_path / "ltbl"))


def _dv_rows(t):
    dvs = [d for d in t.delete_files() if d.content == CONTENT_DV]
    if not dvs:
        return []
    return (
        t.spark.read.schema("file_path string, dv array<bigint>, n_pos long")
        .parquet(*[t.abs_path(d.path) for d in dvs])
        .collect()
    )


def test_dv_repack_matches_pos_deletes(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 60).repartition(4))
    t.append(batch(spark, 60, 100, "b").repartition(3))
    delete_where(t, "doc_id >= 'doc-00010' and doc_id < 'doc-00025'")
    delete_where(t, "doc_id >= 'doc-00070' and doc_id < 'doc-00075'")
    before = visible(t)
    assert len(before) == 80
    n_pos_files = sum(
        1 for d in t.delete_files() if d.content == CONTENT_POS_DELETES
    )
    assert n_pos_files == 2

    res = write_deletion_vectors(t)
    assert res.snapshot_id is not None
    assert res.input_delete_files == 2
    # visibility is bit-identical after the repack
    assert visible(t) == before
    # ... on the distributed-planning path too
    assert (
        t.scan(distributed_planning=True).count() == 80
    )
    # only DV delete files remain, one bitmap row per covered data file
    kinds = {d.content for d in t.delete_files()}
    assert kinds == {CONTENT_DV}
    rows = _dv_rows(t)
    paths = [r.file_path for r in rows]
    assert len(paths) == len(set(paths))
    assert sum(r.n_pos for r in rows) == 20
    # every bitmap is tight: counted bits match n_pos
    for r in rows:
        assert sum(bin(w & (2**64 - 1)).count("1") for w in r.dv) == r.n_pos


def test_dv_coexists_with_new_pos_deletes_then_reconsumes(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 50).repartition(2))
    delete_where(t, "doc_id < 'doc-00005'")
    write_deletion_vectors(t)
    # new positional deletes AFTER the DV build apply independently
    delete_where(t, "doc_id >= 'doc-00045'")
    got = visible(t)
    assert len(got) == 40
    assert "doc-00004" not in got and "doc-00045" not in got
    # a second repack consumes the new pos files AND the old DV
    res = write_deletion_vectors(t)
    assert res.snapshot_id is not None
    assert {d.content for d in t.delete_files()} == {CONTENT_DV}
    rows = _dv_rows(t)
    assert len({r.file_path for r in rows}) == len(rows)
    assert sum(r.n_pos for r in rows) == 10
    assert visible(t) == got
    # nothing to do when only DVs remain
    assert write_deletion_vectors(t).snapshot_id is None


def test_dv_bit63_word_gaps_exact(spark, ltable):
    """Positions straddling word boundaries (0, 63, 64) and a far word
    gap pack and apply exactly — the sign-bit word and the zero-fill
    assembly are the two easy ways to get this wrong."""
    t = ltable
    t.append(batch(spark, 0, 200).coalesce(1))
    f = t.files()[0]
    hit = [0, 63, 64, 127, 128, 190]
    pos_df = spark.createDataFrame(
        [(f.path, p) for p in hit], "file_path string, pos long"
    )
    dels = t.write_delete_files(pos_df, CONTENT_POS_DELETES)
    t.commit("delete", added_deletes=dels)
    write_deletion_vectors(t)
    # position <-> doc ordinal via the raw positional scan
    id_by_pos = {
        r._pos: r.doc_id
        for r in t.scan(apply_deletes=False, with_position=True)
        .select("doc_id", "_pos")
        .collect()
    }
    got = visible(t)
    assert len(got) == 194
    for p in hit:
        assert id_by_pos[p] not in got
    # roundtrip: unpacking the DV returns exactly the packed positions
    dvs = [d for d in t.delete_files() if d.content == CONTENT_DV]
    back = sorted(
        r.pos for r in dv_positions_df(t, dvs).collect()
    )
    assert back == hit
    rows = _dv_rows(t)
    assert len(rows) == 1 and rows[0].n_pos == len(hit)
    # bitmap length is trimmed to the last set word
    assert len(rows[0].dv) == 190 // 64 + 1


def test_dv_maintenance_integration(spark, ltable):
    """Compaction strands a DV (outputs out-sequence it) -> dangling
    removal drops it; materialize folds DVs into data files."""
    t = ltable
    t.append(batch(spark, 0, 80).repartition(4))
    delete_where(t, "doc_id < 'doc-00008'")
    write_deletion_vectors(t)
    before = visible(t)

    compact(t, target_file_bytes=1 << 30, min_group_files=2)
    assert visible(t) == before
    # compaction rewrote every referenced data file; the DV is dangling
    assert remove_dangling_deletes(t) >= 1
    assert t.delete_files() == []
    assert visible(t) == before

    # round 2: materialize_deletes consumes the DV directly
    delete_where(t, "doc_id >= 'doc-00070'")
    write_deletion_vectors(t)
    res = materialize_deletes(t)
    assert res.removed_delete_files == 1
    assert t.delete_files() == []
    assert len(visible(t)) == 62


def test_changelog_across_dv_repack(spark, ltable):
    """A window holding (pos delete -> DV repack) must still report the
    killed rows: the consumed pos file is invisible to the shard diff,
    the DV is the only surviving record of the kills."""
    t = ltable
    t.append(batch(spark, 0, 30))
    s0 = t.current_snapshot_id
    delete_where(t, "doc_id >= 'doc-00020'")
    write_deletion_vectors(t)
    ch = snapshot_changes(t, from_snapshot_id=s0)
    by_type = {
        r.doc_id: r._change_type
        for r in ch.select("doc_id", "_change_type").collect()
    }
    assert sum(1 for v in by_type.values() if v == "delete") == 10
    assert by_type["doc-00025"] == "delete"
    assert "doc-00005" not in by_type


def test_datasource_reads_dv(spark, tmp_path):
    from olake_spark.sources.datasource import OlakeDataSource

    try:
        spark.dataSource.register(OlakeDataSource)
    except Exception:
        pass  # already registered by another test module
    root = str(tmp_path / "dstbl")
    t = Table.create(spark, root)
    t.append(batch(spark, 0, 40).repartition(2))
    delete_where(t, "doc_id >= 'doc-00030'")
    write_deletion_vectors(t)
    got = {
        r.doc_id for r in spark.read.format("olake").load(root).collect()
    }
    assert got == {f"doc-{i:05d}" for i in range(30)}
