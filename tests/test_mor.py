"""Merge-on-read delete files (Iceberg v2 semantics): equality/positional
deletes, sequence-number applicability, MoR MERGE, delete_where,
materialize/dangling maintenance, changelog and expiry integration, and
rewrite-vs-delete conflict detection.

Reference contract: deletes arrive as ``_cdc_deleted_at``-flagged rows
(/root/reference/drivers/postgres/internal/cdc.go:123-131); the
reference defers apply semantics to the destination — here the
destination is our own table layer and MoR is the scale-correct apply
path (O(batch) per CDC batch instead of O(touched files))."""

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.changelog import snapshot_changes
from olake_spark.operators.compaction import compact
from olake_spark.operators.deletes import (
    delete_where,
    materialize_deletes,
    remove_dangling_deletes,
)
from olake_spark.operators.expire import expire_snapshots
from olake_spark.operators.merge import merge_into
from olake_spark.table.format import (
    CONTENT_EQ_DELETES,
    CONTENT_POS_DELETES,
    Table,
)
from olake_spark.schema import OLAKE_ID, olake_id_expr


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


@pytest.fixture(params=["local", "fakeremote"])
def table(spark, tmp_path, request):
    from olake_spark.table.io import FakeRemoteFileIO, LocalFileIO

    io = (
        LocalFileIO()
        if request.param == "local"
        else FakeRemoteFileIO(staging_dir=str(tmp_path / "_stage"))
    )
    yield Table.create(spark, str(tmp_path / "tbl"), io=io)
    if request.param == "fakeremote":
        assert set(io.ops) <= FakeRemoteFileIO.STORE_PRIMITIVES, io.ops


@pytest.fixture
def ltable(spark, tmp_path):
    return Table.create(spark, str(tmp_path / "ltbl"))


def test_eq_delete_sequence_semantics(spark, table):
    t = table
    t.append(batch(spark, 0, 20))
    s_pre = t.current_snapshot_id
    keys = (
        spark.createDataFrame([("doc-00003",), ("doc-00012",)], "doc_id string")
        .withColumn(OLAKE_ID, olake_id_expr("doc_id"))
        .select(OLAKE_ID, "doc_id")
    )
    dels = t.write_delete_files(keys, CONTENT_EQ_DELETES)
    assert all(d.content == CONTENT_EQ_DELETES for d in dels)
    t.commit("delete", added_deletes=dels)
    got = visible(t)
    assert len(got) == 18 and "doc-00003" not in got
    # snapshot isolation: the pre-delete snapshot still sees 20 rows
    assert len(visible(t, snapshot_id=s_pre)) == 20
    # a row re-inserted AFTER the delete out-sequences it and survives
    t.append(batch(spark, 3, 4, tok0=500))
    got = visible(t)
    assert got["doc-00003"] == ((503, 504), "a")
    # raw inspection scan ignores delete files
    assert t.scan(apply_deletes=False).count() == 21


def test_mor_merge_matches_cow(spark, tmp_path):
    t_cow = Table.create(spark, str(tmp_path / "cow"))
    t_mor = Table.create(spark, str(tmp_path / "mor"))
    for t in (t_cow, t_mor):
        t.append(batch(spark, 0, 60))
        t.append(batch(spark, 60, 100, "b"))
    upd = batch(spark, 0, 10, "a", 1000)
    ins = batch(spark, 100, 110, "c")
    dels = batch(spark, 50, 70).withColumn(
        "_cdc_deleted_at", F.current_timestamp()
    )
    changes = upd.unionByName(ins).unionByName(dels, allowMissingColumns=True)
    r_cow = merge_into(t_cow, changes, mode="cow")
    r_mor = merge_into(t_mor, changes, mode="mor")
    assert r_mor.details["mode"] == "mor"
    assert visible(t_cow) == visible(t_mor)
    # second batch on top: delete a previous insert, re-update a key
    ch2 = (
        batch(spark, 5, 6, "a", 2000)
        .unionByName(
            batch(spark, 105, 106).withColumn(
                "_cdc_deleted_at", F.current_timestamp()
            ),
            allowMissingColumns=True,
        )
    )
    merge_into(t_cow, ch2, mode="cow")
    merge_into(t_mor, ch2, mode="mor")
    assert visible(t_cow) == visible(t_mor)
    assert len(t_mor.delete_files()) >= 2


def test_mor_merge_reads_no_data(spark, ltable, monkeypatch):
    """The MoR apply path must not scan a single existing data file —
    that is its entire reason to exist."""
    t = ltable
    t.append(batch(spark, 0, 50))

    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("MoR merge must not call Table.scan")

    monkeypatch.setattr(Table, "scan", boom)
    r = merge_into(t, batch(spark, 25, 30, "a", 900), mode="mor")
    monkeypatch.undo()
    assert r.snapshot_id is not None
    assert visible(t)["doc-00025"] == ((925, 926), "a")


def test_delete_where_positional_exact_tokens(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 40).repartition(4))
    before = visible(t)
    r = delete_where(t, "doc_id >= 'doc-00010' and doc_id < 'doc-00015'")
    assert r.deleted_rows == 5
    got = visible(t)
    assert len(got) == 35
    # byte-exact token arrays for every surviving row
    assert got == {
        k: v for k, v in before.items() if not ("doc-00010" <= k < "doc-00015")
    }
    assert len(t.delete_files()) == 1
    assert t.delete_files()[0].content == CONTENT_POS_DELETES


def test_delete_where_equality(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 30))
    r = delete_where(t, "doc_id = 'doc-00007'", mode="eq")
    assert r.deleted_rows == 1
    assert "doc-00007" not in visible(t)
    # empty match commits nothing
    r2 = delete_where(t, "doc_id = 'doc-99999'", mode="eq")
    assert r2.snapshot_id is None


def test_materialize_deletes_prunes_unaffected(spark, ltable):
    t = ltable
    # two disjoint key ranges in separate files
    t.append(batch(spark, 0, 50).coalesce(1))
    t.append(batch(spark, 1000, 1050, "b").coalesce(1))
    merge_into(
        t,
        batch(spark, 10, 12).withColumn(
            "_cdc_deleted_at", F.current_timestamp()
        ),
        mode="mor",
    )
    before = visible(t)
    untouched = {
        f.path for f in t.files() if f.partition == "b" or (
            f.stats.get("doc_id", {}).get("min", "") or ""
        ).startswith("doc-01")
    }
    assert untouched
    m = materialize_deletes(t)
    assert m.removed_delete_files == 1
    assert not t.delete_files()
    assert visible(t) == before
    # the disjoint-range file was NOT rewritten (sequence+range pruning)
    assert untouched <= {f.path for f in t.files()}


def test_compaction_applies_deletes_then_dangling(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 200).repartition(8))
    merge_into(
        t,
        batch(spark, 0, 5, "a", 700).unionByName(
            batch(spark, 100, 110).withColumn(
                "_cdc_deleted_at", F.current_timestamp()
            ),
            allowMissingColumns=True,
        ),
        mode="mor",
    )
    before = visible(t)
    assert len(before) == 190
    c = compact(t, target_file_bytes=1 << 20, min_group_files=2)
    assert c.snapshot_id is not None
    assert visible(t) == before
    # every data file now out-sequences the delete file -> dangling
    nd = remove_dangling_deletes(t)
    assert nd == 1 and not t.delete_files()
    assert visible(t) == before


def test_mor_scan_correct_without_broadcast(spark, ltable):
    """The delete anti-joins fall back to shuffle joins (identical
    results) when the session broadcast cap is disabled — the cap is
    session.broadcast_cap_bytes, shared with merge's key joins."""
    from olake_spark.session import broadcast_cap_bytes

    t = ltable
    t.append(batch(spark, 0, 60).repartition(3))
    merge_into(
        t,
        batch(spark, 0, 5, "a", 500).unionByName(
            batch(spark, 40, 45).withColumn(
                "_cdc_deleted_at", F.current_timestamp()
            ),
            allowMissingColumns=True,
        ),
        mode="mor",
    )
    delete_where(t, "doc_id = 'doc-00030'")
    expect = visible(t)
    assert len(expect) == 54
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert broadcast_cap_bytes(spark) == 0
        assert visible(t) == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # size-string parsing of the shared cap
    for raw, want in (
        ("64m", 64 << 20), ("10MB", 10 << 20), ("1048576b", 1 << 20),
        ("1t", 1 << 40), ("2g", 2 << 30), ("512", 512),
    ):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
        try:
            assert broadcast_cap_bytes(spark) == want, raw
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_remove_dangling_pos_deletes_single_pass(spark, ltable, monkeypatch):
    """N positional delete files are classified dangling/applying in ONE
    batched read (was a per-delete-file job loop — O(N) driver-scheduled
    jobs at 10^4 accumulated delete files)."""
    t = ltable
    t.append(batch(spark, 0, 100).repartition(4))
    for i in range(6):
        r = delete_where(t, f"doc_id = 'doc-000{i}0'")
        assert r.deleted_rows == 1
    # rewrite strands all six (outputs out-sequence the delete files)...
    c = compact(t, target_file_bytes=1 << 20, min_group_files=2)
    assert c.snapshot_id is not None
    # ...then one more delete lands against the NEW files: still applies
    r = delete_where(t, "doc_id = 'doc-00077'")
    assert r.deleted_rows == 1
    assert len(t.delete_files()) == 7
    before = visible(t)
    assert len(before) == 93

    import pyspark.sql.readwriter as rw

    calls: list[int] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(len(paths))
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    nd = remove_dangling_deletes(t)
    monkeypatch.setattr(rw.DataFrameReader, "parquet", orig)
    assert nd == 6
    live = t.delete_files()
    assert len(live) == 1 and live[0].content == CONTENT_POS_DELETES
    assert visible(t) == before
    # the one batched read covered all 7 pos-delete files; call count
    # must not scale with the number of delete files
    assert calls and max(calls) == 7 and len(calls) <= 2, calls


def test_changelog_sees_mor_deletes(spark, ltable):
    t = ltable
    s1 = t.append(batch(spark, 0, 50))
    merge_into(
        t,
        batch(spark, 0, 5, "a", 900)
        .unionByName(batch(spark, 50, 55, "b"))
        .unionByName(
            batch(spark, 10, 15).withColumn(
                "_cdc_deleted_at", F.current_timestamp()
            ),
            allowMissingColumns=True,
        ),
        mode="mor",
    )
    s2 = t.current_snapshot_id
    ch = {
        (r.doc_id, r._change_type)
        for r in snapshot_changes(t, s1, s2)
        .select("doc_id", "_change_type")
        .collect()
    }
    assert ch == (
        {(f"doc-{i:05d}", "update") for i in range(5)}
        | {(f"doc-{i:05d}", "insert") for i in range(50, 55)}
        | {(f"doc-{i:05d}", "delete") for i in range(10, 15)}
    )
    # positional delete shows as delete too
    delete_where(t, "doc_id = 'doc-00020'")
    ch2 = {
        (r.doc_id, r._change_type)
        for r in snapshot_changes(t, s2, t.current_snapshot_id)
        .select("doc_id", "_change_type")
        .collect()
    }
    assert ch2 == {("doc-00020", "delete")}


def test_expire_keeps_live_delete_files(spark, table):
    t = table
    t.append(batch(spark, 0, 30))
    merge_into(
        t,
        batch(spark, 3, 6).withColumn(
            "_cdc_deleted_at", F.current_timestamp()
        ),
        mode="mor",
    )
    delete_where(t, "doc_id = 'doc-00010'")
    for i in range(3):
        t.append(batch(spark, 100 + i, 101 + i, "z"))
    before = visible(t)
    res = expire_snapshots(t, keep_last=2, orphan_grace_ms=0)
    assert res.expired_snapshots
    t.refresh()
    assert visible(t) == before
    assert len(t.delete_files()) == 2
    # the delete parquet files themselves survived orphan GC
    for d in t.delete_files():
        assert t.io.exists(t.abs_path(d.path))


def test_overwrite_drops_delete_files(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 20))
    delete_where(t, "doc_id = 'doc-00001'", mode="eq")
    assert t.delete_files()
    t.overwrite(batch(spark, 0, 5, "n"))
    assert not t.delete_files()
    assert len(visible(t)) == 5


def test_scan_planned_parity_with_deletes(spark, ltable):
    t = ltable
    t.append(batch(spark, 0, 80).repartition(4))
    merge_into(
        t,
        batch(spark, 0, 3, "a", 800).unionByName(
            batch(spark, 40, 45).withColumn(
                "_cdc_deleted_at", F.current_timestamp()
            ),
            allowMissingColumns=True,
        ),
        mode="mor",
    )
    delete_where(t, "doc_id = 'doc-00060'")
    driver = visible(t)
    dist = {
        r.doc_id: (tuple(r.tokens), r.source)
        for r in t.scan(distributed_planning=True)
        .select("doc_id", "tokens", "source")
        .collect()
    }
    assert driver == dist
    # predicate path too
    a = sorted(
        r.doc_id
        for r in t.scan(doc_id_range=("doc-00000", "doc-00050"))
        .select("doc_id")
        .collect()
    )
    b = sorted(
        r.doc_id
        for r in t.scan(
            doc_id_range=("doc-00000", "doc-00050"), distributed_planning=True
        )
        .select("doc_id")
        .collect()
    )
    assert a == b and "doc-00040" not in a


def test_rewrite_conflicts_with_concurrent_delete(spark, tmp_path):
    """A delete file landing between a compaction's planning and its
    commit must force a recompute: the compaction outputs would
    out-sequence the delete and resurrect its rows."""
    root = str(tmp_path / "cc")
    t = Table.create(spark, root)
    t.append(batch(spark, 0, 100).repartition(6))
    t2 = Table.load(spark, root)
    fired = {"n": 0}
    orig = t.write_data_files

    def hooked(df, max_records_per_file=None):
        out = orig(df, max_records_per_file)
        if fired["n"] == 0:
            fired["n"] = 1
            delete_where(t2, "doc_id = 'doc-00001'", mode="eq")
        return out

    t.write_data_files = hooked
    with pytest.raises(RuntimeError, match="row-level deletes landed"):
        compact(t, target_file_bytes=1 << 20, min_group_files=2)
    # rerun against the new snapshot succeeds and preserves the delete
    t.refresh()
    t.write_data_files = orig
    compact(t, target_file_bytes=1 << 20, min_group_files=2)
    assert "doc-00001" not in visible(t)


def test_pos_delete_conflicts_with_concurrent_rewrite(spark, tmp_path):
    """The mirror race: a compaction committing between a positional
    delete's scan and its commit strands the recorded (file, pos)
    coordinates — delete_where must refuse rather than silently no-op."""
    root = str(tmp_path / "pc")
    t = Table.create(spark, root)
    t.append(batch(spark, 0, 100).repartition(6))
    t2 = Table.load(spark, root)
    orig = t.write_delete_files
    fired = {"n": 0}

    def hooked(df, content, stats_cols=None):
        out = orig(df, content, stats_cols)
        if fired["n"] == 0:
            fired["n"] = 1
            compact(t2, target_file_bytes=1 << 20, min_group_files=2)
        return out

    t.write_delete_files = hooked
    with pytest.raises(RuntimeError, match="rewritten concurrently"):
        delete_where(t, "doc_id = 'doc-00002'")
    t.refresh()
    t.write_delete_files = orig
    delete_where(t, "doc_id = 'doc-00002'")
    assert "doc-00002" not in visible(t)


def test_rewrite_position_deletes_compacts_and_drops_dangling(spark, ltable):
    """Many small positional-delete files -> few, with refs to rewritten
    (no-longer-live) data files dropped, rows visible unchanged, and no
    spurious changelog rows across the metadata-only rewrite."""
    from olake_spark.operators.deletes import rewrite_position_deletes

    t = ltable
    t.append(batch(spark, 0, 60, "a").repartition(2))
    t.append(batch(spark, 100, 160, "b").repartition(2))
    for lo in (5, 15):
        assert delete_where(t, f"doc_id = 'doc-{lo:05d}'").deleted_rows == 1
    for lo in (105, 115):
        assert delete_where(t, f"doc_id = 'doc-{lo:05d}'").deleted_rows == 1
    assert len(t.delete_files()) == 4
    before = visible(t)
    assert len(before) == 116

    # compacting partition 'a' APPLIES its deletes and strands the refs
    c = compact(t, target_file_bytes=1 << 20, min_group_files=2, sources=["a"])
    assert c.snapshot_id is not None
    pre = t.refresh().current_snapshot_id

    r = rewrite_position_deletes(t, target_file_bytes=1 << 20)
    assert r.snapshot_id is not None
    assert r.input_delete_files == 4 and r.output_delete_files == 1
    assert r.dropped_dangling_refs == 2  # the two 'a' refs died in compact
    live = t.delete_files()
    assert len(live) == 1 and live[0].content == CONTENT_POS_DELETES
    assert visible(t) == before
    # pure delete-file reshuffle: the changelog across it is empty
    assert snapshot_changes(t, pre).count() == 0
    # idempotent below the input threshold
    r2 = rewrite_position_deletes(t)
    assert r2.snapshot_id is None and r2.input_delete_files == 1
