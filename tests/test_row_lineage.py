"""Row lineage (Iceberg v3): stable ``_row_id`` assigned on first
commit and preserved across every rewrite, plus
``_last_updated_sequence_number`` tracking the commit that last touched
each row.

Semantics under test (mirroring the v3 spec rules):
- append assigns each new file a ``first_row_id`` block; readers
  synthesize ``first_row_id + row_position`` — nothing is materialized.
- rewrites (compaction, clustering, materialize_deletes) carry RESOLVED
  ids/sequence-numbers through as materialized columns.
- CoW MERGE: updates keep the target row's id and get the merge
  commit's sequence number; inserts claim fresh ids; deletes retire ids.
- snapshot isolation: a reader pinned to an old snapshot sees the old
  lineage values.
- ``enable_row_lineage`` backfills an existing table deterministically.

The reference has no row-identity concept (its `_olake_id` is a content
hash, /root/reference/types/processing.go); lineage here follows the
public Iceberg v3 spec shape instead.
"""

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.clustering import cluster
from olake_spark.operators.compaction import compact
from olake_spark.operators.deletes import delete_where, materialize_deletes
from olake_spark.operators.merge import merge_into
from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
from olake_spark.table.format import LAST_UPDATED_SEQ, ROW_ID, Table


def batch(spark, lo, hi, src="a", tok0=0):
    return spark.range(lo, hi).selectExpr(
        "format_string('doc-%05d', id) as doc_id",
        f"array(cast(id+{tok0} as int), cast(id+{tok0}+1 as int)) as tokens",
        "cast(2 as int) as n_tok",
        f"'{src}' as source",
    )


def lineage(t, **kw):
    """doc_id -> (_row_id, _last_updated_sequence_number)."""
    return {
        r.doc_id: (r[ROW_ID], r[LAST_UPDATED_SEQ])
        for r in t.scan(with_lineage=True, **kw)
        .select("doc_id", ROW_ID, LAST_UPDATED_SEQ)
        .collect()
    }


@pytest.fixture
def ltable(spark, tmp_path):
    return Table.create(spark, str(tmp_path / "tbl"), row_lineage=True)


def test_append_assigns_unique_dense_ids(spark, ltable):
    s1 = ltable.append(batch(spark, 0, 50, "a"))
    lin = lineage(ltable)
    ids = sorted(rid for rid, _ in lin.values())
    assert ids == list(range(50))
    assert {seq for _, seq in lin.values()} == {s1}
    assert ltable.metadata["next_row_id"] == 50

    s2 = ltable.append(batch(spark, 50, 80, "b"))
    lin2 = lineage(ltable.refresh())
    assert sorted(rid for rid, _ in lin2.values()) == list(range(80))
    # first batch untouched; second batch stamped with its own commit
    for d, (rid, seq) in lin2.items():
        assert seq == (s1 if lin.get(d) else s2)
        if d in lin:
            assert rid == lin[d][0]


def test_scan_without_lineage_unchanged(spark, ltable):
    ltable.append(batch(spark, 0, 20))
    cols = ltable.scan().columns
    assert ROW_ID not in cols and LAST_UPDATED_SEQ not in cols


def test_with_lineage_requires_enabled_table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "plain"))
    t.append(batch(spark, 0, 5))
    with pytest.raises(ValueError, match="row lineage"):
        t.scan(with_lineage=True)


def test_compaction_preserves_lineage(spark, ltable):
    for k in range(4):
        ltable.append(batch(spark, 20 * k, 20 * (k + 1), "a"))
    before = lineage(ltable)
    res = compact(ltable, target_file_bytes=1 << 20)
    assert res.snapshot_id is not None
    after = lineage(ltable.refresh())
    assert after == before  # ids AND last-updated both survive
    # outputs materialized their lineage columns
    assert all(f.lineage_cols for f in ltable.files())
    # and a second rewrite of materialized files still preserves
    cluster(ltable, curve="zorder", target_file_bytes=1 << 20)
    assert lineage(ltable.refresh()) == before


def test_merge_update_keeps_id_insert_claims_fresh(spark, ltable):
    ltable.append(batch(spark, 0, 40, "a"))
    before = lineage(ltable)
    rid_before_merge = ltable.metadata["next_row_id"]

    upd = batch(spark, 5, 10, "a", tok0=100).withColumn(
        CDC_DELETED_AT, F.lit(None).cast("timestamp")
    )
    ins = batch(spark, 40, 45, "a").withColumn(
        CDC_DELETED_AT, F.lit(None).cast("timestamp")
    )
    dele = batch(spark, 0, 3, "a").withColumn(
        CDC_DELETED_AT, F.current_timestamp()
    )
    res = merge_into(
        ltable, upd.unionByName(ins).unionByName(dele),
        target_file_bytes=1 << 20,
    )
    assert (res.updated, res.inserted, res.deleted) == (5, 5, 3)
    after = lineage(ltable.refresh())

    for i in range(5, 10):  # updates: same id, new sequence number
        d = f"doc-{i:05d}"
        assert after[d][0] == before[d][0]
        assert after[d][1] == res.snapshot_id
    for i in range(10, 40):  # untouched rows in rewritten files: unchanged
        d = f"doc-{i:05d}"
        assert after[d] == before[d]
    for i in range(40, 45):  # inserts: fresh ids past the old counter
        d = f"doc-{i:05d}"
        assert after[d][0] >= rid_before_merge
        assert after[d][1] == res.snapshot_id
    dead = {f"doc-{i:05d}" for i in range(0, 3)}
    assert not dead & set(after)
    live_ids = [rid for rid, _ in after.values()]
    assert len(live_ids) == len(set(live_ids))  # never duplicated

    # snapshot isolation: pre-merge reader sees pre-merge lineage
    parent = ltable.snapshot(res.snapshot_id).parent_id
    assert lineage(ltable, snapshot_id=parent) == before


def test_materialize_deletes_preserves_ids(spark, ltable):
    ltable.append(batch(spark, 0, 30, "a"))
    before = lineage(ltable)
    delete_where(ltable, "doc_id < 'doc-00005'")
    materialize_deletes(ltable.refresh(), target_file_bytes=1 << 20)
    after = lineage(ltable.refresh())
    expect = {d: v for d, v in before.items() if d >= "doc-00005"}
    assert after == expect


def test_enable_row_lineage_backfill(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 25, "a"))
    t.append(batch(spark, 25, 40, "b"))
    sid = t.enable_row_lineage()
    assert sid is not None and t.row_lineage
    lin = lineage(t)
    assert sorted(rid for rid, _ in lin.values()) == list(range(40))
    # deterministic: files in (sequence_number, path) order — the first
    # append's rows get the lower block
    a_ids = {rid for d, (rid, _) in lin.items() if d < "doc-00025"}
    assert a_ids == set(range(25))
    # enabling twice is a no-op; the counter continues for new appends
    assert t.enable_row_lineage() is None
    t.append(batch(spark, 40, 50, "c"))
    lin2 = lineage(t.refresh())
    assert sorted(rid for rid, _ in lin2.values()) == list(range(50))


def test_distributed_planning_parity(spark, ltable):
    from olake_spark.table.manifest_df import scan_planned

    ltable.append(batch(spark, 0, 30, "a"))
    compact(ltable, target_file_bytes=1 << 20)  # mix materialized + not
    ltable.refresh().append(batch(spark, 30, 40, "b"))
    driver = lineage(ltable.refresh())
    planned = {
        r.doc_id: (r[ROW_ID], r[LAST_UPDATED_SEQ])
        for r in scan_planned(ltable, with_lineage=True)
        .select("doc_id", ROW_ID, LAST_UPDATED_SEQ)
        .collect()
    }
    assert planned == driver


def test_changelog_by_row_id(spark, ltable):
    from olake_spark.operators.changelog import CHANGE_TYPE, snapshot_changes
    from olake_spark.schema import OLAKE_ID, olake_id_expr

    s0 = ltable.append(batch(spark, 0, 30, "a"))
    base = lineage(ltable)

    # a compaction-only window moves every row but changes none:
    # identity diff must be empty
    compact(ltable, target_file_bytes=1 << 20)
    ltable.refresh()
    assert snapshot_changes(ltable, s0, key_col=ROW_ID).count() == 0
    s1 = ltable.current_snapshot_id

    upd = batch(spark, 3, 6, "a", tok0=50).withColumn(
        CDC_DELETED_AT, F.lit(None).cast("timestamp")
    )
    ins = batch(spark, 30, 32, "a").withColumn(
        CDC_DELETED_AT, F.lit(None).cast("timestamp")
    )
    dele = batch(spark, 0, 2, "a").withColumn(
        CDC_DELETED_AT, F.current_timestamp()
    )
    merge_into(
        ltable, upd.unionByName(ins).unionByName(dele),
        target_file_bytes=1 << 20,
    )
    ltable.refresh()
    rows = snapshot_changes(ltable, s1, key_col=ROW_ID).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r[CHANGE_TYPE], []).append(r)
    assert len(by_type["update"]) == 3
    assert {r[ROW_ID] for r in by_type["update"]} == {
        base[f"doc-{i:05d}"][0] for i in range(3, 6)
    }
    assert len(by_type["insert"]) == 2
    assert all(r[ROW_ID] >= 30 for r in by_type["insert"])
    assert {r[ROW_ID] for r in by_type["delete"]} == {
        base[f"doc-{i:05d}"][0] for i in range(0, 2)
    }

    # key-rewriting update (doc_id itself changes, same _row_id): the
    # content-key diff can only say delete+insert; the identity diff
    # pairs it as ONE update
    s2 = ltable.current_snapshot_id
    target_rid = lineage(ltable)["doc-00010"][0]
    cur = ltable.scan(with_lineage=True)
    mutated = (
        cur.withColumn(
            "doc_id",
            F.when(F.col("doc_id") == "doc-00010", "doc-99999").otherwise(
                F.col("doc_id")
            ),
        )
        .withColumn(OLAKE_ID, olake_id_expr("doc_id"))
        .withColumn(
            LAST_UPDATED_SEQ,
            F.when(
                F.col("doc_id") == "doc-99999", F.lit(None).cast("long")
            ).otherwise(F.col(LAST_UPDATED_SEQ)),
        )
    )
    outs = ltable.write_data_files(mutated)
    ltable.commit(
        "replace",
        added=outs,
        removed_paths={f.path for f in ltable.files()},
    )
    ident = snapshot_changes(ltable, s2, key_col=ROW_ID).collect()
    assert [r[CHANGE_TYPE] for r in ident] == ["update"]
    assert ident[0][ROW_ID] == target_rid and ident[0].doc_id == "doc-99999"
    by_key = snapshot_changes(ltable, s2).collect()
    assert sorted(r[CHANGE_TYPE] for r in by_key) == ["delete", "insert"]


def test_changelog_row_id_requires_lineage(spark, tmp_path):
    from olake_spark.operators.changelog import snapshot_changes

    t = Table.create(spark, str(tmp_path / "plain"))
    sid = t.append(batch(spark, 0, 5))
    with pytest.raises(ValueError, match="lineage"):
        snapshot_changes(t, sid, key_col=ROW_ID)


def test_cli_enable_row_lineage_and_files_view(spark, tmp_path, capsys):
    from olake_spark.cli import main
    from olake_spark.table.metadata_tables import metadata_df

    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 20))
    dest = str(tmp_path / "tbl")
    assert main(["maintain", "--dest", dest, "--op", "enable-row-lineage",
                 "--cpus", "8"]) == 0
    out = capsys.readouterr().out
    assert '"op": "enable-row-lineage"' in out and '"next_row_id": 20' in out
    # idempotent second run reports already_enabled
    assert main(["maintain", "--dest", dest, "--op", "enable-row-lineage",
                 "--cpus", "8"]) == 0
    assert '"already_enabled": true' in capsys.readouterr().out

    # files metadata view exposes the lineage fields
    t = Table.load(spark, dest)
    fv = metadata_df(t, "files").select(
        "record_count", "first_row_id", "lineage_cols"
    ).collect()
    assert all(r.first_row_id is not None and not r.lineage_cols for r in fv)
    # disjoint consecutive blocks: sorted bases == cumulative row counts
    by_base = sorted(fv, key=lambda r: r.first_row_id)
    run = 0
    for r in by_base:
        assert r.first_row_id == run
        run += r.record_count
    compact(t, target_file_bytes=1 << 20)
    fv2 = metadata_df(t.refresh(), "files").collect()
    assert all(r.lineage_cols for r in fv2)


def test_datasource_lineage_parity(spark, ltable):
    from olake_spark.operators.deletes import delete_where
    from olake_spark.sources.datasource import OlakeDataSource

    spark.dataSource.register(OlakeDataSource)
    ltable.append(batch(spark, 0, 30, "a"))
    compact(ltable, target_file_bytes=1 << 20)  # materialized lineage
    ltable.refresh().append(batch(spark, 30, 45, "b"))  # synthesized
    delete_where(ltable.refresh(), "doc_id = 'doc-00007'")  # pos-delete
    ltable.refresh()
    want = lineage(ltable)
    got = {
        r.doc_id: (r[ROW_ID], r[LAST_UPDATED_SEQ])
        for r in spark.read.format("olake")
        .option("with_lineage", "true")
        .load(ltable.root)
        .select("doc_id", ROW_ID, LAST_UPDATED_SEQ)
        .collect()
    }
    assert got == want and "doc-00007" not in got

    # without the option, materialized lineage columns never leak
    cols = spark.read.format("olake").load(ltable.root).columns
    assert ROW_ID not in cols and LAST_UPDATED_SEQ not in cols

    # non-lineage tables refuse the option with a clean error
    import pytest as _pytest

    plain_root = ltable.root + "_plain"
    t2 = Table.create(spark, plain_root)
    t2.append(batch(spark, 0, 5))
    with _pytest.raises(Exception, match="row lineage"):
        spark.read.format("olake").option("with_lineage", "true").load(
            plain_root
        ).collect()
