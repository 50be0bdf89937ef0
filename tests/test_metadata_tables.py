"""Metadata tables (table/metadata_tables.py): snapshots/history/refs/
files/delete_files/manifests/partitions DataFrames — parity against the
driver-side Table accessors they mirror."""

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.deletes import delete_where
from olake_spark.table import Table
from olake_spark.table.metadata_tables import (
    METADATA_KINDS,
    metadata_df,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("meta_tbl")
    t = Table.create(spark, str(root / "tbl"))
    df = generate_sequences(spark, 800, seed=11, max_tok=32)
    t.append(df.repartition(6))
    t.append(
        generate_sequences(spark, 200, seed=12, max_tok=32).repartition(2)
    )
    t.set_ref("v1", ref_type="tag")
    # datagen clips n_tok to [8, max_tok]; pick predicates that match
    delete_where(t, F.col("n_tok") <= 16, mode="pos")
    delete_where(t, F.col("doc_id").endswith("7"), mode="eq")
    return t.refresh()


def test_snapshots_table(spark, table):
    sdf = metadata_df(table, "snapshots")
    rows = {r.snapshot_id: r for r in sdf.collect()}
    assert set(rows) == {s.snapshot_id for s in table.snapshots()}
    cur = rows[table.current_snapshot_id]
    assert cur.operation == "delete"
    assert cur.summary["total-rows"] == str(table.total_rows())
    # parent chain is intact and timestamps are monotone along it
    assert rows[cur.snapshot_id].parent_id in rows


def test_history_ancestor_flag(spark, table):
    hist = {r.snapshot_id: r for r in metadata_df(table, "history").collect()}
    # every snapshot in this linear table is a current ancestor
    assert all(r.is_current_ancestor for r in hist.values())
    made = [r.made_current_at for r in sorted(hist.values(), key=lambda r: r.snapshot_id)]
    assert made == sorted(made)


def test_refs_table_includes_main(spark, table):
    refs = {r.name: r for r in metadata_df(table, "refs").collect()}
    assert refs["v1"].type == "tag"
    assert refs["main"].type == "branch"
    assert refs["main"].snapshot_id == table.current_snapshot_id


def test_files_parity_with_driver_accessor(spark, table):
    fdf = metadata_df(table, "files")
    got = {r.file_path: r for r in fdf.collect()}
    want = {f.path: f for f in table.files()}
    assert set(got) == set(want)
    for p, f in want.items():
        r = got[p]
        assert r.record_count == f.record_count
        assert r.file_size_in_bytes == f.file_size_bytes
        assert r.content == "data"
        assert r.sequence_number == f.sequence_number
        st = f.stats.get("doc_id", {})
        if st.get("min") is not None:
            assert r.lower_bounds["doc_id"] == str(st["min"])
            assert r.upper_bounds["doc_id"] == str(st["max"])


def test_delete_files_content_kinds(spark, table):
    ddf = metadata_df(table, "delete_files")
    got = {r.file_path: r.content for r in ddf.collect()}
    want = {f.path: f.content for f in table.delete_files()}
    assert got == want
    assert set(want.values()) == {"pos-deletes", "eq-deletes"}


def test_manifests_and_partitions(spark, table):
    snap = table.snapshot()
    mrows = metadata_df(table, "manifests").collect()
    assert {r.path for r in mrows if r.kind == "data"} == set(snap.manifests)
    assert {r.path for r in mrows if r.kind == "delete"} == set(
        snap.delete_manifests
    )
    assert all(r.length > 0 and r.snapshot_id == snap.snapshot_id for r in mrows)

    prow = {
        r.partition: r for r in metadata_df(table, "partitions").collect()
    }
    files = table.files()
    for part, r in prow.items():
        fs = [f for f in files if f.partition == part]
        assert r.file_count == len(fs)
        assert r.record_count == sum(f.record_count for f in fs)


def test_metadata_time_travel_and_bad_kind(spark, table):
    first = min(s.snapshot_id for s in table.snapshots())
    old = metadata_df(table, "files", snapshot_id=first)
    assert old.count() == len(table.files(first))
    with pytest.raises(ValueError, match="unknown metadata kind"):
        metadata_df(table, "nope")
    assert set(METADATA_KINDS) >= {"snapshots", "files", "partitions"}


def test_schemas_table_shows_ddl_lineage(spark, tmp_path_factory):
    from olake_spark.datagen import generate_sequences

    root = tmp_path_factory.mktemp("meta_schemas")
    t = Table.create(spark, str(root / "tbl"))
    t.append(generate_sequences(spark, 100, seed=3, max_tok=16))
    t.rename_column("tokens", "toks")
    t.add_column("grade", "double")
    rows = metadata_df(t, "schemas").collect()
    by_sid = {}
    for r in rows:
        by_sid.setdefault(r.schema_id, {})[r.name] = (r.field_id, r.is_current)
    # rename keeps the field id across versions
    assert by_sid[0]["tokens"][0] == by_sid[2]["toks"][0]
    # only the latest schema is current
    assert all(c for _, c in by_sid[2].values())
    assert not any(c for _, c in by_sid[0].values())
    assert "grade" in by_sid[2] and "grade" not in by_sid[0]
    # datasource surface agrees
    spark.dataSource.register(__import__(
        "olake_spark.sources.datasource", fromlist=["OlakeDataSource"]
    ).OlakeDataSource)
    d = (spark.read.format("olake").option("metadata", "schemas")
         .load(t.root))
    assert sorted(map(tuple, d.collect())) == sorted(map(tuple, rows))
