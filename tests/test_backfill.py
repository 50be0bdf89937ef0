"""Chunked resumable backfill through the source-adapter interface:
exact once-per-row coverage, ledger resume after a kill, JDBC predicate
generation, and the CLI surface."""

import json
import os

import pytest
from pyspark.sql import functions as F

from olake_spark.plans.split import Chunk
from olake_spark.sources.adapter import (
    JdbcSource,
    ParquetDirSource,
    chunk_predicate_sql,
)
from olake_spark.sources.backfill import chunked_backfill
from olake_spark.table import Table

SF = "/root/testdata/sf0.001"


def _mk_table(spark, tmp_path, stream):
    # declare the stream's post-envelope schema, as cli._load_table does
    from olake_spark.cli import _ensure_doc_id
    from olake_spark.schema import with_system_columns

    probe = with_system_columns(
        _ensure_doc_id(spark.read.parquet(f"{SF}/{stream}.parquet"))
    )
    return Table.create(
        spark, str(tmp_path / "t"), schema=probe.schema,
        partition_col="doc_id", stats_columns=["doc_id", "_olake_id"],
    )


def test_chunks_cover_exactly_once_numeric(spark, tmp_path):
    src = ParquetDirSource(spark, SF)
    src.check()
    t = _mk_table(spark, tmp_path, "orders")
    res = chunked_backfill(t, src, "orders", "o_orderkey", num_chunks=6)
    want = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert res.rows == want and res.chunks >= 2
    got = t.scan()
    assert got.count() == want
    assert got.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_chunks_cover_exactly_once_string_key(spark, tmp_path):
    src = ParquetDirSource(spark, SF)
    t = _mk_table(spark, tmp_path, "customer")
    res = chunked_backfill(t, src, "customer", "c_name", num_chunks=5)
    want = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert res.rows == want
    assert t.scan().count() == want
    assert t.scan().select("c_custkey").distinct().count() == want


def test_backfill_resumes_without_rereading_done_chunks(
    spark, tmp_path, monkeypatch
):
    src = ParquetDirSource(spark, SF)
    t = _mk_table(spark, tmp_path, "orders")
    calls = {"n": 0}
    orig = Table.write_data_files

    def bomb_on_third(self, df, max_records_per_file=None):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated kill mid-backfill")
        return orig(self, df, max_records_per_file)

    monkeypatch.setattr(Table, "write_data_files", bomb_on_third)
    with pytest.raises(RuntimeError, match="simulated"):
        chunked_backfill(t, src, "orders", "o_orderkey", num_chunks=6, job_id="j1")
    done_after_kill = calls["n"] - 1  # two chunks completed

    monkeypatch.setattr(Table, "write_data_files", orig)
    # count further writes by wrapping again without the bomb
    calls2 = {"n": 0}

    def counting(self, df, max_records_per_file=None):
        calls2["n"] += 1
        return orig(self, df, max_records_per_file)

    monkeypatch.setattr(Table, "write_data_files", counting)
    res = chunked_backfill(t, src, "orders", "o_orderkey", num_chunks=6, job_id="j1")
    assert calls2["n"] == res.chunks - done_after_kill  # done chunks skipped
    want = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert res.rows == want and t.scan().count() == want


def test_timestamp_split_col(spark, tmp_path):
    """Timestamp chunk bounds must survive the ledger's json payload
    (persisted as strings; Spark coerces them back in range filters)."""
    src = ParquetDirSource(spark, SF)
    t = _mk_table(spark, tmp_path, "events")
    res = chunked_backfill(t, src, "events", "ts", num_chunks=4)
    want = spark.read.parquet(f"{SF}/events.parquet").count()
    assert res.rows == want and res.chunks >= 2
    assert t.scan().count() == want


def test_rerun_after_commit_syncs_fresh(spark, tmp_path):
    """A completed backfill must NOT make later syncs no-ops: the job id
    keys on the destination snapshot, so re-running refreshes the data
    (overwrite) instead of skipping on the old committed ledger."""
    src = ParquetDirSource(spark, SF)
    t = _mk_table(spark, tmp_path, "region")
    r1 = chunked_backfill(t, src, "region", "r_regionkey", num_chunks=2,
                          mode="overwrite")
    assert not r1.skipped and r1.rows == 5
    r2 = chunked_backfill(t, src, "region", "r_regionkey", num_chunks=2,
                          mode="overwrite")
    assert not r2.skipped and r2.rows == 5
    assert r2.snapshot_id > r1.snapshot_id
    assert t.refresh().scan().count() == 5  # replaced, not duplicated


def test_jdbc_predicates_are_half_open(spark):
    j = JdbcSource(spark, "jdbc:postgresql://example.invalid/db")
    chunks = j.plan_chunks_from_bounds(0, 99, batch_size=40)
    preds = j.chunk_predicates("id", chunks)
    assert preds == [
        "id >= 0 AND id < 40",
        "id >= 40 AND id < 80",
        "id >= 80 AND id <= 99",
    ]
    s = chunk_predicate_sql("name", Chunk("a", "m"), is_last=False)
    assert s == "name >= 'a' AND name < 'm'"


def test_jdbc_predicate_quotes_are_ansi_sql():
    """Embedded single quotes double (''), never backslash-escape: \\' is
    invalid standard SQL and unsafe as a pushed-down JDBC predicate."""
    s = chunk_predicate_sql("name", Chunk("O'Brien", "Z'ha'dum"), is_last=True)
    assert s == "name >= 'O''Brien' AND name <= 'Z''ha''dum'"
    assert "\\" not in s
    # and DuckDB (an ANSI-compliant engine) accepts + round-trips it
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        "SELECT name FROM (VALUES ('Aaron'), ('O''Brien'), ('zz')) t(name) "
        f"WHERE {s}"
    ).fetchall()
    assert [r[0] for r in rows] == ["O'Brien"]


def test_cli_sync_split_col(tmp_path, capsys, spark):
    from olake_spark.cli import main

    dest = str(tmp_path / "tbl")
    rc = main(
        [
            "sync",
            "--source", f"{SF}/orders.parquet",
            "--dest", dest,
            "--split-col", "o_orderkey",
            "--chunks", "4",
            "--cpus", "8",
        ]
    )
    assert rc == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    st = next(m for m in out if m["type"] == "STATE")
    assert st["mode"] == "full_refresh" and st["chunks"] >= 2
    assert st["rows"] == 1500
    assert os.path.exists(os.path.join(dest, "VERSION"))
