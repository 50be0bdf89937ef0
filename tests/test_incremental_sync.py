"""Incremental sync verb — cursor-based append (declared but
unimplemented in the reference, README.md:42; cursor filter shape
pkg/jdbc/jdbc.go:14-16)."""

import json
import os

from olake_spark.cli import main


def _lines(capsys):
    return [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]


def test_incremental_sync_advances_cursor(tmp_path, capsys, spark):
    src_dir = tmp_path / "src"
    dest = str(tmp_path / "tbl")

    df1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "seq int, name string, v double"
    )
    df1.coalesce(1).write.parquet(str(src_dir / "t.parquet"))
    rc = main(
        ["sync", "--mode", "incremental", "--source", str(src_dir / "t.parquet"),
         "--dest", dest, "--cursor-col", "seq", "--cpus", "8"]
    )
    assert rc == 0
    msgs = {m["type"]: m for m in _lines(capsys)}
    assert msgs["STATE"]["rows"] == 2 and msgs["STATE"]["cursor"] == "2"

    # grow the source; only rows past the cursor are appended
    df2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "seq int, name string, v double",
    )
    df2.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "t.parquet"))
    rc = main(
        ["sync", "--mode", "incremental", "--source", str(src_dir / "t.parquet"),
         "--dest", dest, "--cursor-col", "seq", "--cpus", "8"]
    )
    assert rc == 0
    msgs = {m["type"]: m for m in _lines(capsys)}
    assert msgs["STATE"]["rows"] == 2  # only seq 3,4
    assert msgs["STATE"]["cursor"] == "4"
    assert msgs["RECORD_COUNT"]["total_rows"] == 4

    # a third run with nothing new is a no-op (no new snapshot)
    rc = main(
        ["sync", "--mode", "incremental", "--source", str(src_dir / "t.parquet"),
         "--dest", dest, "--cursor-col", "seq", "--cpus", "8"]
    )
    msgs = {m["type"]: m for m in _lines(capsys)}
    assert msgs["STATE"]["rows"] == 0
    assert msgs["RECORD_COUNT"]["total_rows"] == 4
    assert os.path.exists(os.path.join(dest, "jobs", "incremental-cursor.json"))


def test_incremental_requires_cursor_col(capsys):
    rc = main(["sync", "--mode", "incremental", "--source", "x", "--dest", "y"])
    assert rc == 2
    (msg,) = _lines(capsys)
    assert "cursor-col" in msg["message"]
