"""CLI surface tests — the reference's four verbs (SURVEY.md §3)."""

import json
import os

from olake_spark.cli import main


def _lines(capsys):
    return [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]


def test_spec(capsys):
    assert main(["spec"]) == 0
    (msg,) = _lines(capsys)
    assert msg["type"] == "SPEC"
    assert "dest" in msg["spec"]["properties"]


def test_check_creates_and_validates(tmp_path, capsys, spark):
    dest = str(tmp_path / "dst")
    assert main(["check", "--dest", dest, "--cpus", "8"]) == 0
    (msg,) = _lines(capsys)
    assert msg["type"] == "CONNECTION_STATUS" and msg["status"] == "SUCCEEDED"


def test_discover_emits_catalog(capsys, spark):
    assert main(["discover", "--source", "/root/testdata/sf0.001", "--cpus", "8"]) == 0
    (msg,) = _lines(capsys)
    assert msg["type"] == "CATALOG"
    names = {s["name"] for s in msg["streams"]}
    assert {"lineitem", "orders", "documents"} <= names
    li = next(s for s in msg["streams"] if s["name"] == "lineitem")
    assert li["schema"]["l_orderkey"] == "bigint"


def test_sync_full_refresh_and_stats(tmp_path, capsys, spark):
    dest = str(tmp_path / "tbl")
    rc = main(
        [
            "sync",
            "--source", "/root/testdata/sf0.001/documents.parquet",
            "--dest", dest,
            "--cpus", "8",
        ]
    )
    assert rc == 0
    msgs = {m["type"]: m for m in _lines(capsys)}
    assert msgs["STATE"]["rows"] == 500
    assert msgs["RECORD_COUNT"]["total_rows"] == 500
    assert os.path.exists(os.path.join(dest, "stats.json"))
    with open(os.path.join(dest, "stats.json")) as f:
        ticks = [json.loads(ln) for ln in f]
    assert ticks and ticks[-1]["records_synced"] == 500

    # re-running a full refresh REPLACES contents — no duplication
    rc = main(
        [
            "sync",
            "--source", "/root/testdata/sf0.001/documents.parquet",
            "--dest", dest,
            "--cpus", "8",
        ]
    )
    assert rc == 0
    msgs = {m["type"]: m for m in _lines(capsys)}
    assert msgs["STATE"]["rows"] == 500
    assert msgs["RECORD_COUNT"]["total_rows"] == 500
