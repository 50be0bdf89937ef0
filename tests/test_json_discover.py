"""Sample-based JSON discover: drifted/mixed types through the promotion
lattice, nested flatten, timestamp/bool coercion, and an end-to-end sync."""

import json

from pyspark.sql import types as T

from olake_spark.sources.json_discover import discover_json, read_json

LINES = [
    # int id, ts as iso string, nested props, bool flag
    {"id": 1, "ts": "2024-01-01 10:00:00", "flag": "true",
     "props": {"k": 1, "tag": "a"}, "arr": [1, 2]},
    # DRIFT: id becomes float (-> double), new column appears,
    # props.k becomes string (-> promote long|string = string)
    {"id": 2.5, "ts": "2024-02-03T04:05:06", "flag": "no",
     "props": {"k": "x", "tag": "b"}, "extra": 7},
    # nulls carry no type evidence
    {"id": None, "ts": None, "flag": None, "props": {"k": None, "tag": None}},
]


def _write(tmp_path, lines):
    p = str(tmp_path / "stream.jsonl")
    with open(p, "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    return p


def test_discover_resolves_drifted_schema(spark, tmp_path):
    p = _write(tmp_path, LINES)
    disc = discover_json(spark, p)
    got = {f.name: f.dataType for f in disc.schema.fields}
    assert got["id"] == T.DoubleType()          # long | double -> double
    assert got["ts"] == T.TimestampType()       # iso strings -> timestamp
    assert got["flag"] == T.StringType()        # 'true'/'no' stay strings
    assert got["k"] == T.StringType()           # long | string -> string
    assert got["tag"] == T.StringType()
    assert got["extra"] == T.LongType()         # late new column appended
    assert got["arr"] == T.StringType()         # arrays stringify


def test_read_applies_lattice_and_coercion(spark, tmp_path):
    p = _write(tmp_path, LINES)
    disc = discover_json(spark, p)
    rows = {r.id: r for r in read_json(spark, p, disc).collect()}
    assert rows[1.0].ts.year == 2024 and rows[1.0].ts.month == 1
    assert rows[2.5].ts.month == 2 and rows[2.5].ts.hour == 4
    assert rows[1.0].k == "1" and rows[2.5].k == "x"
    assert rows[1.0].arr == "[1,2]" or rows[1.0].arr == '["1","2"]'
    assert rows[2.5].extra == 7
    assert rows[None].ts is None and rows[None].k is None


def test_sync_from_json_source(spark, tmp_path, capsys):
    from olake_spark.cli import main
    from olake_spark.table import Table

    p = _write(tmp_path, LINES * 10)
    dest = str(tmp_path / "tbl")
    assert main(["sync", "--source", p, "--dest", dest, "--cpus", "8"]) == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    msgs = {m["type"]: m for m in out}
    assert msgs["STATE"]["rows"] == 30
    t = Table.load(spark, dest)
    assert t.total_rows() == 30
    df = t.scan()
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.filter("extra = 7").count() == 10


def test_name_collisions_resolve_to_distinct_columns(spark, tmp_path):
    """A struct child whose canon name collides with a top-level key
    must land in its own column (parent-prefixed), not an ambiguous
    duplicate."""
    lines = [
        {"id": 1, "meta": {"id": 7, "x": "a"}},
        {"id": 2, "meta": {"id": 8, "x": "b"}},
    ]
    p = _write(tmp_path, lines)
    disc = discover_json(spark, p)
    names = [f.name for f in disc.schema.fields]
    assert len(names) == len(set(names))
    assert "id" in names and "meta_id" in names and "x" in names
    rows = {r.id: r for r in read_json(spark, p, disc).collect()}
    assert rows[1].meta_id == 7 and rows[2].meta_id == 8
    assert rows[1].x == "a"
