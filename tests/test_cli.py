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


def _write_catalog(path, streams, selected):
    with open(path, "w") as f:
        json.dump({"streams": streams, "selected_streams": selected}, f)


def test_sync_catalog_multi_stream(tmp_path, capsys, spark):
    """One job spec binding two streams with per-stream mode/options —
    reference selected_streams semantics (types/catalog.go:34-44)."""
    cat = str(tmp_path / "job.json")
    _write_catalog(
        cat,
        streams=[
            {"stream": {"name": "region", "namespace": "tpch",
                        "source": "/root/testdata/sf0.001/region.parquet",
                        "sync_mode": "full_refresh"}},
            {"stream": {"name": "events", "namespace": "tpch",
                        "source": "/root/testdata/sf0.001/events.parquet",
                        "sync_mode": "incremental", "cursor_field": "ts"}},
        ],
        selected={"tpch": [
            {"stream_name": "region", "partition_regex": "/r={r_regionkey,'',}"},
            {"stream_name": "events", "partition_regex": ""},
        ]},
    )
    dest = str(tmp_path / "multi")
    assert main(["sync", "--catalog", cat, "--dest", dest, "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    states = {m["stream"]: m for m in msgs if m["type"] == "STATE"}
    counts = {m["stream"]: m for m in msgs if m["type"] == "RECORD_COUNT"}
    assert set(states) == {"region", "events"}
    assert states["region"]["mode"] == "full_refresh"
    assert states["events"]["mode"] == "incremental" and states["events"]["cursor"]
    assert counts["region"]["total_rows"] == 5
    assert counts["events"]["total_rows"] == 1000
    # per-stream tables landed under dest/<name>
    assert os.path.exists(os.path.join(dest, "region", "VERSION"))
    assert os.path.exists(os.path.join(dest, "events", "VERSION"))
    # partition_regex routed region files path-pure
    from olake_spark.table import Table

    t = Table.load(spark, os.path.join(dest, "region"))
    assert {f.partition for f in t.files()} == {f"/r={i}" for i in range(5)}

    # incremental re-run with no new rows appends nothing
    assert main(["sync", "--catalog", cat, "--dest", dest, "--cpus", "8"]) == 0
    msgs2 = _lines(capsys)
    ev2 = next(m for m in msgs2 if m["type"] == "STATE" and m["stream"] == "events")
    assert ev2["rows"] == 0


def test_sync_catalog_concurrent_streams(tmp_path, capsys, spark):
    """--concurrency N runs stream groups in a bounded pool (C3);
    results identical to the sequential path."""
    cat = str(tmp_path / "job.json")
    _write_catalog(
        cat,
        streams=[
            {"stream": {"name": "nation", "namespace": "t",
                        "source": "/root/testdata/sf0.001/nation.parquet",
                        "sync_mode": "full_refresh"}},
            {"stream": {"name": "region", "namespace": "t",
                        "source": "/root/testdata/sf0.001/region.parquet",
                        "sync_mode": "full_refresh"}},
            {"stream": {"name": "supplier", "namespace": "t",
                        "source": "/root/testdata/sf0.001/supplier.parquet",
                        "sync_mode": "full_refresh"}},
        ],
        selected={"t": [{"stream_name": n, "partition_regex": ""}
                        for n in ("nation", "region", "supplier")]},
    )
    dest = str(tmp_path / "multi")
    assert main(["sync", "--catalog", cat, "--dest", dest,
                 "--concurrency", "3", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    counts = {m["stream"]: m["total_rows"]
              for m in msgs if m["type"] == "RECORD_COUNT"}
    assert counts == {"nation": 25, "region": 5, "supplier": 10}


def test_sync_catalog_validation_rejects_bad_cursor(tmp_path, capsys, spark):
    cat = str(tmp_path / "bad.json")
    _write_catalog(
        cat,
        streams=[{"stream": {"name": "events", "namespace": "t",
                             "source": "/root/testdata/sf0.001/events.parquet",
                             "sync_mode": "incremental",
                             "cursor_field": "not_a_col"}}],
        selected={"t": [{"stream_name": "events", "partition_regex": ""}]},
    )
    dest = str(tmp_path / "d")
    assert main(["sync", "--catalog", cat, "--dest", dest, "--cpus", "8"]) == 2
    msgs = _lines(capsys)
    assert any(
        m["type"] == "ERROR" and "invalid cursor field" in m["message"]
        for m in msgs
    )
    assert not os.path.exists(os.path.join(dest, "events", "VERSION"))


def test_maintain_lifecycle(tmp_path, capsys, spark):
    from olake_spark.datagen import generate_sequences
    from olake_spark.table import Table

    dest = str(tmp_path / "mt")
    t = Table.create(spark, dest)
    t.append(generate_sequences(spark, 500, seed=3, max_tok=32).repartition(10))
    s1 = t.current_snapshot_id

    for op in ("compact", "zorder"):
        assert main(["maintain", "--dest", dest, "--op", op,
                     "--cpus", "8", "--target-bytes", str(1 << 20)]) == 0
        msgs = _lines(capsys)
        assert msgs[0]["type"] == "MAINTENANCE" and msgs[0]["op"] == op
        assert not msgs[0]["skipped"] and msgs[0]["rows"] == 500
        assert msgs[-1]["total_rows"] == 500

    out = str(tmp_path / "diff")
    assert main(["maintain", "--dest", dest, "--op", "changelog",
                 "--from-snapshot", str(s1), "--out", out, "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    # compaction+clustering only: net diff is empty, cursor at current
    assert msgs[0]["changes"] == {}
    assert msgs[0]["cursor"] == t.refresh().current_snapshot_id
    assert spark.read.parquet(out).count() == 0

    assert main(["maintain", "--dest", dest, "--op", "expire",
                 "--keep-last", "1", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "expire" and msgs[0]["deleted_data_files"] > 0

    assert main(["maintain", "--dest", dest, "--op", "changelog",
                 "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    # bootstrap (no cursor): full table as inserts
    assert msgs[0]["changes"] == {"insert": 500}


def test_maintain_expire_protects_tailer_cursor(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    from olake_spark.datagen import generate_sequences
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.streaming.changelog_stream import ChangelogTailer
    from olake_spark.table import Table

    dest = str(tmp_path / "prot")
    t = Table.create(spark, dest)
    t.append(generate_sequences(spark, 200, seed=8, max_tok=16).repartition(2))
    tailer = ChangelogTailer(t)
    tailer.run(lambda d, sid: None, bounded=True)
    cursor = tailer.current_cursor()
    for _ in range(3):
        dele = (
            t.scan().select(*DATA_COLUMNS).orderBy("doc_id").limit(1)
            .withColumn(CDC_DELETED_AT, F.current_timestamp())
        )
        merge_into(t, dele)

    assert main(["maintain", "--dest", dest, "--op", "expire",
                 "--keep-last", "1", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["protected_cursor"] == [cursor]
    assert cursor not in msgs[0]["expired"]
    # the consumer still drains cleanly from its cursor
    got = []
    tailer.run(lambda d, sid: got.append(d.count()), bounded=True)
    assert got == [3]


def test_maintain_rollback_and_tag(tmp_path, capsys, spark):
    from olake_spark.datagen import generate_sequences
    from olake_spark.table import Table

    dest = str(tmp_path / "rt")
    t = Table.create(spark, dest)
    df = generate_sequences(spark, 400, seed=9, max_tok=32)
    t.append(df.limit(200).repartition(4))
    s1 = t.current_snapshot_id
    t.append(df.exceptAll(df.limit(200)).repartition(4))

    assert main(["maintain", "--dest", dest, "--op", "tag",
                 "--ref", "prod", "--to-snapshot", str(s1),
                 "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "tag" and msgs[0]["snapshot"] == s1

    assert main(["maintain", "--dest", dest, "--op", "rollback",
                 "--to-snapshot", str(s1), "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "rollback" and msgs[0]["current_snapshot"] == s1
    assert msgs[-1]["total_rows"] == 200

    # missing/invalid args fail cleanly
    assert main(["maintain", "--dest", dest, "--op", "rollback",
                 "--cpus", "8"]) == 2
    _lines(capsys)
    assert main(["maintain", "--dest", dest, "--op", "tag",
                 "--cpus", "8"]) == 2
    _lines(capsys)
    assert main(["maintain", "--dest", dest, "--op", "rollback",
                 "--to-snapshot", "99", "--cpus", "8"]) == 2


def test_maintain_evolve_partition(tmp_path, capsys, spark):
    from olake_spark.datagen import generate_sequences
    from olake_spark.table import Table

    dest = str(tmp_path / "ep")
    t = Table.create(spark, dest)
    t.append(generate_sequences(spark, 100, seed=4, max_tok=16).repartition(2))

    assert main(["maintain", "--dest", dest, "--op", "evolve-partition",
                 "--partition-col", "doc_id", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "evolve-partition"
    assert msgs[0]["partition_col"] == "doc_id"
    assert msgs[0]["spec_log"] == ["source", "doc_id"]
    assert Table.load(spark, dest).partition_col == "doc_id"

    assert main(["maintain", "--dest", dest, "--op", "evolve-partition",
                 "--cpus", "8"]) == 2
    _lines(capsys)
    assert main(["maintain", "--dest", dest, "--op", "evolve-partition",
                 "--partition-col", "nope", "--cpus", "8"]) == 2


def test_maintain_cache_manifests(tmp_path, capsys, spark):
    import os

    from olake_spark.datagen import generate_sequences
    from olake_spark.table import Table
    from olake_spark.table.manifest_df import manifest_entries_df

    dest = str(tmp_path / "cm")
    t = Table.create(spark, dest)
    t.append(generate_sequences(spark, 200, seed=5, max_tok=16).repartition(3))

    assert main(["maintain", "--dest", dest, "--op", "cache-manifests",
                 "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "cache-manifests"
    assert os.path.exists(os.path.join(msgs[0]["cache_dir"], "_SUCCESS"))
    # the cache is picked up by the planner and matches the live manifests
    t2 = Table.load(spark, dest)
    assert manifest_entries_df(t2).count() == len(t2.files())


def test_maintain_branch_and_fast_forward(tmp_path, capsys, spark):
    from olake_spark.datagen import generate_sequences
    from olake_spark.table import Table

    dest = str(tmp_path / "wap")
    t = Table.create(spark, dest)
    t.append(generate_sequences(spark, 100, seed=6, max_tok=16).repartition(2))

    assert main(["maintain", "--dest", dest, "--op", "branch",
                 "--ref", "audit", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "branch" and msgs[0]["snapshot"] == 1
    # stage a commit on the branch, then publish via the CLI
    t = Table.load(spark, dest)
    extra = generate_sequences(spark, 40, seed=7, max_tok=16)
    from pyspark.sql import functions as F
    t.append(extra.withColumn("doc_id", F.concat(F.lit("x-"), F.col("doc_id"))),
             branch="audit")
    assert Table.load(spark, dest).scan().count() == 100  # unpublished
    assert main(["maintain", "--dest", dest, "--op", "fast-forward",
                 "--ref", "audit", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "fast-forward"
    assert Table.load(spark, dest).scan().count() == 140
    assert main(["maintain", "--dest", dest, "--op", "fast-forward",
                 "--ref", "nope", "--cpus", "8"]) == 2


def test_sync_survives_source_schema_drift(tmp_path, capsys, spark):
    """A recurring sync whose source gained a column must evolve the
    table schema (reference Fields.Process) instead of crashing on the
    strict frame validation."""
    src_dir = str(tmp_path / "src")
    dest = str(tmp_path / "tbl")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base.write.parquet(os.path.join(src_dir, "docs.parquet"))
    assert main(["sync", "--source", os.path.join(src_dir, "docs.parquet"),
                 "--dest", dest, "--cpus", "8"]) == 0
    _lines(capsys)

    # source drifts: a new column appears
    from pyspark.sql import functions as F

    base.withColumn("lang_score", F.lit(0.5)).write.mode("overwrite").parquet(
        os.path.join(src_dir, "docs.parquet")
    )
    assert main(["sync", "--source", os.path.join(src_dir, "docs.parquet"),
                 "--dest", dest, "--cpus", "8"]) == 0
    msgs = {m["type"]: m for m in _lines(capsys)}
    assert msgs["STATE"]["rows"] == 500
    from olake_spark.table import Table

    t = Table.load(spark, dest)
    assert "lang_score" in [f.name for f in t.schema().fields]
    assert t.scan().where("lang_score = 0.5").count() == 500


def test_sync_drift_safe_widening_and_refusals(tmp_path, capsys, spark):
    """Safe type widenings auto-apply through the guarded DDL; vanished
    columns and unsafe retypes end as clean ERROR envelopes (rc 2), not
    tracebacks or silent table mangling."""
    from pyspark.sql import functions as F

    from olake_spark.table import Table

    src_dir = str(tmp_path / "src")
    dest = str(tmp_path / "tbl")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = os.path.join(src_dir, "docs.parquet")
    base.withColumn("views", F.lit(3).cast("int")).write.parquet(path)
    assert main(["sync", "--source", path, "--dest", dest, "--cpus", "8"]) == 0
    _lines(capsys)

    # safe widening int -> bigint: auto-promoted
    base.withColumn("views", F.lit(4).cast("bigint")).write.mode(
        "overwrite"
    ).parquet(path)
    assert main(["sync", "--source", path, "--dest", dest, "--cpus", "8"]) == 0
    _lines(capsys)
    t = Table.load(spark, dest)
    assert dict(t.scan().dtypes)["views"] == "bigint"
    assert t.scan().where("views = 4").count() == 500

    # narrower batch against the widened table: coerced, no DDL
    pre_sid = t.metadata["current_schema_id"]
    base.withColumn("views", F.lit(5).cast("int")).write.mode(
        "overwrite"
    ).parquet(path)
    assert main(["sync", "--source", path, "--dest", dest, "--cpus", "8"]) == 0
    _lines(capsys)
    t.refresh()
    assert t.metadata["current_schema_id"] == pre_sid
    assert t.scan().where("views = 5").count() == 500

    # vanished column: refused cleanly, table untouched
    base.write.mode("overwrite").parquet(path)
    assert main(["sync", "--source", path, "--dest", dest, "--cpus", "8"]) == 2
    msgs = [m for m in _lines(capsys) if m["type"] == "ERROR"]
    assert msgs and "lost columns" in msgs[0]["message"]
    assert Table.load(spark, dest).scan().where("views = 5").count() == 500

    # unsafe retype: refused through the DDL whitelist
    base.withColumn("views", F.lit("x")).write.mode("overwrite").parquet(path)
    assert main(["sync", "--source", path, "--dest", dest, "--cpus", "8"]) == 2
    msgs = [m for m in _lines(capsys) if m["type"] == "ERROR"]
    assert msgs and "safe widenings" in msgs[0]["message"]


def test_maintain_delete_file_ops(tmp_path, capsys, spark):
    from olake_spark.operators.deletes import delete_where
    from olake_spark.table import Table

    dest = str(tmp_path / "mdel")
    t = Table.create(spark, dest)
    t.append(
        spark.range(0, 100).selectExpr(
            "format_string('doc-%05d', id) as doc_id",
            "array(cast(id as int)) as tokens",
            "cast(1 as int) as n_tok",
            "'a' as source",
        ).repartition(4)
    )
    for i in (3, 13, 23):
        assert delete_where(t, f"doc_id = 'doc-000{i:02d}'").deleted_rows == 1
    n_before = t.scan().count()

    assert main(["maintain", "--dest", dest, "--op", "rewrite-pos-deletes",
                 "--cpus", "8", "--target-bytes", str(1 << 20)]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "rewrite-pos-deletes"
    assert msgs[0]["input_delete_files"] == 3
    assert msgs[0]["output_delete_files"] == 1

    assert main(["maintain", "--dest", dest, "--op",
                 "remove-dangling-deletes", "--cpus", "8"]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["removed_delete_files"] == 0  # still applying

    assert main(["maintain", "--dest", dest, "--op", "write-deletion-vectors",
                 "--cpus", "8", "--target-bytes", str(1 << 20)]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "write-deletion-vectors"
    assert msgs[0]["input_delete_files"] == 1  # the rewritten pos file
    assert msgs[0]["output_delete_files"] == 1
    t.refresh()
    assert t.scan().count() == n_before

    assert main(["maintain", "--dest", dest, "--op", "materialize-deletes",
                 "--cpus", "8", "--target-bytes", str(1 << 20)]) == 0
    msgs = _lines(capsys)
    assert msgs[0]["op"] == "materialize-deletes"
    assert msgs[0]["removed_delete_files"] == 1
    t.refresh()
    assert not t.delete_files()
    assert t.scan().count() == n_before == 97
