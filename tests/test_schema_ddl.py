"""Metadata-only schema DDL (Iceberg UpdateSchema): add / rename /
drop column with field-id lineage — no data file is ever rewritten,
renames resolve by field id on every read path (Table.scan driver and
distributed planning, the Arrow datasource), and a dropped-then-re-added
name reads NULL instead of resurrecting old values."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.table import Table


def _olake_reader(spark, root):
    from olake_spark.sources.datasource import OlakeDataSource

    spark.dataSource.register(OlakeDataSource)
    return spark.read.format("olake").load(root)


@pytest.fixture()
def table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    df = generate_sequences(spark, 300, seed=5, max_tok=32)
    t.append(df.repartition(3))
    return t


def _paths(t):
    return sorted(f.path for f in t.files())


def test_add_column_metadata_only(table):
    pre = _paths(table)
    pre_snap = table.current_snapshot_id
    table.add_column("grade", "double")
    assert _paths(table) == pre  # zero rewrite
    out = table.scan()
    assert "grade" in out.columns
    assert out.where("grade is not null").count() == 0
    # snapshot pinned before the DDL doesn't see the column
    assert "grade" not in table.scan(snapshot_id=pre_snap).columns


def test_add_column_duplicate_refused(table):
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("tokens", "string")


def test_rename_reads_old_files_under_new_name(table):
    expected = table.scan().selectExpr("sum(size(tokens))").first()[0]
    pre = _paths(table)
    pre_snap = table.current_snapshot_id
    table.rename_column("tokens", "toks")
    assert _paths(table) == pre  # zero rewrite
    out = table.scan()
    assert "toks" in out.columns and "tokens" not in out.columns
    assert out.selectExpr("sum(size(toks))").first()[0] == expected
    # time travel: the pre-DDL snapshot still scans the old name
    assert "tokens" in table.scan(snapshot_id=pre_snap).columns


def test_mixed_schema_append_after_rename(table, spark):
    table.add_column("grade", "double")
    table.append(
        generate_sequences(spark, 100, seed=6, max_tok=16).withColumn(
            "grade", F.lit(2.5)
        )
    )
    table.rename_column("grade", "score")
    out = table.scan()
    assert out.count() == 400
    assert out.where("score = 2.5").count() == 100
    assert out.where("score is null").count() == 300


def test_drop_then_readd_does_not_resurrect(table, spark):
    table.add_column("grade", "double")
    table.append(
        generate_sequences(spark, 80, seed=7, max_tok=16).withColumn(
            "grade", F.lit(9.0)
        )
    )
    assert table.scan().where("grade = 9.0").count() == 80
    table.drop_column("grade")
    assert "grade" not in table.scan().columns
    table.add_column("grade", "double")
    # the 80 rows were written under the OLD field id — they must NOT
    # leak back through the name match
    assert table.scan().where("grade is not null").count() == 0


def test_ddl_guards(table):
    for fn, args, msg in [
        (table.rename_column, ("doc_id", "x"), "pruning"),
        (table.rename_column, ("n_tok", "x"), "pruning"),
        (table.drop_column, ("source",), "partition"),
        (table.rename_column, ("_olake_id", "x"), "system"),
        (table.drop_column, ("_cdc_deleted_at",), "system"),
    ]:
        with pytest.raises(ValueError, match=msg):
            fn(*args)
    with pytest.raises(KeyError):
        table.rename_column("nope", "x")
    with pytest.raises(KeyError):
        table.drop_column("nope")


def test_append_refuses_stale_named_frame(table, spark):
    """A frame built before a rename must be rejected, not silently
    written with a schema_id whose column names it doesn't carry."""
    table.rename_column("tokens", "toks")
    with pytest.raises(ValueError, match="do not match the table schema"):
        table.append(generate_sequences(spark, 10, seed=8, max_tok=16))


def test_distributed_planning_parity_after_ddl(table, spark):
    table.rename_column("tokens", "toks")
    table.append(
        generate_sequences(spark, 50, seed=8, max_tok=16)
        .withColumnRenamed("tokens", "toks")
    )
    a = table.scan(distributed_planning=True)
    b = table.scan(distributed_planning=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_datasource_read_honors_rename(table, spark):
    expected = table.scan().selectExpr("sum(size(tokens))").first()[0]
    table.rename_column("tokens", "toks")
    df = _olake_reader(spark, table.root)
    assert "toks" in df.columns and "tokens" not in df.columns
    assert df.selectExpr("sum(size(toks))").first()[0] == expected
    assert df.count() == 300


def test_datasource_no_resurrection(table, spark):
    table.add_column("grade", "double")
    table.append(
        generate_sequences(spark, 60, seed=9, max_tok=16).withColumn(
            "grade", F.lit(4.0)
        )
    )
    table.drop_column("grade")
    table.add_column("grade", "double")
    df = _olake_reader(spark, table.root)
    assert df.where("grade is not null").count() == 0


def test_maintenance_rewrites_old_schema_files(table, spark):
    """Compaction reads renamed columns by field id and rewrites files
    under the CURRENT schema — after it, storage converges."""
    from olake_spark.operators.compaction import compact

    expected = table.scan().selectExpr("sum(size(tokens))").first()[0]
    table.rename_column("tokens", "toks")
    compact(table, target_file_bytes=8 * 1024 * 1024)
    table.refresh()
    out = table.scan()
    assert out.selectExpr("sum(size(toks))").first()[0] == expected
    sid = table.metadata["current_schema_id"]
    assert all(f.schema_id == sid for f in table.files())


def test_legacy_drift_tables_unaffected(table, spark):
    """Tables evolved only through drift appends (commit(new_schema=))
    derive field ids by name — behavior identical to pre-DDL engine."""
    from pyspark.sql import types as T

    new_schema = T.StructType(
        list(table.schema().fields) + [T.StructField("extra", T.StringType())]
    )
    table.commit("schema-change", new_schema=new_schema)
    out = table.scan()
    assert "extra" in out.columns
    assert out.where("extra is not null").count() == 0
    # field ids derived lazily: names keep their ids across schemas
    ids0 = table._field_ids(0)
    ids1 = table._field_ids(1)
    assert all(ids1[n] == i for n, i in ids0.items())


def test_cli_ddl_verbs(table, capsys):
    import json

    from olake_spark.cli import main

    rc = main(["maintain", "--dest", table.root, "--op", "add-column",
               "--column", "grade:double", "--cpus", "4"])
    assert rc == 0
    rc = main(["maintain", "--dest", table.root, "--op", "rename-column",
               "--column", "grade:score", "--cpus", "4"])
    assert rc == 0
    rc = main(["maintain", "--dest", table.root, "--op", "drop-column",
               "--column", "score", "--cpus", "4"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.strip().startswith("{")]
    ops = [m["op"] for m in lines if m.get("type") == "MAINTENANCE"]
    assert ops == ["add-column", "rename-column", "drop-column"]
    cols = [f.name for f in table.refresh().schema().fields]
    assert "grade" not in cols and "score" not in cols
    # bad spec -> error envelope, rc 2
    rc = main(["maintain", "--dest", table.root, "--op", "drop-column",
               "--column", "doc_id", "--cpus", "4"])
    assert rc == 2


def test_drift_readd_after_rename_gets_fresh_id(table, spark):
    """Review finding: a drift widen (commit(new_schema=)) AFTER a DDL
    must not hand the re-used NAME the old field id — that would remap
    the renamed column's data onto the new column."""
    from pyspark.sql import types as T

    expected = table.scan().selectExpr("sum(size(tokens))").first()[0]
    table.rename_column("tokens", "toks")
    # drift re-adds the OLD name as a fresh (unrelated) column
    new_schema = T.StructType(
        list(table.schema().fields)
        + [T.StructField("tokens", T.StringType())]
    )
    table.commit("schema-change", new_schema=new_schema)
    out = table.scan()
    # old data still reads under toks; the re-added tokens is empty
    assert out.selectExpr("sum(size(toks))").first()[0] == expected
    assert out.where("tokens is not null").count() == 0
    # distinct field ids for the two names
    ids = table._field_ids(table.metadata["current_schema_id"])
    assert ids["tokens"] != ids["toks"]


def test_dropped_field_id_never_reissued(table, spark):
    """An id retired by drop_column must not be reissued to a later
    drift column, or old files would leak the dropped data into it."""
    from pyspark.sql import types as T

    table.add_column("grade", "double")
    table.append(
        generate_sequences(spark, 40, seed=10, max_tok=16).withColumn(
            "grade", F.lit(6.0)
        )
    )
    grade_id = table._field_ids(table.metadata["current_schema_id"])["grade"]
    table.drop_column("grade")
    new_schema = T.StructType(
        list(table.schema().fields) + [T.StructField("other", T.DoubleType())]
    )
    table.commit("schema-change", new_schema=new_schema)
    ids = table._field_ids(table.metadata["current_schema_id"])
    assert ids["other"] != grade_id
    assert table.scan().where("other is not null").count() == 0


def test_add_column_refuses_system_names(table):
    with pytest.raises(ValueError, match="system"):
        table.add_column("_olake_bucket", "int")


def test_add_column_bad_type_string(table):
    with pytest.raises(ValueError, match="invalid type string"):
        table.add_column("grade", "duble")


def test_changelog_across_rename_no_spurious_updates(table, spark):
    """A changelog span crossing a rename must align the old side by
    field id: rows merely moved by compaction are NOT updates."""
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.changelog import snapshot_changes

    cursor = table.current_snapshot_id
    table.rename_column("tokens", "toks")
    compact(table, target_file_bytes=8 * 1024 * 1024)
    table.refresh()
    diff = snapshot_changes(table, cursor)
    counts = {r["_change_type"]: r["count"]
              for r in diff.groupBy("_change_type").count().collect()}
    assert counts == {}, counts


def test_stream_reader_resolves_post_start_ddl(table, spark):
    """A rename AFTER the stream started must still stream the renamed
    column's data (by field id) under the reader's pinned names."""
    from olake_spark.sources.datasource import OlakeStreamReader

    reader = OlakeStreamReader(
        {"path": table.root, "stream_start": "latest"},
        table.schema(),
    )
    start = reader.initialOffset()
    table.rename_column("tokens", "toks")
    table.append(
        generate_sequences(spark, 30, seed=11, max_tok=16)
        .withColumnRenamed("tokens", "toks")
    )
    end = reader.latestOffset()
    rows = []
    for p in reader.partitions(start, end):
        for batch in reader.read(p):
            rows.extend(batch.to_pylist())
    assert len(rows) == 30
    # pinned (pre-DDL) schema names, with real data resolved by field id
    assert all(r["tokens"] is not None and len(r["tokens"]) > 0 for r in rows)


def test_update_column_type_safe_widening(table, spark):
    """int->long retype is metadata-only; old int files read back as
    long, new writes must carry the widened type."""
    from pyspark.sql import types as T

    table.add_column("views", "int")
    table.append(
        generate_sequences(spark, 50, seed=12, max_tok=16).withColumn(
            "views", F.lit(7).cast("int")
        )
    )
    pre = _paths(table)
    table.update_column_type("views", "bigint")
    assert _paths(table) == pre  # zero rewrite
    out = table.scan()
    assert dict(out.dtypes)["views"] == "bigint"
    assert out.where("views = 7").count() == 50
    # stale-typed frame now refused
    with pytest.raises(ValueError, match="frame column 'views'"):
        table.append(
            generate_sequences(spark, 5, seed=13, max_tok=16).withColumn(
                "views", F.lit(1).cast("int")
            )
        )
    # widened frame accepted
    table.append(
        generate_sequences(spark, 5, seed=13, max_tok=16).withColumn(
            "views", F.lit(8).cast("bigint")
        )
    )
    assert table.scan().where("views = 8").count() == 5


def test_update_column_type_refuses_unsafe(table):
    table.add_column("views", "bigint")
    with pytest.raises(ValueError, match="safe widenings"):
        table.update_column_type("views", "int")  # narrowing
    with pytest.raises(ValueError, match="safe widenings"):
        table.update_column_type("views", "string")  # cross-family
    with pytest.raises(ValueError, match="already"):
        table.update_column_type("views", "bigint")
    with pytest.raises(ValueError, match="pruning"):
        table.update_column_type("n_tok", "bigint")  # stats column


def test_datasource_writer_refuses_stale_frame_after_rename(table, spark):
    """The Arrow writer's column validation keys on the CURRENT table
    schema, so a frame built before a rename is refused — same contract
    as Table.append's strict validation."""
    from olake_spark.sources.datasource import OlakeDataSource

    spark.dataSource.register(OlakeDataSource)
    table.rename_column("tokens", "toks")
    stale = generate_sequences(spark, 10, seed=14, max_tok=8).drop(
        "_olake_id", "_olake_insert_time", "_cdc_deleted_at"
    )
    with pytest.raises(Exception, match="missing table columns|unknown"):
        stale.write.format("olake").mode("append").save(table.root)
    # renamed frame writes fine and reads back under the new name
    ok = stale.withColumnRenamed("tokens", "toks").withColumn(
        "doc_id", F.concat(F.lit("w-"), F.col("doc_id"))
    )
    ok.write.format("olake").mode("append").save(table.root)
    out = table.refresh().scan()
    assert out.count() == 310
    assert out.where("doc_id like 'w-%'").selectExpr(
        "sum(size(toks))"
    ).first()[0] > 0


def test_cli_retype_verb(table, capsys):
    import json

    from olake_spark.cli import main

    assert main(["maintain", "--dest", table.root, "--op", "add-column",
                 "--column", "views:int", "--cpus", "4"]) == 0
    assert main(["maintain", "--dest", table.root, "--op", "retype-column",
                 "--column", "views:bigint", "--cpus", "4"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.strip().startswith("{")]
    ops = [m["op"] for m in lines if m.get("type") == "MAINTENANCE"]
    assert ops == ["add-column", "retype-column"]
    table.refresh()
    assert dict(
        (f.name, f.dataType.simpleString()) for f in table.schema().fields
    )["views"] == "bigint"
    # narrowing refused through the CLI with a clean envelope
    assert main(["maintain", "--dest", table.root, "--op", "retype-column",
                 "--column", "views:int", "--cpus", "4"]) == 2
