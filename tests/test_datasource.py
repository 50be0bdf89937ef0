"""The ``olake`` Python Data Source (sources/datasource.py): batch read
parity vs Table.scan, filter-pushdown file pruning, MoR delete
application, time travel, metadata tables, the Arrow writer's atomic
commit, and the snapshot-tail stream reader."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.deletes import delete_where
from olake_spark.schema import DATA_COLUMNS
from olake_spark.sources.datasource import OlakeDataSource
from olake_spark.table import Table
from olake_spark.table.metadata_tables import metadata_df


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(OlakeDataSource)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds_tbl") / "tbl")
    t = Table.create(spark, root)
    # partition-pure files (one file per source) so identity pruning has
    # something to prune; a second unclustered append mixes layouts
    t.append(
        generate_sequences(spark, 2500, seed=21, max_tok=64),
        distribute="partition",
    )
    t.append(generate_sequences(spark, 500, seed=22, max_tok=64).repartition(2))
    return t.refresh()


def _read(spark, table, **opts):
    r = spark.read.format("olake")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(table.root)


def test_batch_parity_both_planning_modes(spark, table):
    native = table.scan()
    for mode in ("false", "true"):
        ds = _read(spark, table, distributed_planning=mode)
        assert ds.schema == native.schema
        assert ds.count() == native.count()
        assert ds.exceptAll(native).count() == 0
        assert native.exceptAll(ds).count() == 0


def test_filter_pushdown_prunes_files(spark, table):
    full = _read(spark, table)
    src = table.scan().select("source").first().source
    filtered = _read(spark, table).filter(F.col("source") == src)
    # partition-pure layout: non-matching pure files must be gone from
    # the plan (partition count == surviving file count)
    assert filtered.rdd.getNumPartitions() < full.rdd.getNumPartitions()
    exp = table.scan().filter(F.col("source") == src)
    assert filtered.count() == exp.count()
    assert filtered.exceptAll(exp).count() == 0

    # range pushdown on a stats column prunes too and stays exact
    rng = _read(spark, table).filter(
        (F.col("doc_id") >= "p") & (F.col("doc_id") < "q")
    )
    exp_rng = table.scan().filter(
        (F.col("doc_id") >= "p") & (F.col("doc_id") < "q")
    )
    assert rng.count() == exp_rng.count()
    # executor-side pruning (shard mode) returns the same rows
    rng_sh = _read(spark, table, distributed_planning="true").filter(
        (F.col("doc_id") >= "p") & (F.col("doc_id") < "q")
    )
    assert rng_sh.count() == exp_rng.count()


def test_in_filter_pushdown(spark, table):
    srcs = [r.source for r in table.scan().select("source").distinct().collect()][:2]
    ds = _read(spark, table).filter(F.col("source").isin(srcs))
    exp = table.scan().filter(F.col("source").isin(srcs))
    assert ds.count() == exp.count()


def test_mor_deletes_applied(spark, tmp_path, table):
    root = str(tmp_path / "mor_tbl")
    t = Table.create(spark, root)
    t.append(generate_sequences(spark, 1200, seed=31, max_tok=32).repartition(4))
    delete_where(t, F.col("doc_id").endswith("1"), mode="eq")
    delete_where(t.refresh(), F.col("n_tok") <= 12, mode="pos")
    t = t.refresh()
    assert t.delete_files(), "fixture should have live delete files"
    ds = spark.read.format("olake").load(root)
    native = t.scan().select(*ds.columns)  # scan reorders after joins
    assert ds.count() == native.count()
    assert ds.exceptAll(native).count() == 0
    # raw pre-delete view
    raw = (
        spark.read.format("olake").option("apply_deletes", "false").load(root)
    )
    assert raw.count() == 1200


def test_time_travel_options(spark, table):
    first = min(s.snapshot_id for s in table.snapshots())
    old = _read(spark, table, snapshot_id=first)
    assert old.count() == table.scan(snapshot_id=first).count()
    ts = table.snapshot(first).timestamp_ms
    as_of = _read(spark, table, as_of_timestamp_ms=ts)
    assert as_of.count() == old.count()
    table.set_ref("ds_v1", snapshot_id=first)
    try:
        by_ref = _read(spark, table, ref="ds_v1")
        assert by_ref.count() == old.count()
    finally:
        table.remove_ref("ds_v1")
    with pytest.raises(Exception, match="at most one"):
        _read(spark, table, snapshot_id=first, ref="x").count()


def test_metadata_kinds_parity(spark, table):
    for kind in ("snapshots", "history", "refs", "files", "delete_files",
                 "manifests", "partitions", "schemas"):
        ds = (
            spark.read.format("olake")
            .option("metadata", kind)
            .load(table.root)
        )
        want = metadata_df(table, kind)
        # nullability flags differ between the declared schema and the
        # Catalyst-derived frame; names and types must agree
        assert [
            (f.name, f.dataType.simpleString()) for f in ds.schema.fields
        ] == [
            (f.name, f.dataType.simpleString()) for f in want.schema.fields
        ], kind
        assert ds.count() == want.count(), kind
        if kind == "files":
            a = {r.file_path for r in ds.collect()}
            b = {r.file_path for r in want.collect()}
            assert a == b


def test_writer_append_and_read_back(spark, tmp_path):
    root = str(tmp_path / "w_tbl")
    t = Table.create(spark, root)
    t.append(generate_sequences(spark, 300, seed=41).repartition(2))
    add = generate_sequences(spark, 200, seed=42).select(*DATA_COLUMNS)
    add.write.format("olake").mode("append").save(root)
    t = t.refresh()
    assert t.snapshot().operation == "append"
    assert t.snapshot().summary["writer"] == "python-datasource"
    assert t.scan().count() == 500
    # system columns completed identically to the JVM path: the id hash
    # of a doc written via the datasource equals olake_id_expr's
    ids = (
        t.scan()
        .withColumn("expect", F.md5(F.concat(F.col("doc_id"), F.lit("|"))))
        .filter(F.col("_olake_id") != F.col("expect"))
    )
    assert ids.count() == 0
    # stats footers make the new files prunable
    pruned = (
        spark.read.format("olake")
        .load(root)
        .filter(F.col("doc_id") < "a")
    )
    assert pruned.count() == t.scan().filter(F.col("doc_id") < "a").count()


def test_writer_overwrite_and_schema_checks(spark, tmp_path):
    root = str(tmp_path / "ow_tbl")
    t = Table.create(spark, root)
    t.append(generate_sequences(spark, 300, seed=51).repartition(2))
    repl = generate_sequences(spark, 120, seed=52).select(*DATA_COLUMNS)
    repl.write.format("olake").mode("overwrite").save(root)
    t = t.refresh()
    assert t.snapshot().operation == "overwrite"
    assert t.scan().count() == 120
    with pytest.raises(Exception, match="missing table columns"):
        repl.drop("tokens").write.format("olake").mode("append").save(root)
    with pytest.raises(Exception, match="unknown columns"):
        repl.withColumn("bogus", F.lit(1)).write.format("olake").mode(
            "append"
        ).save(root)


def test_stream_tail_skips_rewrites(spark, tmp_path):
    from olake_spark.operators.compaction import compact

    root = str(tmp_path / "s_tbl")
    t = Table.create(spark, root)
    t.append(generate_sequences(spark, 400, seed=61).repartition(8))

    def drain(qname, start="earliest"):
        q = (
            spark.readStream.format("olake")
            .option("stream_start", start)
            .load(root)
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        return {
            r.source: r.n for r in spark.sql(f"select * from {qname}").collect()
        }

    got = drain("tail1")
    assert sum(got.values()) == 400
    # a rewrite commit adds files but no rows: the tail must stay empty
    compact(t.refresh(), target_file_bytes=1 << 30)
    t2 = t.refresh()
    assert t2.snapshot().operation != "append"
    start_sid = t2.current_snapshot_id
    t2.append(generate_sequences(spark, 150, seed=62).repartition(2))
    got2 = drain("tail2", start=str(start_sid))
    assert sum(got2.values()) == 150
