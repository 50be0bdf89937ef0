"""partition_regex templating (reference parquet.go:307-364): value,
granularity, fallback, default_<col>, now(), trailing-slash trim, and
path-pure file routing through the table writer."""

import datetime

from pyspark.sql import functions as F

from olake_spark.functions.partition_regex import (
    PARTITION_PATH,
    partition_path_expr,
    with_partition_path,
)

def _fixed_now():
    return F.lit("2026-03-07 10:30:00").cast("timestamp")


def _one(spark, pattern, row, schema, now=None):
    df = spark.createDataFrame([row], schema)
    return df.select(
        partition_path_expr(pattern, now=now if now is not None else _fixed_now()).alias("p")
    ).first().p


def test_granularities_and_literals(spark):
    row = (datetime.datetime(2024, 2, 29, 23, 5), "web")
    schema = "ts timestamp, src string"
    assert _one(spark, "/{ts,'',YY}/{ts,'',MM}/{ts,'',DD}/{ts,'',HH}", row, schema) \
        == "/2024/2/29/23"
    assert _one(spark, "/lit/{src,'',}/x", row, schema) == "/lit/web/x"
    # ISO week
    assert _one(spark, "/{ts,'',WW}", row, schema) == "/9"


def test_fallback_and_default(spark):
    row = (None, None)
    schema = "ts timestamp, src string"
    assert _one(spark, "/{src,'unknown',}", row, schema) == "/unknown"
    # empty fallback -> default_<col> (parquet.go:326-328)
    assert _one(spark, "/{src,'',}", row, schema) == "/default_src"
    assert _one(spark, "/{ts,'nodate',MM}", row, schema) == "/nodate"


def test_now_and_trailing_slash_trim(spark):
    row = ("a",)
    schema = "src string"
    assert _one(spark, "/{now(),'',YY}/{src,'',}/", row, schema) == "/2026/a"
    assert _one(spark, "/{now(),'',MM}", row, schema) == "/3"


def test_routed_write_is_path_pure(spark, tmp_path):
    """Files written through the table land path-pure with the resolved
    path as the identity-partition value (manifest, not directory)."""
    from olake_spark.table import Table

    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1 + i % 3, 1 + i, 8), f"d{i}") for i in range(30)],
        "id int, ts timestamp, name string",
    )
    routed = with_partition_path(df, "/m={ts,'',MM}", now=_fixed_now())
    t = Table.create(
        spark,
        str(tmp_path / "tbl"),
        schema=routed.schema,
        partition_col=PARTITION_PATH,
        stats_columns=[PARTITION_PATH, "id"],
    )
    t.append(routed)
    files = t.files()
    assert len(files) == 3  # one per month path
    parts = {f.partition for f in files}
    assert parts == {"/m=1", "/m=2", "/m=3"}
    for f in files:
        st = f.stats[PARTITION_PATH]
        assert st["min"] == st["max"]
    # scan returns everything, path column included
    assert t.scan().count() == 30
    got = {
        r[0]
        for r in t.scan().select(PARTITION_PATH).distinct().collect()
    }
    assert got == parts


def test_empty_input_routes_without_crash(spark):
    """A full_refresh/catalog sync of an EMPTY source with partition_regex
    set: repartition(0, ...) used to raise IllegalArgumentException."""
    df = spark.createDataFrame([], "id int, ts timestamp, name string")
    routed = with_partition_path(df, "/m={ts,'',MM}", now=_fixed_now())
    assert routed.count() == 0
    assert PARTITION_PATH in routed.columns
