"""Type-system tests: promotion lattice, schema drift, value coercion
(reference semantics from typeutils/, SURVEY.md §1.2, §2.3)."""

import datetime

import pytest
from pyspark.sql import types as T

from olake_spark.functions.reformat import (
    canon_name,
    canonicalize_columns,
    coerce_to_schema,
    flatten_struct,
    merge_schemas,
    parse_bool,
    parse_timestamp_multi,
    promote_type,
)
from pyspark.sql import functions as F


def test_canon_name():
    assert canon_name("Foo Bar-Baz!") == "foo_bar_baz_"
    assert canon_name("already_ok9") == "already_ok9"


def test_promotion_lattice():
    # bool < int < float < string (typeutils/fields.go:18-39)
    assert promote_type(T.BooleanType(), T.LongType()) == T.LongType()
    assert promote_type(T.IntegerType(), T.LongType()) == T.LongType()
    assert promote_type(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert promote_type(T.DoubleType(), T.StringType()) == T.StringType()
    # timestamps promote toward string
    assert promote_type(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert promote_type(T.TimestampType(), T.StringType()) == T.StringType()
    # incompatible branches meet at the universal top
    assert promote_type(T.TimestampType(), T.LongType()) == T.StringType()
    assert (
        promote_type(T.ArrayType(T.IntegerType()), T.DoubleType()) == T.StringType()
    )


def test_merge_schemas_drift_report():
    cur = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    inc = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("c", T.DoubleType(), True),
        ]
    )
    merged, drift = merge_schemas(cur, inc)
    names = {f.name: f.dataType for f in merged.fields}
    assert names["a"] == T.LongType()  # promoted
    assert names["c"] == T.DoubleType()  # new col
    assert drift["new_columns"] == ["c"]
    assert drift["promoted"] == [("a", "int", "bigint")]


def test_parse_timestamp_multi_formats(spark):
    df = spark.createDataFrame(
        [
            ("2021-03-04T05:06:07+00:00",),
            ("2021-03-04 05:06:07",),
            ("2021-03-04",),
            ("03/04/2021",),
            ("20210304",),
            ("not a date",),
        ],
        "s string",
    )
    got = [r.ts for r in df.select(parse_timestamp_multi(F.col("s")).alias("ts")).collect()]
    d = datetime.datetime(2021, 3, 4)
    assert got[0] == datetime.datetime(2021, 3, 4, 5, 6, 7)
    assert got[1] == datetime.datetime(2021, 3, 4, 5, 6, 7)
    assert got[2] == d and got[3] == d and got[4] == d
    assert got[5] is None  # unparseable -> NULL, never an ANSI error


def test_parse_bool_truth_table(spark):
    df = spark.createDataFrame(
        [("1",), ("t",), ("YES",), ("off",), ("0",), ("maybe",)], "s string"
    )
    got = [r.b for r in df.select(parse_bool(F.col("s")).alias("b")).collect()]
    assert got == [True, True, True, False, False, None]


def test_coerce_to_schema_paths(spark):
    df = spark.createDataFrame(
        [("5", "2021-03-04", "yes", 7)],
        "num string, when string, flag string, single int",
    )
    target = T.StructType(
        [
            T.StructField("num", T.LongType(), True),
            T.StructField("when", T.TimestampType(), True),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("single", T.ArrayType(T.LongType()), True),  # scalar->array
            T.StructField("missing", T.StringType(), True),  # absent -> null
        ]
    )
    row = coerce_to_schema(df, target).first()
    assert row.num == 5
    assert row.when == datetime.datetime(2021, 3, 4)
    assert row.flag is True
    assert row.single == [7]
    assert row.missing is None


def test_flatten_struct_and_canon(spark):
    df = spark.createDataFrame(
        [(1, {"Inner Key": "v", "deep": {"x": 1}})],
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField(
                    "payload",
                    T.StructType(
                        [
                            T.StructField("Inner Key", T.StringType()),
                            T.StructField(
                                "deep",
                                T.StructType([T.StructField("x", T.IntegerType())]),
                            ),
                        ]
                    ),
                ),
            ]
        ),
    )
    out = flatten_struct(df, "payload")
    assert set(out.columns) == {"id", "inner_key", "deep"}
    row = out.first()
    assert row.inner_key == "v"
    assert row.deep == '{"x":1}'  # nested stringified to JSON


def test_canonicalize_columns(spark):
    df = spark.createDataFrame([(1, 2)], "`Col One` int, ok int")
    assert canonicalize_columns(df).columns == ["col_one", "ok"]


def test_objectid_canon_and_timestamp(spark):
    # T6: handleObjectID analog (reference
    # drivers/mongodb/internal/backfill.go:332-335) — unwrap, normalize
    # case, tombstone garbage; embedded creation time = first 4 id bytes.
    from olake_spark.functions.reformat import (
        objectid_canon,
        objectid_timestamp,
    )

    hexid = "65f1a2b3c4d5e6f708192a3b"
    rows = [
        (f'ObjectID("{hexid}")',),          # wrapped wire form
        (hexid.upper(),),                    # bare, uppercase
        (hexid,),                            # bare, already canonical
        ('ObjectID("xyz")',),                # wrapped but not 24-hex
        ("not-an-oid",),                     # garbage
        (None,),                             # NULL-safe
    ]
    df = spark.createDataFrame(rows, "raw string")
    out = df.select(
        objectid_canon(F.col("raw")).alias("oid"),
    ).collect()
    assert [r.oid for r in out] == [hexid, hexid, hexid, None, None, None]

    ts = (
        spark.createDataFrame([(hexid,), (None,)], "oid string")
        .select(objectid_timestamp(F.col("oid")).alias("u"))
        .collect()
    )
    assert ts[0].u == int(hexid[:8], 16)
    assert ts[1].u is None
