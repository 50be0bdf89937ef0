"""olake_id parity with the reference's GetKeysHash
(/root/reference/utils/utils.go:229-241): sorted keys, every value
followed by '|', NULL rendered as '<nil>'."""

import hashlib

from pyspark.sql import functions as F

from olake_spark.schema import olake_id_expr


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_single_key_trailing_separator(spark):
    df = spark.createDataFrame([("abc",)], "doc_id string").select(
        olake_id_expr("doc_id").alias("h")
    )
    assert df.first().h == _md5("abc|")


def test_composite_keys_sorted_and_suffixed(spark):
    # keys sorted by NAME (b_key < z_key regardless of arg order)
    df = spark.createDataFrame([(7, "x")], "z_key int, b_key string").select(
        olake_id_expr("z_key", "b_key").alias("h")
    )
    assert df.first().h == _md5("x|7|")


def test_null_values_render_as_nil_and_do_not_collide(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "b")], "k1 string, k2 string"
    ).select("k1", "k2", olake_id_expr("k1", "k2").alias("h"))
    rows = {(r.k1, r.k2): r.h for r in df.collect()}
    assert rows[("a", None)] == _md5("a|<nil>|")
    assert rows[("a", "b")] == _md5("a|b|")
    # and a single-key ('a') hash differs from composite ('a', NULL)
    one = (
        spark.createDataFrame([("a",)], "k1 string")
        .select(olake_id_expr("k1").alias("h"))
        .first()
        .h
    )
    assert one == _md5("a|") != rows[("a", None)]
