"""Salted-skew join: result parity with the plain join, and the hot
key's rows demonstrably spread across many shuffle tasks."""

from pyspark.sql import functions as F

from olake_spark.functions.skew import (
    SALT,
    salted_hot_group_count,
    salted_join,
    with_salt,
)


def _skewed(spark, n=20_000, hot_frac=0.9):
    # 90% of rows share one key — the pathological hot-source shape
    n_hot = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5)] + [(f"k{i}", float(i)) for i in range(50)],
        "k string, w double",
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 4).alias("s")
    )
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 4).alias("s")
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_left_join_preserves_unmatched(spark):
    big = _skewed(spark, n=2000)
    small = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    out = salted_join(big, small, "k", n_salts=4, how="left")
    assert out.count() == 2000
    assert out.filter(F.col("w").isNull()).count() == big.filter(
        F.col("k") != "hot"
    ).count()


def test_hot_key_spreads_across_salts(spark):
    big = _skewed(spark)
    salted = with_salt(big, 8)
    dist = (
        salted.filter(F.col("k") == "hot")
        .groupBy(SALT)
        .count()
        .collect()
    )
    assert len(dist) == 8  # every salt bucket gets a share
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)  # roughly uniform


def test_salt_is_deterministic(spark):
    big = _skewed(spark, n=500)
    a = with_salt(big, 8).groupBy("k", SALT).count()
    b = with_salt(big, 8).groupBy("k", SALT).count()
    assert a.exceptAll(b).count() == 0


def test_two_phase_count_matches(spark):
    big = _skewed(spark, n=5000)
    want = {r.k: r.cnt for r in big.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    got = {r.k: r.cnt for r in salted_hot_group_count(big, ["k"], 8).collect()}
    assert got == want
