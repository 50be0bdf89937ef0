"""Bucket transform (table/format.py) + co-located join
(operators/bucket_join.py): spec parsing, write-side purity, join
parity vs a plain shuffle join, shuffle-free plan shape, residual and
MoR-delete correctness, incompatibility guards."""

import pytest
from pyspark.sql import functions as F, types as T

from olake_spark.datagen import generate_sequences
from olake_spark.operators.bucket_join import bucket_join
from olake_spark.table import Table
from olake_spark.table.format import (
    BUCKET_COL,
    bucket_value_expr,
    parse_partition_spec,
)

DIM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("grade", T.DoubleType()),
        T.StructField("label", T.StringType()),
    ]
)


def _dim_df(spark, n, seed=0, keep_mod=1):
    """Dim rows whose doc_id space overlaps generate_sequences(n, seed);
    keep_mod>1 keeps a deterministic subset (partial key coverage)."""
    base = generate_sequences(spark, n, seed=seed).select("doc_id")
    if keep_mod > 1:
        base = base.where(F.pmod(F.xxhash64("doc_id"), keep_mod) == 0)
    return base.select(
        "doc_id",
        (F.length("doc_id") % 100 / 100.0).alias("grade"),
        F.substring("doc_id", 1, 2).alias("label"),
    )


def _fact(spark, root, rows=2000, buckets=8, seed=1):
    t = Table.create(spark, str(root), partition_col=f"bucket({buckets},doc_id)")
    t.append(
        generate_sequences(spark, rows, seed=seed), distribute="partition"
    )
    return t.refresh()


def _dim(spark, root, rows=2000, buckets=8, seed=0, keep_mod=1):
    t = Table.create(
        spark, str(root), schema=DIM_SCHEMA,
        partition_col=f"bucket({buckets},doc_id)",
    )
    t.append(
        _dim_df(spark, rows, seed, keep_mod), distribute="partition"
    )
    return t.refresh()


def test_parse_partition_spec():
    assert parse_partition_spec("bucket(16,doc_id)") == {
        "type": "bucket", "n": 16, "source": "doc_id",
    }
    assert parse_partition_spec("source") is None
    with pytest.raises(ValueError):
        parse_partition_spec("bucket(1,doc_id)")


def test_bucketed_write_is_pure_and_scannable(spark, tmp_path):
    t = _fact(spark, tmp_path / "f", rows=1200, buckets=8)
    files = t.files()
    assert files and all(f.spec_col == BUCKET_COL for f in files)
    assert all(f.partition is not None for f in files)
    assert {int(f.partition) for f in files} <= set(range(8))
    # the stamped column agrees with the declared transform
    bad = (
        t.scan()
        .where(F.col(BUCKET_COL) != bucket_value_expr("doc_id", 8))
        .count()
    )
    assert bad == 0
    assert t.scan().count() == 1200


def test_bucket_join_parity_and_no_shuffle(spark, tmp_path):
    fact = _fact(spark, tmp_path / "f", rows=3000, buckets=8, seed=3)
    dim = _dim(spark, tmp_path / "d", rows=3000, buckets=8, seed=3, keep_mod=2)
    got = bucket_join(
        fact, dim, on=["doc_id"], right_cols=["grade", "label"]
    )
    want = (
        fact.scan().drop(BUCKET_COL)
        .join(
            dim.scan().select("doc_id", "grade", "label"), "doc_id", "inner"
        )
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # colocation: no hash-partition exchange anywhere in the plan —
    # the only exchanges are the bounded per-chunk broadcasts
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


@pytest.mark.parametrize("how", ["left_outer", "left_semi", "left_anti"])
def test_bucket_join_how_parity(spark, tmp_path, how):
    fact = _fact(spark, tmp_path / "f", rows=1000, buckets=4, seed=5)
    # dim covers only part of the fact keys -> non-trivial outer/anti
    dim = _dim(spark, tmp_path / "d", rows=1000, buckets=4, seed=5, keep_mod=3)
    got = bucket_join(
        fact, dim, on="doc_id", how=how, right_cols=["grade"]
    ).select("doc_id", "n_tok")
    rs = dim.scan().select("doc_id", "grade")
    want = (
        fact.scan().drop(BUCKET_COL).join(rs, "doc_id", how)
        .select("doc_id", "n_tok")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_residual_files_stay_correct(spark, tmp_path):
    fact = _fact(spark, tmp_path / "f", rows=1500, buckets=4, seed=7)
    dim = _dim(spark, tmp_path / "d", rows=1500, buckets=4, seed=7, keep_mod=2)
    # impure appends on BOTH sides (no distribute -> mixed buckets/file)
    fact.append(generate_sequences(spark, 500, seed=8).coalesce(1))
    dim.append(_dim_df(spark, 500, seed=8, keep_mod=2).coalesce(1))
    fact, dim = fact.refresh(), dim.refresh()
    assert any(f.partition is None for f in fact.files())
    got = bucket_join(fact, dim, on="doc_id", right_cols=["grade"])
    want = fact.scan().drop(BUCKET_COL).join(
        dim.scan().select("doc_id", "grade"), "doc_id"
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_bucket_join_applies_mor_deletes(spark, tmp_path):
    from olake_spark.operators.deletes import delete_where

    fact = _fact(spark, tmp_path / "f", rows=1000, buckets=4, seed=9)
    dim = _dim(spark, tmp_path / "d", rows=1000, buckets=4, seed=9)
    n0 = bucket_join(fact, dim, on="doc_id", right_cols=["grade"]).count()
    delete_where(fact, F.col("n_tok") < 100)
    fact = fact.refresh()
    got = bucket_join(fact, dim, on="doc_id", right_cols=["grade"])
    want = fact.scan().drop(BUCKET_COL).join(
        dim.scan().select("doc_id", "grade"), "doc_id"
    )
    assert got.count() == want.count() < n0
    assert got.exceptAll(want).count() == 0


def test_incompatible_specs_raise(spark, tmp_path):
    a = _fact(spark, tmp_path / "a", rows=100, buckets=4)
    b = _fact(spark, tmp_path / "b", rows=100, buckets=8, seed=2)
    plain = Table.create(spark, str(tmp_path / "p"))
    with pytest.raises(ValueError, match="incompatible bucket specs"):
        bucket_join(a, b, on="doc_id")
    with pytest.raises(ValueError, match="bucket-transform tables"):
        bucket_join(a, plain, on="doc_id")
    with pytest.raises(ValueError, match="must include the bucket source"):
        bucket_join(a, a, on="source")
    with pytest.raises(ValueError, match="how must be one of"):
        bucket_join(a, a, on="doc_id", how="full_outer")


def test_bucket_source_required_in_frame(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), partition_col="bucket(4,doc_id)")
    bad = spark.range(5).select(F.col("id").cast("string").alias("other"))
    with pytest.raises(ValueError, match="source column 'doc_id'"):
        t.append(bad, distribute="partition")
