"""Seeded shard export (operators/export.py): determinism across input
partitionings, completeness, position permutations, token balance, the
written layout + manifest, and composition with pack_sequences."""

import json
import os

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.export import (
    read_shard,
    shard_stats,
    shuffle_shards,
    write_shards,
)
from olake_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def seq(spark):
    return generate_sequences(spark, num_rows=2000, seed=3).select(
        "doc_id", "n_tok", "source"
    ).cache()


def test_assignment_deterministic_across_partitionings(seq):
    a = shuffle_shards(seq, 8, seed=42).select("doc_id", "shard", "pos")
    b = shuffle_shards(seq.repartition(17, "source"), 8, seed=42).select(
        "doc_id", "shard", "pos"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_complete_disjoint_and_positions_are_permutations(seq):
    out = shuffle_shards(seq, 5, seed=1)
    assert out.count() == 2000  # every row exactly once
    bad = (
        out.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.min("pos").alias("lo"),
             F.max("pos").alias("hi"), F.countDistinct("pos").alias("d"))
        .filter("lo != 0 OR hi != n - 1 OR d != n")
        .count()
    )
    assert bad == 0  # pos is exactly 0..n-1 within each shard
    assert out.filter("shard < 0 OR shard >= 5").count() == 0


def test_seed_changes_order_but_not_membership(seq):
    a = shuffle_shards(seq, 4, seed=1).select("doc_id", "shard", "pos")
    b = shuffle_shards(seq, 4, seed=2).select("doc_id", "shard", "pos")
    assert a.count() == b.count() == 2000
    moved = (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .filter("a.shard != b.shard OR a.pos != b.pos")
        .count()
    )
    assert moved > 1500  # a different seed is a genuinely different shuffle


def test_token_balance_within_lln_tolerance(seq):
    stats = shard_stats(shuffle_shards(seq, 4, seed=7)).collect()
    assert len(stats) == 4
    # ~500 docs/shard: token share concentrates near 1.0
    for r in stats:
        assert 0.8 < r.balance < 1.2, dict(r.asDict())


def test_write_read_shards_roundtrip(seq, spark, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_shards(seq, path, n_shards=3, seed=9)
    assert manifest["total_rows"] == 2000
    assert sorted(m["shard"] for m in manifest["shards"]) == [0, 1, 2]
    on_disk = json.load(open(os.path.join(path, "shard_manifest.json")))
    assert on_disk["seed"] == 9 and on_disk["n_shards"] == 3
    shard0 = read_shard(spark, path, 0)
    rows = shard0.select("pos").collect()
    assert [r.pos for r in rows] == list(range(len(rows)))
    # membership matches a fresh in-memory assignment
    expect = shuffle_shards(seq, 3, seed=9).filter("shard = 0").select("doc_id")
    assert shard0.select("doc_id").exceptAll(expect).count() == 0
    assert expect.exceptAll(shard0.select("doc_id")).count() == 0


def test_shuffle_packed_blocks(seq):
    packed = pack_sequences(
        seq.withColumn("tokens", F.array(F.lit(1))), block_len=64
    )
    out = shuffle_shards(packed, 4, seed=5, key_col="block_id")
    assert out.count() == packed.count()
    assert out.select("shard").distinct().count() == 4


def test_bad_n_shards(seq):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(seq, 0)
