"""ANALYZE / NDV sketches (operators/analyze.py): estimator accuracy,
register merge algebra, incremental refresh parity, removal fallback,
rank-CASE portability, persistence + CLI."""

import math

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.analyze import (
    analyze_table,
    hll_estimate,
    hll_registers,
    load_stats,
    merge_registers,
    ndv,
    rank_case_sql,
    _registers_from_df,
)
from olake_spark.table import Table


def _regs(df, cols, **kw):
    return _registers_from_df(hll_registers(df, cols, **kw))


@pytest.mark.parametrize("word_hash", ["xxhash64", "md5_60"])
def test_estimate_accuracy(spark, word_hash):
    n = 20000
    df = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
        (F.col("id") % 7).alias("small"),
    )
    regs = _regs(df, ["k", "small"], word_hash=word_hash)
    est = hll_estimate(regs["k"], 12)
    assert abs(est - n) / n < 0.05  # ~1.6% expected at p=12
    # linear counting regime: tiny cardinalities are near-exact
    assert round(hll_estimate(regs["small"], 12)) == 7


def test_register_merge_is_union(spark):
    a = generate_sequences(spark, 800, seed=1)
    b = generate_sequences(spark, 800, seed=2)
    ra = _regs(a, ["doc_id", "source"])
    rb = _regs(b, ["doc_id", "source"])
    runion = _regs(a.unionByName(b), ["doc_id", "source"])
    for c in ("doc_id", "source"):
        assert merge_registers(ra[c], rb[c]) == runion[c]


def test_rank_case_matches_bit_length(spark):
    # the generated CASE chain IS leading_zeros+1 for width-bit values
    width = 48
    vals = [0, 1, 2, 3, 4, (1 << 47) - 1, 1 << 47, (1 << 48) - 1, 12345678]
    df = spark.createDataFrame([(v,) for v in vals], "w long")
    got = [
        r[0]
        for r in df.select(
            F.expr(rank_case_sql("w", width)).alias("r")
        ).collect()
    ]
    want = [width + 1 if v == 0 else width - v.bit_length() + 1 for v in vals]
    assert got == want


def test_nulls_excluded_and_counted(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("a",)], "v string"
    )
    regs = _regs(df, ["v"])
    assert round(hll_estimate(regs["v"], 12)) == 2
    # the fused one-scan path must agree on both registers and nulls
    from olake_spark.operators.analyze import _registers_and_nulls

    regs2, nulls = _registers_and_nulls(df, ["v"], 12, "xxhash64")
    assert regs2 == regs
    assert nulls == {"v": 2}


def test_analyze_persists_and_incremental_matches_full(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(generate_sequences(spark, 1500, seed=5).repartition(3))
    doc1 = analyze_table(t, columns=["doc_id", "source", "n_tok"])
    assert doc1["mode"] == "full"
    assert abs(doc1["columns"]["doc_id"]["ndv"] - 1500) / 1500 < 0.05
    assert ndv(t, "doc_id") == doc1["columns"]["doc_id"]["ndv"]

    # append-only refresh takes the incremental path...
    t.append(generate_sequences(spark, 1500, seed=6).repartition(3))
    t = t.refresh()
    doc2 = analyze_table(t, columns=["doc_id", "source", "n_tok"])
    assert doc2["mode"] == "incremental"
    # ...and is REGISTER-IDENTICAL to a from-scratch analyze
    full = _regs(t.scan(), ["doc_id", "source", "n_tok"])
    for c in ("doc_id", "source", "n_tok"):
        got = {r: k for r, k in doc2["columns"][c]["registers"]}
        assert got == full[c]
    # superseded stats file was GC'd: one live pointer, readable
    assert len(t.metadata["statistics"]) == 1
    assert load_stats(t)["snapshot_id"] == t.current_snapshot_id

    # same-snapshot re-analyze is a no-op read
    doc3 = analyze_table(t, columns=["doc_id", "source", "n_tok"])
    assert doc3["snapshot_id"] == doc2["snapshot_id"]


def test_removal_forces_full_recompute(spark, tmp_path):
    from olake_spark.operators.compaction import compact

    t = Table.create(spark, str(tmp_path / "tbl"))
    for s in (7, 8, 9):
        t.append(generate_sequences(spark, 400, seed=s).repartition(4))
    analyze_table(t, columns=["doc_id"])
    compact(t, target_file_bytes=1 << 30)  # rewrites files -> removals
    t = t.refresh()
    doc = analyze_table(t, columns=["doc_id"])
    assert doc["mode"] == "full"
    full = _regs(t.scan(), ["doc_id"])
    assert {r: k for r, k in doc["columns"]["doc_id"]["registers"]} == full[
        "doc_id"
    ]


def test_cli_analyze(spark, tmp_path, capsys):
    from olake_spark.cli import main as cli_main

    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(generate_sequences(spark, 300, seed=11).repartition(2))
    rc = cli_main(
        [
            "maintain",
            "--dest",
            t.root,
            "--op",
            "analyze",
            "--columns",
            "doc_id,source",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert '"op": "analyze"' in out and '"doc_id"' in out
    t = t.refresh()
    assert ndv(t, "source") is not None
