"""Sequence packing invariants: token conservation, block-length bound,
fill quality, determinism."""

from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.packing import pack_sequences, packing_stats

BLOCK = 512


def _packed(spark, n=3000):
    seq = generate_sequences(spark, n, seed=9, max_tok=300)
    return seq, pack_sequences(seq, block_len=BLOCK, partitions=8)


def test_tokens_conserved_exactly(spark):
    seq, packed = _packed(spark)
    stats = packing_stats(packed, BLOCK).first()
    src = seq.agg(
        F.sum("n_tok").alias("tok"), F.count("*").alias("n")
    ).first()
    assert stats.total_tokens == src.tok
    assert stats.total_seqs == src.n
    # every doc id lands in exactly one block
    ids = packed.select(F.explode("doc_ids").alias("doc_id"))
    assert ids.count() == src.n
    assert ids.distinct().count() == src.n
    # and the concatenated token multiset matches per block
    bad = packed.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_block_length_bound(spark):
    _, packed = _packed(spark)
    # max_tok(300) < BLOCK(512), so NO block may exceed the budget
    assert packed.filter(F.col("n_tok") > BLOCK).count() == 0


def test_oversized_sequences_kept_whole(spark):
    seq = generate_sequences(spark, 200, seed=4, max_tok=900)
    packed = pack_sequences(seq, block_len=BLOCK, partitions=4)
    over = packed.filter(F.col("n_tok") > BLOCK)
    # oversized inputs become singleton blocks, never truncated
    assert over.filter(F.col("n_seqs") != 1).count() == 0
    got = packed.agg(F.sum("n_tok")).first()[0]
    want = seq.agg(F.sum("n_tok")).first()[0]
    assert got == want


def test_fill_beats_one_sequence_per_block(spark):
    seq, packed = _packed(spark)
    stats = packing_stats(packed, BLOCK).first()
    naive_blocks = seq.count()  # one sequence per window
    assert stats.n_blocks < naive_blocks / 2
    assert stats.avg_fill > 0.6


def test_deterministic_for_fixed_partitioning(spark):
    seq = generate_sequences(spark, 1000, seed=9, max_tok=300)
    a = pack_sequences(seq, block_len=BLOCK, partitions=8)
    b = pack_sequences(seq, block_len=BLOCK, partitions=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
