"""Split-planner tests (SURVEY.md S4-S8 analogs)."""

from olake_spark.plans.split import (
    Chunk,
    chunked_read,
    numeric_stride_chunks,
    ntile_bounds,
    quantile_chunks,
)
from olake_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_numeric_stride_chunks_cover_everything(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    chunks = numeric_stride_chunks(li, "l_orderkey", batch_size=400)
    assert len(chunks) >= 2
    total = sum(chunked_read(li, "l_orderkey", c).count() for c in chunks)
    assert total == li.count()
    # chunks are contiguous, non-overlapping
    for a, b in zip(chunks, chunks[1:]):
        assert b.min == a.max + 1


def test_quantile_chunks_balanced(spark):
    o = load_table(spark, SF_DIR, "orders")
    chunks = quantile_chunks(o, "o_orderkey", 8)
    assert len(chunks) == 8
    counts = [
        o.filter(
            (o.o_orderkey > c.min if i else o.o_orderkey >= c.min)
            & (o.o_orderkey <= c.max)
        ).count()
        for i, c in enumerate(chunks)
    ]
    assert sum(counts) == o.count()
    avg = sum(counts) / len(counts)
    assert max(counts) < 2.5 * avg  # roughly balanced


def test_ntile_bounds_partition_key_space(spark):
    o = load_table(spark, SF_DIR, "orders")
    b = ntile_bounds(o, "o_orderkey", 4).orderBy("bucket").collect()
    assert [r.bucket for r in b] == [1, 2, 3, 4]
    assert sum(r.cnt for r in b) == o.count()
    for prev, nxt in zip(b, b[1:]):
        assert prev.hi <= nxt.lo


def test_chunk_dataclass():
    c = Chunk(1, 10)
    assert c.min == 1 and c.max == 10
