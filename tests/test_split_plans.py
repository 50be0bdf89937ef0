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


def test_time_density_chunks_reference_heuristic(spark):
    """S3 analog of the reference's ObjectID-timestamp density strategy
    (backfill.go:179-209): width = max(1, span_hours/6) * 10 s, chunks
    contiguous + half-open, full coverage incl. the max row, and the
    chunk COUNT saturates (~2160) as the span grows — the density scales
    with the collection instead of the chunk count."""
    import datetime

    from pyspark.sql import functions as F

    from olake_spark.plans.split import time_density_chunks

    def mk(span_hours, n=200):
        start = datetime.datetime(2024, 1, 1)
        step = span_hours * 3600.0 / (n - 1)
        rows = [
            (i, start + datetime.timedelta(seconds=int(i * step)))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "id long, ts timestamp")

    # small span (< 6h): width floors at 10 s
    df = mk(1)
    chunks = time_density_chunks(df, "ts")
    assert chunks[0].max - chunks[0].min == 10
    # 12h span -> width = 2*10 s
    assert (lambda c: c[0].max - c[0].min)(time_density_chunks(mk(12), "ts")) == 20
    # contiguity + half-open coverage incl. the closed-out max
    for a, b in zip(chunks, chunks[1:]):
        assert a.max == b.min
    lo = chunks[0].min
    hi = chunks[-1].max
    es = [r[0] for r in df.select(F.unix_timestamp("ts")).collect()]
    assert min(es) == lo and max(es) < hi  # max row inside the last chunk
    # chunk-count saturation: 30 days vs 120 days -> same ~2160 count
    n30 = len(time_density_chunks(mk(24 * 30), "ts"))
    n120 = len(time_density_chunks(mk(24 * 120), "ts"))
    assert 2000 <= n30 <= 2400 and 2000 <= n120 <= 2400
    # empty input
    empty = spark.createDataFrame([], "id long, ts timestamp")
    assert time_density_chunks(empty, "ts") == []
