"""Chunk/split planners — the Spark analogs of the reference's parallel
scan planning (SURVEY.md §2.1 S4-S8).

The reference plans chunks from server statistics before reading
(relpages/reltuples: /root/reference/drivers/postgres/internal/backfill.go:102-192,
splitVector: /root/reference/drivers/mongodb/internal/backfill.go:126-177).
In Spark, file splits come free from the source; these planners exist
for (a) explicit ``repartitionByRange`` sizing, (b) resumable-chunk
bookkeeping, (c) driving partitioned reads of external stores.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class Chunk:
    """Half-open key range — the unit of parallel scan *and* of
    resumable state (/root/reference/types/state.go:209-212)."""

    min: object
    max: object


def numeric_stride_chunks(df: DataFrame, col: str, batch_size: int) -> list[Chunk]:
    """S6 — min/max of the split key -> fixed-stride ranges
    (splitViaBatchSize, backfill.go:123-141). One aggregate scan."""
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    if row.lo is None:
        return []
    lo, hi = int(row.lo), int(row.hi)
    n = max(1, math.ceil((hi - lo + 1) / batch_size))
    return [
        Chunk(lo + i * batch_size, min(lo + (i + 1) * batch_size - 1, hi))
        for i in range(n)
    ]


def quantile_chunks(
    df: DataFrame, col: str, num_chunks: int, rel_err: float = 0.001
) -> list[Chunk]:
    """S7 — boundary walk for arbitrary orderable keys. The reference
    walks `ORDER BY k LIMIT batch` queries (splitViaNextQuery,
    backfill.go:143-161); one distributed ``approxQuantile`` replaces
    the N round trips."""
    probs = [i / num_chunks for i in range(1, num_chunks)]
    bounds = df.stat.approxQuantile(col, probs, rel_err)
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    if row.lo is None:
        return []
    edges = [row.lo] + bounds + [row.hi]
    return [Chunk(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


def ntile_bounds(df: DataFrame, col: str, num_chunks: int) -> DataFrame:
    """S7 exact variant: ntile() bucket stats — returns one row per
    bucket with min/max/count (used as an oracle-checkable query)."""
    w = Window.orderBy(F.col(col))
    return (
        df.select(col)
        .withColumn("bucket", F.ntile(num_chunks).over(w))
        .groupBy("bucket")
        .agg(
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            F.count("*").alias("cnt"),
        )
    )


def time_density_chunks(df: DataFrame, ts_col: str) -> list[Chunk]:
    """S3 — the reference's ObjectID-timestamp density strategy
    (timestampStrategy, /root/reference/drivers/mongodb/internal/
    backfill.go:179-209): fetch the time extremes, derive the chunk
    WIDTH from the total span — every 6 h of span adds 10 s of width
    (width = max(1, span_hours/6) * 10 s, so chunk count saturates at
    ~2160 however large the collection grows) — then stride [first,
    last] by that width. The reference converts each boundary to a
    minimal ObjectID; here chunks stay native timestamps (epoch seconds,
    the same granularity an ObjectID encodes), with the last chunk
    closed just past the max like generateMinObjectID(last + 1 s).

    One extremes aggregation plans the whole scan — no data pass.
    Boundaries are epoch SECONDS (unix_timestamp — the granularity an
    ObjectID encodes), so chunk assignment is a pure integer floor and
    invariant to timezone interpretation of naive timestamps."""
    e = F.unix_timestamp(F.col(ts_col))
    row = df.agg(F.min(e).alias("lo"), F.max(e).alias("hi")).first()
    if row.lo is None:
        return []
    first = int(row.lo)
    last = int(row.hi)
    span_hours = (last - first) / 3600.0
    width = int(max(1.0, span_hours / 6.0)) * 10  # seconds
    chunks = []
    start = first
    while start <= last:
        end = start + width
        chunks.append(Chunk(start, end if end <= last else last + 1))
        start = end
    return chunks


def chunked_read(df: DataFrame, col: str, chunk: Chunk) -> DataFrame:
    """S4 — one chunk's range scan (WHERE k BETWEEN lo AND hi, the query
    shape of /root/reference/pkg/jdbc/jdbc.go:41-52). With parquet the
    predicate reaches the scan (PushedFilters) and prunes row groups."""
    return df.filter(F.col(col).between(F.lit(chunk.min), F.lit(chunk.max)))


def estimate_row_count(df: DataFrame) -> int:
    """S8 — the reference asks the server (reltuples / collStats); for
    our table layer the manifests answer without a scan (Table.total_rows).
    For an arbitrary DataFrame a count() is the honest fallback."""
    return df.count()
