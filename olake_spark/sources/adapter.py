"""Source-adapter interface — the reference's driver contract, Spark-shaped.

The reference abstracts sources behind a driver interface (Check /
Discover / chunked Read with persisted chunk state —
/root/reference/protocol/root.go + drivers/base); its Postgres backfill
plans key-range chunks from server stats and reads them in parallel
(/root/reference/drivers/postgres/internal/backfill.go:19-100). The
adapters here feed the SAME sync path (sources/backfill.chunked_backfill)
from different stores:

- ParquetDirSource — local/lake files; chunk planning runs the engine's
  split planners (plans/split.py) and each chunk's BETWEEN predicate
  reaches the parquet scan (PushedFilters).
- JdbcSource — database tables via spark.read.jdbc; the same planners
  produce the per-chunk WHERE predicates Spark turns into one query per
  partition (the splitViaBatchSize analog). This sandbox has no network
  or JDBC jars, so execution is gated; predicate/plan construction is
  real and unit-tested.

Chunks are HALF-OPEN [lo, hi) except the last (closed), so adjacent
quantile chunks never double-read boundary rows.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.plans.split import (
    Chunk,
    numeric_stride_chunks,
    quantile_chunks,
)


@dataclass
class StreamInfo:
    name: str
    namespace: str
    schema: T.StructType
    supported_sync_modes: tuple[str, ...] = ("full_refresh", "incremental")


def chunk_filter(col: str, chunk: Chunk, is_last: bool) -> F.Column:
    """Half-open range predicate (closed on the last chunk)."""
    c = F.col(col) >= F.lit(chunk.min)
    return c & (F.col(col) <= F.lit(chunk.max) if is_last else F.col(col) < F.lit(chunk.max))


def _sql_literal(v) -> str:
    """ANSI-SQL literal: strings quote embedded ' by doubling (Python
    repr would backslash-escape — invalid standard SQL and unsafe as a
    pushed-down JDBC predicate for values like O'Brien)."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def chunk_predicate_sql(col: str, chunk: Chunk, is_last: bool) -> str:
    """The same predicate as SQL text — what spark.read.jdbc(predicates=
    [...]) pushes to the database, one query per chunk/partition
    (reference query shape: /root/reference/pkg/jdbc/jdbc.go:41-52)."""
    op = "<=" if is_last else "<"
    return (
        f"{col} >= {_sql_literal(chunk.min)} "
        f"AND {col} {op} {_sql_literal(chunk.max)}"
    )


class ParquetDirSource:
    """A directory of <stream>.parquet files as a multi-stream source."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def check(self) -> None:
        if not glob.glob(os.path.join(self.path, "*.parquet")):
            raise FileNotFoundError(f"no parquet streams under {self.path}")

    def streams(self) -> list[StreamInfo]:
        ns = os.path.basename(self.path.rstrip("/"))
        out = []
        for p in sorted(glob.glob(os.path.join(self.path, "*.parquet"))):
            name = os.path.basename(p).replace(".parquet", "")
            out.append(
                StreamInfo(name, ns, self.spark.read.parquet(p).schema)
            )
        return out

    def read(self, stream: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.path, f"{stream}.parquet")
        )

    def plan_chunks(
        self, stream: str, split_col: str, num_chunks: int = 8,
        batch_size: int | None = None,
    ) -> list[Chunk]:
        """Half-open chunks (last closed) covering the stream exactly."""
        df = self.read(stream)
        dtype = dict(df.dtypes)[split_col]
        if batch_size and dtype in ("int", "bigint", "smallint"):
            cs = numeric_stride_chunks(df, split_col, batch_size)
            # stride chunks are inclusive [lo, hi]; open the right edge
            # of every chunk but the last
            return [Chunk(c.min, c.max + 1) for c in cs[:-1]] + cs[-1:]
        if dtype in ("int", "bigint", "smallint", "float", "double"):
            return quantile_chunks(df, split_col, num_chunks)
        # orderable non-numeric keys (string/timestamp): inner boundaries
        # from a bounded sample, outer edges EXACT (a sampled min/max
        # would silently drop rows outside the sample's range)
        row = df.agg(
            F.min(split_col).alias("lo"), F.max(split_col).alias("hi")
        ).first()
        if row.lo is None:
            return []
        qs = sorted(
            r[0]
            for r in df.select(split_col)
            .sample(False, min(1.0, 100_000 / max(df.count(), 1)), seed=42)
            .collect()
        )
        inner = sorted(
            {
                qs[min(len(qs) - 1, i * len(qs) // num_chunks)]
                for i in range(1, num_chunks)
            }
            - {row.lo, row.hi}
        ) if qs else []
        edges = [row.lo] + inner + [row.hi]
        return [Chunk(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]

    def read_chunk(
        self, stream: str, split_col: str, chunk: Chunk, is_last: bool
    ) -> DataFrame:
        return self.read(stream).filter(chunk_filter(split_col, chunk, is_last))


class JdbcSource:
    """JDBC-shaped source: same adapter surface, predicates pushed to the
    database. Requires a reachable database + driver jar at runtime
    (neither exists in this sandbox — construction and predicate
    generation are tested; execution raises a clear error)."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.properties = properties or {}

    def check(self) -> None:
        self.spark.read.jdbc(
            self.url, "(SELECT 1) olake_check", properties=self.properties
        ).first()

    def read(self, stream: str) -> DataFrame:
        return self.spark.read.jdbc(self.url, stream, properties=self.properties)

    def plan_chunks_from_bounds(
        self, lo: int, hi: int, batch_size: int
    ) -> list[Chunk]:
        """Stride chunks from externally-known bounds (the reference asks
        pg_stats/collStats; a JDBC MIN/MAX round trip supplies these).
        Half-open except the last (closed at hi)."""
        import math

        n = max(1, math.ceil((hi - lo + 1) / batch_size))
        return [
            Chunk(lo + i * batch_size, hi if i == n - 1 else lo + (i + 1) * batch_size)
            for i in range(n)
        ]

    def chunk_predicates(
        self, split_col: str, chunks: list[Chunk]
    ) -> list[str]:
        return [
            chunk_predicate_sql(split_col, c, i == len(chunks) - 1)
            for i, c in enumerate(chunks)
        ]

    def read_chunked(
        self, stream: str, split_col: str, chunks: list[Chunk]
    ) -> DataFrame:
        """One database query per chunk, executed as one Spark partition
        each — spark.read.jdbc's predicates mode."""
        return self.spark.read.jdbc(
            self.url,
            stream,
            predicates=self.chunk_predicates(split_col, chunks),
            properties=self.properties,
        )
