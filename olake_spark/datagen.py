"""Deterministic synthetic tokenized-sequences generator (SURVEY.md P0).

Shape per BASELINE.json input_hint / FIXTURES.md §1:
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` with
Zipf-skewed ``source`` (the hot-key axis) and log-normal ``n_tok``.

Everything is a pure function of the row id via counter-based SplitMix64
hashing, so the data is identical regardless of partitioning, executor
count, or run order — generation is `spark.range` + `mapInArrow`
(numpy straight into Arrow buffers; no per-row Python in the hot loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from olake_spark.functions.zorder import splitmix64_np
from olake_spark.schema import with_system_columns

VOCAB = 50257
SOURCES = [
    "web", "books", "code", "wiki", "news", "forums",
    "papers", "legal", "patents", "chat", "math", "recipes",
]
ZIPF_S = 1.2
# tokens for doc i are splitmix64(i << 13 | j); supports n_tok < 8192
_TOK_SHIFT = np.uint64(13)

GEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


_MASK64 = (1 << 64) - 1


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    mix = np.uint64((salt * 0x9E3779B97F4A7C15) & _MASK64)
    h = splitmix64_np(ids.astype(np.uint64) ^ mix)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _batch_fields(raw_ids: np.ndarray, seed: int, max_tok: int):
    """Vectorized field synthesis shared by the pandas and Arrow shapes:
    (doc_id:U-str array, token values:int32, token list ends:int64,
    n_tok:int32, source:object array)."""
    raw_ids = raw_ids.astype(np.uint64)
    ids = raw_ids + np.uint64((seed * 0x51_7C_C1B7_2722_0A95) & _MASK64)
    cdf = _zipf_cdf(len(SOURCES), ZIPF_S)
    src_idx = np.searchsorted(cdf, _u01(ids, 1), side="left")
    src = np.array(SOURCES, dtype=object)[src_idx]

    # log-normal n_tok via Box-Muller, clipped to [8, max_tok]
    u1 = np.clip(_u01(ids, 2), 1e-12, 1.0)
    u2 = _u01(ids, 3)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    n_tok = np.clip(np.exp(5.0 + 1.0 * z), 8, max_tok).astype(np.int32)

    # counter-based token streams: token j of doc i = h(i << 13 | j) % VOCAB
    total = int(n_tok.sum())
    base = np.repeat(ids << _TOK_SHIFT, n_tok)
    ends = np.cumsum(n_tok.astype(np.int64))
    offs = np.arange(total, dtype=np.uint64) - np.repeat(
        (ends - n_tok).astype(np.uint64), n_tok
    )
    toks = (splitmix64_np(base + offs) % np.uint64(VOCAB)).astype(np.int32)

    # vectorized doc_id = f"{source}-{id:012d}" via numpy char ops
    id_digits = np.char.zfill(raw_ids.astype("U12"), 12)
    doc_id = np.char.add(np.char.add(src.astype("U16"), "-"), id_digits)
    return doc_id, toks, ends, n_tok, src


def row_fields(raw_ids: np.ndarray, seed: int, max_tok: int = 4096) -> pd.DataFrame:
    """Vectorized row synthesis for a batch of row ids (numpy only)."""
    doc_id, toks, ends, n_tok, src = _batch_fields(raw_ids, seed, max_tok)
    tok_lists = np.split(toks, ends[:-1])
    return pd.DataFrame(
        {
            "doc_id": pd.array(doc_id, dtype="string"),
            "tokens": pd.Series(tok_lists, dtype=object),
            "n_tok": n_tok,
            "source": pd.array(src, dtype="string"),
        }
    )


def arrow_batch(raw_ids: np.ndarray, seed: int, max_tok: int = 4096):
    """Same rows as ``row_fields`` but assembled directly as an Arrow
    RecordBatch: the token column is ONE contiguous int32 buffer plus an
    offsets array (``ListArray.from_arrays``) instead of a per-row
    python list-of-arrays that pandas->Arrow conversion would walk
    object-by-object — ~30% faster end-to-end on the generation stage
    (guide §4.2's re-slice-the-buffer property)."""
    import pyarrow as pa

    doc_id, toks, ends, n_tok, src = _batch_fields(raw_ids, seed, max_tok)
    offsets = np.concatenate([[0], ends]).astype(np.int32)
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(toks, pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_id, pa.string()),
            tokens_arr,
            pa.array(n_tok, pa.int32()),
            pa.array(src, pa.string()),
        ],
        ["doc_id", "tokens", "n_tok", "source"],
    )


def generate_sequences(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    max_tok: int = 4096,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of the sequences payload
    (plus reference system columns) as a DataFrame."""
    if num_partitions is None:
        num_partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for b in batches:
            yield arrow_batch(b.column("id").to_numpy(), seed, max_tok)

    base = spark.range(0, num_rows, numPartitions=num_partitions)
    df = base.mapInArrow(gen, schema=GEN_SCHEMA)
    return with_system_columns(df)
