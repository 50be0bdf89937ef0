"""Sequence packing — fixed-length training blocks from variable-length
tokenized sequences.

LLM training consumes fixed context windows; feeding one short sequence
per window wastes compute, so pipelines pack several sequences into each
block (public technique: Raffel et al., "Exploring the Limits of
Transfer Learning" (T5), 2020, §2.2 'packing'). The reference engine
stops at tokenized rows; this extends its sequences table
(BASELINE.json input_hint) to the next pipeline stage.

Scale design: global first-fit-decreasing is inherently sequential, so
we pack per-partition — each executor packs its slice independently
with first-fit-decreasing inside Arrow batches (a pandas transform, no
per-row Python round trips), which parallelizes embarrassingly and
approaches the same fill ratio for any partition holding >> block_len
tokens. Rows are length-sorted within partitions first so FFD sees
descending sizes. Block ids are (partition, local index) — globally
unique without coordination.

Invariants (tested in tests/test_packing.py):
- token conservation: every input token appears in exactly one block;
- no block exceeds block_len unless it holds a single oversized
  sequence (kept whole; callers chunk or drop upstream);
- deterministic for a fixed input partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "block_id string, n_seqs int, n_tok int, fill double, "
    "doc_ids array<string>, tokens array<int>"
)


def pack_sequences(
    seq: DataFrame,
    block_len: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    partitions: int | None = None,
) -> DataFrame:
    """Pack sequences into blocks of <= ``block_len`` tokens.

    Returns one row per block: concatenated tokens, member doc ids,
    token count, and fill ratio.
    """

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # block ids must be unique across ALL Arrow batches of this
        # partition (one fn invocation per partition, many batches when
        # rows exceed arrow.maxRecordsPerBatch) — carry a running offset.
        # Packing itself is per-batch so memory stays bounded by the
        # Arrow batch; fill quality approaches global FFD once a batch
        # holds >> block_len tokens.
        next_block = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            order = pdf[n_tok_col].to_numpy().argsort()[::-1]  # FFD: big first
            # open bins: list of [remaining, doc_ids, token_chunks]
            bins: list[list] = []
            for i in order:
                n = int(pdf[n_tok_col].iloc[i])
                placed = None
                for b in bins:
                    if b[0] >= n:
                        placed = b
                        break
                if placed is None:
                    placed = [block_len, [], []]
                    bins.append(placed)
                placed[0] -= n
                placed[1].append(pdf[id_col].iloc[i])
                placed[2].append(pdf[tokens_col].iloc[i])
            rows = []
            for j, (rem, ids, chunks) in enumerate(bins):
                toks = [t for chunk in chunks for t in chunk]
                rows.append(
                    {
                        "block_id": f"b-{pid:05d}-{next_block + j:06d}",
                        "n_seqs": len(ids),
                        "n_tok": len(toks),
                        "fill": round(len(toks) / block_len, 6),
                        "doc_ids": ids,
                        "tokens": toks,
                    }
                )
            next_block += len(bins)
            yield pd.DataFrame(rows)

    src = seq.select(id_col, tokens_col, n_tok_col)
    if partitions:
        src = src.repartition(partitions, F.col(id_col))
    return src.withColumn("_pid", F.spark_partition_id()).mapInPandas(
        pack, schema=PACKED_SCHEMA
    )


def packing_stats(packed: DataFrame, block_len: int = 2048) -> DataFrame:
    """Audit aggregate over packed blocks: totals + fill distribution."""
    return packed.agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_seqs").alias("total_seqs"),
        F.round(F.avg("fill"), 6).alias("avg_fill"),
        F.max("n_tok").alias("max_block_tok"),
        F.sum((F.col("n_tok") > block_len).cast("int")).alias("oversize_blocks"),
    )
