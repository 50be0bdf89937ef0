"""Derive the tokenized-sequences table from the documents corpus.

Bridges the driver testdata to the engine's primary input shape
(doc_id, tokens:array<int32>, n_tok, source — BASELINE.json input_hint).
Tokenization is entirely JVM-side Catalyst expressions (split +
higher-order transform + xxhash64) — zero Python in the hot path, which
is what a 100 TB tokenize pass requires.

For a real learned subword vocabulary (trained merges + alphabet, UNK
handling, round-trippable decode) use ``olake_spark.operators.bpe``:
``train_bpe`` + ``bpe_encode`` produce the same (tokens, n_tok) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olake_spark.schema import with_system_columns
from olake_spark.sources.tpch import load_table

VOCAB = 50257


def tokenize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text -> array<int32> token ids via whitespace split + word hash.

    A stand-in for BPE that keeps the whole pipeline vectorized: the
    token id of a word is pmod(xxhash64(word), VOCAB). Deterministic,
    language-agnostic, and executed inside whole-stage codegen.
    """
    words = F.split(F.col(text_col), " ")
    tokens = F.transform(
        words, lambda w: F.pmod(F.xxhash64(w), F.lit(VOCAB)).cast("int")
    )
    return df.withColumn("tokens", tokens).withColumn(
        "n_tok", F.size("tokens").cast("int")
    )


def sequences_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> engine-shaped sequences table (+ system cols)."""
    docs = load_table(spark, sf_dir, "documents")
    seq = (
        tokenize_text(docs)
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "tokens",
            "n_tok",
            F.col("source").cast("string").alias("source"),
        )
    )
    return with_system_columns(seq)
