"""CDC change-batch decoding — the wal2json analog (SURVEY.md S12).

The reference consumes wal2json messages, routes them per table, and
reconstructs deletes from oldkeys
(/root/reference/pkg/waljs/filter.go:30-74, message shape
/root/reference/pkg/waljs/types.go:47-63). Here a change feed is a
stream/batch of JSON lines:

    {"op": "insert"|"update"|"delete", "table": "sequences",
     "lsn": 123, "doc_id": "...", "tokens": [..], "n_tok": 5,
     "source": "web", "ts_ms": 1700000000000}

``decode_changes`` turns raw JSON strings into the engine's change
shape (payload columns + ``_cdc_deleted_at`` tombstone, per
/root/reference/drivers/postgres/internal/cdc.go:123-131) using
``from_json`` — fully vectorized, schema-checked, corrupt records
dropped (tombstoned to NULL doc_id and filtered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def decode_changes(
    raw: DataFrame, json_col: str = "value", table: str = "sequences"
) -> DataFrame:
    """raw JSON lines -> (doc_id, tokens, n_tok, source, _cdc_deleted_at,
    lsn). Delete rows carry the tombstone timestamp; inserts/updates
    carry payload. Unknown tables and corrupt lines are filtered —
    the per-table routing of FilterChange."""
    parsed = raw.select(F.from_json(F.col(json_col), CHANGE_SCHEMA).alias("c"))
    return (
        parsed.filter(F.col("c.table") == table)
        .filter(F.col("c.doc_id").isNotNull())
        .filter(F.col("c.op").isin("insert", "update", "delete"))
        .select(
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.tokens").alias("tokens"),
            F.col("c.n_tok").alias("n_tok"),
            F.col("c.source").alias("source"),
            F.when(
                F.col("c.op") == "delete",
                F.timestamp_millis(F.coalesce(F.col("c.ts_ms"), F.lit(0))),
            )
            .otherwise(F.lit(None).cast("timestamp"))
            .alias("_cdc_deleted_at"),
            F.col("c.lsn").alias("lsn"),
        )
    )
