"""Canonical schemas and system columns for the tokenized-sequences table.

Mirrors the reference's record envelope (RawRecord at
/root/reference/types/data_types.go:26-31 and system-column injection at
/root/reference/protocol/writers.go:133-138): ``_olake_id`` is the PK hash
(md5 of sorted PK values joined by '|', /root/reference/utils/utils.go:229-241),
``_olake_insert_time`` is write time, ``_cdc_deleted_at`` is the delete
tombstone (/root/reference/constants/constants.go:8-10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- primary table: pre-tokenized training sequences (BASELINE.json input_hint)
OLAKE_ID = "_olake_id"
OLAKE_INSERT_TIME = "_olake_insert_time"
CDC_DELETED_AT = "_cdc_deleted_at"

SYSTEM_COLUMNS = [OLAKE_ID, OLAKE_INSERT_TIME, CDC_DELETED_AT]

DATA_FIELDS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
]

SEQUENCES_SCHEMA = T.StructType(
    DATA_FIELDS
    + [
        T.StructField(OLAKE_ID, T.StringType(), False),
        T.StructField(OLAKE_INSERT_TIME, T.LongType(), False),
        T.StructField(CDC_DELETED_AT, T.TimestampType(), True),
    ]
)

DATA_COLUMNS = [f.name for f in DATA_FIELDS]
ALL_COLUMNS = [f.name for f in SEQUENCES_SCHEMA.fields]

# columns for which the manifest records per-file min/max stats
STATS_COLUMNS = ["doc_id", "n_tok", "source", OLAKE_ID]


def olake_id_expr(*pk_cols: str) -> Column:
    """PK hash, byte-interoperable with the reference's GetKeysHash
    (/root/reference/utils/utils.go:229-241): md5 over sorted PK values
    where EVERY value is followed by '|' (trailing separator included)
    and a missing/NULL value renders as Go's fmt.Sprint(nil) = '<nil>'.
    The explicit NULL token matters: concat_ws would silently drop NULLs,
    making ('a', NULL) and ('a',) collide. Vectorized JVM expression — no
    UDF.
    """
    parts: list[Column] = []
    for c in sorted(pk_cols):
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("<nil>")))
        parts.append(F.lit("|"))
    return F.md5(F.concat(*parts))


def with_system_columns(
    df: DataFrame, pk_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Inject the reference's system columns on a payload DataFrame."""
    out = df
    if OLAKE_ID not in df.columns:
        out = out.withColumn(OLAKE_ID, olake_id_expr(*pk_cols))
    if OLAKE_INSERT_TIME not in out.columns:
        out = out.withColumn(
            OLAKE_INSERT_TIME, (F.unix_micros(F.current_timestamp()) / 1000).cast("long")
        )
    if CDC_DELETED_AT not in out.columns:
        out = out.withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
    return out
