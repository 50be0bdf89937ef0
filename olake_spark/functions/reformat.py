"""Row-transformation pipeline pieces (SURVEY.md §2.3 T1-T7).

The reference's per-record writer pipeline is flatten → inject system
cols → schema-drift detect/evolve → reformat-cast
(/root/reference/protocol/writers.go:127-156). Here each step is a
vectorized DataFrame transformation:

- T1 flatten / key canonicalization (/root/reference/typeutils/flatten.go:27-82)
- T3 schema drift + promotion lattice (/root/reference/typeutils/fields.go:18-39,104-129)
- T4 value coercion incl. multi-format date parsing
  (/root/reference/typeutils/reformat.go:21-33,45-128)
- T7 cursor max-on-type (/root/reference/typeutils/datatype.go:59-95)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------- T1 flatten
_CANON_RE = re.compile(r"[^a-z0-9_]")


def canon_name(name: str) -> str:
    """Key canonicalization: lowercase, non-alphanumerics -> '_'
    (flatten.go:71-82)."""
    return _CANON_RE.sub("_", name.strip().lower())


def canonicalize_columns(df: DataFrame) -> DataFrame:
    out = df
    for c in df.columns:
        cc = canon_name(c)
        if cc != c:
            out = out.withColumnRenamed(c, cc)
    return out


def flatten_struct(df: DataFrame, col: str, stringify_nested: bool = True) -> DataFrame:
    """L1-flatten one struct column: each field becomes a top-level
    canon-named column; deeper nesting is JSON-stringified, mirroring
    the reference's arrays/maps→JSON rule (flatten.go:45-56). Our
    ``tokens`` array is exempt by design (SURVEY.md §1.2)."""
    field = next(f for f in df.schema.fields if f.name == col)
    assert isinstance(field.dataType, T.StructType)
    cols = [c for c in df.columns if c != col]
    for sub in field.dataType.fields:
        target = canon_name(sub.name)
        v = F.col(f"{col}.{sub.name}")
        if stringify_nested and isinstance(
            sub.dataType, (T.StructType, T.ArrayType, T.MapType)
        ):
            v = F.to_json(v)
        cols.append(v.alias(target))
    return df.select(*cols)


# ---------------------------------------------------- T3 promotion lattice
# bool < int64 < float64 < string; timestamp < ts_milli < ts_micro < ts_nano
# < string; string is the universal top (typeutils/fields.go:18-39).
_NUM_CHAIN = ["boolean", "integer", "long", "float", "double", "string"]
_TS_CHAIN = ["date", "timestamp_ntz", "timestamp", "string"]


def promote_type(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    for chain in (_NUM_CHAIN, _TS_CHAIN):
        if an in chain and bn in chain:
            name = chain[max(chain.index(an), chain.index(bn))]
            return getattr(
                T,
                {
                    "boolean": "BooleanType",
                    "integer": "IntegerType",
                    "long": "LongType",
                    "float": "FloatType",
                    "double": "DoubleType",
                    "string": "StringType",
                    "date": "DateType",
                    "timestamp": "TimestampType",
                    "timestamp_ntz": "TimestampNTZType",
                }[name],
            )()
    return T.StringType()  # anything ⊔ anything = string (universal top)


def merge_schemas(
    current: T.StructType, incoming: T.StructType
) -> tuple[T.StructType, dict]:
    """Schema-drift resolution: returns (evolved schema, drift report).

    New columns are appended nullable; conflicting types walk the
    promotion lattice (Fields.Process, typeutils/fields.go:104-129).
    """
    drift = {"new_columns": [], "promoted": []}
    by_name = {f.name: f for f in current.fields}
    out = list(current.fields)
    for f in incoming.fields:
        cur = by_name.get(f.name)
        if cur is None:
            nf = T.StructField(f.name, f.dataType, True)
            out.append(nf)
            drift["new_columns"].append(f.name)
        elif cur.dataType != f.dataType:
            p = promote_type(cur.dataType, f.dataType)
            if p != cur.dataType:
                out[out.index(cur)] = T.StructField(
                    cur.name, p, cur.nullable or f.nullable
                )
                drift["promoted"].append((f.name, cur.dataType.simpleString(), p.simpleString()))
    return T.StructType(out), drift


# ------------------------------------------------------------------- T4 casts
# the reference accepts 11 datetime layouts (typeutils/reformat.go:21-33);
# these are the Spark-format equivalents of the common ones.
DATE_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
    "yyyyMMdd",
]


def parse_timestamp_multi(col: Column) -> Column:
    """First-match-wins multi-format timestamp parse, with the year
    clamped to [0, 9999] (reformat.go:189-193) by construction of the
    formats. NULL when nothing matches (reference errors; we tombstone)."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in DATE_FORMATS]
    return F.coalesce(*attempts)


_TRUTHY = ["1", "t", "true", "y", "yes", "on"]
_FALSY = ["0", "f", "false", "n", "no", "off"]


def parse_bool(col: Column) -> Column:
    """String→bool truth table (reformat.go:76-92)."""
    low = F.lower(F.trim(col))
    return (
        F.when(low.isin(_TRUTHY), F.lit(True))
        .when(low.isin(_FALSY), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_to_schema(
    df: DataFrame, target: T.StructType, extra_cols: list[str] | None = None
) -> DataFrame:
    """Cast every column to the resolved schema type (ReformatRecord,
    reformat.go:45-60): scalars→singleton arrays when the target is an
    array (reformat.go:119-124), strings→timestamp via the format list,
    strings→bool via the truth table, else plain cast.

    ``extra_cols``: pass-through columns kept verbatim after the schema
    fields (e.g. parquet ``_metadata``-derived columns a delete-applying
    scan must carry across the coercion)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        src = have.get(f.name)
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        c = F.col(f.name)
        # simpleString drops nullability — array<int> with/without
        # containsNull must NOT trigger a (disallowed) cast
        if src.dataType.simpleString() == f.dataType.simpleString():
            cols.append(c.alias(f.name))
        elif isinstance(f.dataType, T.ArrayType) and not isinstance(
            src.dataType, T.ArrayType
        ):
            cols.append(
                F.array(c.cast(f.dataType.elementType)).alias(f.name)
            )
        elif isinstance(f.dataType, T.TimestampType) and isinstance(
            src.dataType, T.StringType
        ):
            cols.append(parse_timestamp_multi(c).alias(f.name))
        elif isinstance(f.dataType, T.BooleanType) and isinstance(
            src.dataType, T.StringType
        ):
            cols.append(parse_bool(c).alias(f.name))
        else:
            cols.append(c.cast(f.dataType).alias(f.name))
    for name in extra_cols or []:
        cols.append(F.col(name))
    return df.select(*cols)


# -------------------------------------------------------------- T6 ObjectID
# Mongo ObjectIDs arrive from the wire as the driver's string form
# `ObjectID("65f1...3b")`; the reference unwraps the primary id in place
# (handleObjectID, /root/reference/drivers/mongodb/internal/backfill.go:332-335,
# prefix/suffix constants /root/reference/constants/constants.go:6).
_OID_WRAPPED_RE = r'^ObjectID\("([0-9a-fA-F]{24})"\)$'
_OID_BARE_RE = r"^[0-9a-fA-F]{24}$"


def objectid_canon(col: Column) -> Column:
    """Canonicalize an ObjectID-ish string to the bare lowercase 24-hex id.

    Accepts the wrapped wire form and already-bare hex; anything else
    becomes NULL (the reference type-asserts and would panic on non-OID
    input — a typed table tombstones instead). Pure Catalyst: regexp +
    lower, no UDF."""
    inner = F.regexp_extract(col, _OID_WRAPPED_RE, 1)
    return (
        F.when(inner != "", F.lower(inner))
        .when(col.rlike(_OID_BARE_RE), F.lower(col))
        .otherwise(F.lit(None).cast("string"))
    )


def objectid_timestamp(col: Column) -> Column:
    """Embedded creation time of a canonical 24-hex ObjectID as unix
    seconds (the id's first 4 bytes, per the public BSON spec — the same
    field the reference's density chunk planner keys on,
    /root/reference/drivers/mongodb/internal/backfill.go:179-209).
    NULL-safe on NULL/garbage input."""
    return F.when(
        col.rlike(_OID_BARE_RE),
        F.conv(F.substring(col, 1, 8), 16, 10).cast("long"),
    ).otherwise(F.lit(None).cast("long"))


# ----------------------------------------------------------------- T7 cursor
def max_cursor(df: DataFrame, cursor_col: str, group_cols: list[str]) -> DataFrame:
    """Cursor advancement under max-on-type semantics
    (typeutils/datatype.go:59-95): the incremental-sync watermark per
    stream."""
    return df.groupBy(*group_cols).agg(F.max(cursor_col).alias("cursor"))
