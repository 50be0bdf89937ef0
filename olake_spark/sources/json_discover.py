"""Sample-based schema discovery for semi-structured JSON-lines input.

The reference discovers a Mongo collection's schema by fetching 10k docs
from BOTH ends of the collection and resolving every row into the stream
schema through the type-promotion lattice
(/root/reference/drivers/mongodb/internal/mon.go:151-203 +
typeutils/fields.go:104-129). Here:

- the sample is head-N plus a seeded random-N (drift living anywhere in
  the file is caught, not just at the ends);
- each sampled row walks the SAME lattice the engine uses for schema
  evolution (functions/reformat.promote_type): bool < long < double <
  string, timestamp-like strings promote to timestamp; L1 structs
  flatten to canon-named columns; arrays and deeper nesting
  JSON-stringify (flatten.go:45-56);
- the discover pass resolves a bounded sample driver-side (exactly the
  reference's 20k-document budget); the FULL read stays distributed and
  JVM-side: from_json against the raw nested schema, an explicit
  collision-free projection, then T4 coercion (multi-format timestamps,
  bool truth table).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.functions.reformat import (
    canon_name,
    coerce_to_schema,
    promote_type,
)

_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?([+-]\d{2}:?\d{2}|Z)?)?$"
)


@dataclass
class DiscoveredStream:
    """Outcome of discovery: the raw parse shape and the resolved types.

    raw_schema — what from_json parses (all leaves string; L1 structs
    kept as structs; arrays as array<string>).
    schema — the flat, lattice-resolved output schema (canon names).
    projection — (kind, key, subkey, flat_name) per output column: the
    explicit origin map the read applies, so name collisions (a struct
    child canon-colliding with a top-level key) resolve to distinct
    output columns instead of ambiguous duplicates.
    """

    raw_schema: T.StructType
    schema: T.StructType
    projection: list[tuple[str, str, str | None, str]]


def _value_type(v) -> T.DataType | None:
    """Observed Spark type of one JSON scalar (None for null — nulls
    carry no type evidence, matching typeutils.Resolve)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        if _TS_RE.match(v.strip()):
            return T.TimestampType()
        return T.StringType()
    return T.StringType()


class _Resolver:
    """Folds sampled rows into (raw nested shape, flat resolved types)."""

    def __init__(self) -> None:
        self.flat: dict[str, T.DataType] = {}
        self.flat_order: list[str] = []
        # flat name -> origin (key, subkey|None); collisions from a
        # DIFFERENT origin get a parent-prefixed / suffixed name so the
        # read never produces two columns with one name
        self.origin: dict[str, tuple[str, str | None]] = {}
        # top-level key -> 'scalar' | 'struct' | 'array'
        self.shape: dict[str, str] = {}
        self.shape_order: list[str] = []
        self.children: dict[str, list[str]] = {}

    def _flat_name(self, key: str, subkey: str | None) -> str:
        cand = canon_name(subkey if subkey is not None else key)
        if self.origin.get(cand, (key, subkey)) == (key, subkey):
            return cand
        if subkey is not None:
            cand2 = canon_name(f"{key}_{subkey}")
            if self.origin.get(cand2, (key, subkey)) == (key, subkey):
                return cand2
            cand = cand2
        i = 2
        while self.origin.get(f"{cand}_{i}", (key, subkey)) != (key, subkey):
            i += 1
        return f"{cand}_{i}"

    def _note_flat(
        self, key: str, subkey: str | None, vt: T.DataType | None
    ) -> str:
        name = self._flat_name(key, subkey)
        if name not in self.flat:
            self.flat_order.append(name)
            self.origin[name] = (key, subkey)
            self.flat[name] = vt or T.NullType()
        elif vt is not None:
            if self.flat[name] == T.NullType():
                self.flat[name] = vt
            elif self.flat[name] != vt:
                self.flat[name] = promote_type(self.flat[name], vt)
        return name

    def _note_shape(self, key: str, kind: str) -> None:
        if key not in self.shape:
            self.shape_order.append(key)
            self.shape[key] = kind
        elif self.shape[key] != kind:
            self.shape[key] = "scalar"  # conflicting shapes -> string scalar

    def add(self, row: dict) -> None:
        for k, v in row.items():
            if isinstance(v, dict):
                self._note_shape(k, "struct")
                kids = self.children.setdefault(k, [])
                for sk, sv in v.items():
                    if sk not in kids:
                        kids.append(sk)
                    if isinstance(sv, (dict, list)):
                        self._note_flat(k, sk, T.StringType())
                    else:
                        self._note_flat(k, sk, _value_type(sv))
            elif isinstance(v, list):
                self._note_shape(k, "array")
                self._note_flat(k, None, T.StringType())
            else:
                self._note_shape(k, "scalar")
                self._note_flat(k, None, _value_type(v))

    def result(self) -> DiscoveredStream:
        raw_fields = []
        for k in self.shape_order:
            kind = self.shape[k]
            if kind == "struct":
                raw_fields.append(
                    T.StructField(
                        k,
                        T.StructType(
                            [
                                T.StructField(c, T.StringType(), True)
                                for c in self.children[k]
                            ]
                        ),
                        True,
                    )
                )
            elif kind == "array":
                raw_fields.append(
                    T.StructField(k, T.ArrayType(T.StringType(), True), True)
                )
            else:
                raw_fields.append(T.StructField(k, T.StringType(), True))
        flat_fields = [
            T.StructField(
                n,
                T.StringType() if self.flat[n] == T.NullType() else self.flat[n],
                True,
            )
            for n in self.flat_order
        ]
        projection = []
        for n in self.flat_order:
            key, subkey = self.origin[n]
            kind = self.shape.get(key, "scalar") if subkey is None else "struct"
            projection.append((kind, key, subkey, n))
        return DiscoveredStream(
            T.StructType(raw_fields), T.StructType(flat_fields), projection
        )


def discover_json(
    spark: SparkSession, path: str, sample_rows: int = 10_000, seed: int = 42
) -> DiscoveredStream:
    """Head-N + tail-N + seeded-random-N sampling, lattice fold on the
    driver. Both-ends sampling mirrors the reference's ``$natural``
    +1/-1 dual cursor (drivers/mongodb/internal/mon.go:176-179):
    append-heavy corpora drift at the TAIL, exactly where head-only or
    sparse random sampling is most likely to miss a new column; the
    random block still covers mid-file drift."""
    lines = spark.read.text(path)
    head = [r.value for r in lines.limit(sample_rows).collect()]
    rand: list[str] = []
    tail: list[str] = []
    if len(head) == sample_rows:  # file larger than the head budget
        total = lines.count()
        frac = min(1.0, 2.0 * sample_rows / max(total, 1))
        rand = [
            r.value
            for r in lines.sample(False, frac, seed=seed)
            .limit(sample_rows)
            .collect()
        ]
        # df.tail reads only the trailing partitions — no full scan
        tail = [r.value for r in lines.tail(sample_rows)]
    res = _Resolver()
    n = 0
    for ln in head + rand + tail:
        ln = ln.strip()
        if not ln:
            continue
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            res.add(obj)
            n += 1
    if n == 0:
        raise ValueError(f"no parseable JSON objects sampled from {path}")
    return res.result()


def read_json(spark: SparkSession, path: str, disc: DiscoveredStream) -> DataFrame:
    """Distributed, JVM-side read of the discovered stream: from_json
    parse -> explicit projection (discovery's exact origin->name map,
    collision-free by construction) -> T4 coercion."""
    parsed = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(F.from_json(F.col("value"), disc.raw_schema).alias("r"))
    )
    cols = []
    for kind, key, subkey, name in disc.projection:
        if kind == "struct":
            cols.append(F.col(f"r.`{key}`.`{subkey}`").alias(name))
        elif kind == "array":
            cols.append(F.to_json(F.col(f"r.`{key}`")).alias(name))
        else:
            cols.append(F.col(f"r.`{key}`").alias(name))
    return coerce_to_schema(parsed.select(*cols), disc.schema)
