"""partition_regex write templating — Catalyst re-expression of the
reference's getPartitionedFilePath
(/root/reference/writers/parquet/parquet.go:307-364).

A pattern like ``/{col,'fallback',granularity}/literal/{now(),'',YY}``
resolves per ROW into a partition path:

- ``{col, fb, gran}`` — the column's value; with a granularity
  (HH/DD/WW/MM/YY) the value is parsed as a timestamp and the UTC
  hour/day/iso-week/month/year is emitted (reference switch at
  parquet.go:335-350);
- NULL (or unparseable-timestamp-under-granularity) falls back to the
  literal fallback, or ``default_<col>`` when the fallback is empty
  (parquet.go:326-328);
- ``now()`` uses the write-time clock (injectable for determinism);
- a trailing '/' is trimmed (parquet.go:363).

Everything is one codegen'd string expression — the path is computed
inline during the write pass, no UDF, no extra scan. Files route by the
resolved path and the manifest records it as the identity-partition
value (Iceberg model: partition info lives in manifests, not directory
layout).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK = re.compile(r"\{([^}]+)\}")
_GRAN = {
    "HH": F.hour,
    "DD": F.dayofmonth,
    "WW": F.weekofyear,
    "MM": F.month,
    "YY": F.year,
}

PARTITION_PATH = "_partition_path"


def partition_path_expr(pattern: str, now: Column | None = None) -> Column:
    """Per-row partition path for a reference-style template."""
    now = now if now is not None else F.current_timestamp()
    parts: list[Column] = []
    pos = 0
    for m in _BLOCK.finditer(pattern):
        if m.start() > pos:
            parts.append(F.lit(pattern[pos : m.start()]))
        fields = [s.strip().strip("'").strip() for s in m.group(1).split(",")]
        col = fields[0]
        fallback = fields[1] if len(fields) > 1 else ""
        gran = fields[2] if len(fields) > 2 else ""
        if not fallback:
            fallback = f"default_{col}"
        base = now if col == "now()" else F.col(col)
        if gran:
            if gran not in _GRAN:
                raise ValueError(f"unknown granularity {gran!r} in {pattern!r}")
            val = _GRAN[gran](base.cast("timestamp")).cast("string")
        else:
            val = base.cast("string")
        parts.append(F.coalesce(val, F.lit(fallback)))
        pos = m.end()
    if pos < len(pattern):
        parts.append(F.lit(pattern[pos:]))
    return F.regexp_replace(F.concat(*parts), "/$", "")


def with_partition_path(
    df: DataFrame,
    pattern: str,
    now: Column | None = None,
    max_pure_paths: int = 4096,
) -> DataFrame:
    """Attach the resolved path and route rows so output files are
    path-PURE (the reference writes one directory per resolved path —
    parquet.go:363): up to ``max_pure_paths`` distinct paths get exact
    salt-mapped routing (one Spark partition per path); above that the
    layout degrades to hash co-location, which still gives tight manifest
    stats. Partition-path cardinality is Hive-partition-like by design
    (date granularities x a categorical), so the exact path is the norm.
    """
    from olake_spark.functions.partitioning import salts_for_bins

    if now is None:
        # pin now() to ONE driver-side instant: the path expression is
        # evaluated twice (distinct-paths query + write query) and an
        # unpinned current_timestamp() crossing a granularity boundary
        # between the two would leave rows whose path has no salt-map
        # entry (NULL salt -> one giant partition, purity silently lost)
        import datetime

        now = F.lit(
            datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
        ).cast("timestamp")
    out = df.withColumn(PARTITION_PATH, partition_path_expr(pattern, now))
    paths = [
        r[0]
        for r in out.select(PARTITION_PATH)
        .distinct()
        .limit(max_pure_paths + 1)
        .collect()
    ]
    if not paths:
        # empty source (e.g. a full_refresh of an empty stream):
        # repartition(0, ...) would raise — there is nothing to route
        return out
    if len(paths) > max_pure_paths:
        return out.repartition(F.col(PARTITION_PATH)).sortWithinPartitions(
            PARTITION_PATH
        )
    paths = sorted(paths)
    salts = salts_for_bins(len(paths))
    mapping = F.create_map(
        *[F.lit(x) for p, s in zip(paths, salts) for x in (p, s)]
    )
    return (
        out.withColumn("_salt", mapping[F.col(PARTITION_PATH)])
        .repartition(len(paths), F.col("_salt"))
        .drop("_salt")
    )
