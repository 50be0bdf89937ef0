"""ANALYZE — per-column NDV statistics as mergeable HLL sketches.

Iceberg records table-level NDV in Puffin files (theta sketches)
referenced from table metadata ``statistics``; engines read them for
join planning. The reference engine has no stats subsystem — its
planning scalars come from the source server (reference
pkg/jdbc/jdbc.go:18-28, drivers/mongodb/internal/backfill.go:218-231).
This is the lakehouse analog over our snapshots.

Design for 100 TB:

- **Registers, not rows.** One scan emits ``(column, register, rank)``
  from built-in expressions only (md5/conv or xxhash64, integer masks,
  and a generated CASE chain for the leading-zero rank — no UDF, no
  libm ``floor(log2())`` whose boundary rounding is dialect-dependent).
  ``groupBy(column, register).max(rank)`` has map-side partial
  aggregation, so the shuffle carries at most ``cols x 2^p`` rows per
  input partition and the driver holds exactly ``cols x 2^p`` small
  integers regardless of table size.
- **Mergeable.** HLL registers max-merge. Incremental ANALYZE scans
  ONLY the files appended since the last analyzed snapshot (manifest
  shard diff, O(churned shards)) and max-merges onto the stored sketch
  — O(churn) per refresh, the CDC steady state. Any file/row REMOVAL
  since the base forces a full recompute: a max-merge cannot forget
  rows, and silently keeping them would overstate NDV after a purge.
- **Snapshot-pinned.** Each sketch records the snapshot it describes;
  stats files live under ``stats/`` through the FileIO seam and are
  referenced from table metadata (the Puffin-file pointer shape).

Hash variants: ``xxhash64`` (JVM-codegen, the production default) and
``md5_60`` (first hex digits of md5 — bit-identical in DuckDB, used by
the correctness oracle, same trick as operators/dedup.simhash).
"""

from __future__ import annotations

import math
import os
import uuid

from pyspark.sql import DataFrame, functions as F

HLL_P_DEFAULT = 12  # 4096 registers; standard error ~1.04/sqrt(m) = 1.6%

# stats entries in table metadata: {"snapshot_id", "path", "p",
# "word_hash", "columns"} appended per analyze run (latest wins)
STATS_KEY = "statistics"


def rank_case_sql(w_sql: str, width: int) -> str:
    """Portable SQL for ``leading_zeros(w) + 1`` of a ``width``-bit
    non-negative value: rank k iff w in [2^(width-k), 2^(width-k+1)),
    rank width+1 for w = 0. A CASE chain of integer comparisons is
    bit-exact in every dialect — ``floor(log2(w))`` is not (libm
    rounding at power-of-two boundaries differs across engines)."""
    whens = "".join(
        f" WHEN {w_sql} >= {1 << (width - k)} THEN {k}"
        for k in range(1, width + 1)
    )
    return f"(CASE{whens} ELSE {width + 1} END)"


def register_exprs(
    col_sql: str, p: int, word_hash: str
) -> tuple[str, str]:
    """(register_sql, rank_sql) for one column, Spark dialect.

    md5_60 keeps everything in hex-substring space (register = first
    p/4 hex digits, w = next 12) so the DuckDB oracle can reproduce it
    with ``('0x' || substr(md5(..)))::BIGINT``; xxhash64 splits the
    signed 64-bit hash with shiftrightunsigned/mask."""
    if word_hash == "md5_60":
        if p % 4:
            raise ValueError("md5_60 requires p to be a multiple of 4")
        hexd = p // 4
        reg = f"CAST(conv(substring(md5({col_sql}), 1, {hexd}), 16, 10) AS BIGINT)"
        w = (
            f"CAST(conv(substring(md5({col_sql}), {hexd + 1}, 12), 16, 10)"
            " AS BIGINT)"
        )
        return reg, rank_case_sql(w, 48)
    if word_hash == "xxhash64":
        h = f"xxhash64({col_sql})"
        reg = f"shiftrightunsigned({h}, {64 - p})"
        w = f"({h} & {(1 << (64 - p)) - 1})"
        return reg, rank_case_sql(w, 64 - p)
    raise ValueError(f"word_hash must be 'xxhash64' or 'md5_60', got {word_hash!r}")


def hll_registers(
    df: DataFrame,
    columns: list[str],
    p: int = HLL_P_DEFAULT,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """``(column string, register long, max_rank int)`` — the non-zero
    HLL registers of every column in one scan (F.inline fans each row
    out to one struct per column; NULL values hash to NULL registers
    and drop out, so the sketch counts distinct non-null values)."""
    entries = []
    for c in columns:
        col_sql = f"CAST(`{c}` AS STRING)"
        reg, rank = register_exprs(col_sql, p, word_hash)
        # xxhash64(NULL) is the seed hash, not NULL — guard explicitly
        # so NULL values drop out of the sketch under every variant
        null_guard = F.col(c).isNull()
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.when(null_guard, F.lit(None).cast("long"))
                .otherwise(F.expr(reg))
                .alias("register"),
                F.expr(rank).cast("int").alias("rank"),
            )
        )
    return (
        df.select(F.inline(F.array(*entries)))
        .where(F.col("register").isNotNull())
        .groupBy("column", "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def _registers_and_nulls(
    df: DataFrame,
    columns: list[str],
    p: int,
    word_hash: str,
) -> tuple[dict[str, dict[int, int]], dict[str, int]]:
    """Registers + per-column null counts in ONE scan job: NULL values
    keep their (column, register=NULL) group instead of being filtered,
    and that group's row count IS the null count — ``analyze_table``
    previously ran a second full-scan aggregation just for nulls."""
    entries = []
    for c in columns:
        col_sql = f"CAST(`{c}` AS STRING)"
        reg, rank = register_exprs(col_sql, p, word_hash)
        null_guard = F.col(c).isNull()
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.when(null_guard, F.lit(None).cast("long"))
                .otherwise(F.expr(reg))
                .alias("register"),
                F.when(null_guard, F.lit(0))
                .otherwise(F.expr(rank).cast("int"))
                .alias("rank"),
            )
        )
    rows = (
        df.select(F.inline(F.array(*entries)))
        .groupBy("column", "register")
        .agg(F.max("rank").alias("max_rank"), F.count("*").alias("n"))
        .collect()  # bounded: <= cols x (2^p + 1) rows
    )
    regs: dict[str, dict[int, int]] = {c: {} for c in columns}
    nulls: dict[str, int] = {c: 0 for c in columns}
    for r in rows:
        if r["register"] is None:
            nulls[r["column"]] = int(r["n"])
        else:
            regs[r["column"]][int(r["register"])] = int(r["max_rank"])
    return regs, nulls


def hll_estimate(registers: dict[int, int], p: int) -> float:
    """Flajolet et al. HLL estimator with the small-range linear-
    counting correction (the large-range correction is unnecessary at
    48+ rank bits)."""
    m = 1 << p
    zeros = m - len(registers)
    s = float(zeros) + sum(2.0 ** -r for r in registers.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return e


def merge_registers(
    a: dict[int, int], b: dict[int, int]
) -> dict[int, int]:
    out = dict(a)
    for r, rank in b.items():
        if rank > out.get(r, 0):
            out[r] = rank
    return out


def _registers_from_df(reg_df: DataFrame) -> dict[str, dict[int, int]]:
    out: dict[str, dict[int, int]] = {}
    for row in reg_df.collect():  # bounded: <= cols x 2^p rows
        out.setdefault(row["column"], {})[int(row["register"])] = int(
            row["max_rank"]
        )
    return out


def _default_columns(table) -> list[str]:
    return [
        f.name for f in table.schema().fields if not f.name.startswith("_")
    ]


def load_stats(table, snapshot_id: int | None = None) -> dict | None:
    """The latest stats file at/under ``snapshot_id`` (default: any).
    Returns the parsed stats document or None."""
    entries = table.metadata.get(STATS_KEY, [])
    if snapshot_id is not None:
        entries = [e for e in entries if e["snapshot_id"] <= snapshot_id]
    if not entries:
        return None
    ref = max(entries, key=lambda e: e["snapshot_id"])
    return table.io.get_json(table.abs_path(ref["path"]))


def ndv(table, column: str) -> float | None:
    """Point estimate of the column's distinct non-null count from the
    latest ANALYZE, or None when never analyzed. O(1) planning-side —
    this is the number a join planner reads before choosing a strategy."""
    doc = load_stats(table)
    if doc is None or column not in doc["columns"]:
        return None
    return float(doc["columns"][column]["ndv"])


def analyze_table(
    table,
    columns: list[str] | None = None,
    p: int = HLL_P_DEFAULT,
    word_hash: str = "xxhash64",
    incremental: bool = True,
) -> dict:
    """Compute/refresh column NDV sketches for the CURRENT snapshot and
    persist them (stats file + metadata pointer). Returns the stats doc.

    ``incremental=True`` max-merges onto the previous sketch when (a) a
    prior run exists with the same (p, word_hash, columns), (b) its
    snapshot is still retained, and (c) NOTHING was removed since —
    no data-file removal, no new/removed delete manifests. Otherwise a
    full recompute runs (correct by construction; the fast path is for
    the append-mostly CDC steady state)."""
    from olake_spark.table.format import snapshot_file_delta

    snap = table.snapshot()
    if snap is None:
        raise ValueError("cannot analyze an empty table")
    columns = columns or _default_columns(table)
    known = {f.name for f in table.schema().fields}
    unknown = [c for c in columns if c not in known]
    if unknown:
        raise KeyError(
            f"columns {unknown} not in the table schema {sorted(known)}"
        )

    base_doc = None
    added_files = None
    if incremental:
        prior = [
            e
            for e in table.metadata.get(STATS_KEY, [])
            if e["p"] == p
            and e["word_hash"] == word_hash
            and set(e["columns"]) == set(columns)
        ]
        if prior:
            ref = max(prior, key=lambda e: e["snapshot_id"])
            try:
                base_snap = table.snapshot(ref["snapshot_id"])
            except KeyError:
                base_snap = None  # expired — full recompute
            if base_snap is not None:
                if base_snap.snapshot_id == snap.snapshot_id:
                    return table.io.get_json(table.abs_path(ref["path"]))
                tgt_only, base_only = snapshot_file_delta(
                    table, base_snap, snap
                )
                true_removed = base_only.keys() - tgt_only.keys()
                deletes_changed = set(base_snap.delete_manifests) != set(
                    snap.delete_manifests
                )
                if not true_removed and not deletes_changed:
                    added_files = [
                        e
                        for path, e in tgt_only.items()
                        if path not in base_only
                    ]
                    base_doc = table.io.get_json(table.abs_path(ref["path"]))

    if base_doc is not None:
        if not added_files:
            regs = {
                c: {
                    int(r): int(k)
                    for r, k in base_doc["columns"][c]["registers"]
                }
                for c in columns
            }
            nulls = {
                c: base_doc["columns"][c]["null_count"] for c in columns
            }
        else:
            df = table.scan(files=added_files, apply_deletes=False)
            regs_new, nulls_new = _registers_and_nulls(
                df, columns, p, word_hash
            )
            regs, nulls = {}, {}
            for c in columns:
                regs[c] = merge_registers(
                    {
                        int(r): int(k)
                        for r, k in base_doc["columns"][c]["registers"]
                    },
                    regs_new.get(c, {}),
                )
                nulls[c] = base_doc["columns"][c]["null_count"] + nulls_new[c]
        mode = "incremental"
    else:
        df = table.scan()
        regs, nulls = _registers_and_nulls(df, columns, p, word_hash)
        mode = "full"

    doc = {
        "snapshot_id": snap.snapshot_id,
        "p": p,
        "word_hash": word_hash,
        "mode": mode,
        "row_count": table.total_rows(),
        "columns": {
            c: {
                "ndv": hll_estimate(regs[c], p),
                "null_count": int(nulls[c]),
                "registers": sorted(
                    [int(r), int(k)] for r, k in regs[c].items()
                ),
            }
            for c in columns
        },
    }
    rel = f"stats/stats-{snap.snapshot_id}-{uuid.uuid4().hex[:12]}.json"
    table.io.ensure_prefix(table.abs_path("stats"))
    table.io.put_json(table.abs_path(rel), doc)
    entry = {
        "snapshot_id": snap.snapshot_id,
        "path": rel,
        "p": p,
        "word_hash": word_hash,
        "columns": sorted(columns),
    }

    def _mut():
        stats = table.metadata.setdefault(STATS_KEY, [])
        # one live entry per (p, word_hash, columns) family: the sketch
        # is cumulative, superseded files are dropped here and deleted
        stale = [
            e
            for e in stats
            if e["p"] == p
            and e["word_hash"] == word_hash
            and e["columns"] == entry["columns"]
        ]
        for e in stale:
            stats.remove(e)
        stats.append(entry)

    old_paths = [
        e["path"]
        for e in table.metadata.get(STATS_KEY, [])
        if e["p"] == p
        and e["word_hash"] == word_hash
        and e["columns"] == entry["columns"]
    ]
    try:
        table._persist_mutation(_mut)
    except Exception:
        table.io.delete(table.abs_path(rel))  # never orphan the new file
        raise
    for rel_old in old_paths:
        table.io.delete(table.abs_path(rel_old))
    return doc


