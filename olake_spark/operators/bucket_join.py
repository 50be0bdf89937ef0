"""Co-located (storage-partitioned) joins over bucket-transform tables.

Two tables created with the same ``bucket(N, key)`` spec store rows of
one key strictly inside one bucket, and (after a distributed write or
clustering pass) each data FILE is bucket-pure with its bucket id in
the manifest. Joining them therefore never needs to shuffle the big
side: matching rows are already co-located file-to-file. This is
Iceberg's storage-partitioned join (SPARK-37375); Spark only activates
it through a DSv2 relation that reports its output partitioning, which
the Python Data Source API does not expose (Spark 4.x) — so this
operator composes the same execution shape out of DataFrame pieces:

- plan per-BUCKET file lists for both sides from the manifests (driver
  work O(files in buckets), no data touched);
- pack buckets into CHUNKS first-fit-decreasing by the right side's
  manifest byte size so each chunk's right side fits one broadcast —
  the output plan is a union of `chunk-scan JOIN broadcast(chunk-scan)`
  branches: the LEFT (big) side is scanned exactly once in total and
  NEVER exchanged, the right side moves only as bounded broadcasts;
- files that are not bucket-pure (written without
  ``distribute='partition'``) degrade gracefully: a residual right
  side joins into every chunk (it may match any bucket), a residual
  left side joins once against the full right table — correct always,
  colocation just shrinks to the pure fraction.

At 100 TB: pick N so table_bytes/N of the SMALLER table fits executor
broadcast (e.g. 10 TB dim / 4096 buckets = 2.4 GB... then raise N —
the spec is chosen per table pair). When NO side has broadcastable
buckets (fact-fact), each chunk join falls back to a shuffle bounded
by the chunk, which AQE splits further — correct, but the win is gone;
prefer re-bucketing one side. Left-anchored join types only
(inner/left_outer/left_semi/left_anti): a full_outer would need
right-residual rows emitted exactly once across chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from olake_spark.table.format import BUCKET_COL, DataFile, Table

#: conservative per-chunk cap on the broadcast side's on-disk bytes
#: (parquet decompresses ~2-4x into the hash relation)
DEFAULT_CHUNK_BYTES = 64 << 20

_HOWS = ("inner", "left_outer", "left_semi", "left_anti")


def _pure_groups(
    table: Table, snapshot_id: int | None
) -> tuple[dict[int, list[DataFile]], list[DataFile]]:
    groups: dict[int, list[DataFile]] = {}
    residual: list[DataFile] = []
    for f in table.files(snapshot_id):
        if f.spec_col == BUCKET_COL and f.partition is not None:
            groups.setdefault(int(f.partition), []).append(f)
        else:
            residual.append(f)
    return groups, residual


def _chunks_ffd(
    bucket_ids: list[int],
    right_groups: dict[int, list[DataFile]],
    chunk_bytes: int,
) -> list[list[int]]:
    """First-fit-decreasing pack of buckets by right-side bytes. A
    single bucket larger than the cap gets its own chunk (join falls
    back to a bucket-local shuffle there)."""
    sized = sorted(
        bucket_ids,
        key=lambda b: -sum(f.file_size_bytes for f in right_groups.get(b, [])),
    )
    chunks: list[list[int]] = []
    loads: list[int] = []
    for b in sized:
        sz = sum(f.file_size_bytes for f in right_groups.get(b, []))
        for i, ld in enumerate(loads):
            if ld + sz <= chunk_bytes:
                chunks[i].append(b)
                loads[i] += sz
                break
        else:
            chunks.append([b])
            loads.append(sz)
    return chunks


def bucket_join(
    left: Table,
    right: Table,
    on: list[str] | str,
    how: str = "inner",
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    left_snapshot_id: int | None = None,
    right_snapshot_id: int | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Join two tables bucketed by the same ``bucket(N, key)`` spec
    without shuffling the left side (see module docstring).

    ``on`` must include the shared bucket source column. Both sides'
    MoR deletes are applied snapshot-pinned, exactly as ``scan`` does.
    The bucket system column is dropped from the output (its two sides
    would collide and carry no information past the join).

    ``left_cols`` / ``right_cols`` project each side to ``on + cols``
    before joining — required when both sides share non-key column
    names (two same-schema tables), where Spark's join would emit
    ambiguous duplicates. Semi/anti joins project the right side to
    the keys automatically (its payload can't reach the output)."""
    on = [on] if isinstance(on, str) else list(on)
    lt, rt = left.partition_transform, right.partition_transform
    if lt is None or rt is None:
        raise ValueError("bucket_join requires bucket-transform tables on both sides")
    if (lt["n"], lt["source"]) != (rt["n"], rt["source"]):
        raise ValueError(
            f"incompatible bucket specs: bucket({lt['n']},{lt['source']}) "
            f"vs bucket({rt['n']},{rt['source']}) — same N and source "
            "column are required for colocation"
        )
    # same PHYSICAL type too: the bucket hash works on the string
    # rendering ('7' vs '7.0'), so differently-typed keys that a plain
    # join would match via numeric coercion land in DIFFERENT buckets
    # and would silently drop rows
    ltype = {f.name: f.dataType for f in left.schema().fields}[lt["source"]]
    rtype = {f.name: f.dataType for f in right.schema().fields}[rt["source"]]
    if ltype.simpleString() != rtype.simpleString():
        raise ValueError(
            f"bucket source {lt['source']!r} is {ltype.simpleString()} on "
            f"the left but {rtype.simpleString()} on the right; equal "
            "values would hash to different buckets"
        )
    if lt["source"] not in on:
        raise ValueError(
            f"join keys {on} must include the bucket source column "
            f"{lt['source']!r} — otherwise matches cross buckets"
        )
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")

    lg, lres = _pure_groups(left, left_snapshot_id)
    rg, rres = _pure_groups(right, right_snapshot_id)

    if how in ("left_semi", "left_anti") and right_cols is None:
        right_cols = []

    def lscan(fs):
        df = left.scan(snapshot_id=left_snapshot_id, files=fs).drop(BUCKET_COL)
        return df.select(*on, *left_cols) if left_cols is not None else df

    def rscan(fs):
        df = right.scan(snapshot_id=right_snapshot_id, files=fs).drop(BUCKET_COL)
        return df.select(*on, *right_cols) if right_cols is not None else df

    rres_bytes = sum(f.file_size_bytes for f in rres)
    # every chunk's right side carries the residual files on top of its
    # pure buckets — pack against the REMAINING headroom, or a single
    # impure right file would push every well-packed chunk past the cap
    # and silently disable broadcasting (re-shuffling the left side).
    # When the residual alone exceeds the cap no chunk can broadcast
    # anyway; keep full-size chunks to minimize branch count.
    pack_bytes = max(chunk_bytes - rres_bytes, 0) or chunk_bytes
    parts: list[DataFrame] = []
    for chunk in _chunks_ffd(sorted(lg), rg, pack_bytes):
        lfs = [f for b in chunk for f in lg[b]]
        rfs = [f for b in chunk for f in rg.get(b, [])]
        # a residual right file may hold rows of ANY bucket — it must be
        # visible to every chunk for the join to be total
        rdf = rscan(rfs + rres) if (rfs or rres) else None
        ldf = lscan(lfs)
        if rdf is None:
            if how in ("inner", "left_semi"):
                continue  # provably no matches for this chunk
            rdf = rscan([])
        rbytes = sum(f.file_size_bytes for f in rfs) + rres_bytes
        if rbytes <= chunk_bytes:
            rdf = F.broadcast(rdf)
        parts.append(ldf.join(rdf, on=on, how=how))
    if lres:
        parts.append(lscan(lres).join(rscan(None), on=on, how=how))

    if not parts:
        return lscan([]).join(rscan([]), on=on, how=how)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
