"""Distributed per-file parquet stats collection.

The reference gathers planning scalars (count/min/max) by querying the
source server (/root/reference/pkg/jdbc/jdbc.go:18-28,
/root/reference/drivers/mongodb/internal/backfill.go:218-231). Here the
equivalent metadata lives in parquet footers; we read them with pyarrow
inside ``mapInPandas`` so stats collection for millions of files
distributes across executors instead of looping on the driver — no data
pages are read, footers only.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession

_OUT_SCHEMA = "path string, record_count long, file_size_bytes long, stats_json string"


def _footer_stats(path: str, stats_cols: list[str]) -> dict:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    # flat parquet leaf columns carry a dotted path; the top-level field
    # name is the prefix before the first dot (tokens -> tokens.list.element)
    col_stats: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            top = col.path_in_schema.split(".")[0]
            st = col.statistics
            if top not in stats_cols or st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn = mn.decode("utf-8", "replace")
            if isinstance(mx, bytes):
                mx = mx.decode("utf-8", "replace")
            nulls = st.null_count if st.has_null_count else None
            cur = col_stats.get(top)
            if cur is None:
                col_stats[top] = {"min": mn, "max": mx, "null_count": nulls}
            else:
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
                if nulls is not None and cur["null_count"] is not None:
                    cur["null_count"] += nulls
    return {
        "path": path,
        "record_count": md.num_rows,
        "file_size_bytes": os.path.getsize(path),
        "stats_json": json.dumps(col_stats, default=str),
    }


def collect_file_stats(
    spark: SparkSession, paths: list[str], stats_cols: list[str]
) -> list[dict]:
    """Footer-read every path in parallel; returns one dict per file with
    record_count, size, and per-column min/max/null_count."""
    if not paths:
        return []
    if len(paths) <= 512:
        # small manifests: a driver-side pyarrow loop beats the fixed
        # cost of scheduling a Spark job by ~15x (measured: 256 footers
        # loop 0.05 s vs mapInPandas 0.7-2 s — the job pays a
        # createDataFrame + repartition + Python-worker round trip);
        # re-measured r6: loop 0.035 s vs 32-thread pool 0.16 s for 256
        # tmpfs footers — pool spin-up + GIL dominate at this size; the
        # distributed path below is for million-file tables
        out = [_footer_stats(p, stats_cols) for p in paths]
        for d in out:
            d["stats"] = json.loads(d.pop("stats_json"))
        return out
    if len(paths) <= 8192:
        # mid-size: footer reads release the GIL inside pyarrow, so a
        # driver thread pool stays well under the Spark-job fixed cost
        # (measured 0.2 s for 256 files at 16 threads)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(32, os.cpu_count() or 8)) as ex:
            out = list(ex.map(lambda p: _footer_stats(p, stats_cols), paths))
        for d in out:
            d["stats"] = json.loads(d.pop("stats_json"))
        return out
    n_part = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    pdf_in = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        n_part
    )

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_footer_stats(p, stats_cols) for p in b["path"]]
            if rows:
                yield pd.DataFrame(rows)

    out = pdf_in.mapInPandas(read_footers, schema=_OUT_SCHEMA).collect()
    results = []
    for r in out:
        d = r.asDict()
        d["stats"] = json.loads(d.pop("stats_json"))
        results.append(d)
    return results
