"""CLI — the reference's four verbs, Spark-native (SURVEY.md §3).

The reference's query language is its CLI: ``spec | check | discover |
sync`` (/root/reference/README.md:81-86, command wiring
/root/reference/protocol/root.go:68-69). Same surface here:

    python -m olake_spark spec
    python -m olake_spark check    --dest <table_root>
    python -m olake_spark discover --source <parquet_dir>
    python -m olake_spark sync     --source <parquet_dir> --dest <table_root>
                                   [--mode full_refresh|incremental|cdc]
                                   [--feed <dir>] [--state <ledger_dir>]
                                   [--partition-regex <template>] [--cpus N]
    python -m olake_spark sync     --catalog job.json --dest <root>

A catalog binds N streams to N per-stream configs (mode, cursor,
partition_regex) in the reference's selected_streams shape
(/root/reference/types/catalog.go:34-44); each stream is validated
before any sync runs (/root/reference/types/stream_configured.go:72-87)
and lands in <dest>/<stream_name> with its own STATE message.

Messages go to stdout as single-line JSON envelopes typed like the
reference's message stream (/root/reference/types/message_type.go:6-14).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _msg(mtype: str, payload) -> None:
    print(json.dumps({"type": mtype, "ts_ms": int(time.time() * 1000), **payload}))


SPEC = {
    "title": "olake_spark job config",
    "type": "object",
    "properties": {
        "source": {"type": "string", "description": "parquet dir or table root"},
        "dest": {"type": "string", "description": "table root to create/append"},
        "mode": {
            "enum": ["full_refresh", "incremental", "cdc"],
            "default": "full_refresh",
        },
        "cursor_col": {"type": "string", "description": "cursor (mode=incremental)"},
        "feed": {"type": "string", "description": "CDC json-lines dir (mode=cdc)"},
        "catalog": {"type": "string", "description": "multi-stream job spec path"},
        "partition_regex": {
            "type": "string",
            "description": "write-path template /{col,'fallback',granularity}/",
        },
        "target_file_bytes": {"type": "integer", "default": 134217728},
        "cpus": {"type": "integer", "default": 8},
    },
    "required": ["dest"],
}


def cmd_spec(_args) -> int:
    _msg("SPEC", {"spec": SPEC})
    return 0


def cmd_check(args) -> int:
    """Destination write-test, like the reference's check
    (/root/reference/writers/parquet/parquet.go:165-204)."""
    from olake_spark.session import get_spark
    from olake_spark.table import Table

    if not args.dest:
        _msg("ERROR", {"message": "check requires --dest"})
        return 2
    try:
        os.makedirs(args.dest, exist_ok=True)
        probe = os.path.join(args.dest, ".olake_check")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        spark = get_spark("olake-check", cores=args.cpus)
        if os.path.exists(os.path.join(args.dest, "VERSION")):
            t = Table.load(spark, args.dest)
            _msg("CONNECTION_STATUS", {"status": "SUCCEEDED", "existing_table": True,
                                       "snapshot": t.current_snapshot_id})
        else:
            _msg("CONNECTION_STATUS", {"status": "SUCCEEDED", "existing_table": False})
        return 0
    except Exception as e:  # noqa: BLE001
        _msg("CONNECTION_STATUS", {"status": "FAILED", "message": str(e)})
        return 1


def cmd_discover(args) -> int:
    """Emit a catalog of streams (tables) with schemas — the reference's
    discover (/root/reference/protocol/discover.go:16-26); for typed
    parquet, schema inference is metadata-only."""
    from olake_spark.session import get_spark

    if not args.source:
        _msg("ERROR", {"message": "discover requires --source <parquet dir>"})
        return 2
    spark = get_spark("olake-discover", cores=args.cpus)
    ns = os.path.basename(args.source.rstrip("/"))
    streams = []
    for p in sorted(glob.glob(os.path.join(args.source, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        df = spark.read.parquet(p)
        streams.append(
            {
                "name": name,
                "namespace": ns,
                "schema": {f.name: f.dataType.simpleString() for f in df.schema.fields},
                "supported_sync_modes": ["full_refresh", "cdc"],
            }
        )
    # semi-structured input: sample-based discover drives the promotion
    # lattice (reference mon.go:151-203) instead of typed footers
    from olake_spark.sources.json_discover import discover_json

    for p in sorted(
        glob.glob(os.path.join(args.source, "*.jsonl"))
        + glob.glob(os.path.join(args.source, "*.json"))
    ):
        name = os.path.basename(p).rsplit(".", 1)[0]
        disc = discover_json(spark, p)
        streams.append(
            {
                "name": name,
                "namespace": ns,
                "schema": {
                    f.name: f.dataType.simpleString() for f in disc.schema.fields
                },
                "supported_sync_modes": ["full_refresh", "incremental"],
            }
        )
    _msg("CATALOG", {"streams": streams})
    return 0


def _ensure_doc_id(df):
    """Generic tables get a content-addressed doc_id (stable across
    batches — a monotonically_increasing_id would collide between
    incremental appends)."""
    from pyspark.sql import functions as F

    if "doc_id" in df.columns:
        return df
    return df.withColumn("doc_id", F.md5(F.to_json(F.struct(*df.columns))))


SUPPORTED_SYNC_MODES = ["full_refresh", "incremental", "cdc"]


def _load_table(spark, dest: str, df=None, partition_regex: str | None = None):
    """Load an existing table, or create one matching the incoming
    stream's schema (+ the partition-path column when routing)."""
    from olake_spark.table import Table

    if os.path.exists(os.path.join(dest, "VERSION")):
        return Table.load(spark, dest)
    if df is None:
        return Table.create(spark, dest)
    from olake_spark.functions.partition_regex import PARTITION_PATH

    pcol = PARTITION_PATH if partition_regex else (
        "source" if "source" in df.columns else "doc_id"
    )
    stats = [c for c in ("doc_id", "n_tok", "source", "_olake_id", pcol)
             if c in df.columns or c == pcol]
    return Table.create(
        spark, dest, schema=df.schema, partition_col=pcol, stats_columns=stats
    )


def _sync_stream(
    spark,
    mode: str,
    source: str | None,
    dest: str,
    cursor_col: str | None = None,
    feed: str | None = None,
    state_dir: str | None = None,
    partition_regex: str | None = None,
    split_col: str | None = None,
    num_chunks: int = 8,
) -> dict:
    """One stream's sync — returns the STATE payload. Shared by the
    single-stream CLI flags and the multi-stream catalog runner."""
    from pyspark.sql import functions as F

    from olake_spark.schema import with_system_columns

    if mode == "cdc":
        from olake_spark.streaming.cdc_stream import run_cdc_stream

        table = _load_table(spark, dest)
        ckpt = state_dir or os.path.join(dest, "jobs", "cdc-checkpoint")
        cursor = run_cdc_stream(table, feed, ckpt, bounded=True)
        return {"mode": "cdc", "cursor": cursor, "rows": table.total_rows(),
                "snapshot": table.refresh().current_snapshot_id}

    if source.rstrip("/").endswith((".json", ".jsonl")):
        from olake_spark.sources.json_discover import discover_json, read_json

        src = read_json(spark, source, discover_json(spark, source))
    else:
        src = spark.read.parquet(source)
    src = _ensure_doc_id(src)
    src = with_system_columns(src)
    if partition_regex:
        from olake_spark.functions.partition_regex import with_partition_path

        src = with_partition_path(src, partition_regex)

    if mode == "incremental":
        # cursor-based append — declared but UNIMPLEMENTED in the
        # reference (README.md:42); cursor filter shape per
        # /root/reference/pkg/jdbc/jdbc.go:14-16 (k > $1), cursor
        # advanced only after the snapshot commit
        cur_path = os.path.join(dest, "jobs", "incremental-cursor.json")
        last = None
        if os.path.exists(cur_path):
            with open(cur_path) as fh:
                last = json.load(fh).get("cursor")
        batch = src.filter(F.col(cursor_col) > F.lit(last)) if last is not None else src
        # one column-pruned pass for both cursor max and row count
        agg = batch.agg(
            F.max(cursor_col).cast("string").alias("mx"),
            F.count("*").alias("n"),
        ).first()
        new_max, rows = agg.mx, agg.n
        table = _load_table(spark, dest, batch, partition_regex)
        if rows:
            snap = table.append(batch)
            os.makedirs(os.path.dirname(cur_path), exist_ok=True)
            with open(cur_path, "w") as fh:
                json.dump({"cursor": new_max, "snapshot": snap}, fh)
        return {"mode": "incremental", "rows": rows,
                "cursor": new_max or last,
                "snapshot": table.current_snapshot_id}

    # full refresh REPLACES the destination contents (one atomic
    # overwrite snapshot) — re-running must not duplicate rows; the
    # reference re-syncs the stream from scratch
    table = _load_table(spark, dest, src, partition_regex)
    if split_col and source.endswith(".parquet"):
        # chunked backfill: key-range chunks planned before any read,
        # each chunk a resumable ledger entry (reference backfill loop,
        # drivers/postgres/internal/backfill.go:19-100)
        from olake_spark.sources.adapter import ParquetDirSource
        from olake_spark.sources.backfill import chunked_backfill

        transform = None
        if partition_regex:
            from olake_spark.functions.partition_regex import with_partition_path

            transform = lambda d: with_partition_path(d, partition_regex)  # noqa: E731
        res = chunked_backfill(
            table,
            ParquetDirSource(spark, os.path.dirname(source)),
            os.path.basename(source).replace(".parquet", ""),
            split_col,
            num_chunks=num_chunks,
            mode="overwrite",
            transform=transform,
        )
        return {"mode": "full_refresh", "rows": res.rows,
                "chunks": res.chunks, "snapshot": res.snapshot_id}
    snap = table.overwrite(src)
    rows = table.snapshot(snap).summary.get("added-rows", 0)
    return {"mode": "full_refresh", "rows": rows, "snapshot": snap}


def _validate_stream(spark, cfg: dict, meta: dict) -> str | None:
    """Configured-stream validation, reference semantics at
    /root/reference/types/stream_configured.go:72-87: sync mode must be
    supported; incremental requires a cursor field that exists."""
    mode = cfg.get("sync_mode", "full_refresh")
    if mode not in SUPPORTED_SYNC_MODES:
        return f"invalid sync mode[{mode}]; valid are {SUPPORTED_SYNC_MODES}"
    if mode == "incremental":
        cur = cfg.get("cursor_field")
        if not cur:
            return "incremental sync requires cursor_field"
        src = cfg.get("source", "")
        if src.rstrip("/").endswith((".json", ".jsonl")):
            from olake_spark.sources.json_discover import discover_json

            cols = [f.name for f in discover_json(spark, src).schema.fields]
        else:
            cols = [f.name for f in spark.read.parquet(src).schema.fields]
        if cur not in cols:
            return f"invalid cursor field [{cur}]; valid are {cols}"
    if mode == "cdc" and not cfg.get("feed"):
        return "cdc sync requires feed"
    return None


def cmd_sync(args) -> int:
    from olake_spark.plans.telemetry import StatsMonitor
    from olake_spark.session import get_spark
    from olake_spark.table import Table

    if not args.dest:
        _msg("ERROR", {"message": "sync requires --dest"})
        return 2

    if args.catalog:
        # multi-stream job: spec -> catalog -> selected_streams
        # (/root/reference/types/catalog.go:34-44)
        with open(args.catalog) as f:
            catalog = json.load(f)
        # streams are addressed by (namespace, name) — same-named streams
        # in different namespaces are distinct (types/catalog.go:34-44)
        by_key = {
            (s["stream"].get("namespace", ""), s["stream"]["name"]): s["stream"]
            for s in catalog.get("streams", [])
        }
        selected: list[tuple[dict, dict]] = []  # (stream cfg, metadata)
        for ns, metas in catalog.get("selected_streams", {}).items():
            for m in metas:
                cfg = by_key.get((ns, m["stream_name"]))
                if cfg is None:
                    _msg("ERROR", {"message": f"selected stream {ns}.{m['stream_name']} not in catalog"})
                    return 2
                selected.append((cfg, m))
        if not selected:
            _msg("ERROR", {"message": "catalog selects no streams"})
            return 2
        names = [cfg["name"] for cfg, _m in selected]
        if len(names) != len(set(names)):
            # destinations are keyed by stream name under --dest
            _msg("ERROR", {"message": f"duplicate stream names selected: {sorted(set(n for n in names if names.count(n) > 1))}"})
            return 2
        spark = get_spark("olake-sync", cores=args.cpus)
        for cfg, _m in selected:
            err = _validate_stream(spark, cfg, _m)
            if err:
                _msg("ERROR", {"stream": cfg["name"], "message": err})
                return 2
        # concurrent stream groups (§2.7 C3): the reference syncs selected
        # streams with a bounded worker pool (utils.Concurrent); Spark's
        # scheduler interleaves the concurrent jobs across executor slots.
        # Destinations are disjoint table roots, so commits don't contend.
        from concurrent.futures import ThreadPoolExecutor

        conc = max(1, args.concurrency)

        def _run_one(item):
            cfg, m = item
            dest = os.path.join(args.dest, cfg["name"])
            state = _sync_stream(
                spark,
                cfg.get("sync_mode", "full_refresh"),
                cfg.get("source"),
                dest,
                cursor_col=cfg.get("cursor_field"),
                feed=cfg.get("feed"),
                partition_regex=m.get("partition_regex") or None,
                split_col=m.get("split_column") or None,
            )
            return cfg["name"], dest, state

        with StatsMonitor(spark, os.path.join(args.dest, "stats.json")) as mon:
            if conc == 1:
                results = [_run_one(it) for it in selected]
            else:
                with ThreadPoolExecutor(max_workers=conc) as pool:
                    results = list(pool.map(_run_one, selected))
            for name, dest, state in results:
                mon.add_records(state.get("rows") or 0)
                _msg("STATE", {"stream": name, **state})
                t = Table.load(spark, dest)
                _msg("RECORD_COUNT", {"stream": name,
                                      "total_rows": t.total_rows(),
                                      "total_files": len(t.files())})
        return 0

    if args.mode == "cdc" and not args.feed:
        _msg("ERROR", {"message": "sync --mode cdc requires --feed <json-lines dir>"})
        return 2
    if args.mode in ("full_refresh", "incremental") and not args.source:
        _msg("ERROR", {"message": f"sync --mode {args.mode} requires --source"})
        return 2
    if args.mode == "incremental" and not args.cursor_col:
        _msg("ERROR", {"message": "sync --mode incremental requires --cursor-col"})
        return 2

    spark = get_spark("olake-sync", cores=args.cpus)
    with StatsMonitor(spark, os.path.join(args.dest, "stats.json")) as mon:
        state = _sync_stream(
            spark, args.mode, args.source, args.dest,
            cursor_col=args.cursor_col, feed=args.feed, state_dir=args.state,
            partition_regex=args.partition_regex,
            split_col=args.split_col, num_chunks=args.chunks,
        )
        mon.add_records(state.get("rows") or 0)
        _msg("STATE", state)
    table = Table.load(spark, args.dest)
    _msg("RECORD_COUNT", {"total_rows": table.total_rows(),
                          "total_files": len(table.files())})
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="olake_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("spec")
    for name in ("check", "discover", "sync"):
        sp = sub.add_parser(name)
        sp.add_argument("--source")
        sp.add_argument("--dest")
        sp.add_argument("--mode", default="full_refresh",
                        choices=["full_refresh", "incremental", "cdc"])
        sp.add_argument("--feed")
        sp.add_argument("--cursor-col", dest="cursor_col")
        sp.add_argument("--state")
        sp.add_argument("--cpus", type=int, default=8)
        sp.add_argument("--catalog", help="multi-stream job spec (json)")
        sp.add_argument("--partition-regex", dest="partition_regex",
                        help="write-path template /{col,'fallback',granularity}/")
        sp.add_argument("--split-col", dest="split_col",
                        help="key column for chunked (resumable) backfill")
        sp.add_argument("--chunks", type=int, default=8,
                        help="chunk count for --split-col backfill")
        sp.add_argument("--concurrency", type=int, default=1,
                        help="concurrent streams for --catalog sync")
    args = p.parse_args(argv)
    return {"spec": cmd_spec, "check": cmd_check,
            "discover": cmd_discover, "sync": cmd_sync}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
