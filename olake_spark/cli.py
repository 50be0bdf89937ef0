"""CLI — the reference's four verbs, Spark-native (SURVEY.md §3).

The reference's query language is its CLI: ``spec | check | discover |
sync`` (/root/reference/README.md:81-86, command wiring
/root/reference/protocol/root.go:68-69). Same surface here:

    python -m olake_spark spec
    python -m olake_spark check    --dest <table_root>
    python -m olake_spark discover --source <parquet_dir>
    python -m olake_spark sync     --source <parquet_dir> --dest <table_root>
                                   [--mode full_refresh|cdc] [--feed <dir>]
                                   [--state <ledger_dir>] [--cpus N]

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
    streams = []
    for p in sorted(glob.glob(os.path.join(args.source, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        df = spark.read.parquet(p)
        streams.append(
            {
                "name": name,
                "namespace": os.path.basename(args.source.rstrip("/")),
                "schema": {f.name: f.dataType.simpleString() for f in df.schema.fields},
                "supported_sync_modes": ["full_refresh", "cdc"],
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


def cmd_sync(args) -> int:
    if not args.dest:
        _msg("ERROR", {"message": "sync requires --dest"})
        return 2
    if args.mode == "cdc" and not args.feed:
        _msg("ERROR", {"message": "sync --mode cdc requires --feed <json-lines dir>"})
        return 2
    if args.mode in ("full_refresh", "incremental") and not args.source:
        _msg("ERROR", {"message": f"sync --mode {args.mode} requires --source"})
        return 2
    if args.mode == "incremental" and not args.cursor_col:
        _msg("ERROR", {"message": "sync --mode incremental requires --cursor-col"})
        return 2
    from pyspark.sql import functions as F

    from olake_spark.plans.telemetry import StatsMonitor
    from olake_spark.schema import with_system_columns
    from olake_spark.session import get_spark
    from olake_spark.table import Table

    spark = get_spark("olake-sync", cores=args.cpus)
    if os.path.exists(os.path.join(args.dest, "VERSION")):
        table = Table.load(spark, args.dest)
    else:
        table = Table.create(spark, args.dest)

    stats_path = os.path.join(args.dest, "stats.json")
    with StatsMonitor(spark, stats_path) as mon:
        if args.mode == "cdc":
            from olake_spark.streaming.cdc_stream import run_cdc_stream

            ckpt = args.state or os.path.join(args.dest, "jobs", "cdc-checkpoint")
            cursor = run_cdc_stream(table, args.feed, ckpt, bounded=True)
            mon.add_records(table.total_rows())
            _msg("STATE", {"mode": "cdc", "cursor": cursor,
                           "snapshot": table.refresh().current_snapshot_id})
        elif args.mode == "incremental":
            # cursor-based append — declared but UNIMPLEMENTED in the
            # reference (README.md:42); cursor filter shape per
            # /root/reference/pkg/jdbc/jdbc.go:14-16 (k > $1), cursor
            # advanced only after the snapshot commit
            import json as _json

            cur_path = os.path.join(args.dest, "jobs", "incremental-cursor.json")
            last = None
            if os.path.exists(cur_path):
                with open(cur_path) as fh:
                    last = _json.load(fh).get("cursor")
            src = _ensure_doc_id(spark.read.parquet(args.source))
            batch = src.filter(F.col(args.cursor_col) > F.lit(last)) if last is not None else src
            # one column-pruned pass for both cursor max and row count
            agg = batch.agg(
                F.max(args.cursor_col).cast("string").alias("mx"),
                F.count("*").alias("n"),
            ).first()
            new_max, rows = agg.mx, agg.n
            if rows:
                snap = table.append(with_system_columns(batch))
                os.makedirs(os.path.dirname(cur_path), exist_ok=True)
                with open(cur_path, "w") as fh:
                    _json.dump({"cursor": new_max, "snapshot": snap}, fh)
            mon.add_records(rows)
            _msg("STATE", {"mode": "incremental", "rows": rows,
                           "cursor": new_max or last,
                           "snapshot": table.current_snapshot_id})
        else:
            src = _ensure_doc_id(spark.read.parquet(args.source))
            # full refresh REPLACES the destination contents (one atomic
            # overwrite snapshot) — re-running must not duplicate rows;
            # the reference re-syncs the stream from scratch
            snap = table.overwrite(with_system_columns(src))
            rows = table.snapshot(snap).summary.get("added-rows", 0)
            mon.add_records(rows)
            _msg("STATE", {"mode": "full_refresh", "rows": rows, "snapshot": snap})
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
    args = p.parse_args(argv)
    return {"spec": cmd_spec, "check": cmd_check,
            "discover": cmd_discover, "sync": cmd_sync}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
