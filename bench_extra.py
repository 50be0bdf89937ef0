"""Instrumented replay of bench.py's maintenance rep + query legs.

NOT the driver contract (bench.py is frozen for measurement) — this
harness exists to ATTRIBUTE time inside each op: it enables the Spark
UI and, after every timed op, drains the REST /jobs endpoint to split
the op's wall time into per-job executor time vs driver gaps
(planning, commits, footer stats, metadata IO).

Usage:
    python bench_extra.py maintenance   # synthetic-table ops breakdown
    python bench_extra.py queries       # sf-dir query legs breakdown
    python bench_extra.py explain       # dump .explain() for query legs

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
        return json.loads(r.read())


class Attr:
    """Wall-time attribution per op from the UI jobs endpoint."""

    def __init__(self, spark):
        self.spark = spark
        self.seen = 0
        self.rows = []

    def op(self, name):
        attr = self

        class _T:
            def __enter__(self):
                attr.spark.sparkContext.setJobDescription(name)
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                dt = time.time() - self.t0
                attr.spark.sparkContext.setJobDescription(None)
                jobs = [
                    j
                    for j in _rest(attr.spark, "jobs")
                    if j["jobId"] >= attr.seen
                ]
                attr.seen = max((j["jobId"] + 1 for j in jobs), default=attr.seen)
                njobs = len(jobs)
                jw = 0.0
                detail = []
                for j in jobs:
                    try:
                        t0 = pd.Timestamp(j["submissionTime"])
                        t1 = pd.Timestamp(j["completionTime"])
                        d = (t1 - t0).total_seconds()
                        jw += d
                        detail.append(
                            {
                                "id": j["jobId"],
                                "s": round(d, 3),
                                "tasks": j.get("numTasks"),
                                "name": (j.get("name") or "")[:110],
                            }
                        )
                    except (KeyError, ValueError):
                        pass
                attr.rows.append(
                    {
                        "op": name,
                        "wall_s": round(dt, 3),
                        "jobs": njobs,
                        "job_wall_s": round(jw, 3),
                        "driver_gap_s": round(max(0.0, dt - jw), 3),
                        "detail": detail,
                    }
                )

        return _T()

    def report(self):
        print(f"{'op':26s} {'wall':>7s} {'jobs':>5s} {'jobwall':>8s} {'gap':>7s}")
        for r in self.rows:
            print(
                f"{r['op']:26s} {r['wall_s']:7.3f} {r['jobs']:5d} "
                f"{r['job_wall_s']:8.3f} {r['driver_gap_s']:7.3f}"
            )
        out = os.environ.get("OLAKE_BENCHX_OUT", "/tmp/benchx_detail.json")
        with open(out, "w") as f:
            json.dump(self.rows, f, indent=1)
        print("detail ->", out)


def _get_spark(cpus):
    from olake_spark.session import get_spark

    os.environ["OLAKE_SPARK_UI"] = "1"
    spark = get_spark("olake-bench-extra", cores=cpus, shuffle_partitions=2 * cpus)
    spark.range(1000).count()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    (
        spark.range(cpus * 4, numPartitions=cpus)
        .select(_warm("id"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return spark


def run_maintenance(spark, cpus, sf_dir, rows):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from olake_spark.datagen import generate_sequences
    from olake_spark.operators.clustering import cluster
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.table import Table

    attr = Attr(spark)
    n_small_files = max(64, cpus * 8)
    bench_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="olake_benchx_", dir=bench_dir)
    try:
        with attr.op("build_table.datagen+write"):
            df = generate_sequences(
                spark, rows, seed=42, max_tok=1024, num_partitions=n_small_files
            )
            table = Table.create(spark, os.path.join(root, "tbl"))
            table.append(df)
        bytes_in = table.total_bytes()
        target = min(max(bytes_in // (4 * cpus), 2 * 1024 * 1024), 64 * 1024 * 1024)

        with attr.op("compact"):
            compact(table, target_file_bytes=target)
        with attr.op("zorder"):
            cluster(table, curve="zorder", target_file_bytes=target)
        with attr.op("hilbert"):
            cluster(table, curve="hilbert", target_file_bytes=target)

        cur = table.scan()
        n_upd = max(rows // 100, 10)
        n_del = max(rows // 200, 5)
        pre_merge_snap = table.current_snapshot_id
        sample = (
            cur.select(*DATA_COLUMNS).orderBy("doc_id").limit(n_upd + n_del).cache()
        )
        upd = (
            sample.limit(n_upd)
            .withColumn("tokens", F.expr("slice(tokens, 1, 4)"))
            .withColumn("n_tok", F.least("n_tok", F.lit(4)))
            .withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
        )
        dele = sample.exceptAll(sample.limit(n_upd)).withColumn(
            CDC_DELETED_AT, F.current_timestamp()
        )
        changes = upd.unionByName(dele).cache()
        changes.count()
        with attr.op("merge"):
            mres = merge_into(table, changes, target_file_bytes=target)
        print("merge phases:", mres.details.get("phase_seconds", {}))
        sample.unpersist()
        changes.unpersist()

        from olake_spark.operators.changelog import snapshot_changes

        with attr.op("changelog"):
            snapshot_changes(table.refresh(), pre_merge_snap).write.format(
                "noop"
            ).mode("overwrite").save()

        from olake_spark.operators.deletes import materialize_deletes

        cur2 = table.refresh().scan()
        sample2 = (
            cur2.select(*DATA_COLUMNS)
            .orderBy(F.desc("doc_id"))
            .limit(n_upd + n_del)
            .cache()
        )
        upd2 = (
            sample2.limit(n_upd)
            .withColumn("tokens", F.expr("slice(tokens, 1, 4)"))
            .withColumn("n_tok", F.least("n_tok", F.lit(4)))
            .withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
        )
        del2 = sample2.exceptAll(sample2.limit(n_upd)).withColumn(
            CDC_DELETED_AT, F.current_timestamp()
        )
        changes2 = upd2.unionByName(del2).cache()
        changes2.count()
        with attr.op("merge_mor"):
            merge_into(table, changes2, target_file_bytes=target, mode="mor")
        sample2.unpersist()
        changes2.unpersist()
        with attr.op("mor_scan"):
            table.refresh().scan().write.format("noop").mode("overwrite").save()
        with attr.op("materialize_deletes"):
            materialize_deletes(table.refresh(), target_file_bytes=target)

        from olake_spark.operators.manifests import rewrite_manifests

        table.refresh()
        with attr.op("rewrite_manifests"):
            rewrite_manifests(table)

        from olake_spark.operators.ann_index import ann_index_topk, build_ann_index

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qvec = list(emb.select("embedding").first()[0])
        with attr.op("ann_index_build"):
            idx = build_ann_index(
                spark, emb, os.path.join(root, "annidx"), kind="ivf",
                n_cells=32, seed=7,
            )
        with attr.op("ann_index_probe"):
            out, info = ann_index_topk(idx, qvec, k=10, n_probe=4)
            out.write.format("noop").mode("overwrite").save()

        from olake_spark.operators.analyze import analyze_table

        with attr.op("analyze"):
            analyze_table(table.refresh(), columns=["doc_id", "source", "n_tok"])

        from olake_spark.table.blooms import build_bloom_blobs

        with attr.op("bloom_build"):
            build_bloom_blobs(table.refresh(), ["doc_id"], fpp=0.01)
        probe_key = table.scan().select("doc_id").first().doc_id
        with attr.op("bloom_lookup"):
            hit = table.scan(eq={"doc_id": probe_key})
            hit.write.format("noop").mode("overwrite").save()

        from olake_spark.operators.bucket_join import bucket_join

        fact_rows = rows // 2
        fsrc = generate_sequences(
            spark, fact_rows, seed=77, max_tok=64, num_partitions=cpus
        )
        dsrc = (
            generate_sequences(spark, fact_rows, seed=77, max_tok=8)
            .where(F.xxhash64("doc_id") % 10 == 0)
            .select("doc_id", F.col("n_tok").alias("grade"))
        )
        with attr.op("bucket_build"):
            bf = Table.create(
                spark, os.path.join(root, "bfact"),
                partition_col="bucket(16,doc_id)",
            )
            bf.append(fsrc, distribute="partition")
            bd = Table.create(
                spark, os.path.join(root, "bdim"), schema=dsrc.schema,
                partition_col="bucket(16,doc_id)",
                stats_columns=["doc_id"],
            )
            bd.append(dsrc, distribute="partition")
        with attr.op("bucket_join"):
            bucket_join(
                bf.refresh(), bd.refresh(), on="doc_id", right_cols=["grade"]
            ).write.format("noop").mode("overwrite").save()

        from olake_spark.operators.deletes import (
            delete_where,
            write_deletion_vectors,
        )

        with attr.op("delete_where"):
            delete_where(table.refresh(), "n_tok % 8 = 3")
        with attr.op("dv_build"):
            write_deletion_vectors(table.refresh())
        with attr.op("mor_scan_dv"):
            table.refresh().scan().write.format("noop").mode("overwrite").save()

        with attr.op("enable_lineage"):
            table.refresh().enable_row_lineage()
        with attr.op("lineage_scan"):
            table.refresh().scan(with_lineage=True).write.format("noop").mode(
                "overwrite"
            ).save()
        with attr.op("lineage_zorder"):
            cluster(table, curve="zorder", target_file_bytes=target)

        from olake_spark.operators.export import write_shards

        with attr.op("shard_export"):
            write_shards(
                table.refresh().scan().select("doc_id", "tokens", "n_tok"),
                os.path.join(root, "shards"),
                n_shards=4 * cpus,
                seed=42,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    attr.report()


def run_queries(spark, sf_dir, reps=2):
    import bench as benchmod
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    qs["doc_token_count"] = benchmod._bench_doc_token_count
    qs["minhash_lsh"] = benchmod._bench_minhash_lsh
    qs["embedding_topk"] = benchmod._bench_embedding_topk
    qs["seq_table_stats"] = benchmod._bench_seq_table_stats
    qs["ccnet_ppl"] = benchmod._bench_ccnet_ppl
    qs["simhash_near_dup"] = benchmod._bench_simhash
    qs["merge_as_join"] = entrymod._merge_as_join
    qs["broadcast_dim_join"] = entrymod._broadcast_dim_join
    names = [
        "q1_pricing_summary", "merge_as_join", "broadcast_dim_join",
        "dedup_latest_event", "doc_token_count", "minhash_lsh",
        "simhash_near_dup", "embedding_topk", "seq_table_stats",
        "doc_repetition", "repeated_ngrams", "drop_repeated_spans",
        "pii_scrub", "c4_filter", "ccnet_ppl",
    ]
    attr = Attr(spark)
    for rep in range(reps):
        for name in names:
            with attr.op(f"{name}#{rep}"):
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
    attr.report()


def run_explain(spark, sf_dir, out_dir):
    import bench as benchmod
    import __spark_entry__ as entrymod
    from contextlib import redirect_stdout

    qs = dict(entrymod.queries())
    qs["doc_token_count"] = benchmod._bench_doc_token_count
    qs["minhash_lsh"] = benchmod._bench_minhash_lsh
    qs["embedding_topk"] = benchmod._bench_embedding_topk
    qs["seq_table_stats"] = benchmod._bench_seq_table_stats
    qs["ccnet_ppl"] = benchmod._bench_ccnet_ppl
    qs["simhash_near_dup"] = benchmod._bench_simhash
    qs["merge_as_join"] = entrymod._merge_as_join
    qs["broadcast_dim_join"] = entrymod._broadcast_dim_join
    os.makedirs(out_dir, exist_ok=True)
    which = sys.argv[2:] or [
        "q1_pricing_summary", "merge_as_join", "broadcast_dim_join",
        "dedup_latest_event", "doc_token_count", "minhash_lsh",
        "simhash_near_dup", "embedding_topk", "seq_table_stats",
        "doc_repetition", "repeated_ngrams", "drop_repeated_spans",
        "pii_scrub", "c4_filter", "ccnet_ppl",
    ]
    for name in which:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            with redirect_stdout(f):
                df.explain("formatted")
        print("wrote", name)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("OLAKE_BENCH_ROWS", "300000"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "maintenance"
    spark = _get_spark(cpus)
    if mode == "maintenance":
        run_maintenance(spark, cpus, sf_dir, rows)
    elif mode == "queries":
        run_queries(spark, sf_dir)
    elif mode == "explain":
        run_explain(spark, sf_dir, os.environ.get("OLAKE_EXPLAIN_DIR", "/tmp/explains"))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
