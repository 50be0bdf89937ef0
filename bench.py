"""Benchmark harness (driver contract + BASELINE.json north rule).

Runs the engine's headline maintenance jobs (bin-pack compaction,
Z-order clustering, MERGE) on a deterministic synthetic tokenized table
sized by the scale factor, plus representative analytic queries from
__spark_entry__ on the driver testdata.

The LAST stdout line is a COMPACT headline JSON (must stay well under
the driver's ~2 KB tail capture — BENCH_r04 went parsed:null when
per-JVM rep arrays outgrew it):

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, "cpus": N,
     "maintenance": {summary scalars only}, "sf1": {summary scalars},
     "detail": "BENCH/detail_latest.json"}

Full detail (per-JVM rep arrays, phase breakdowns, sf1 rep arrays) is
written to BENCH/detail_latest.json (override: OLAKE_BENCH_DETAIL).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     OLAKE_BENCH_ROWS (override synthetic row count),
     OLAKE_BENCH_JVMS (total JVMs for sf0.1 maintenance reps, default 3),
     OLAKE_BENCH_SF1=0 (skip the 10x "sf1_maintenance" block — one
     compact+cluster+merge+expire cycle at ~2 GB with conservation
     invariants),
     OLAKE_BENCH_SF1_JVMS (total JVMs for the sf1 block, default 2 —
     parent + fresh children, min merged per op like the sf0.1 block).

The two-parallelism scaling study (north rule: efficiency >= 0.8 from
N to 4N) is tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from olake_spark.datagen import generate_sequences
    from olake_spark.operators.clustering import cluster
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.session import get_spark
    from olake_spark.table import Table

    spark = get_spark("olake-bench", cores=cpus, shuffle_partitions=2 * cpus)
    spark.range(1000).count()  # JVM warm-up

    # Python-worker/Arrow warm-up: the session's FIRST pandas-UDF stage
    # pays ~5 s of worker fork + Arrow init at 32 cores (one-time session
    # cost, not engine throughput) — spawn all workers before any timer.
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

    timings: dict[str, float] = {}
    rep_arrays: dict[str, list[float]] = {}
    maintenance: dict[str, float] = {}

    def timed(name):
        # min across bench reps: this VM's ambient noise is ~2x on
        # identical runs, so a single-shot timing grades the weather,
        # not the engine (methodology mirrors tools/bench_scaling.py);
        # every rep is also recorded so swings stay attributable
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                dt = round(time.time() - self.t0, 3)
                rep_arrays.setdefault(name, []).append(dt)
                timings[name] = min(timings.get(name, dt), dt)

        return _T()

    # ---- maintenance benchmark on the synthetic tokenized table
    rows = int(os.environ.get("OLAKE_BENCH_ROWS", str(int(sf * 3_000_000))))
    rows = max(rows, 10_000)
    reps = int(os.environ.get("OLAKE_BENCH_REPS", "2"))
    n_small_files = max(64, cpus * 8)
    # bench table lives on tmpfs: this sandbox's /tmp is a slow, jittery
    # virtio disk that dominates wall time; /dev/shm measures the engine
    bench_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    maintenance["reps"] = reps

    if os.environ.get("OLAKE_BENCH_MODE") == "maintenance":
        # child mode: ONE maintenance rep in this fresh JVM, print the
        # per-op times for the parent to merge, exit
        _run_maintenance_rep(
            spark, rows, cpus, n_small_files, bench_dir, sf_dir, timed,
            maintenance,
        )
        print(
            json.dumps(
                {"maintenance_times": rep_arrays, "maintenance": maintenance}
            )
        )
        spark.stop()
        return

    if os.environ.get("OLAKE_BENCH_MODE") == "sf1":
        # child mode: ONE sf1 rep in this fresh JVM, print scalars, exit
        sf1_child: dict = {}
        _run_sf1_smoke(spark, rows * 10, cpus, bench_dir, sf1_child)
        _run_sf1_dedup_curation(spark, sf_dir, sf1_child)
        print(json.dumps({"sf1": sf1_child}))
        spark.stop()
        return

    # Cross-JVM noise-proofing: min-of-2-within-one-JVM is correlated
    # noise (one session shares GC/JIT/page-cache weather). Interleave
    # the in-process reps with fresh-JVM child reps (P1, C1, P2, C2 —
    # OLAKE_BENCH_JVMS total JVMs incl this one) and take the min across
    # ALL of them; per-JVM rep arrays land in maintenance.jvm_reps so a
    # round-over-round swing is attributable to code vs weather.
    n_children = max(0, int(os.environ.get("OLAKE_BENCH_JVMS", "3")) - 1)
    child_arrays: list[dict] = []
    for _rep in range(reps):
        _run_maintenance_rep(
            spark, rows, cpus, n_small_files, bench_dir, sf_dir, timed, maintenance
        )
        if len(child_arrays) < n_children:
            ct = _spawn_maintenance_jvm()
            if ct is not None:
                child_arrays.append(ct)
                for op, arr in ct.items():
                    for dt in arr:
                        timings[op] = min(timings.get(op, dt), dt)
    maintenance["jvm_reps"] = {
        "parent": {op: rep_arrays[op] for op in list(rep_arrays)},
        "children": child_arrays,
    }
    maint_sec = timings["compact"] + timings["zorder"]
    bytes_in = maintenance["bytes"]
    maintenance["compact_gb_per_s"] = round(
        bytes_in / 1e9 / max(timings["compact"], 1e-9), 4
    )
    maintenance["zorder_gb_per_s"] = round(
        bytes_in / 1e9 / max(timings["zorder"], 1e-9), 4
    )
    maintenance["seq_per_s"] = round(2 * rows / max(maint_sec, 1e-9), 1)

    # ---- analytic queries on the driver testdata (same min-of-reps).
    # Keys kept identical to BENCH_r03 for round-over-round comparability:
    # four of them were consolidated out of the registry in r4 (50-entry
    # driver cap), so local wrappers run the SAME underlying operator.
    qs = dict(entrymod.queries())
    qs["doc_token_count"] = _bench_doc_token_count
    qs["minhash_lsh"] = _bench_minhash_lsh
    qs["embedding_topk"] = _bench_embedding_topk
    qs["seq_table_stats"] = _bench_seq_table_stats
    qs["ccnet_ppl"] = _bench_ccnet_ppl
    # keep the xxhash64 production hash for the bench timing (the
    # registry entry switched to the DuckDB-expressible md5_60 variant)
    qs["simhash_near_dup"] = _bench_simhash
    # late-r4 registry merges (join_aggregates / cursor_suite): keep the
    # r3 timing keys by running the same underlying probes directly
    qs["merge_as_join"] = entrymod._merge_as_join
    qs["broadcast_dim_join"] = entrymod._broadcast_dim_join
    for _rep in range(reps):
        for name in [
            "q1_pricing_summary",
            "merge_as_join",
            "broadcast_dim_join",
            "dedup_latest_event",
            "doc_token_count",
            "minhash_lsh",
            "simhash_near_dup",
            "embedding_topk",
            "seq_table_stats",
            "doc_repetition",
            "repeated_ngrams",
            "drop_repeated_spans",
            "pii_scrub",
            "c4_filter",
            "ccnet_ppl",
        ]:
            with timed(name):
                # noop sink: forces full computation of every output
                # column without shipping rows to the driver
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    # ---- sf1 maintenance smoke: compact+cluster+merge+expire cycles
    # at 10x the bench scale (~2 GB) to shake out group-count / ledger /
    # manifest behavior beyond sf0.1. Same cross-JVM discipline as the
    # sf0.1 block (parent run + fresh child JVMs, min merged per op):
    # single-JVM sf1 numbers swung 2x between r3 and r4 on this VM.
    sf1_block = None
    if os.environ.get("OLAKE_BENCH_SF1", "1") != "0":
        sf1_block = {}
        _run_sf1_smoke(spark, rows * 10, cpus, bench_dir, sf1_block)
        _run_sf1_dedup_curation(spark, sf_dir, sf1_block)
        n_sf1_children = max(
            0, int(os.environ.get("OLAKE_BENCH_SF1_JVMS", "2")) - 1
        )
        child_blocks = []
        for _ in range(n_sf1_children):
            cb = _spawn_sf1_jvm()
            if cb is not None:
                child_blocks.append(cb)
        sf1_block["jvm_reps"] = {
            "parent": {
                k: v
                for k, v in sf1_block.items()
                if isinstance(v, (int, float, list))
            },
            "children": child_blocks,
        }
        for cb in child_blocks:
            for op in (
                "build_s", "compact_s", "zorder_s", "merge_s", "expire_s",
                "minhash_lsh_s", "curation_s",
            ):
                if op in cb and cb[op] < sf1_block.get(op, float("inf")):
                    sf1_block[op] = cb[op]
            sf1_block["invariants_ok"] = bool(
                sf1_block.get("invariants_ok") and cb.get("invariants_ok", True)
            )
        if "bytes" in sf1_block:
            gb = sf1_block["bytes"] / 1e9
            sf1_block["compact_gb_per_s"] = round(gb / sf1_block["compact_s"], 4)
            sf1_block["zorder_gb_per_s"] = round(gb / sf1_block["zorder_s"], 4)
        if "dedup_docs" in sf1_block:
            nd = sf1_block["dedup_docs"]
            sf1_block["minhash_docs_per_s"] = round(
                nd / sf1_block["minhash_lsh_s"], 1
            )
            sf1_block["curation_docs_per_s"] = round(
                nd / sf1_block["curation_s"], 1
            )

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "maintenance+query wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "maintenance": maintenance,
    }
    if sf1_block is not None:
        detail["sf1_maintenance"] = sf1_block

    detail_path = os.environ.get(
        "OLAKE_BENCH_DETAIL",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH", "detail_latest.json",
        ),
    )
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        detail_rel = os.path.relpath(
            detail_path, os.path.dirname(os.path.abspath(__file__))
        )
    except OSError:
        detail_rel = None

    # compact headline LAST: summary scalars only — per-JVM arrays and
    # phase breakdowns live in the detail file
    headline = {
        "metric": "maintenance+query wall time",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": cpus,
        "maintenance": {
            k: maintenance[k]
            for k in (
                "bytes", "rows", "reps", "compact_gb_per_s",
                "zorder_gb_per_s", "seq_per_s", "ntok_prune_fraction",
                "ann_prune_fraction", "bloom_prune_fraction", "ndv_doc_id",
            )
            if k in maintenance
        },
    }
    if sf1_block is not None:
        headline["sf1"] = {
            k: sf1_block[k]
            for k in (
                "rows", "compact_s", "compact_gb_per_s", "zorder_s",
                "zorder_gb_per_s", "merge_s", "minhash_docs_per_s",
                "curation_docs_per_s", "invariants_ok",
            )
            if k in sf1_block
        }
    if detail_rel:
        headline["detail"] = detail_rel
    print(json.dumps(headline, separators=(",", ":")))
    spark.stop()


def _spawn_sf1_jvm() -> dict | None:
    """Run the sf1 block once in a FRESH subprocess JVM and return its
    scalar dict (None on failure — the parent's run still stands)."""
    import subprocess

    env = dict(
        os.environ,
        OLAKE_BENCH_MODE="sf1",
        OLAKE_BENCH_REPS="1",
        PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("{"):
                return json.loads(line)["sf1"]
    except Exception:
        pass
    return None


def _spawn_maintenance_jvm() -> dict | None:
    """Run one maintenance rep in a FRESH subprocess JVM (same geometry:
    rows/cpus/sf from the same env) and return its per-op times dict.
    Returns None if the child fails — the parent's own reps still stand,
    the bench degrades to single-JVM rather than dying."""
    import subprocess

    env = dict(
        os.environ,
        OLAKE_BENCH_MODE="maintenance",
        OLAKE_BENCH_REPS="1",
        OLAKE_BENCH_SF1="0",
        PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("{"):
                return json.loads(line)["maintenance_times"]
    except Exception:
        pass
    return None


def _bench_ccnet_ppl(spark, sf_dir):
    # CCNet bigram-LM perplexity filter: train + score in one plan
    from olake_spark.operators.lm import perplexity_scores

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return perplexity_scores(d, max_nll_q4_per_token=33870)


def _bench_doc_token_count(spark, sf_dir):
    from pyspark.sql import functions as F

    from olake_spark.operators.text import token_count

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.select("doc_id", token_count("text").alias("tok_count"))


def _bench_minhash_lsh(spark, sf_dir):
    from olake_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=32, bands=8, shingle_k=2,
        jaccard_threshold=0.5,
    )


def _bench_simhash(spark, sf_dir):
    from olake_spark.operators.dedup import simhash_near_dup_pairs

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=3, blocks=4)


def _bench_embedding_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from olake_spark.operators.similarity import brute_force_topk

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return brute_force_topk(e.filter(F.col("vec_id") != 0), list(qvec), k=10)


def _bench_seq_table_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from olake_spark.sources.tokenizer import sequences_from_documents

    seq = sequences_from_documents(spark, sf_dir)
    return seq.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


def _run_sf1_smoke(spark, rows, cpus, bench_dir, out: dict) -> None:
    """One full maintenance cycle at ~10x bench scale with conservation
    invariants checked in-line (row count + token checksum across
    compact -> zorder -> merge -> expire)."""
    import tempfile

    from pyspark.sql import functions as F

    from olake_spark.datagen import generate_sequences
    from olake_spark.operators.clustering import cluster
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.expire import expire_snapshots
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.table import Table

    root = tempfile.mkdtemp(prefix="olake_sf1_", dir=bench_dir)
    try:
        t0 = time.time()
        df = generate_sequences(
            spark, rows, seed=7, max_tok=1024,
            num_partitions=max(64, cpus * 8),
        )
        table = Table.create(spark, os.path.join(root, "tbl"))
        table.append(df)
        out["build_s"] = round(time.time() - t0, 3)
        bytes_in = table.total_bytes()
        out["rows"] = rows
        out["bytes"] = bytes_in
        base = table.scan().agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(doc_id, n_tok))").alias("ck"),
        ).first()

        target = min(
            max(bytes_in // (4 * cpus), 2 * 1024 * 1024), 64 * 1024 * 1024
        )
        # min-of-2 on compaction too (like zorder below): ambient noise
        # on this VM swings identical runs >2x. Compaction consumes its
        # input, so the first rep runs on a byte-identical COPY of the
        # pre-compaction table (relocatable: scan paths derive from the
        # load-time root), which is then discarded.
        copy_root = os.path.join(root, "tbl_rep")
        shutil.copytree(os.path.join(root, "tbl"), copy_root)
        ct = []
        t0 = time.time()
        compact(Table.load(spark, copy_root), target_file_bytes=target)
        ct.append(round(time.time() - t0, 3))
        shutil.rmtree(copy_root, ignore_errors=True)
        t0 = time.time()
        compact(table, target_file_bytes=target)
        ct.append(round(time.time() - t0, 3))
        out["compact_s"] = min(ct)
        out["compact_s_reps"] = ct
        out["compact_gb_per_s"] = round(bytes_in / 1e9 / out["compact_s"], 4)
        # min-of-2 on the headline rewrite: this VM's ambient noise swings
        # identical runs >2x (the second pass re-clusters the same bytes —
        # equivalent work, fresh job id per snapshot)
        zt = []
        for _ in range(2):
            t0 = time.time()
            cluster(table, curve="zorder", target_file_bytes=target)
            zt.append(round(time.time() - t0, 3))
        out["zorder_s"] = min(zt)
        out["zorder_s_reps"] = zt
        out["zorder_gb_per_s"] = round(bytes_in / 1e9 / out["zorder_s"], 4)

        # rewrite preservation: compaction + clustering moved every row
        # without loss or mutation (count + content checksum)
        mid = table.scan().agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(doc_id, n_tok))").alias("ck"),
        ).first()
        rewrite_preserved = mid.n == base.n and mid.ck == base.ck

        # 0.5% upsert + 0.25% delete batch (prep outside the timer)
        n_upd, n_del = rows // 200, rows // 400
        sample = (
            table.scan().select(*DATA_COLUMNS)
            .orderBy("doc_id").limit(n_upd + n_del).cache()
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
        t0 = time.time()
        mres = merge_into(table, changes, target_file_bytes=target)
        out["merge_s"] = round(time.time() - t0, 3)
        sample.unpersist()
        changes.unpersist()
        t0 = time.time()
        expire_snapshots(table, keep_last=1)
        out["expire_s"] = round(time.time() - t0, 3)

        # invariants at 10x: counts conserved through the whole cycle,
        # merge applied exactly, post-expire table still fully readable
        cur = table.refresh().scan()
        n_after = cur.count()
        out["invariants_ok"] = bool(
            rewrite_preserved
            and n_after == base.n - mres.deleted
            and mres.updated == n_upd
            and mres.deleted == n_del
            and cur.filter(F.col("n_tok") > 4).count() > 0
        )
        out["files_after"] = len(table.files())
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _run_sf1_dedup_curation(spark, sf_dir, out: dict) -> None:
    """The heaviest SHUFFLE plans (MinHash-LSH near-dup and the 6-stage
    curation funnel) at 10x the documents corpus — the maintenance sf1
    smoke covers only the rewrite ops. The corpus is 10 word-suffixed
    replicas of the sf documents table: suffixing every word with the
    replica id keeps the replicas' shingle spaces disjoint, so the
    near-duplicate DENSITY (the cost driver of bucket verification)
    matches the base corpus instead of fabricating 10-way clone
    clusters; dedup work scales with corpus size, as at 100 TB."""
    from functools import reduce

    from pyspark.sql import functions as F

    from olake_spark.operators.dedup import minhash_lsh_pairs
    from olake_spark.pipelines.curation import curate_corpus

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "source", "n_chars"
    )
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select(
                (F.col("doc_id") + F.lit(k * 100_000_000)).alias("doc_id"),
                F.regexp_replace("text", " ", f"_{k} ").alias("text"),
                "source",
                "n_chars",
            )
            for k in range(10)
        ],
    ).persist()
    n_docs = big.count()
    out["dedup_docs"] = n_docs
    try:
        t0 = time.time()
        minhash_lsh_pairs(
            big, "doc_id", "text", num_perm=32, bands=8, shingle_k=2,
            jaccard_threshold=0.5,
        ).write.format("noop").mode("overwrite").save()
        out["minhash_lsh_s"] = round(time.time() - t0, 3)
        out["minhash_docs_per_s"] = round(n_docs / out["minhash_lsh_s"], 1)

        d = big.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.pmod(F.col("doc_id"), F.lit(50)).alias("_m"),
            "text",
            "source",
            "n_chars",
        )
        bench_split = d.filter(F.col("_m") == 0).drop("_m")
        train = d.filter(F.col("_m") != 0).drop("_m")
        handles: list = []
        t0 = time.time()
        curated = curate_corpus(
            train,
            bench_split,
            repetition={"max_word": 0.10, "min_words": 5},
            scrub_pii=True,
            materialize=True,
            persisted=handles,
            mixture_rates={"src0": 0.75, "src1": 0.5},
            default_rate=0.25,
            token_budget=20480,
            weight_col="n_chars",
            seed=0,
        )
        curated.write.format("noop").mode("overwrite").save()
        out["curation_s"] = round(time.time() - t0, 3)
        out["curation_docs_per_s"] = round(n_docs / out["curation_s"], 1)
        for h in handles:
            h.unpersist()
    finally:
        big.unpersist()


def _run_maintenance_rep(
    spark, rows, cpus, n_small_files, bench_dir, sf_dir, timed, maintenance
) -> None:
    import tempfile

    from pyspark.sql import functions as F

    from olake_spark.operators.clustering import cluster
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.table import Table

    from olake_spark.datagen import generate_sequences

    root = tempfile.mkdtemp(prefix="olake_bench_", dir=bench_dir)
    try:
        with timed("build_table"):
            # generate directly at the small-file partitioning — a
            # .repartition(n) after datagen is a full round-robin
            # shuffle of the whole table for nothing (the generator is
            # counter-based, so the DATA is identical either way)
            df = generate_sequences(
                spark, rows, seed=42, max_tok=1024,
                num_partitions=n_small_files,
            )
            table = Table.create(spark, os.path.join(root, "tbl"))
            table.append(df)
        bytes_in = table.total_bytes()
        maintenance["bytes"] = bytes_in
        maintenance["rows"] = rows

        # keep task count ~= 4x cores, as on a real cluster where bins
        # >> executor cores; a 64 MB target on a 200 MB bench table
        # would collapse the write stage to 4 tasks and measure nothing
        target = min(max(bytes_in // (4 * cpus), 2 * 1024 * 1024), 64 * 1024 * 1024)
        maintenance["target_file_bytes"] = target

        with timed("compact"):
            cres = compact(table, target_file_bytes=target)
        maintenance["compact_skipped"] = bool(cres.skipped)
        with timed("zorder"):
            cluster(table, curve="zorder", target_file_bytes=target)

        # clustering quality: fraction of files a narrow n_tok range scan
        # can skip via manifest stats after the Z-order pass (variable-
        # width interleave); measured BEFORE hilbert re-clusters
        files = table.files()
        with_stats = [f for f in files if "n_tok" in f.stats]
        cand = [f for f in with_stats if f.overlaps("n_tok", 8, 64)]
        if with_stats:
            maintenance["ntok_prune_fraction"] = round(
                1 - len(cand) / len(with_stats), 4
            )

        with timed("hilbert"):
            cluster(table, curve="hilbert", target_file_bytes=target)

        # 1% upsert + 0.5% delete CDC batch (batch prep outside the timer)
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
        with timed("merge"):
            mres = merge_into(table, changes, target_file_bytes=target)
        maintenance["merge_phases"] = mres.details.get("phase_seconds", {})
        sample.unpersist()
        changes.unpersist()

        # CDC-out: recover the merge's net row-level diff from the
        # manifest diff + one full-outer join (O(churned files) scan)
        from olake_spark.operators.changelog import snapshot_changes

        with timed("changelog"):
            snapshot_changes(table.refresh(), pre_merge_snap).write.format(
                "noop"
            ).mode("overwrite").save()

        # merge-on-read apply of a SAME-SIZE CDC batch (different rows:
        # sampled from the doc_id tail) — merge_mor vs merge is the
        # CoW-vs-MoR apply-cost comparison, mor_scan is the read tax
        # while delete files are live, materialize_deletes folds back to
        # pure CoW on the compaction cadence
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
        with timed("merge_mor"):
            mres2 = merge_into(
                table, changes2, target_file_bytes=target, mode="mor"
            )
        maintenance["merge_mor_phases"] = mres2.details.get("phase_seconds", {})
        sample2.unpersist()
        changes2.unpersist()
        with timed("mor_scan"):
            table.refresh().scan().write.format("noop").mode(
                "overwrite"
            ).save()
        with timed("materialize_deletes"):
            materialize_deletes(table.refresh(), target_file_bytes=target)

        # manifest-log compaction after the append/compact/cluster/merge
        # churn above — metadata-only, measures planning-debt payoff
        from olake_spark.operators.manifests import rewrite_manifests

        table.refresh()
        pre_shards = len(table.snapshot().manifests)
        with timed("rewrite_manifests"):
            rres = rewrite_manifests(table)
        maintenance["manifest_shards_before"] = pre_shards
        maintenance["manifest_shards_after"] = (
            pre_shards
            if rres.skipped
            else len(table.refresh().snapshot().manifests)
        )

        # persisted ANN index: build once, probe via manifest pruning —
        # ann_prune_fraction is the files-skipped evidence (VERDICT #3)
        from olake_spark.operators.ann_index import ann_index_topk, build_ann_index

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qvec = list(emb.select("embedding").first()[0])
        with timed("ann_index_build"):
            idx = build_ann_index(
                spark, emb, os.path.join(root, "annidx"), kind="ivf",
                n_cells=32, seed=7,
            )
        with timed("ann_index_probe"):
            out, info = ann_index_topk(idx, qvec, k=10, n_probe=4)
            out.write.format("noop").mode("overwrite").save()
        maintenance["ann_prune_fraction"] = info["prune_fraction"]

        # ANALYZE: full NDV-sketch refresh — one scan; the register
        # shuffle is capped at cols x 4096 rows per input partition
        from olake_spark.operators.analyze import analyze_table

        with timed("analyze"):
            adoc = analyze_table(
                table.refresh(), columns=["doc_id", "source", "n_tok"]
            )
        maintenance["ndv_doc_id"] = round(adoc["columns"]["doc_id"]["ndv"], 1)

        # bloom blobs: one distributed build pass over every data file,
        # then a point lookup no min/max can prune (doc_id is NOT the
        # cluster key after the hilbert pass) — bloom_prune_fraction is
        # the files-skipped evidence for scan(eq=)
        from olake_spark.table.blooms import build_bloom_blobs

        with timed("bloom_build"):
            build_bloom_blobs(table.refresh(), ["doc_id"], fpp=0.01)
        probe_key = table.scan().select("doc_id").first().doc_id
        n_data_files = len(table.files())
        with timed("bloom_lookup"):
            hit = table.scan(eq={"doc_id": probe_key})
            hit.write.format("noop").mode("overwrite").save()
        read_files = len(hit.inputFiles())
        maintenance["bloom_prune_fraction"] = round(
            1 - read_files / max(n_data_files, 1), 4
        )

        # bucket-transform write + co-located join: the left side is
        # never hash-exchanged; the right side moves as packed chunk
        # broadcasts (bucket_build measures the exact-routing write tax)
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
        with timed("bucket_build"):
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
        with timed("bucket_join"):
            bucket_join(
                bf.refresh(), bd.refresh(), on="doc_id",
                right_cols=["grade"],
            ).write.format("noop").mode("overwrite").save()

        # deletion vectors: a row-level DELETE writes positional delete
        # files (delete_where = predicate scan + O(matched) delete
        # bytes), dv_build repacks them into one bitmap per data file,
        # mor_scan_dv is the post-repack read tax — compare with
        # mor_scan (anti-join against row-level delete files). Last in
        # the rep so earlier legs keep their r3/r4-comparable workloads.
        from olake_spark.operators.deletes import (
            delete_where,
            write_deletion_vectors,
        )

        with timed("delete_where"):
            dres = delete_where(table.refresh(), "n_tok % 8 = 3")
        maintenance["dv_deleted_rows"] = dres.deleted_rows
        with timed("dv_build"):
            write_deletion_vectors(table.refresh())
        with timed("mor_scan_dv"):
            table.refresh().scan().write.format("noop").mode(
                "overwrite"
            ).save()

        # row lineage (v3): enable_lineage is the metadata-only backfill
        # over the live file set; lineage_scan vs mor_scan_dv is the
        # read tax of synthesizing _row_id/_last_updated (one broadcast
        # map join over the same DV-filtered scan); lineage_zorder vs
        # zorder is the rewrite tax of materializing resolved lineage
        # through a full re-cluster. Last in the rep so every earlier
        # leg keeps its r3/r4-comparable workload.
        with timed("enable_lineage"):
            table.refresh().enable_row_lineage()
        with timed("lineage_scan"):
            table.refresh().scan(with_lineage=True).write.format(
                "noop"
            ).mode("overwrite").save()
        with timed("lineage_zorder"):
            cluster(table, curve="zorder", target_file_bytes=target)

        # terminal pipeline stage: seeded shuffle -> token-balanced
        # shard export (one exchange + per-shard sort + parquet write)
        from olake_spark.operators.export import write_shards

        with timed("shard_export"):
            manifest = write_shards(
                table.refresh().scan().select("doc_id", "tokens", "n_tok"),
                os.path.join(root, "shards"),
                n_shards=4 * cpus,
                seed=42,
            )
        maintenance["shard_rows"] = manifest["total_rows"]

        # autopilot steady-state probe: the "does this table need work?"
        # decision is metadata-only (snapshot summaries + entries frame)
        # — this leg is the per-table cost of a fleet-wide health sweep
        from olake_spark.operators.autopilot import (
            MaintenancePolicy,
            inspect_health,
            plan_actions,
        )

        with timed("auto_plan"):
            pol = MaintenancePolicy(target_file_bytes=target)
            plan = plan_actions(inspect_health(table, pol), pol)
        maintenance["auto_planned_ops"] = [a.op for a in plan]

    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
