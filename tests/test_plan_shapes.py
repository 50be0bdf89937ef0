"""Physical-plan shape assertions: the optimizations SURVEY.md §4 relies
on must actually appear in the plans Catalyst produces — pushdown,
column pruning, broadcast joins, zero-shuffle binpack, top-k as
TakeOrderedAndProject."""

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.sources.tpch import load_table
from olake_spark.table import Table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_range_filter_pushed_to_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.filter(F.col("l_orderkey").between(1000, 2000)).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_orderkey,1000)" in plan
    assert "LessThanOrEqual(l_orderkey,2000)" in plan


def test_column_pruning_reaches_scan(spark):
    d = load_table(spark, SF_DIR, "documents")
    df = d.select("doc_id", F.size(F.split("text", " ")).alias("tok_count"))
    plan = _plan(df)
    # ReadSchema must NOT include lang/source/n_chars
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_small_dim_join_goes_broadcast(spark):
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).groupBy(
        "n_name"
    ).count()
    assert "BroadcastHashJoin" in _plan(df)


def test_topk_plans_take_ordered(spark):
    o = load_table(spark, SF_DIR, "orders")
    df = o.orderBy(F.desc("o_totalprice")).limit(5)
    assert "TakeOrderedAndProject" in _plan(df)


def test_manifest_pruned_scan_and_stats_pushdown(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    df = generate_sequences(spark, 2000, seed=3, max_tok=32)
    t.append(df.repartition(8, "source"))  # source-pure files
    all_files = t.files()
    pruned = t.scan(sources=["web"])
    # file-level pruning happened before Spark ever saw the paths
    n_cand = len(
        [
            f
            for f in all_files
            if f.partition == "web"
            or (f.partition is None and f.may_contain("source", "web"))
        ]
    )
    assert n_cand < len(all_files)
    plan = _plan(pruned)
    # the residual source filter is also pushed into the parquet scan
    assert "PushedFilters" in plan and "source" in plan


def test_binpack_compaction_plan_has_no_exchange(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    df = generate_sequences(spark, 3000, seed=5, max_tok=32)
    t.append(df.repartition(30))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    try:
        # same conf pair compact(mode='binpack') sets: without lowering
        # openCostInBytes, each tiny file "costs" 4 MB and never packs
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", "131072")
        scan = t.scan()
        assert "Exchange" not in _plan(scan)
        # scan-level packing merged 30 small files into far fewer splits
        assert scan.rdd.getNumPartitions() < 30
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_exact_range_partition_is_single_hash_exchange(spark):
    """The clustering rewrite's routing must be ONE hash exchange — no
    RangePartitioner (whose sampling pass re-evaluates the child plan,
    the round-1 zorder anomaly)."""
    from olake_spark.functions.partitioning import exact_range_partition

    df = spark.range(1000).withColumn("k", F.col("id") * 7 % 100)
    out = exact_range_partition(df, F.col("k"), [20, 50, 80], ["k"])
    plan = _plan(out)
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning" in plan.lower()
    # and the routing is exact: 4 bins -> partition id == bin id
    pids = (
        out.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "bin",
            F.when(F.col("k") < 20, 0)
            .when(F.col("k") < 50, 1)
            .when(F.col("k") < 80, 2)
            .otherwise(3),
        )
        .groupBy("bin")
        .agg(F.count_distinct("pid").alias("n"), F.first("pid").alias("p"))
        .collect()
    )
    assert all(r.n == 1 and r.p == r.bin for r in pids)


def test_backfill_chunk_predicate_pushes_to_scan(spark):
    from olake_spark.plans.split import Chunk
    from olake_spark.sources.adapter import ParquetDirSource

    src = ParquetDirSource(spark, SF_DIR)
    df = src.read_chunk("orders", "o_orderkey", Chunk(100, 900), is_last=False)
    plan = _plan(df.select("o_orderkey"))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_orderkey,100)" in plan
    assert "LessThan(o_orderkey,900)" in plan


def test_merge_discovery_join_is_broadcast(spark, tmp_path):
    from olake_spark.schema import OLAKE_ID

    t = Table.create(spark, str(tmp_path / "tbl"))
    df = generate_sequences(spark, 2000, seed=7, max_tok=32)
    t.append(df.repartition(4))
    keys = df.limit(10).select(OLAKE_ID)
    probe = (
        t.scan()
        .select(OLAKE_ID, F.input_file_name().alias("_file"))
        .join(F.broadcast(keys), OLAKE_ID, "left_semi")
    )
    assert "BroadcastHashJoin" in _plan(probe)


def test_bucket_pair_generation_is_single_pipeline(spark):
    """The LSH candidate generator must be one linear pipeline: the
    signature pipeline (scan + shingle explode + 32-way min-agg) appears
    ONCE (no self-join, no union of branches re-evaluating it), and the
    capped/star pair aggregation reuses the window's (band,bkey)
    partitioning instead of adding an Exchange of its own."""
    from olake_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = minhash_lsh_pairs(
        docs, num_perm=32, bands=8, shingle_k=2, jaccard_threshold=0.5
    )
    plan = _plan(out)
    # executedPlan before materialization = the initial physical plan
    assert plan.count("FileScan") == 1
    assert "Union" not in plan
    # exactly 3 shuffles: doc-id signature agg, (band,bkey) window,
    # pair dropDuplicates — the pair groupBy must NOT add a 4th
    assert plan.count("Exchange hashpartitioning") == 3


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    from olake_spark.operators.dedup import decontaminate

    d = load_table(spark, SF_DIR, "documents")
    bench = d.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
    train = d.filter(F.pmod(F.col("doc_id"), F.lit(50)) != 0)
    plan = _plan(decontaminate(train, bench, shingle_k=3))
    # benchmark shingle set ships as a broadcast; never a cartesian or
    # sort-merge join against the corpus explode
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sampling_filters_are_narrow(spark):
    from olake_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
        stratified_sample,
    )

    d = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source"
    )
    for df in (
        deterministic_sample(d, 0.3),
        hash_split(d, {"a": 1, "b": 1}),
        stratified_sample(d, {"src0": 0.5}),
    ):
        plan = _plan(df)
        # pure map/filter: no exchange of any kind, no Python stage
        assert "Exchange" not in plan, plan
        assert "Python" not in plan


def test_token_budget_two_level_windows_only_boundary_bucket(spark):
    from olake_spark.operators.sampling import token_budget_select

    docs = generate_sequences(spark, 2000, seed=3, max_tok=32)
    out = token_budget_select(docs, 5000, n_buckets=64)
    plan = _plan(out)
    # the running-sum window exists, but its input is filtered to ONE
    # bucket per source BEFORE the window's exchange (pushed filter on
    # the bucket id) — the full-source single-task sort never happens
    assert "Window" in plan
    w_idx = plan.index("Window")
    assert "FLOOR" in plan[w_idx:] or "floor" in plan[w_idx:], (
        "bucket filter should sit below the window"
    )


def test_merge_exact_output_uses_single_hash_exchange(spark, tmp_path):
    """The merge rewrite's output partitioning must be the salt-routed
    hash repartition (child evaluated once), never RangePartitioning
    (whose sampling pass re-scans the touched files)."""
    from olake_spark.functions.partitioning import (
        composite_key_expr,
        exact_range_partition,
        sample_file_boundaries,
    )

    t = Table.create(spark, str(tmp_path / "mshape"))
    t.append(generate_sequences(spark, 2000, seed=5, max_tok=16).repartition(4))
    files = t.files()
    bnds = sample_file_boundaries(t, files, ["source", "doc_id"], 8)
    out = exact_range_partition(
        t.scan(), composite_key_expr(["source", "doc_id"]), bnds,
        ["source", "doc_id"],
    )
    plan = _plan(out)
    assert "rangepartitioning" not in plan.lower()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan  # binning is the codegen'd nested-when tree


def test_text_quality_ops_are_single_scan_no_shuffle(spark):
    """repetition_stats / pii_scrub / c4_page_filter / analyze_documents
    are pure per-row expression pipelines: exactly one FileScan, zero
    Exchange (the 100 TB funnel's cheap first pass)."""
    from olake_spark.operators.text import (
        analyze_documents,
        c4_page_filter,
        pii_scrub,
        repetition_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # a well-partitioned corpus (the 100 TB case) passes through with no
    # shuffle: fan_out_small_scan must no-op once the scan has enough
    # partitions for the session's cores
    wide = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint()
    for op in (repetition_stats, pii_scrub, c4_page_filter, analyze_documents):
        plan = _plan(op(wide))
        assert "Exchange" not in plan, op.__name__
    # an under-partitioned input (one small unsplittable file) gets
    # exactly one round-robin fan-out before the per-row stage, so the
    # map work spreads across cores instead of one task
    for op in (repetition_stats, pii_scrub, c4_page_filter, analyze_documents):
        plan = _plan(op(docs))
        assert plan.count("Scan parquet") == 1, op.__name__
        assert plan.count("Exchange RoundRobinPartitioning") == 1, op.__name__


def test_repeated_ngrams_window_strategy_single_scan(spark):
    """The default (window) strategy must read the corpus ONCE; the join
    strategy is allowed its second scan but must keep the count
    aggregation partial (map-side combine before the exchange)."""
    from olake_spark.operators.dedup import repeated_ngram_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pw = _plan(repeated_ngram_stats(docs, strategy="window"))
    assert pw.count("Scan parquet") == 1
    pj = _plan(repeated_ngram_stats(docs, strategy="join"))
    assert "partial_count" in pj or "partial count" in pj.lower()


def test_repeated_ngrams_auto_selects_scale_safe_strategy(spark):
    """strategy='auto' (the default): window's single-scan plan only up
    to window_max_rows docs; past the threshold the AQE-skew-splittable
    join shape, where an ultra-hot gram cannot become one straggler
    window task."""
    from olake_spark.operators.dedup import repeated_ngram_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # small corpus (500 docs <= default threshold): window plan
    p_small = _plan(repeated_ngram_stats(docs))
    assert p_small.count("Scan parquet") == 1
    assert "windowspecdefinition" in p_small
    # force the corpus to read as "big": join plan, no window operator
    p_big = _plan(repeated_ngram_stats(docs, window_max_rows=10))
    assert "windowspecdefinition" not in p_big
    assert "partial_count" in p_big or "partial count" in p_big.lower()
