"""Deterministic sampling / splitting / mixing (training-data curation)."""

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
    token_budget_select,
    uniform_hash,
)


@pytest.fixture(scope="module")
def docs(spark):
    df = generate_sequences(spark, 4000, seed=11, max_tok=64).cache()
    df.count()
    return df


def test_uniform_hash_range_and_determinism(spark, docs):
    u = docs.select(uniform_hash(F.col("doc_id"), seed=3).alias("u"))
    mm = u.agg(F.min("u"), F.max("u"), F.avg("u")).first()
    assert 0.0 <= mm[0] and mm[1] < 1.0
    assert 0.4 < mm[2] < 0.6  # roughly uniform over 4000 draws
    # same seed -> identical; different seed -> different draws
    a = deterministic_sample(docs, 0.3, seed=7).select("doc_id")
    b = deterministic_sample(docs, 0.3, seed=7).select("doc_id")
    c = deterministic_sample(docs, 0.3, seed=8).select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.exceptAll(c).count() > 0
    assert abs(a.count() / 4000 - 0.3) < 0.05


def test_hash_split_partition_and_stability(spark, docs):
    out = hash_split(docs, {"train": 8, "val": 1, "test": 1}, seed=1)
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 4000 == pytest.approx(0.8, abs=0.05)
    # holdout stability: the assignment of existing docs is unchanged
    # when the table grows
    sub = hash_split(docs.limit(1000), {"train": 8, "val": 1, "test": 1}, seed=1)
    j = sub.select("doc_id", F.col("split").alias("s2")).join(
        out.select("doc_id", "split"), "doc_id"
    )
    assert j.filter(F.col("split") != F.col("s2")).count() == 0


def test_stratified_sample_rates(spark, docs):
    rates = {"web": 0.5, "books": 0.1}
    out = stratified_sample(docs, rates, default_rate=0.0)
    got = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    base = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    assert set(got) <= set(rates)  # unlisted sources dropped entirely
    for s, r in rates.items():
        assert got.get(s, 0) / base[s] == pytest.approx(r, abs=0.07)


def test_token_budget_select(spark, docs):
    budget = 20_000
    out = token_budget_select(docs, budget).cache()
    sums = {
        r.source: r.tok
        for r in out.groupBy("source").agg(F.sum("n_tok").alias("tok")).collect()
    }
    total = {
        r.source: r.tok
        for r in docs.groupBy("source").agg(F.sum("n_tok").alias("tok")).collect()
    }
    # every source lands under budget; sources with more material than
    # the budget fill it to within one document (max_tok=64 slack),
    # exhausted sources keep everything
    for s, tok in sums.items():
        assert tok <= budget
        if total[s] > budget:
            assert tok > budget - 200
        else:
            assert tok == total[s]
    # deterministic: rerun selects the identical set
    again = token_budget_select(docs, budget)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    # per-source dict budgets override
    capped = token_budget_select(docs, {"web": 5000})
    got = {
        r.source: r.tok
        for r in capped.groupBy("source").agg(F.sum("n_tok").alias("tok")).collect()
    }
    assert set(got) == {"web"} and got["web"] <= 5000
    out.unpersist()


def test_decontaminate_removes_ngram_overlap(spark):
    from olake_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            ("t1", "the quick brown fox jumps"),      # shares 3-gram with b1
            ("t2", "completely different training text here"),
            ("t3", "short"),                          # no shingles -> safe
            ("t4", "quick brown fox somewhere else"), # shares via b1 too
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "a quick brown fox appears")], "doc_id string, text string"
    )
    kept = {
        r.doc_id
        for r in decontaminate(docs, bench, shingle_k=3).select("doc_id").collect()
    }
    assert kept == {"t2", "t3"}
    # non-broadcast path agrees
    kept2 = {
        r.doc_id
        for r in decontaminate(
            docs, bench, shingle_k=3, broadcast_benchmark=False
        ).select("doc_id").collect()
    }
    assert kept2 == kept


def test_token_budget_two_level_parity(spark, docs):
    # the bucketized scale path must select the IDENTICAL set as the
    # naive single-window form, for scalar and per-source dict budgets
    for budget in (20_000, {"web": 5000, "books": 900}):
        fast = token_budget_select(docs, budget).select("doc_id")
        naive = token_budget_select(docs, budget, n_buckets=None).select("doc_id")
        assert fast.exceptAll(naive).count() == 0
        assert naive.exceptAll(fast).count() == 0
    # tiny bucket count stresses boundary handling
    fast8 = token_budget_select(docs, 20_000, n_buckets=8).select("doc_id")
    naive = token_budget_select(docs, 20_000, n_buckets=None).select("doc_id")
    assert fast8.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast8).count() == 0


def test_curate_corpus_stage_composition(spark):
    from olake_spark.pipelines.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta", "web", 4),
            ("d2", "alpha beta gamma delta", "web", 4),   # exact dup of d1
            ("d3", "totally unrelated words here", "web", 4),
            ("d4", "the secret benchmark passage text", "books", 5),  # contaminated
            ("d5", "clean and unique content indeed", "books", 5),
        ],
        "doc_id string, text string, source string, n_tok int",
    )
    bench = spark.createDataFrame(
        [("b1", "contains the secret benchmark passage")],
        "doc_id string, text string",
    )
    # dedup + decontaminate only (sampling stages skipped)
    kept = {
        r.doc_id
        for r in curate_corpus(docs, bench).select("doc_id").collect()
    }
    assert kept == {"d1", "d3", "d5"}

    # full pipeline stays a subset and respects budgets per source
    out = curate_corpus(
        docs, bench, mixture_rates={"web": 1.0, "books": 1.0},
        token_budget={"web": 8, "books": 5}, seed=3,
    )
    rows = out.collect()
    assert {r.doc_id for r in rows} <= kept
    by_src = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + r.n_tok
    assert by_src.get("web", 0) <= 8 and by_src.get("books", 0) <= 5


def test_curate_corpus_quality_gates(spark):
    """Repetition gate drops the spam doc; PII scrub runs BEFORE dedup
    so two docs differing only in embedded PII dedup to one."""
    from olake_spark.pipelines.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            ("1", "a sound document with plenty of distinct words inside", "s", 9),
            ("2", "spam spam spam spam spam spam spam spam spam ham", "s", 10),
            # 3 and 4 identical after scrubbing their different emails
            ("3", "contact alice@example.com for all the various details", "s", 8),
            ("4", "contact bob@example.org for all the various details", "s", 8),
        ],
        "doc_id string, text string, source string, n_tok int",
    )
    out = curate_corpus(
        docs, repetition={"max_word": 0.3, "min_words": 2}, scrub_pii=True
    )
    kept = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert "2" not in kept  # repetition gate
    assert "4" not in kept and "3" in kept  # post-scrub dedup keeps min id
    assert kept == ["1", "3"]
    # scrubbed text flows downstream
    texts = {r.doc_id: r.text for r in out.collect()}
    assert "<EMAIL>" in texts["3"] and "alice" not in texts["3"]


def test_curate_corpus_materialize_parity_and_speed(spark):
    """materialize=True must change the physical execution (persisted
    fan-out points) but NOT the result."""
    from pyspark.sql import functions as F

    from olake_spark.pipelines.curation import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source", "n_chars"
    )
    bench = docs.limit(20)
    kw = dict(
        mixture_rates={"src0": 0.9}, default_rate=0.6,
        token_budget=4096, weight_col="n_chars", seed=2,
    )
    lazy = {r.doc_id for r in curate_corpus(docs, bench, **kw).select("doc_id").collect()}
    mat_df = curate_corpus(docs, bench, materialize=True, **kw)
    mat = {r.doc_id: r for r in mat_df.collect()}
    assert set(mat) == lazy and len(lazy) > 0
    assert "InMemoryTableScan" in mat_df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()


def test_leakage_safe_split_cluster_cohesion(spark, docs):
    """Every near-duplicate cluster lands in exactly ONE split, docs
    outside any cluster split by their own key (identical to
    hash_split), and assignment is deterministic."""
    from olake_spark.operators.sampling import leakage_safe_split

    # synthetic cluster graph: doc i joins cluster i//4 for the first
    # 1000 docs; the rest are singletons absent from the frame entirely
    from pyspark.sql.window import Window

    ids = docs.select("doc_id").orderBy("doc_id").limit(1000)
    clustered = ids.withColumn(
        "_rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    reps = (
        clustered.withColumn("_g", ((F.col("_rn") - 1) / 4).cast("int"))
        .withColumn(
            "cluster_rep",
            F.min("doc_id").over(Window.partitionBy("_g")),
        )
        .select("doc_id", "cluster_rep")
        .cache()
    )
    reps.count()
    out = leakage_safe_split(
        docs, reps, {"train": 2, "val": 1, "test": 1}, seed=5
    ).cache()
    # cohesion: every cluster maps to exactly one split
    per_cluster = (
        out.join(reps, "doc_id")
        .groupBy("cluster_rep")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert per_cluster.filter(F.col("k") != 1).count() == 0
    # unclustered docs behave exactly like plain hash_split
    plain = hash_split(docs, {"train": 2, "val": 1, "test": 1}, seed=5)
    unclustered = out.join(reps.select("doc_id"), "doc_id", "left_anti")
    j = unclustered.select("doc_id", F.col("split").alias("s2")).join(
        plain.select("doc_id", "split"), "doc_id"
    )
    assert j.filter(F.col("split") != F.col("s2")).count() == 0
    # total conservation
    assert out.count() == 4000
    out.unpersist()
    reps.unpersist()
