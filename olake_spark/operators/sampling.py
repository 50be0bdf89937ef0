"""Deterministic sampling, splitting, and mixing for training-data curation.

No direct reference analog — these are the training-pipeline extras a
100 TB curation engine needs around dedup/quality (public practice:
hash-based holdout splits; source-weighted mixtures as in the public
Pile/C4/LLaMA data recipes).

Every decision is a pure function of (seed, key): re-running any task at
any parallelism yields byte-identical selections, which resumable jobs
require (a ``rand()`` Bernoulli sample is neither stable across task
retries nor oracle-checkable). The uniform variate is

    u(key) = int(md5(seed || '|' || key)[:8 hex], 16) / 2^32  in [0, 1)

computed entirely JVM-side (md5/conv/cast — no UDF). All ops are narrow
map/filters; only ``token_budget_select`` adds one hash exchange for its
per-source window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def uniform_hash(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform [0,1) from a key column — the shared
    randomness primitive for every sampler here."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep each row iff u(key) < rate. Stable under retries/reruns."""
    return df.filter(uniform_hash(F.col(key_col), seed) < F.lit(float(rate)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hash.

    ``weights`` need not sum to 1 — they are normalized. A document's
    split depends only on (seed, key), so growing the table never moves
    existing documents between splits (holdout stability)."""
    if not weights:
        raise ValueError("hash_split requires at least one split weight")
    total = float(sum(weights.values()))
    u = uniform_hash(F.col(key_col), seed)
    names = list(weights)
    acc = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    rep_col: str = "cluster_rep",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """``hash_split`` that assigns every NEAR-DUPLICATE CLUSTER to one
    split: the hash key is the cluster representative (``clusters`` is
    ``dedup.near_dup_clusters`` output, ``key -> cluster_rep``), so a
    near-copy of a training document can never land in the test set —
    the standard leakage guard train/eval splits need on deduplicated
    web corpora. Documents missing from ``clusters`` hash their own key
    (a pairs-only cluster frame therefore also works).

    Same holdout stability as ``hash_split``: assignment depends only on
    (seed, rep), and a cluster's rep is its MIN member id, so growing a
    cluster by discovering new near-dups never moves it between splits
    unless the new member becomes the min — the unavoidable case, since
    the new member must join its cluster's split. Plan shape: one
    shuffled equi-join on the key (both sides hash-partition on it; at
    fleet scale AQE sizes the join, no driver state)."""
    reps = clusters.select(
        F.col(key_col).alias("_ls_key"), F.col(rep_col).alias("_ls_rep")
    )
    out = df.join(reps, F.col(key_col) == F.col("_ls_key"), "left")
    out = out.withColumn(
        "_ls_rep", F.coalesce(F.col("_ls_rep"), F.col(key_col))
    )
    out = hash_split(
        out, weights, key_col="_ls_rep", seed=seed, split_col=split_col
    )
    return out.drop("_ls_key", "_ls_rep")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli-by-hash sampling — the mixing knob that
    up/down-weights sources in a training mixture. Strata missing from
    ``rates`` fall back to ``default_rate``."""
    rate: Column = F.lit(float(default_rate))
    for name, r in rates.items():
        rate = F.when(F.col(strata_col) == name, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(uniform_hash(F.col(key_col), seed) < rate)


def token_budget_select(
    df: DataFrame,
    budget: int | dict[str, int],
    weight_col: str = "n_tok",
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int | None = 1024,
) -> DataFrame:
    """Select documents per source, in seeded-shuffle order, until the
    cumulative token budget is reached (running sum INCLUDES the row
    that crosses the line iff it still fits).

    The order is u(key) with key as tie-break — a deterministic shuffle,
    so the selected set is a uniform prefix sample of each source sized
    by tokens, not rows.

    Scale: a plain per-source running-sum window hash-partitions an
    ENTIRE source into one task — with a handful of sources at 100 TB
    that is a terabyte single-task sort. Instead (default): bucketize u
    into ``n_buckets`` ranges, aggregate per-(source, bucket) token
    totals (one small shuffle, ~sources x buckets rows to the driver),
    prefix-sum driver-side to find each source's boundary bucket, then
    keep every bucket strictly before it outright and run the window
    ONLY on the boundary bucket (~1/n_buckets of a source per task).
    The selected set is IDENTICAL to the naive window's — bucket order
    refines u order — verified by a parity test. ``n_buckets=None``
    forces the naive single-window path (small inputs / verification).
    Falls back to it automatically when sources x buckets would flood
    the driver (high-cardinality strata means small per-source groups,
    where the single-task window is harmless)."""
    if isinstance(budget, dict):
        b: Column = F.lit(None).cast("long")
        for name, v in budget.items():
            b = F.when(F.col(strata_col) == name, F.lit(int(v))).otherwise(b)
        budgets = {name: int(v) for name, v in budget.items()}
    else:
        b = F.lit(int(budget))
        budgets = None
    u = uniform_hash(F.col(key_col), seed)
    wt = F.col(weight_col).cast("long")

    def _naive() -> DataFrame:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(u.asc(), F.col(key_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn("_cum_tok", F.sum(wt).over(w))
            .filter(F.col("_cum_tok") <= b)
            .drop("_cum_tok")
        )

    if n_buckets is None:
        return _naive()

    bucket = F.floor(u * F.lit(float(n_buckets))).cast("int")
    stats = (
        df.select(F.col(strata_col).alias("_s"), bucket.alias("_bk"), wt.alias("_w"))
        .groupBy("_s", "_bk")
        .agg(F.sum("_w").alias("_tok"))
        .collect()
    )
    if not stats:
        return _naive()  # empty input — exact and trivially cheap
    if len(stats) > 1_000_000 or len({r._s for r in stats}) > 10_000:
        return _naive()
    per_strata: dict = {}
    for r in stats:
        per_strata.setdefault(r._s, []).append((r._bk, r._tok))
    cutoff: dict = {}  # strata -> (boundary bucket, tokens before it)
    full_until: dict = {}  # strata -> first non-fully-kept bucket
    for s_val, entries in per_strata.items():
        limit = budgets.get(s_val) if budgets is not None else int(budget)
        if limit is None:
            full_until[s_val] = -1  # unbudgeted stratum: drop everything
            continue
        acc = 0
        boundary = None
        for bk, tok in sorted(entries):
            if acc + tok > limit:
                boundary = bk
                break
            acc += tok
        if boundary is None:
            full_until[s_val] = n_buckets  # whole stratum fits
        else:
            full_until[s_val] = boundary
            cutoff[s_val] = (boundary, acc)

    s_col = F.col(strata_col)
    items = [x for s_val, fu in full_until.items() for x in (F.lit(s_val), F.lit(fu))]
    fu_map = F.create_map(*items) if items else F.create_map()
    fu_col = F.coalesce(F.element_at(fu_map, s_col), F.lit(-1))
    out = df.withColumn("_bk", bucket)
    kept_full = out.filter(F.col("_bk") < fu_col).drop("_bk")
    if not cutoff:
        return kept_full
    citems = []
    oitems = []
    for s_val, (bk, acc) in cutoff.items():
        citems += [F.lit(s_val), F.lit(bk)]
        oitems += [F.lit(s_val), F.lit(acc)]
    c_col = F.element_at(F.create_map(*citems), s_col)
    offset = F.element_at(F.create_map(*oitems), s_col)
    boundary_rows = out.filter(F.col("_bk") == c_col)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(u.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_boundary = (
        boundary_rows.withColumn("_cum_tok", F.sum(wt).over(w) + offset)
        .filter(F.col("_cum_tok") <= b)
        .drop("_cum_tok", "_bk")
    )
    return kept_full.unionByName(kept_boundary)
