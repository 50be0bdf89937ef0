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
) -> DataFrame:
    """Select documents per source, in seeded-shuffle order, until the
    cumulative token budget is reached (running sum INCLUDES the row
    that crosses the line iff it still fits).

    The order is u(key) with key as tie-break — a deterministic shuffle,
    so the selected set is a uniform prefix sample of each source sized
    by tokens, not rows. One hash exchange on the (uniformly
    distributed) strata column; per-source skew in row counts is real
    but the window computes a single running sum — no state blow-up."""
    if isinstance(budget, dict):
        b: Column = F.lit(None).cast("long")
        for name, v in budget.items():
            b = F.when(F.col(strata_col) == name, F.lit(int(v))).otherwise(b)
    else:
        b = F.lit(int(budget))
    u = uniform_hash(F.col(key_col), seed)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(u.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(weight_col).cast("long")).over(w)
    return (
        df.withColumn("_cum_tok", cum)
        .filter(F.col("_cum_tok") <= b)
        .drop("_cum_tok")
    )
