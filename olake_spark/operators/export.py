"""Training-data export: seeded deterministic global shuffle into
token-balanced shards.

The last stage of a curation pipeline hands data to a dataloader, which
wants (a) a reproducible global shuffle — same seed, same order, no
matter how the corpus was partitioned or how many executors ran — and
(b) N shards of roughly equal token mass so data-parallel workers
finish epochs together (public practice: the shard-per-worker layouts
of Pile/C4/Dolma-style pipelines; reference analog: none — OLake stops
at table rows, this extends its sequences table like
``operators/packing.py`` does).

Scale design, in the house style of ``operators/sampling.py``:

* Every placement is a pure function of (seed, key): shard id and
  within-shard order both derive from JVM-side ``md5`` expressions
  (no UDF, no ``rand()``), so task retries, reruns, and different
  input partitionings all produce byte-identical shards.
* ONE hash exchange total. Shard assignment is a narrow projection;
  the within-shard position comes from a window partitioned by the
  shard id, which Catalyst plans as a single exchange + per-partition
  sort. There is NO global sort: at 100 TB a seeded ``orderBy(rand)``
  is a full-table range sort, while N independent shard sorts are
  embarrassingly parallel and AQE-sizable.
* Token balance is by expectation, not coordination: with thousands of
  documents per shard the maximum relative token imbalance concentrates
  around sqrt(shards/docs) (law of large numbers), which the
  ``shard_stats`` audit makes observable; exact bin-balancing would
  need a global sort for a <1% gain at scale.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash64(key: Column, salt: str) -> Column:
    """Deterministic nonnegative 63-bit int from (salt, key) — md5-based
    like sampling.uniform_hash so every placement is oracle-expressible."""
    h = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    key_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Assign every row a shard in [0, n_shards) and a 0-based position
    within its shard — the (seed, key)-deterministic global shuffle.

    The result is independent of the input's row order and partitioning:
    shard = h(seed, key) mod n_shards; order within a shard is by an
    independent hash h'(seed, key), ties broken by the key itself.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(key_col)
    shard = F.pmod(_hash64(key, f"{seed}|shard"), F.lit(n_shards)).cast("int")
    order = _hash64(key, f"{seed}|order")
    win = Window.partitionBy(shard_col).orderBy(F.col("_shuffle_ord"), key)
    return (
        df.withColumn(shard_col, shard)
        .withColumn("_shuffle_ord", order)
        .withColumn(pos_col, F.row_number().over(win) - F.lit(1))
        .drop("_shuffle_ord")
    )


def shard_stats(
    sharded: DataFrame,
    shard_col: str = "shard",
    n_tok_col: str | None = "n_tok",
) -> DataFrame:
    """Per-shard audit: rows, tokens, and each shard's token share
    relative to a perfectly balanced split (1.0 = exact balance)."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if n_tok_col is not None:
        aggs.append(F.sum(n_tok_col).cast("long").alias("tokens"))
    per = sharded.groupBy(F.col(shard_col).alias("shard")).agg(*aggs)
    if n_tok_col is not None:
        total = Window.partitionBy()
        per = per.withColumn(
            "balance",
            F.round(
                F.col("tokens")
                * F.count(F.lit(1)).over(total)
                / F.sum("tokens").over(total),
                6,
            ),
        )
    return per.orderBy("shard")


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    key_col: str = "doc_id",
    n_tok_col: str | None = "n_tok",
) -> dict:
    """Materialize the shuffled shards as ``path/shard=K/`` parquet plus
    a ``shard_manifest.json`` the dataloader reads (per-shard rows and
    tokens, seed, shard count).

    One exchange: the explicit ``repartition(n_shards, shard)`` below
    SATISFIES the window's clustered-distribution requirement, so
    Catalyst plans exchange -> per-partition sort -> window -> write
    with no second shuffle of the token payload; each task writes its
    shard(s) pre-sorted by position, so a sequential read of a shard IS
    the shuffled order.  The manifest stats come from the WRITTEN
    files (shard + token columns only — parquet column pruning skips
    the payload), not from re-running the shuffle.
    """
    key = F.col(key_col)
    assigned = df.withColumn(
        "shard",
        F.pmod(_hash64(key, f"{seed}|shard"), F.lit(n_shards)).cast("int"),
    ).withColumn("_shuffle_ord", _hash64(key, f"{seed}|order"))
    win = Window.partitionBy("shard").orderBy(F.col("_shuffle_ord"), key)
    out = (
        assigned.repartition(n_shards, F.col("shard"))
        .withColumn("pos", F.row_number().over(win) - F.lit(1))
        .drop("_shuffle_ord")
    )
    # V1Writes ("planned write", Spark 3.4+) injects a logical Sort by
    # the partition column above the window — it cannot see that the
    # window already ordered each task by (shard, ord, key), so the
    # payload gets fully re-sorted (measured +0.55 s on the bench
    # table). With it off, FileFormatWriter's runtime ordering check
    # sees the data sorted and skips. Scoped to this write only.
    spark = df.sparkSession
    _PW = "spark.sql.optimizer.plannedWrite.enabled"
    old_pw = spark.conf.get(_PW, "true")
    spark.conf.set(_PW, "false")
    try:
        out.write.mode("overwrite").partitionBy("shard").parquet(path)
    finally:
        spark.conf.set(_PW, old_pw)
    # manifest stats straight from the written files' metadata: per-shard
    # row counts are parquet footer fields and the token sums read ONE
    # narrow column per file with pyarrow — no re-scan job, no partition
    # discovery pass (was ~0.7 s of the export wall: read-back planning
    # + a 3-job aggregate for numbers the files already hold)
    stats_rows = _shard_stats_from_files(
        path, n_tok_col if n_tok_col in df.columns else None
    )
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "key_col": key_col,
        "shards": stats_rows,
        "total_rows": int(sum(r["rows"] for r in stats_rows)),
    }
    with open(os.path.join(path, "shard_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=int)
    return manifest


def _shard_stats_from_files(path: str, n_tok_col: str | None) -> list[dict]:
    """Per-shard (rows, tokens, balance) from the written ``shard=K``
    dirs: row counts from parquet footers, token sums from a pyarrow
    read of just the token column. Same numbers ``shard_stats`` computes
    with a Spark job; balance keeps its definition (token share vs a
    perfectly even split over the shards present)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.startswith(f"{_SHARD_DIR_PREFIX}"):
            continue
        shard = int(name.split("=", 1)[1])
        rows = 0
        tokens = 0
        for fn in os.listdir(os.path.join(path, name)):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(path, name, fn)
            pf = pq.ParquetFile(fp)
            rows += pf.metadata.num_rows
            if n_tok_col is not None:
                col = pq.read_table(fp, columns=[n_tok_col])[n_tok_col]
                s = col.combine_chunks().sum().as_py()
                tokens += int(s) if s is not None else 0
        rec = {"shard": shard, "rows": rows}
        if n_tok_col is not None:
            rec["tokens"] = tokens
        out.append(rec)
    out.sort(key=lambda r: r["shard"])
    if n_tok_col is not None:
        total = sum(r["tokens"] for r in out)
        n_groups = len(out)
        for r in out:
            r["balance"] = (
                round(r["tokens"] * n_groups / total, 6) if total else 0.0
            )
    return out


_SHARD_DIR_PREFIX = "shard="


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One worker's slice: the shard's rows in shuffled order (partition
    pruning keeps the scan to that one directory)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .orderBy("pos")
    )
