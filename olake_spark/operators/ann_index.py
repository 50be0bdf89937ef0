"""Persisted ANN index: materialized IVF cells / LSH buckets + pruning.

The query-time ANN paths in operators/similarity.py recompute bucket
assignments with a UDF over the FULL table per query — correct, but at
10^12 rows every query is a full scan. This module is the maintenance-
side fix, mirroring how the engine's other operators turn compute into
layout (cluster() for curve keys):

- ``build_ann_index`` assigns every vector its IVF cell (or LSH bucket)
  ONCE, with the same vectorized pandas UDFs, and writes a Table whose
  files are routed by the assignment (salt-mapped exact partitioning, so
  IVF files are cell-PURE and LSH files cover a tight bucket range);
  manifests carry min/max stats on the assignment column. The codebook
  (centroids / hyperplane seed) persists next to the table in
  ``index.json``.
- ``ann_index_topk`` plans probes driver-side from the codebook
  (metadata only), prunes files via manifest stats, and reruns exact
  cosine only on surviving rows — NO assignment UDF at query time.

The reference has no vector search; this extends its chunk-planning
idea (stats-driven scan pruning, e.g. /root/reference/drivers/mongodb/
internal/backfill.go:126-217) to embedding space.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.functions.partitioning import salts_for_bins
from olake_spark.operators.similarity import (
    _hyperplanes,
    _ivf_centroids,
    brute_force_topk,
    ivf_bucket_udf,
    lsh_bucket_udf,
)
from olake_spark.table.format import Table, _atomic_write_json

ASSIGN = "_cell"  # the materialized assignment column


@dataclass
class AnnIndex:
    table: Table
    kind: str  # 'ivf' | 'lsh' | 'ivfpq'
    dim: int
    id_col: str
    vec_col: str
    n_cells: int  # ivf/ivfpq: cells; lsh: 2**n_planes buckets
    n_planes: int
    seed: int
    centroids: np.ndarray | None  # ivf/ivfpq
    pq_books: np.ndarray | None = None  # ivfpq: [m, ks, dsub]

    @property
    def root(self) -> str:
        return self.table.root


def _index_schema(id_type: T.DataType, vec_col: str, id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField(vec_col, T.ArrayType(T.FloatType(), True), True),
            T.StructField(ASSIGN, T.IntegerType(), True),
        ]
    )


def _pq_index_schema(id_type: T.DataType, id_col: str) -> T.StructType:
    # NO vector column — m int codes + one double norm per row is the
    # whole payload (32x smaller than 64-dim float32), the layout that
    # holds 10^9+ embeddings where raw vectors would not
    return T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("codes", T.ArrayType(T.IntegerType(), True), True),
            T.StructField("vnorm", T.DoubleType(), True),
            T.StructField(ASSIGN, T.IntegerType(), True),
        ]
    )


def build_ann_index(
    spark: SparkSession,
    emb: DataFrame,
    root: str,
    kind: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_planes: int = 8,
    seed: int = 7,
    sample_rows: int = 2048,
    max_records_per_file: int | None = None,
    pq_m: int = 8,
    pq_ks: int = 16,
) -> AnnIndex:
    """One assignment pass + one exact-routed write; returns the index.

    IVF: files are cell-pure (one hash partition per cell via the salt
    map), so manifest min==max and a probe prunes to exactly its cells.
    LSH: buckets (2**n_planes) are grouped into ``n_cells`` contiguous
    ranges so stats stay tight; probes prune to overlapping ranges.
    IVFPQ: cell routing as IVF, but rows store only (id, m PQ codes,
    exact norm) — the vector is dropped; probe-time scoring is ADC via
    pure Catalyst lookups (operators/similarity.py PQ kernels).
    At scale, pass max_records_per_file to split hot cells into multiple
    (still pure) files.
    """
    if kind not in ("ivf", "lsh", "ivfpq"):
        raise ValueError(f"unknown index kind: {kind}")
    if not 1 <= n_planes <= 30:
        # bucket ids live in the int32 ASSIGN column; 2**n_planes must fit
        raise ValueError(f"n_planes must be in [1, 30], got {n_planes}")
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot index an empty embedding table")
    dim = len(first[0])

    centroids = None
    pq_books = None
    if kind in ("ivf", "ivfpq"):
        from olake_spark.operators.similarity import sample_codebook

        centroids = sample_codebook(
            emb, vec_col, n_cells, seed, sample_rows, dim=dim
        )
        assign_udf = ivf_bucket_udf(centroids)
        n_routes = n_cells
        route = F.col(ASSIGN)
        if kind == "ivfpq":
            from olake_spark.operators.similarity import (
                pq_codebooks,
                sample_vectors,
            )

            raw = sample_vectors(emb, vec_col, sample_rows)
            pq_books = pq_codebooks(raw, m=pq_m, ks=pq_ks, seed=seed)
    else:
        assign_udf = lsh_bucket_udf(dim, n_planes, seed)
        n_routes = min(n_cells, 1 << n_planes)
        # contiguous bucket ranges -> tight per-file min/max for pruning.
        # Multiply in LONG: bucket_id * n_routes overflows int32 from
        # n_planes ~27 up, silently corrupting the salt routing.
        route = (
            F.col(ASSIGN).cast("long") * n_routes / (1 << n_planes)
        ).cast("int")

    id_type = emb.schema[id_col].dataType
    schema = (
        _pq_index_schema(id_type, id_col)
        if kind == "ivfpq"
        else _index_schema(id_type, vec_col, id_col)
    )
    table = Table.create(
        spark,
        root,
        schema=schema,
        partition_col=ASSIGN,
        stats_columns=[ASSIGN, id_col],
    )
    salts = salts_for_bins(n_routes)
    assigned = emb.select(
        id_col, F.col(vec_col).cast("array<float>").alias(vec_col)
    ).withColumn(ASSIGN, assign_udf(F.col(vec_col)))
    if kind == "ivfpq":
        from olake_spark.operators.similarity import pq_encode_udf

        enc = pq_encode_udf(pq_books)
        assigned = assigned.withColumn("_pq", enc(F.col(vec_col))).select(
            id_col,
            F.col("_pq.codes").alias("codes"),
            F.col("_pq.vnorm").alias("vnorm"),
            ASSIGN,
        )
    assigned = (
        assigned.withColumn("_salt", F.element_at(F.lit(salts), route + 1))
        .repartition(n_routes, F.col("_salt"))
        .sortWithinPartitions(ASSIGN)
        .drop("_salt")
    )
    table.append(assigned, max_records_per_file=max_records_per_file)

    meta = {
        "kind": kind,
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        "n_cells": n_cells,
        "n_planes": n_planes,
        "seed": seed,
        "centroids": centroids.tolist() if centroids is not None else None,
        "pq_books": pq_books.tolist() if pq_books is not None else None,
    }
    # atomic: a crash mid-write must not leave a torn codebook that makes
    # an otherwise-consistent index unloadable
    _atomic_write_json(os.path.join(table.root, "index.json"), meta)
    return AnnIndex(
        table=table,
        kind=kind,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        n_planes=n_planes,
        seed=seed,
        centroids=centroids,
        pq_books=pq_books,
    )


def load_ann_index(spark: SparkSession, root: str) -> AnnIndex:
    with open(os.path.join(root, "index.json")) as f:
        meta = json.load(f)
    return AnnIndex(
        table=Table.load(spark, root),
        kind=meta["kind"],
        dim=meta["dim"],
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        n_cells=meta["n_cells"],
        n_planes=meta["n_planes"],
        seed=meta["seed"],
        centroids=(
            np.asarray(meta["centroids"], dtype=np.float32)
            if meta["centroids"] is not None
            else None
        ),
        pq_books=(
            np.asarray(meta["pq_books"], dtype=np.float32)
            if meta.get("pq_books") is not None
            else None
        ),
    )


def _probe_ids(index: AnnIndex, query_vec: list[float], n_probe: int, probe_hamming: int):
    """Driver-side probe planning from the persisted codebook — metadata
    only, no scan."""
    q = np.asarray(query_vec, dtype=np.float32)
    if index.kind in ("ivf", "ivfpq"):
        qn = q / (np.linalg.norm(q) + 1e-9)
        return sorted(np.argsort(-(index.centroids @ qn))[:n_probe].tolist())
    H = _hyperplanes(index.dim, index.n_planes, index.seed)
    qbits = (q @ H) > 0
    qbucket = int(sum(int(b) << j for j, b in enumerate(qbits)))
    probes = {qbucket}
    if probe_hamming >= 1:
        probes |= {qbucket ^ (1 << j) for j in range(index.n_planes)}
    if probe_hamming >= 2:
        probes |= {
            qbucket ^ (1 << j) ^ (1 << j2)
            for j in range(index.n_planes)
            for j2 in range(j + 1, index.n_planes)
        }
    return sorted(probes)


def ann_index_topk_batch(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    probe_hamming: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> tuple[DataFrame, dict]:
    """Top-k for a whole DataFrame of query vectors in ONE plan.

    The per-query path scans its probe cells per call; a training-data
    batch (dedupe N new docs against the corpus) wants one job: assign
    each query its probe cells with the vectorized UDF, explode, prune
    files to the UNION of probed cells, then a single equi-join on the
    cell id + per-query exact rerank (window top-k). Shuffle key is the
    cell id — uniform by construction of the codebook.

    Returns (df[(qid, vec_id, cosine, rank)], plan_info).
    """
    from pyspark.sql.window import Window

    if index.kind == "ivfpq":
        return _pq_batch_topk(index, queries, k, n_probe, qid_col, qvec_col)
    if index.kind == "ivf":
        C = index.centroids

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def probe_cells(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float32)
            M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-9)
            order = np.argsort(-(M @ C.T), axis=1)[:, :n_probe]
            return pd.Series([row.astype(np.int32).tolist() for row in order])

    else:
        H = _hyperplanes(index.dim, index.n_planes, index.seed)
        n_planes = index.n_planes
        ph = probe_hamming

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def probe_cells(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float32)
            bits = (M @ H) > 0
            base = np.zeros(len(M), dtype=np.int64)
            for j in range(n_planes):
                base |= bits[:, j].astype(np.int64) << j
            out = []
            for b in base:
                probes = {int(b)}
                if ph >= 1:
                    probes |= {int(b) ^ (1 << j) for j in range(n_planes)}
                if ph >= 2:
                    probes |= {
                        int(b) ^ (1 << j) ^ (1 << j2)
                        for j in range(n_planes)
                        for j2 in range(j + 1, n_planes)
                    }
                out.append(sorted(probes))
            return pd.Series(out)

    qbase = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<float>").alias("qvec"),
    )
    # evaluate the probe-cell UDF exactly ONCE: collect the (qid, cell)
    # assignment driver-side (n_queries x n_probe ints — a query batch is
    # tiny next to the corpus), then rejoin it as a literal relation.
    # Leaving the UDF in the main plan would run it twice: once for the
    # probed-cell set (file pruning) and again in the corpus join.
    qcells = qbase.select(
        "qid", F.explode(probe_cells(F.col("qvec"))).alias(ASSIGN)
    ).collect()
    probed = sorted({r[ASSIGN] for r in qcells})
    cells_df = index.table.spark.createDataFrame(
        [(r.qid, r[ASSIGN]) for r in qcells],
        T.StructType(
            [
                T.StructField("qid", qbase.schema["qid"].dataType),
                T.StructField(ASSIGN, T.IntegerType()),
            ]
        ),
    )
    q = qbase.join(cells_df, "qid")
    files = index.table.files()
    cand_files = [
        f for f in files if any(f.overlaps(ASSIGN, p, p) for p in probed)
    ]
    info = {
        "files_total": len(files),
        "files_scanned": len(cand_files),
        "prune_fraction": round(1 - len(cand_files) / max(len(files), 1), 4),
        "probes": len(probed),
    }
    base = index.table.scan(files=cand_files).filter(F.col(ASSIGN).isin(probed))
    # typical batches are tiny next to the corpus: auto-broadcast picks
    # them up; a huge batch degrades gracefully to a shuffle on the
    # uniform cell id
    joined = base.join(q, ASSIGN)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = dot(F.col(index.vec_col), F.col("qvec")) / (
        F.sqrt(dot(F.col(index.vec_col), F.col(index.vec_col)))
        * F.sqrt(dot(F.col("qvec"), F.col("qvec")))
    )
    # no dedup needed: every corpus row lives in exactly one cell, and a
    # query's probe cells are distinct — (qid, id) pairs appear once
    scored = joined.select(
        "qid", F.col(index.id_col), F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.col(index.id_col).asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return out, info


def ann_index_topk(
    index: AnnIndex,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    probe_hamming: int = 1,
) -> tuple[DataFrame, dict]:
    """Top-k via the persisted index. Returns (result_df, plan_info);
    plan_info carries files_total / files_scanned / prune_fraction —
    the bench's ann_prune_fraction evidence.
    """
    probes = _probe_ids(index, query_vec, n_probe, probe_hamming)
    files = index.table.files()
    cand_files = [
        f for f in files if any(f.overlaps(ASSIGN, p, p) for p in probes)
    ]
    info = {
        "files_total": len(files),
        "files_scanned": len(cand_files),
        "prune_fraction": round(1 - len(cand_files) / max(len(files), 1), 4),
        "probes": len(probes),
    }
    cand = index.table.scan(files=cand_files).filter(F.col(ASSIGN).isin(probes))
    if index.kind == "ivfpq":
        out = _pq_adc_topk(index, cand, query_vec, k)
    else:
        out = brute_force_topk(cand, query_vec, k, index.id_col, index.vec_col)
    return out, info


def _pq_batch_topk(
    index: AnnIndex,
    queries: DataFrame,
    k: int,
    n_probe: int,
    qid_col: str,
    qvec_col: str,
) -> tuple[DataFrame, dict]:
    """Batch ADC over the code-only index, ONE plan, no probe-time UDF:
    the query batch (tiny next to the corpus, as in the ivf batch path)
    is collected once; each query contributes (qid, probe cell, ADC
    lookup table, qnorm) rows that rejoin the corpus codes on the cell
    id — the LUT rides the join as an array<array<double>> column and
    scoring is two nested element_at lookups per subspace. Per-query
    rank mirrors _pq_adc_topk (rounded score desc, id asc)."""
    from pyspark.sql.window import Window

    from olake_spark.operators.similarity import pq_adc_lut, seq_norm_kernel

    qrows = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<float>").alias("qvec"),
    ).collect()
    C = index.centroids
    cells_rows = []
    for r in qrows:
        qv = np.asarray(r.qvec, dtype=np.float32)
        qn = qv / (np.linalg.norm(qv) + 1e-9)
        probes = np.argsort(-(C @ qn))[:n_probe].tolist()
        lut = pq_adc_lut(index.pq_books, list(qv))
        qnorm = float(seq_norm_kernel(qv.reshape(1, -1))[0])
        for p in probes:
            cells_rows.append((r.qid, int(p), lut, qnorm))
    qid_type = queries.schema[qid_col].dataType
    cells_df = index.table.spark.createDataFrame(
        cells_rows,
        T.StructType(
            [
                T.StructField("qid", qid_type),
                T.StructField(ASSIGN, T.IntegerType()),
                T.StructField(
                    "_lut", T.ArrayType(T.ArrayType(T.DoubleType()))
                ),
                T.StructField("_qnorm", T.DoubleType()),
            ]
        ),
    )
    probed = sorted({c for _, c, _, _ in cells_rows})
    files = index.table.files()
    cand_files = [
        f for f in files if any(f.overlaps(ASSIGN, p, p) for p in probed)
    ]
    info = {
        "files_total": len(files),
        "files_scanned": len(cand_files),
        "prune_fraction": round(1 - len(cand_files) / max(len(files), 1), 4),
        "probes": len(probed),
    }
    base = index.table.scan(files=cand_files).filter(F.col(ASSIGN).isin(probed))
    joined = base.join(cells_df, ASSIGN)
    m = index.pq_books.shape[0]
    adc = F.element_at(
        F.element_at(F.col("_lut"), 1), F.col("codes").getItem(0) + 1
    )
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at(F.col("_lut"), s + 1), F.col("codes").getItem(s) + 1
        )
    cos = adc / (F.col("_qnorm") * F.col("vnorm"))
    scored = joined.select(
        "qid", F.col(index.id_col), F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.col(index.id_col).asc()
    )
    out = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return out, info


def _pq_adc_topk(
    index: AnnIndex, cand: DataFrame, query_vec: list[float], k: int
) -> DataFrame:
    """ADC scoring over PQ codes — pure Catalyst, NO UDF at probe time:
    the per-query lookup table (m x ks doubles, driver-computed) becomes
    literal arrays, each subspace contributes one element_at, and the
    approximate cosine is their sum over (|q| * stored exact |v|). Ranks
    like brute_force_topk (rounded score desc, id asc). Scores are PQ
    approximations by design; a rerank pass joins the top-R ids back to
    the source vectors when exactness matters."""
    from olake_spark.operators.similarity import pq_adc_lut, seq_norm_kernel

    lut = pq_adc_lut(index.pq_books, query_vec)
    qnorm = float(
        seq_norm_kernel(
            np.asarray(query_vec, dtype=np.float32).reshape(1, -1)
        )[0]
    )
    adc = F.element_at(F.lit(lut[0]), F.col("codes").getItem(0) + 1)
    for s in range(1, len(lut)):
        adc = adc + F.element_at(F.lit(lut[s]), F.col("codes").getItem(s) + 1)
    cos = adc / (F.lit(qnorm) * F.col("vnorm"))
    return (
        cand.select(index.id_col, F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(index.id_col).asc())
        .limit(k)
    )
