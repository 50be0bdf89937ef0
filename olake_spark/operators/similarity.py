"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
- ``brute_force_topk`` — exact cosine top-k; dot products are
  zip_with/aggregate Catalyst expressions (JVM, codegen'd). The
  correctness baseline, and fine for one-off queries even at scale
  (it's a single narrow scan + TakeOrderedAndProject).
- ``lsh_topk`` — random-hyperplane LSH: a vectorized pandas UDF
  (numpy matmul over whole Arrow batches) assigns each vector a
  bucket signature; the query probes its own bucket plus neighboring
  buckets within Hamming distance ``probe_hamming``; exact cosine
  reranks the candidates. The scale path: candidate count is a small
  fraction of N and the bucket join is an equi-join on an int key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    # cast BEFORE multiply: float32*float32 then cast loses precision vs
    # the double-math oracles (duckdb computes on DOUBLE[] lists)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_to_query(
    emb: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec))
    cos = _dot(F.col(vec_col), q) / (
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))) * F.lit(qn)
    )
    return emb.withColumn("cosine", F.round(cos, 6))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on the id.
    Plans as TakeOrderedAndProject — no full sort, no shuffle of the
    data, only k rows per partition reach the driver-side merge."""
    scored = cosine_to_query(emb, query_vec, vec_col)
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float32)


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 7):
    """Pandas UDF: embedding -> sign-bit bucket id (int). One numpy
    matmul per Arrow batch — the showcase vectorized-UDF path."""
    H = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy())  # (batch, dim)
        bits = (M @ H) > 0  # (batch, n_planes)
        out = np.zeros(len(M), dtype=np.int64)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out.astype(np.int32))

    return bucket


def _ivf_centroids(dim: int, n_cells: int, seed: int, sample: np.ndarray | None) -> np.ndarray:
    """Deterministic IVF codebook: a few Lloyd iterations of k-means on a
    driver-side sample (numpy; the sample is small, the assignment pass
    over the full table is the distributed part)."""
    rng = np.random.default_rng(seed)
    if sample is None or len(sample) < n_cells:
        return rng.standard_normal((n_cells, dim)).astype(np.float32)
    idx = rng.choice(len(sample), n_cells, replace=False)
    C = sample[idx].astype(np.float32)
    for _ in range(8):
        d = sample @ C.T  # cosine-ish on normalized rows
        assign = np.argmax(d, axis=1)
        for j in range(n_cells):
            m = sample[assign == j]
            if len(m):
                C[j] = m.mean(axis=0)
        C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-9
    return C


def sample_codebook(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
    sample_rows: int = 2048,
    dim: int | None = None,
) -> np.ndarray | None:
    """Driver-side IVF codebook from a bounded sample — the ONE recipe
    (collect limit(sample_rows) in scan order, L2-normalize with 1e-9
    epsilon, k-means via _ivf_centroids) shared by ivf_topk,
    build_ann_index, and semantic_dedup. The DuckDB oracle generators in
    __spark_entry__.py replicate this math byte-for-byte; keeping a
    single copy is what keeps oracle parity safe. Returns None for an
    empty input."""
    rows = emb.select(vec_col).limit(sample_rows).collect()
    if not rows:
        return None
    sample = np.stack([r[0] for r in rows]).astype(np.float32)
    sample = sample / (np.linalg.norm(sample, axis=1, keepdims=True) + 1e-9)
    return _ivf_centroids(
        dim if dim is not None else sample.shape[1], n_cells, seed, sample
    )


def ivf_bucket_udf(centroids: np.ndarray):
    """Pandas UDF: embedding -> nearest-centroid cell id (one numpy
    matmul per Arrow batch)."""
    C = centroids

    @F.pandas_udf(T.IntegerType())
    def cell(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float32)
        M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-9)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return cell


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    sample_rows: int = 2048,
) -> DataFrame:
    """IVF-style ANN: k-means cells from a driver-side sample, search
    restricted to the ``n_probe`` cells nearest the query, exact cosine
    rerank inside. The inverted-file scale path: at 10^12 rows the cell
    id becomes a partition/cluster key and a probe touches n_probe/n_cells
    of the data."""
    C = sample_codebook(
        emb, vec_col, n_cells, seed, sample_rows, dim=len(query_vec)
    )
    if C is None:
        C = _ivf_centroids(len(query_vec), n_cells, seed, None)
    q = np.asarray(query_vec, dtype=np.float32)
    q = q / (np.linalg.norm(q) + 1e-9)
    probes = np.argsort(-(C @ q))[:n_probe].tolist()
    cell = ivf_bucket_udf(C)
    cand = emb.withColumn("_cell", cell(F.col(vec_col))).filter(
        F.col("_cell").isin([int(p) for p in probes])
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    probe_hamming: int = 1,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: restrict to buckets within ``probe_hamming`` bit flips
    of the query's bucket, rerank those exactly. Recall/probes tradeoff
    is the standard multi-probe LSH knob."""
    dim = len(query_vec)
    H = _hyperplanes(dim, n_planes, seed)
    qbits = (np.asarray(query_vec, dtype=np.float32) @ H) > 0
    qbucket = int(sum(int(b) << j for j, b in enumerate(qbits)))
    probes = {qbucket}
    if probe_hamming >= 1:
        for j in range(n_planes):
            probes.add(qbucket ^ (1 << j))
    if probe_hamming >= 2:
        for j in range(n_planes):
            for j2 in range(j + 1, n_planes):
                probes.add(qbucket ^ (1 << j) ^ (1 << j2))

    bucket = lsh_bucket_udf(dim, n_planes, seed)
    cand = emb.withColumn("_bkt", bucket(F.col(vec_col))).filter(
        F.col("_bkt").isin(list(probes))
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
