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


# -------------------------------------------------- product quantization
# IVF-PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"): split the vector into m subspaces, k-means each subspace to
# ks codewords, store only the m code bytes + the exact vector norm.
# At 64-dim float32 with m=8/ks=16 that is 8 ints + 1 double per vector
# instead of 256 bytes — the layout that fits 10^9+ embeddings where the
# raw vectors would not. Query-time scoring is ADC (asymmetric distance
# computation): a per-query lookup table of dot(q_sub, codeword), summed
# over subspaces via pure Catalyst element_at on literal arrays — NO UDF
# at probe time.
#
# Float discipline for the DuckDB oracle: every accumulation (encode
# distances, LUT dots, vector norms) runs SEQUENTIALLY over dimensions
# in float64, matching the generated SQL's left-associated sums term for
# term, so codes, scores, and ranks are bit-identical cross-engine.


def sample_vectors(
    emb: DataFrame, vec_col: str = "embedding", sample_rows: int = 2048
) -> np.ndarray | None:
    """Raw (UNnormalized) float32 sample in scan order — the PQ
    trainer's input; same bounded-collect recipe as sample_codebook."""
    rows = emb.select(vec_col).limit(sample_rows).collect()
    if not rows:
        return None
    return np.stack([r[0] for r in rows]).astype(np.float32)


def pq_codebooks(
    sample: np.ndarray, m: int = 8, ks: int = 16, seed: int = 7
) -> np.ndarray:
    """[m, ks, dsub] float32 PQ codebooks: per-subspace Lloyd k-means on
    the driver-side sample (the trainer's internals need no cross-engine
    discipline — only its OUTPUT is embedded as oracle literals)."""
    n, dim = sample.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub), dtype=np.float32)
    for s in range(m):
        sub = sample[:, s * dsub:(s + 1) * dsub].astype(np.float32)
        if n < ks:
            books[s] = rng.standard_normal((ks, dsub)).astype(np.float32)
            continue
        idx = rng.choice(n, ks, replace=False)
        C = sub[idx].copy()
        for _ in range(8):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(ks):
                msk = assign == j
                if msk.any():
                    C[j] = sub[msk].mean(axis=0)
        books[s] = C
    return books


def pq_encode_kernel(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """[n, m] int32 codes. Distances accumulate sequentially over the
    subspace dims in float64 — the exact arithmetic the generated SQL
    oracle replays — and argmin takes the FIRST minimum (numpy argmin ==
    SQL CASE first-match)."""
    B = books.astype(np.float64)
    m, ks, dsub = B.shape
    M64 = M.astype(np.float64)
    n = len(M64)
    codes = np.empty((n, m), dtype=np.int32)
    for s in range(m):
        sub = M64[:, s * dsub:(s + 1) * dsub]
        dists = np.empty((n, ks), dtype=np.float64)
        for k in range(ks):
            d = np.zeros(n, dtype=np.float64)
            for j in range(dsub):
                t = sub[:, j] - B[s, k, j]
                d = d + t * t
            dists[:, k] = d
        codes[:, s] = np.argmin(dists, axis=1)
    return codes


def seq_norm_kernel(M: np.ndarray) -> np.ndarray:
    """Exact L2 norms with sequential float64 accumulation (matches the
    SQL left-associated sum-of-squares)."""
    M64 = M.astype(np.float64)
    d = np.zeros(len(M64), dtype=np.float64)
    for j in range(M64.shape[1]):
        d = d + M64[:, j] * M64[:, j]
    return np.sqrt(d)


def pq_encode_udf(books: np.ndarray):
    """Pandas UDF: embedding -> struct(codes array<int>, vnorm double).
    One Arrow batch per call; the vector itself is DROPPED downstream —
    that is the compression."""
    B = books.copy()
    out_t = T.StructType(
        [
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
            T.StructField("vnorm", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(out_t)
    def encode(v: pd.Series) -> pd.DataFrame:
        M = np.stack(v.to_numpy())
        codes = pq_encode_kernel(M, B)
        norms = seq_norm_kernel(M)
        return pd.DataFrame(
            {"codes": [row.tolist() for row in codes], "vnorm": norms}
        )

    return encode


def pq_adc_lut(books: np.ndarray, query_vec: list[float]) -> list[list[float]]:
    """Per-query ADC lookup table: lut[s][k] = dot(q_sub, codeword) with
    sequential float64 accumulation. m*ks doubles — driver-side, tiny."""
    B = books.astype(np.float64)
    m, ks, dsub = B.shape
    q = np.asarray(query_vec, dtype=np.float32).astype(np.float64)
    lut = []
    for s in range(m):
        qs = q[s * dsub:(s + 1) * dsub]
        row = []
        for k in range(ks):
            acc = 0.0
            for j in range(dsub):
                acc = acc + qs[j] * B[s, k, j]
            row.append(float(acc))
        lut.append(row)
    return lut
