"""Persisted ANN index: cell-pure file routing, manifest pruning at
query time (no assignment UDF), recall parity with the query-time path,
and codebook persistence/reload."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.ann_index import (
    ASSIGN,
    _probe_ids,
    ann_index_topk,
    build_ann_index,
    load_ann_index,
)
from olake_spark.operators.similarity import brute_force_topk


def _mk_embeddings(spark, n=300, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in M[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id int, embedding array<float>"),
        M,
    )


@pytest.fixture(scope="module")
def ivf_setup(spark, tmp_path_factory):
    emb, M = _mk_embeddings(spark)
    root = str(tmp_path_factory.mktemp("annidx") / "ivf")
    idx = build_ann_index(spark, emb, root, kind="ivf", n_cells=8, seed=7)
    return emb, M, idx


def test_ivf_index_files_are_cell_pure(spark, ivf_setup):
    _, _, idx = ivf_setup
    files = idx.table.files()
    assert files
    for f in files:
        st = f.stats[ASSIGN]
        assert st["min"] == st["max"]  # exact salt routing: one cell/file
    cells = {f.stats[ASSIGN]["min"] for f in files}
    assert len(cells) > 1


def test_ivf_index_probe_prunes_and_matches_full_rerank(spark, ivf_setup):
    emb, M, idx = ivf_setup
    q = list(map(float, M[0]))
    out, info = ann_index_topk(idx, q, k=10, n_probe=3)
    got = [r.vec_id for r in out.collect()]
    # pruning evidence: probes touch <= n_probe of the cells' files
    assert info["files_scanned"] < info["files_total"]
    assert info["prune_fraction"] > 0
    # parity: identical to exact rerank over the SAME probed cells done
    # the slow way (scan ALL files, filter by assignment — no pruning)
    slow = brute_force_topk(
        idx.table.scan().filter(F.col(ASSIGN).isin(_probe_ids(idx, q, 3, 1))),
        q,
        k=10,
    )
    assert got == [r.vec_id for r in slow.collect()]
    # recall vs global brute force (deterministic, same seed as builder)
    exact = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    assert len(exact & set(got)) / 10 >= 0.3


def test_index_roundtrips_through_load(spark, ivf_setup, tmp_path):
    emb, M, idx = ivf_setup
    q = list(map(float, M[5]))
    before, _ = ann_index_topk(idx, q, k=5, n_probe=3)
    reloaded = load_ann_index(spark, idx.root)
    assert reloaded.kind == "ivf" and reloaded.dim == idx.dim
    assert np.allclose(reloaded.centroids, idx.centroids)
    after, _ = ann_index_topk(reloaded, q, k=5, n_probe=3)
    assert [r.vec_id for r in before.collect()] == [
        r.vec_id for r in after.collect()
    ]


def test_batch_topk_matches_per_query_path(spark, ivf_setup):
    from olake_spark.operators.ann_index import ann_index_topk_batch

    emb, M, idx = ivf_setup
    qids = [3, 17, 42, 99]
    queries = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in qids],
        "qid int, qvec array<float>",
    )
    out, info = ann_index_topk_batch(idx, queries, k=5, n_probe=3)
    assert info["files_scanned"] <= info["files_total"]
    got = {}
    for r in out.collect():
        got.setdefault(r.qid, []).append((r.rank, r.vec_id, r.cosine))
    assert set(got) == set(qids)
    for qid in qids:
        single, _ = ann_index_topk(idx, [float(x) for x in M[qid]], k=5, n_probe=3)
        want = [(i + 1, r.vec_id, r.cosine) for i, r in enumerate(single.collect())]
        assert sorted(got[qid]) == want


def test_batch_topk_lsh_kind(spark, tmp_path):
    from olake_spark.operators.ann_index import ann_index_topk_batch

    emb, M = _mk_embeddings(spark)
    idx = build_ann_index(
        spark, emb, str(tmp_path / "lshb"), kind="lsh", n_planes=8, seed=7
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in M[0]])], "qid int, qvec array<float>"
    )
    out, _ = ann_index_topk_batch(idx, queries, k=10, probe_hamming=2)
    got = {r.vec_id for r in out.collect()}
    single, _ = ann_index_topk(idx, [float(x) for x in M[0]], k=10, probe_hamming=2)
    assert got == {r.vec_id for r in single.collect()}


def test_lsh_index_prunes_and_recalls(spark, tmp_path):
    emb, M = _mk_embeddings(spark)
    root = str(tmp_path / "lsh")
    idx = build_ann_index(
        spark, emb, root, kind="lsh", n_planes=8, n_cells=16, seed=7
    )
    q = list(map(float, M[0]))
    out, info = ann_index_topk(idx, q, k=10, probe_hamming=2)
    got = {r.vec_id for r in out.collect()}
    assert info["files_scanned"] <= info["files_total"]
    exact = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    assert len(exact & got) / 10 >= 0.3
    # file bucket ranges are tight (grouped contiguously, not random)
    for f in idx.table.files():
        st = f.stats[ASSIGN]
        assert st["max"] - st["min"] < (1 << idx.n_planes) // 4


def test_lsh_route_survives_wide_bucket_space(spark, tmp_path):
    """bucket_id * n_routes overflows int32 from n_planes ~27 up; the
    route math runs in long so wide bucket spaces still salt-route every
    row (no NULL salts / silently lost purity). n_planes beyond the int32
    ASSIGN column is rejected at build time."""
    emb, _ = _mk_embeddings(spark, n=80, dim=8, seed=5)
    idx = build_ann_index(
        spark, emb, str(tmp_path / "wide"), kind="lsh",
        n_cells=4, n_planes=28, seed=3,
    )
    files = idx.table.files()
    assert sum(f.record_count for f in files) == 80  # nothing dropped
    for f in files:
        st = f.stats[ASSIGN]
        assert 0 <= st["min"] <= st["max"] < (1 << 28)
    with pytest.raises(ValueError, match="n_planes"):
        build_ann_index(
            spark, emb, str(tmp_path / "bad"), kind="lsh", n_planes=31
        )


def test_batch_topk_probe_udf_runs_once(spark, ivf_setup):
    """The returned batch plan must contain NO Python/Arrow eval stage:
    probe assignment was evaluated exactly once (driver-side collect) and
    rejoined as a literal relation — not recomputed in the corpus join."""
    from olake_spark.operators.ann_index import ann_index_topk_batch

    emb, _, idx = ivf_setup
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out, info = ann_index_topk_batch(idx, queries, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # covers ArrowEvalPython + BatchEvalPython
    assert info["probes"] >= 1
    assert out.count() == 5 * 3


def test_ivfpq_index_stores_codes_not_vectors(spark, tmp_path):
    from olake_spark.operators.similarity import (
        pq_adc_lut,
        pq_encode_kernel,
        seq_norm_kernel,
    )

    emb, M = _mk_embeddings(spark, n=300, dim=16)
    root = str(tmp_path / "pq")
    idx = build_ann_index(
        spark, emb, root, kind="ivfpq", n_cells=8, seed=7, pq_m=4, pq_ks=8
    )
    # no vector column; m codes + one norm per row — the compression
    cols = idx.table.scan().columns
    assert "embedding" not in cols and {"codes", "vnorm"} <= set(cols)
    rows = {r.vec_id: (list(r.codes), r.vnorm) for r in idx.table.scan().collect()}
    assert all(len(c) == 4 for c, _ in rows.values())

    # distributed encode == the sequential-float64 numpy kernel, exactly
    codes = pq_encode_kernel(M, idx.pq_books)
    norms = seq_norm_kernel(M)
    for i in range(len(M)):
        assert rows[i][0] == codes[i].tolist(), i
        assert rows[i][1] == norms[i], i

    # probe: Catalyst ADC scores == numpy ADC over the same candidates
    qvec = [float(x) for x in M[0]]
    out, info = ann_index_topk(idx, qvec, k=10, n_probe=3)
    got = [(r.vec_id, r.cosine) for r in out.collect()]
    assert 0 < info["files_scanned"] < info["files_total"]
    lut = pq_adc_lut(idx.pq_books, qvec)
    qn = seq_norm_kernel(np.asarray(qvec, dtype=np.float32).reshape(1, -1))[0]
    adc = np.zeros(len(M))
    for s in range(len(lut)):
        adc = adc + np.asarray(lut[s])[codes[:, s]]
    score = np.round(adc / (qn * norms), 6)
    probes = set(_probe_ids(idx, qvec, 3, 1))
    cand = [i for i in range(len(M)) if rows[i] and i in rows]
    # restrict to rows whose cell was probed (read back from the table)
    cells = {r.vec_id: r[ASSIGN] for r in idx.table.scan().collect()}
    cand = [i for i in cand if cells[i] in probes]
    want = sorted(
        ((i, float(score[i])) for i in cand), key=lambda t: (-t[1], t[0])
    )[:10]
    assert got == want

    # the query vector itself (in-corpus, id 0) must rank first
    assert got[0][0] == 0

    # rebuild is deterministic: identical codes, identical codebooks
    idx2 = build_ann_index(
        spark, emb, str(tmp_path / "pq2"), kind="ivfpq", n_cells=8, seed=7,
        pq_m=4, pq_ks=8,
    )
    assert np.array_equal(idx.pq_books, idx2.pq_books)
    rows2 = {r.vec_id: list(r.codes) for r in idx2.table.scan().collect()}
    assert all(rows2[i] == rows[i][0] for i in rows)

    # roundtrip through load preserves the codebooks
    idx3 = load_ann_index(spark, root)
    assert idx3.kind == "ivfpq" and np.array_equal(idx3.pq_books, idx.pq_books)

    # batch path: ONE plan, LUTs ride the cell join — per-query parity
    # with the single-query ADC path
    from olake_spark.operators.ann_index import ann_index_topk_batch

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    bout, binfo = ann_index_topk_batch(idx, queries, k=5, n_probe=3)
    got_b = {
        (r.qid, r.rank): (r.vec_id, r.cosine) for r in bout.collect()
    }
    assert 0 < binfo["files_scanned"] < binfo["files_total"]
    for qid in range(3):
        qv = [float(x) for x in M[qid]]
        single, _ = ann_index_topk(idx, qv, k=5, n_probe=3)
        for rank, r in enumerate(single.collect(), start=1):
            assert got_b[(qid, rank)] == (r.vec_id, r.cosine), (qid, rank)
