"""Brute-force oracles for the non-SQL-expressible training-data ops:
MinHash LSH, SimHash, ANN recall, curve-key UDF, multimodal plumbing."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from olake_spark.operators.multimodal import (
    attach_fake_payload,
    decode_stub,
    extract_features,
    media_metadata,
)
from olake_spark.operators.similarity import brute_force_topk, lsh_topk
from olake_spark.operators.text import analyze_documents

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _mk_docs(spark, n=24, seed=5):
    """Docs with built-in near-duplicates: doc 3i+1 is a light perturbation
    of doc 3i; doc 3i+2 is unrelated."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n // 3):
        base = list(rng.choice(WORDS, 30))
        near = list(base)
        near[5] = "zulu"  # one-word edit -> high jaccard
        other = list(rng.choice(WORDS, 30))
        rows.append((f"d{3*i:03d}", " ".join(base), "s"))
        rows.append((f"d{3*i+1:03d}", " ".join(near), "s"))
        rows.append((f"d{3*i+2:03d}", " ".join(other), "s"))
    return spark.createDataFrame(rows, "doc_id string, text string, source string")


def _py_jaccard(a: str, b: str, k: int) -> float:
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / max(len(sa | sb), 1)


def test_ngram_jaccard_matches_python_oracle(spark):
    docs = _mk_docs(spark)
    rows = {r.doc_id: r.text for r in docs.collect()}
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, block_col=None, threshold=0.3, shingle_k=2
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        j = _py_jaccard(rows[a], rows[b], 2)
        if j >= 0.3:
            want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6


def test_minhash_lsh_finds_planted_near_dups(spark):
    docs = _mk_docs(spark)
    rows = {r.doc_id: r.text for r in docs.collect()}
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, num_perm=32, bands=16, shingle_k=2, jaccard_threshold=0.4
        ).collect()
    }
    # every planted near-dup pair (true jaccard >= 0.8) must be found
    planted = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if _py_jaccard(rows[a], rows[b], 2) >= 0.8
    }
    assert planted, "fixture should contain near-dups"
    assert planted <= pairs
    # and no wildly-dissimilar pair should survive the estimate filter
    for a, b in pairs:
        assert _py_jaccard(rows[a], rows[b], 2) >= 0.2


def test_minhash_lsh_verified_returns_exact_jaccard(spark):
    """verify=True output = EXACT Jaccard-thresholded pairs (not the
    signature estimate), matching the brute-force python oracle at a
    threshold where banding recall is 1.0 on this fixture."""
    docs = _mk_docs(spark)
    rows = {r.doc_id: r.text for r in docs.collect()}
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs,
            num_perm=32,
            bands=16,
            shingle_k=2,
            jaccard_threshold=0.7,
            verify=True,
        ).collect()
    }
    want = {
        (a, b): round(_py_jaccard(rows[a], rows[b], 2), 6)
        for a, b in itertools.combinations(sorted(rows), 2)
        if _py_jaccard(rows[a], rows[b], 2) >= 0.7
    }
    assert want, "fixture should contain near-dups above 0.7"
    assert got == want  # exact values, exact set


def test_simhash_blocks_find_identical_and_near(spark):
    docs = _mk_docs(spark)
    pairs = simhash_near_dup_pairs(docs, max_hamming=10, blocks=4).collect()
    by_pair = {(r.id_a, r.id_b): r.hamming for r in pairs}
    # planted near-dups (one-word edit) must appear with small hamming
    planted = [(f"d{3*i:03d}", f"d{3*i+1:03d}") for i in range(len(by_pair) and 8)]
    found = [p for p in planted if p in by_pair]
    assert len(found) >= len(planted) // 2
    for p in found:
        assert by_pair[p] <= 10


def _mk_embeddings(spark, n=300, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in M[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id int, embedding array<float>"),
        M,
    )


def test_brute_force_topk_matches_numpy(spark):
    emb, M = _mk_embeddings(spark)
    q = M[0]
    got = brute_force_topk(
        emb.filter(F.col("vec_id") != 0), list(map(float, q)), k=5
    ).collect()
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    cos[0] = -np.inf
    want = list(np.argsort(-cos)[:5])
    assert [r.vec_id for r in got] == [int(i) for i in want]


def test_lsh_ann_recall(spark):
    emb, M = _mk_embeddings(spark)
    q = M[0]
    exact = {
        r.vec_id
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") != 0), list(map(float, q)), k=10
        ).collect()
    }
    approx = {
        r.vec_id
        for r in lsh_topk(
            emb.filter(F.col("vec_id") != 0),
            list(map(float, q)),
            k=10,
            n_planes=8,
            probe_hamming=2,
            seed=7,
        ).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.3  # deterministic given fixed seed
    # every approx hit must be a real vector ranked by true cosine
    assert approx <= {int(i) for i in range(300)}


def test_ivf_ann_recall(spark):
    from olake_spark.operators.similarity import ivf_topk

    emb, M = _mk_embeddings(spark)
    q = M[0]
    exact = {
        r.vec_id
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") != 0), list(map(float, q)), k=10
        ).collect()
    }
    approx = {
        r.vec_id
        for r in ivf_topk(
            emb.filter(F.col("vec_id") != 0),
            list(map(float, q)),
            k=10,
            n_cells=8,
            n_probe=3,
            seed=7,
        ).collect()
    }
    assert len(exact & approx) / 10 >= 0.3  # deterministic given seed
    # determinism: same call, same results
    again = {
        r.vec_id
        for r in ivf_topk(
            emb.filter(F.col("vec_id") != 0),
            list(map(float, q)),
            k=10,
            n_cells=8,
            n_probe=3,
            seed=7,
        ).collect()
    }
    assert approx == again


def test_text_analysis_metrics(spark):
    docs = spark.createDataFrame(
        [
            ("a", "the cat and the dog sat on the mat for fun", "s"),
            ("b", "der hund und die katze ist nicht ein tier von hier", "s"),
            ("c", "xxxxx yyyyy zzzzz", "s"),
        ],
        "doc_id string, text string, source string",
    )
    out = {r.doc_id: r for r in analyze_documents(docs).collect()}
    assert out["a"].pred_lang == "en"
    assert out["b"].pred_lang == "de"
    assert out["c"].pred_lang == "und"
    assert out["a"].tok_count == 11
    assert out["a"].stop_ratio > out["c"].stop_ratio
    assert 0.0 <= out["a"].quality <= 1.0
    # deterministic fingerprint
    again = {r.doc_id: r.fp for r in analyze_documents(docs).collect()}
    assert all(again[k] == out[k].fp for k in again)


def test_repetition_stats_exact(spark):
    from olake_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # 6 words, 'spam' x4 -> max_word 4/6; bigram 'spam spam' x3 / 5
            ("a", "spam spam spam spam egg ham", "s"),
            # all distinct words: max_word 1/5, every bigram unique 1/4
            ("b", "one two three four five", "s"),
            # 4 lines, 'dup' repeated 3x -> distinct 2/4 -> dup_line 0.5
            ("c", "dup\nunique line\ndup\ndup", "s"),
            ("d", "solo", "s"),  # single word: no bigrams
            ("e", "", "s"),  # empty text
        ],
        "doc_id string, text string, source string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs, min_words=2).collect()}
    assert out["a"].max_word_ratio == pytest.approx(4 / 6, abs=1e-6)
    assert out["a"].top_bigram_ratio == pytest.approx(3 / 5, abs=1e-6)
    assert not out["a"].keep
    assert out["b"].max_word_ratio == pytest.approx(1 / 5, abs=1e-6)
    assert out["b"].top_bigram_ratio == pytest.approx(1 / 4, abs=1e-6)
    assert out["c"].dup_line_ratio == pytest.approx(0.5, abs=1e-6)
    assert not out["c"].keep
    assert out["d"].top_bigram_ratio == 0.0
    assert out["e"].max_word_ratio == 1.0  # split('') -> [''] single token


def test_pii_scrub_patterns(spark):
    from olake_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            ("a", "mail bob.smith+x@corp.example.org today", "s"),
            ("b", "server 192.168.0.1 and 10.0.0.255 up", "s"),
            ("c", "call +1-555-0100 or +44 201 5550 123", "s"),
            ("d", "clean text no pii at all", "s"),
            ("e", "combo a@b.co at 8.8.8.8 ring +1 555 0100", "s"),
        ],
        "doc_id string, text string, source string",
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out["a"].n_emails == 1 and "<EMAIL>" in out["a"].text_clean
    assert "bob.smith" not in out["a"].text_clean
    assert out["b"].n_ips == 2 and out["b"].text_clean.count("<IP>") == 2
    assert out["c"].n_phones == 2 and out["c"].text_clean.count("<PHONE>") == 2
    assert out["d"].text_clean == out["d"].text
    assert (out["e"].n_emails, out["e"].n_ips, out["e"].n_phones) == (1, 1, 1)
    assert "<EMAIL>" in out["e"].text_clean and "<IP>" in out["e"].text_clean


def test_pii_scrub_counts_reconcile_with_tokens(spark):
    """Overlapping matches (an IP inside an email's user part) count
    once, as the kind that scrubbed them — counts always equal the
    number of placeholder tokens emitted."""
    from olake_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [("a", "contact 10.0.0.1@host.com now", "s")],
        "doc_id string, text string, source string",
    )
    r = pii_scrub(docs).collect()[0]
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 0, 0)
    assert r.text_clean == "contact <EMAIL> now"
    assert r.text_clean.count("<EMAIL>") == r.n_emails
    assert r.text_clean.count("<IP>") == r.n_ips


def test_semantic_dedup_empty_input(spark):
    from olake_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame([], "vec_id int, embedding array<float>")
    out = semantic_dedup(emb)
    assert out.columns == ["vec_id", "cluster_rep", "keep"]
    assert out.count() == 0


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [("1", "hello world", "s"), ("2", "bytes here", "s")],
        "doc_id string, text string, source string",
    )
    media = attach_fake_payload(docs, "doc_id", "text")
    meta = {r.media_id: r for r in media_metadata(media).collect()}
    assert meta["1"].n_bytes == len("hello world")
    assert meta["1"].magic == "68656C6C".upper()
    feats = {r.media_id: r for r in extract_features(media, fake=True).collect()}
    assert feats["1"].n_bytes == 11
    assert len(feats["1"].feat) == 4
    assert feats["1"].width >= 16 and feats["1"].height >= 16
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        extract_features(media, fake=False).collect()


def test_multimodal_resize_and_frames(spark):
    from olake_spark.operators.multimodal import resize_images, sample_frames

    docs = spark.createDataFrame(
        [("1", "x" * 200, "s"), ("2", "y" * 64, "s")],
        "doc_id string, text string, source string",
    )
    media = attach_fake_payload(docs, "doc_id", "text")
    rz = {r.media_id: r for r in resize_images(media, 8, 4).collect()}
    assert len(rz["1"].payload) == 32 and rz["1"].width == 8
    # deterministic: same input -> same bytes
    rz2 = {r.media_id: r for r in resize_images(media, 8, 4).collect()}
    assert bytes(rz["1"].payload) == bytes(rz2["1"].payload)

    frames = sample_frames(media, every_ms=500, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["1"]) == 4  # 200 bytes -> capped at max_frames
    assert [f.ts_ms for f in sorted(by_id["1"], key=lambda x: x.frame_idx)] == [
        0, 500, 1000, 1500,
    ]
    assert all(len(f.payload) > 0 for f in frames)


def test_minhash_giant_cluster_is_bounded_and_connected(spark):
    """One ~50k-member near-duplicate cluster (templated boilerplate —
    the exact thing dedup exists for) used to concentrate b members and
    O(b^2) pairs in a single task. With the bucket cap, candidate volume
    is O(b), per-group aggregation state is bounded by max_bucket, and
    the cluster stays connected through the bucket representative so
    keep-one-per-cluster dedup still collapses it."""
    n = 50_000
    cap = 200
    template = "the quick brown fox jumps over the lazy dog again and again"
    docs = (
        spark.range(n)
        .select(
            F.format_string("c%06d", F.col("id")).alias("doc_id"),
            # vary ONE trailing token out of ~13 -> jaccard stays high and
            # every doc shares all band signatures with the template
            F.concat(F.lit(template + " tail"), (F.col("id") % 7).cast("string")).alias("text"),
            F.lit("s").alias("source"),
        )
    )
    pairs = minhash_lsh_pairs(
        docs, num_perm=32, bands=8, shingle_k=2,
        jaccard_threshold=0.5, max_bucket=cap,
    )
    rows = pairs.collect()
    # O(b) candidate volume: the 7 tail variants form up to 7 buckets per
    # band, each contributing <= cap^2/2 all-pairs + its tail stars —
    # nowhere near the uncapped ~1.8e8 in-bucket all-pairs
    assert len(rows) <= 8 * (cap * cap // 2 + n)
    # connectivity: every member participates in >= 1 surviving pair
    seen = {r.id_a for r in rows} | {r.id_b for r in rows}
    assert len(seen) == n
    # star pairs hang off the bucket's min-id representative
    assert min(seen) == "c000000"
    for r in rows:
        assert r.id_a < r.id_b and r.est_jaccard >= 0.5


def test_simhash_giant_cluster_is_bounded(spark):
    n = 20_000
    docs = spark.range(n).select(
        F.format_string("c%06d", F.col("id")).alias("doc_id"),
        F.lit("identical boilerplate text repeated across the corpus").alias("text"),
    )
    pairs = simhash_near_dup_pairs(
        docs, max_hamming=3, blocks=4, max_bucket=100
    )
    rows = pairs.collect()
    assert len(rows) <= 100 * 100 // 2 + n
    seen = {r.id_a for r in rows} | {r.id_b for r in rows}
    assert len(seen) == n  # identical docs -> hamming 0 -> all connected


def test_bucket_cap_is_noop_below_threshold(spark):
    """On a corpus whose largest bucket is far below the cap, results are
    IDENTICAL with and without a small cap — the capped path only changes
    behavior for oversized buckets."""
    docs = _mk_docs(spark)
    base = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_lsh_pairs(
            docs, num_perm=32, bands=16, shingle_k=2, jaccard_threshold=0.4
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_lsh_pairs(
            docs, num_perm=32, bands=16, shingle_k=2, jaccard_threshold=0.4,
            max_bucket=50,
        ).collect()
    }
    assert base == capped


def test_ngram_jaccard_guards_against_quadratic_misuse(spark):
    docs = _mk_docs(spark)
    # blocking must be an explicit choice
    with pytest.raises(TypeError, match="explicit block_col"):
        ngram_jaccard_pairs(docs)
    # oversized block -> refuse with guidance to the LSH-verify path
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(docs, block_col="source", max_block=5)
    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(docs, block_col=None, max_block=5)
    # max_block=None skips the pre-check for known-small inputs
    assert ngram_jaccard_pairs(
        docs, block_col=None, threshold=0.9, max_block=None
    ).count() >= 0


def test_near_dup_clusters_match_union_find(spark):
    """Connected components by min-label propagation vs a python
    union-find oracle on a random graph (chains force >1 propagation
    round), plus keep-one-per-cluster dedup semantics."""
    from olake_spark.operators.dedup import (
        dedup_near_duplicates,
        near_dup_clusters,
    )

    rng = np.random.default_rng(3)
    n = 200
    ids = [f"n{i:03d}" for i in range(n)]
    # a long chain (diameter ~30), some random edges, many singletons
    edges = [(ids[i], ids[i + 1]) for i in range(30)]
    edges += [
        tuple(sorted((ids[int(a)], ids[int(b)])))
        for a, b in rng.integers(40, 120, size=(25, 2))
        if a != b
    ]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")

    # python union-find oracle
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    # canonicalize: rep = min member of each component
    comp: dict = {}
    for i, r in want.items():
        comp.setdefault(r, []).append(i)
    want = {i: min(members) for r, members in comp.items() for i in members}

    got = {
        r.doc_id: r.cluster_rep
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert got == want

    kept = {r.doc_id for r in dedup_near_duplicates(docs, pairs).collect()}
    assert kept == {rep for rep in want.values()}
    # one keeper per component + all singletons
    assert len(kept) == len(set(want.values()))


def test_near_dup_clusters_plan_stays_bounded(spark):
    """Each propagation round references the previous round's frame
    twice, so without lineage truncation the LOGICAL plan doubles per
    round — a long-diameter graph (many rounds) used to OOM the driver
    stringifying a 2^rounds plan tree at sf0.1 (semantic_dedup). The
    localCheckpoint per round must keep the result plan O(1)."""
    from olake_spark.operators.dedup import near_dup_clusters

    n = 300  # chain of diameter 299 -> ~log2(299) doubling rounds
    ids = [f"c{i:04d}" for i in range(n)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)],
        "id_a string, id_b string",
    )
    out = near_dup_clusters(docs, pairs)
    reps = {r.cluster_rep for r in out.collect()}
    assert reps == {ids[0]}  # one chain, min-id representative
    plan = out._jdf.queryExecution().toString()
    assert len(plan) < 100_000, f"plan blew up: {len(plan)} chars"


def test_semantic_dedup_matches_numpy_oracle(spark):
    """semantic_dedup vs a full numpy oracle: same codebook/assignment
    replicated driver-side, exact all-pairs-within-cell cosine, python
    union-find components, min-id keeper."""
    import numpy as np

    from olake_spark.operators.dedup import semantic_dedup
    from olake_spark.operators.similarity import _ivf_centroids

    rng = np.random.default_rng(3)
    # planted duplicate groups: 40 base vectors, each with 0-3 noisy copies
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows, truth_group = [], []
    vid = 0
    for g in range(40):
        for _ in range(1 + int(rng.integers(0, 4))):
            v = base[g] + 0.01 * rng.standard_normal(16).astype(np.float32)
            rows.append((vid, [float(x) for x in v]))
            truth_group.append(g)
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    out = {
        r.vec_id: (r.cluster_rep, r.keep)
        for r in semantic_dedup(
            emb, threshold=0.95, n_cells=4, seed=7, sample_rows=2048
        ).collect()
    }
    assert len(out) == vid

    # numpy oracle: same cells, exact cosine pairs, union-find
    M = np.stack([np.asarray(r[1], dtype=np.float32) for r in rows])
    Mn = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-9)
    C = _ivf_centroids(16, 4, 7, Mn[:2048].copy())
    assign = np.argmax(Mn @ C.T, axis=1)
    parent = list(range(vid))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    M64 = M.astype(np.float64)  # Spark casts elements to double before summing
    cos = (M64 @ M64.T) / (
        np.linalg.norm(M64, axis=1)[:, None] * np.linalg.norm(M64, axis=1)[None, :]
    )
    for i in range(vid):
        for j in range(i + 1, vid):
            if assign[i] == assign[j] and round(float(cos[i, j]), 6) >= 0.95:
                parent[find(i)] = find(j)
    want = {}
    for i in range(vid):
        r = find(i)
        want.setdefault(r, []).append(i)
    expect = {i: min(want[find(i)]) for i in range(vid)}
    for i in range(vid):
        assert out[i][0] == expect[i], i
        assert out[i][1] == (i == expect[i])
    # the planted copies actually cluster (same cell + cos>=0.95 for most)
    n_clusters = len(set(expect.values()))
    assert n_clusters < vid  # at least some multi-member clusters formed


def test_cluster_loop_materializes_edges_once(spark, tmp_path):
    """The label-propagation loop must read the PERSISTED edge set each
    round — if the persist is ever dropped, every round re-evaluates the
    full candidate-pair pipeline (at scale: the whole MinHash job per
    round). Traced with a side-effect UDF counting evaluated rows."""
    import pandas as pd

    from olake_spark.operators.dedup import near_dup_clusters

    marker = str(tmp_path / "evals")

    @F.pandas_udf("string")
    def traced(s: pd.Series) -> pd.Series:
        with open(marker, "a") as f:
            f.write(f"{len(s)}\n")
        return s

    ids = [f"d{i:03d}" for i in range(50)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    base = [(ids[i], ids[i + 1]) for i in range(0, 40, 2)]
    pairs = spark.createDataFrame(base, "id_a string, id_b string").withColumn(
        "id_a", traced("id_a")
    )
    out = near_dup_clusters(docs, pairs).collect()
    assert len(out) == 50
    # both edge directions explode from ONE evaluation of the pairs
    # subtree, and the loop's rounds must add nothing
    rows_traced = sum(int(x) for x in open(marker))
    assert rows_traced <= len(base), rows_traced


def test_repeated_ngram_stats_exact(spark):
    """Hot-n-gram coverage vs hand-computed counts on a planted corpus."""
    from olake_spark.operators.dedup import repeated_ngram_stats

    boiler = "all rights reserved contact us today"
    docs = spark.createDataFrame(
        [
            ("a", "unique opening words here " + boiler, "s"),
            ("b", "different second document text " + boiler, "s"),
            ("c", "third body copy entirely " + boiler, "s"),
            ("d", "fresh original content nothing shared at all", "s"),
            ("e", "xy zz", "s"),  # < 3 words: no 3-grams, drops out
        ],
        "doc_id string, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in repeated_ngram_stats(docs, n=3, min_repeats=3).collect()
    }
    assert "e" not in out and len(out) == 4
    # docs a/b/c: 10 words -> 8 trigrams; the 4 trigrams fully inside the
    # shared 6-word boilerplate occur 3x corpus-wide -> hot
    for d in ("a", "b", "c"):
        assert out[d].n_grams == 8
        assert out[d].n_hot == 4
        assert out[d].hot_fraction == pytest.approx(0.5, abs=1e-6)
    assert out["d"].n_hot == 0 and out["d"].hot_fraction == 0.0


def test_drop_repeated_spans_removes_spans_and_conserves_tokens(spark):
    """Span-level exact-substring dedup: the planted boilerplate span is
    REMOVED from every doc carrying it, unique text survives verbatim,
    and token accounting is conserved (n_words - n_dropped ==
    len(clean_text words); every doc survives)."""
    from olake_spark.operators.dedup import drop_repeated_spans

    boiler = "all rights reserved contact us today"
    docs = spark.createDataFrame(
        [
            ("a", "unique opening words here " + boiler, "s"),
            ("b", "different second document text " + boiler, "s"),
            ("c", "third body copy entirely " + boiler, "s"),
            ("d", "fresh original content nothing shared at all", "s"),
            ("e", "xy zz", "s"),  # < 3 words: passes through untouched
        ],
        "doc_id string, text string, source string",
    )
    out = {r.doc_id: r for r in drop_repeated_spans(docs, n=3, min_repeats=3).collect()}
    assert len(out) == 5  # every doc survives
    # hot trigrams live fully inside the 6-word boilerplate; its first
    # word starts at index 4 (a/c) or 5 (b), so the whole span drops
    assert out["a"].clean_text == "unique opening words here"
    assert out["b"].clean_text == "different second document text"
    assert out["c"].clean_text == "third body copy entirely"
    assert out["d"].clean_text == "fresh original content nothing shared at all"
    assert out["e"].clean_text == "xy zz" and out["e"].n_dropped == 0
    for r in out.values():
        kept = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert r.n_words - r.n_dropped == kept, r
    assert out["a"].n_words == 10 and out["a"].n_dropped == 6


def test_drop_repeated_spans_matches_bruteforce(spark):
    """Corpus-level parity vs a driver-side brute-force replica on real
    sf0.001 documents."""
    from collections import Counter

    from olake_spark.operators.dedup import drop_repeated_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    n, min_repeats = 3, 3
    counts: Counter = Counter()
    words_by_id = {}
    for r in rows:
        w = r.text.split(" ")
        words_by_id[r.doc_id] = w
        for i in range(len(w) - n + 1):
            counts[" ".join(w[i : i + n])] += 1
    expect = {}
    for did, w in words_by_id.items():
        starts = [
            i
            for i in range(len(w) - n + 1)
            if counts[" ".join(w[i : i + n])] >= min_repeats
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + n))
        kept = [x for i, x in enumerate(w) if i not in covered]
        expect[did] = (len(w), len(w) - len(kept), " ".join(kept))
    got = {
        r.doc_id: (r.n_words, r.n_dropped, r.clean_text)
        for r in drop_repeated_spans(docs, n=n, min_repeats=min_repeats).collect()
    }
    assert got == expect and len(got) == len(rows)


def test_repeated_ngram_strategies_agree(spark):
    """window and join strategies are alternative physical plans of the
    same logical op — identical output required."""
    from olake_spark.operators.dedup import repeated_ngram_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        r.doc_id: (r.n_grams, r.n_hot, r.hot_fraction)
        for r in repeated_ngram_stats(docs, strategy="window").collect()
    }
    b = {
        r.doc_id: (r.n_grams, r.n_hot, r.hot_fraction)
        for r in repeated_ngram_stats(docs, strategy="join").collect()
    }
    assert a == b and len(a) > 0


def test_c4_page_filter_rules(spark):
    from olake_spark.operators.text import c4_page_filter

    docs = spark.createDataFrame(
        [
            # two sentence lines + one junk line -> junk dropped, keep
            ("a", "This is a fine sentence.\nshort\nAnother good line here!", "s"),
            # no terminal punctuation anywhere -> nothing kept
            ("b", "just words with no punctuation at all", "s"),
            # lorem ipsum page -> keep False even with good lines
            ("c", "A good line stays here.\ncontains lorem ipsum junk.", "s"),
            # code page (brace)
            ("d", "function foo() { return 1; }\nA real sentence here.", "s"),
            # quote-terminated line counts as a sentence
            ("e", 'He said "stop right there."', "s"),
        ],
        "doc_id string, text string, source string",
    )
    out = {r.doc_id: r for r in c4_page_filter(docs).collect()}
    assert out["a"].n_lines == 3 and out["a"].n_kept == 2 and out["a"].keep
    assert out["a"].clean_text == (
        "This is a fine sentence.\nAnother good line here!"
    )
    assert out["b"].n_kept == 0 and not out["b"].keep
    assert out["c"].n_kept == 2 and not out["c"].keep  # lorem ipsum page
    assert not out["d"].keep  # brace page
    assert out["e"].n_kept == 1 and out["e"].keep


def test_minhash_over_token_arrays(spark):
    """token_shingles plugs pre-tokenized sequences (the input_hint
    shape) into the SAME banded pipeline: verify=True pairs must equal
    the brute-force token-shingle Jaccard oracle exactly."""
    import numpy as np
    from olake_spark.operators.dedup import minhash_lsh_pairs, token_shingles

    rng = np.random.default_rng(31)
    base = [rng.integers(0, 40, size=30).tolist() for _ in range(8)]
    rows = []
    for i, toks in enumerate(base):
        rows.append((3 * i, toks))
        near = list(toks)
        near[5] = int(near[5]) + 1000  # one substitution: high overlap
        rows.append((3 * i + 1, [int(t) for t in near]))
        rows.append((3 * i + 2, rng.integers(2000, 4000, size=30).tolist()))
    seq = spark.createDataFrame(
        [(i, [int(t) for t in ts]) for i, ts in rows],
        "doc_id int, tokens array<int>",
    )
    k = 4
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            seq,
            num_perm=32,
            bands=16,
            jaccard_threshold=0.4,
            verify=True,
            shingles=token_shingles("tokens", k),
        ).collect()
    }

    def sh(ts):
        return {
            " ".join(str(t) for t in ts[i : i + k])
            for i in range(len(ts) - k + 1)
        }

    toks = dict(rows)
    want = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        sa, sb = sh(toks[a]), sh(toks[b])
        j = len(sa & sb) / max(len(sa | sb), 1)
        if j >= 0.4:
            want[(a, b)] = round(j, 6)
    assert want, "fixture must contain token-level near-dups"
    assert got == want
