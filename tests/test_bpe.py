"""BPE trainer/encoder: driver-mode vs distributed-mode merge-list
equality (two independent implementations of the same algorithm),
rank-greedy encode reproducing training segmentation, and round-trips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.bpe import (
    EOW,
    UNK_ID,
    _initial_symbols,
    _merge_syms,
    bpe_decode_ids,
    bpe_encode,
    bpe_vocab,
    corpus_alphabet,
    encode_word,
    train_bpe,
)

WORDS = "low lower lowest new newer newest wide wider widest slow slower".split()


def _mk_docs(spark, n=30, seed=17):
    rng = np.random.default_rng(seed)
    rows = [
        (i, " ".join(rng.choice(WORDS, size=int(rng.integers(1, 9)))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_driver_vs_distributed_merges_equal(spark):
    docs = _mk_docs(spark)
    # num_merges > checkpoint_every so the lineage-truncation path runs
    m_driver = train_bpe(docs, num_merges=12)
    m_dist = train_bpe(docs, num_merges=12, distributed=True, checkpoint_every=5)
    assert m_driver == m_dist
    assert len(m_driver) == 12


def test_early_stop_when_pairs_exhausted(spark):
    docs = spark.createDataFrame([(0, "ab ab cd")], "doc_id int, text string")
    merges = train_bpe(docs, num_merges=50, min_pair_count=2)
    # only 'ab' (x2) clears min_pair_count=2: a+b, then ab+</w>
    assert merges == [("a", "b"), ("ab", EOW)]
    assert train_bpe(docs, num_merges=50, min_pair_count=2, distributed=True) == merges


def test_sennrich_style_merges_prefer_hot_suffix(spark):
    # 'est'/'er' suffixes dominate the toy corpus: the first merges must
    # build them before any stem
    docs = spark.createDataFrame(
        [(0, " ".join(["lowest"] * 6 + ["newest"] * 5 + ["widest"] * 4))],
        "doc_id int, text string",
    )
    merges = train_bpe(docs, num_merges=3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)


def test_encode_reproduces_training_segmentation(spark):
    """Rank-greedy encode of a training word == the symbols the trainer
    left for that word (the standard BPE encode/train equivalence)."""
    docs = _mk_docs(spark, n=40, seed=3)
    merges = train_bpe(docs, num_merges=15)
    ranks = {m: i for i, m in enumerate(merges)}
    words = {
        w
        for r in docs.select("text").collect()
        for w in r.text.split(" ")
    }
    for w in sorted(words):
        syms = _initial_symbols(w)
        for a, b in merges:
            syms = _merge_syms(syms, a, b)
        assert encode_word(w, ranks) == syms, w


def test_spark_encode_roundtrip_and_unk(spark):
    docs = _mk_docs(spark, n=25, seed=9)
    merges = train_bpe(docs, num_merges=10)
    alphabet = corpus_alphabet(docs)
    enc = bpe_encode(docs, merges, alphabet=alphabet).collect()
    by_id = {r.doc_id: r for r in enc}
    src = {r.doc_id: r.text for r in docs.collect()}
    for i, text in src.items():
        r = by_id[i]
        assert r.n_tok == len(r.tokens)
        # corpus alphabet covers every char -> no UNK, exact round-trip
        assert UNK_ID not in r.tokens
        assert bpe_decode_ids(r.tokens, merges, alphabet=alphabet) == text
    # character outside the alphabet maps to UNK
    oov = spark.createDataFrame([(0, "l0w")], "doc_id int, text string")
    toks = bpe_encode(oov, merges, alphabet=alphabet).first().tokens
    assert UNK_ID in toks


def test_vocab_is_deterministic_and_dense(spark):
    docs = _mk_docs(spark, n=20, seed=1)
    merges = train_bpe(docs, num_merges=8)
    v1, v2 = bpe_vocab(merges), bpe_vocab(merges)
    assert v1 == v2
    ids = sorted(v1.values())
    assert ids == list(range(1, len(ids) + 1))  # dense, UNK=0 reserved
    assert EOW in v1


def test_min_count_prunes_tail_and_max_words_guard(spark):
    docs = _mk_docs(spark, n=30, seed=21)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(docs, num_merges=2, max_words=3)
    # pruning rare words changes only the count table, not the API shape
    merges = train_bpe(docs, num_merges=4, min_count=2)
    assert len(merges) <= 4
