"""Bigram-LM perplexity scoring (CCNet-style quality filter):
pure-Python reference parity + DuckDB oracle replay of the quantized
fixed-point pipeline."""

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.lm import perplexity_scores

WORDS = "the quick brown fox jumps over a lazy dog and runs far away".split()


def _mk_corpus(n=40, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ln = int(rng.integers(0, 12))  # includes 0- and 1-word docs
        text = " ".join(rng.choice(WORDS, size=ln)) if ln else "solo"
        # make a handful of exact repeats so some bigrams are hot
        if i % 7 == 3:
            text = "the quick brown fox jumps over the lazy dog"
        rows.append((i, text))
    return rows


def _py_scores(eval_rows, train_rows, thr_q4=None):
    """Pure-Python reference: add-one bigram LM, 1e-4-nat quantization,
    half-away-from-zero rounding (Spark/DuckDB ``round`` semantics)."""

    def bigrams(t):
        w = t.split(" ")
        return list(zip(w, w[1:]))

    cb = Counter(b for _, t in train_rows for b in bigrams(t))
    ch = Counter(b[0] for _, t in train_rows for b in bigrams(t))
    vocab = {w for _, t in train_rows for w in t.split(" ")}
    v = len(vocab)

    def q4(c_b, c_h):
        lp = math.log(c_b + 1) - math.log(c_h + v)
        x = lp * 10000
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    out = {}
    for i, t in eval_rows:
        bs = bigrams(t)
        nll = -sum(q4(cb.get(b, 0), ch.get(b[0], 0)) for b in bs)
        keep = (
            True
            if thr_q4 is None
            else (not bs or nll <= thr_q4 * len(bs))
        )
        out[i] = (len(bs), nll, keep)
    return out


def _spark_scores(spark, eval_rows, train_rows=None, thr_q4=None):
    docs = spark.createDataFrame(eval_rows, "doc_id int, text string")
    lm = (
        spark.createDataFrame(train_rows, "doc_id int, text string")
        if train_rows is not None
        else None
    )
    got = perplexity_scores(
        docs, lm_docs=lm, max_nll_q4_per_token=thr_q4
    ).collect()
    return {r.doc_id: (r.n_bigrams, r.nll_q4, r.keep) for r in got}


def test_self_perplexity_matches_python(spark):
    rows = _mk_corpus()
    # threshold: perplexity 40 per token -> ln(40)*1e4 quantized
    thr = round(math.log(40.0) * 10000)
    assert _spark_scores(spark, rows, thr_q4=thr) == _py_scores(
        rows, rows, thr_q4=thr
    )


def test_foreign_lm_unseen_grams(spark):
    train = _mk_corpus(n=25, seed=3)
    # eval corpus has words the LM never saw -> c_b = c_h = 0 branch
    evalr = [(100, "zebra quark the quick zebra"), (101, "solo"), (102, "")]
    thr = round(math.log(200.0) * 10000)
    assert _spark_scores(spark, evalr, train_rows=train, thr_q4=thr) == _py_scores(
        evalr, train, thr_q4=thr
    )


def test_short_docs_kept_with_zero_bigrams(spark):
    rows = [(0, "one"), (1, ""), (2, "two words")]
    got = _spark_scores(spark, rows, thr_q4=0)  # impossible threshold
    assert got[0] == (0, 0, True)
    assert got[1] == (0, 0, True)
    assert got[2][0] == 1 and got[2][2] is False  # real bigram, nll > 0


def test_duckdb_oracle_hash_exact(spark):
    """The exact SQL replay the registry fold uses: every output value
    is bigint/bool, so cross-engine equality is bit-exact."""
    duckdb = pytest.importorskip("duckdb")
    rows = _mk_corpus(n=60, seed=29)
    thr = round(math.log(60.0) * 10000)
    got = sorted(_spark_scores(spark, rows, thr_q4=thr).items())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    sql = f"""
        WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i+1])) AS gram
          FROM s WHERE len(w) >= 2
        ),
        cb AS (SELECT gram, count(*) AS c_b FROM g GROUP BY gram),
        ch AS (SELECT split_part(gram, ' ', 1) AS hist, sum(c_b) AS c_h
               FROM cb GROUP BY 1),
        v AS (SELECT count(DISTINCT word) AS vv
              FROM (SELECT unnest(w) AS word FROM s)),
        q AS (
          SELECT g.doc_id,
                 CAST(round((ln(cb.c_b + 1) - ln(ch.c_h + v.vv)) * 10000)
                      AS BIGINT) AS qq
          FROM g JOIN cb USING (gram)
                 JOIN ch ON split_part(g.gram, ' ', 1) = ch.hist
                 CROSS JOIN v
        ),
        p AS (SELECT doc_id, count(*) AS n_bigrams, -sum(qq) AS nll_q4
              FROM q GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
               coalesce(p.nll_q4, 0)::BIGINT AS nll_q4,
               (coalesce(p.n_bigrams, 0) = 0
                OR coalesce(p.nll_q4, 0) <= {thr} * p.n_bigrams) AS keep
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN p USING (doc_id) ORDER BY doc_id
    """
    want = [(r[0], (r[1], r[2], r[3])) for r in con.execute(sql).fetchall()]
    assert got == want
