"""Corpus n-gram language model + perplexity quality filtering.

CCNet-style (Wenzek et al. 2019, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data") corpus curation scores every
document by its negative log-likelihood under a smoothed n-gram LM and
keeps documents whose per-token NLL (equivalently, perplexity) is below
a threshold.  The reference pipeline trains KenLM models offline; here
the LM is a bigram model with add-one smoothing trained as a DataFrame
job — either on the corpus itself (self-perplexity, the default) or on
a separate reference corpus (``lm_docs=``), which is the CCNet shape.

Reference provenance: the reference engine (OLake) has no quality
scoring at all — this belongs to the training-data-pipeline layer the
survey adds on top (SURVEY.md §2.8+); the operator set follows the
public CCNet paper, not any reference code.

Model
-----
p(w2 | w1) = (c(w1 w2) + 1) / (c_hist(w1) + V)

where ``c(w1 w2)`` is the corpus bigram count, ``c_hist(w1)`` the count
of ``w1`` as a bigram history (positions 0..n-2), and ``V`` the corpus
vocabulary size (distinct words over ALL positions).  Unseen bigrams /
histories score with count 0, so scoring against a foreign LM is total.

Determinism discipline (what makes the DuckDB oracle hash-exact)
----------------------------------------------------------------
Each per-token log-probability is quantized to 1e-4 nats::

    q = round((ln(c_b + 1) - ln(c_h + V)) * 10000)  :: bigint

BEFORE the per-document sum, so the document score is a sum of
integers — associative and order-free — and the keep decision is a pure
bigint comparison (no float crosses the engine boundary).  ``ln`` on
the JVM and in DuckDB may disagree in the final ulp, but both are
evaluated on *integer-valued* arguments and a 1 ulp error at |x|<=30 is
~3.6e-15 — eight orders of magnitude below the 1e-4 grid — so a
rounding flip needs the true value within ~1e-11 of a grid midpoint:
negligible over the <=O(vocab^2) distinct (c_b, c_h) pairs.

Scale notes (100 TB corpus)
---------------------------
* One scan explodes bigrams (codegen ``transform`` over the split —
  bound once via ``bind_once``), two groupBy shuffles build the count
  tables; both are Zipf-bounded (O(distinct bigrams), not O(corpus)).
* Scoring is two equi-joins (gram, history).  The history table is
  O(vocab) and broadcastable almost always; the bigram table broadcasts
  under ``spark.sql.autoBroadcastJoinThreshold`` else shuffles with AQE
  skew handling ("the"-headed histories are the classic hot keys).
* The per-document reduction is an integer ``sum`` — map-side partial
  aggregation applies, so the final shuffle carries one row per doc.
* Zero Python in the hot path: every expression is Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.text import bigrams_col, words_col

# fixed-point grid: 1e-4 nats per unit ("q4")
_Q4 = 10000


def lm_counts(docs: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram LM: returns ``(bigram_counts, history_counts,
    vocab_size)`` DataFrames.

    * ``bigram_counts``: (gram, c_b) — space-joined adjacent word pair
      counts over the whole corpus.
    * ``history_counts``: (hist, c_h) — counts of each word in history
      position, derived from the bigram table (grouping the *distinct*
      gram counts, not re-exploding the corpus).
    * ``vocab_size``: single row (v) — distinct words over all
      positions.

    All three are lazy; callers can persist ``bigram_counts`` when
    scoring multiple corpora against one LM.
    """
    grams = docs.select(F.explode(bigrams_col(text_col)).alias("gram"))
    cb = grams.groupBy("gram").agg(F.count("*").alias("c_b"))
    # history = first word of the gram; words contain no spaces by
    # construction (split on ' '), so substring_index is injective
    ch = cb.groupBy(
        F.substring_index(F.col("gram"), " ", 1).alias("hist")
    ).agg(F.sum("c_b").alias("c_h"))
    # vocab without a third corpus-wide explode: every word occurrence
    # at position < n-1 is some bigram's history, and position n-1 is
    # the doc's last word — so distinct(all words) == distinct(history
    # words of the DISTINCT-gram table ∪ per-doc last words). The gram
    # table is Zipf-bounded and the last-word pass is one narrow row
    # per doc, vs exploding every word of a 100 TB corpus again.
    # (Verified v-identical on the test corpora; single-word docs
    # contribute their word as the last word, empty docs contribute ''.)
    from olake_spark.operators.text import bind_once

    hist_words = cb.select(
        F.substring_index(F.col("gram"), " ", 1).alias("word")
    )
    last_word = bind_once(
        words_col(text_col), lambda w: F.element_at(w, F.size(w))
    )
    vocab = (
        hist_words.unionByName(docs.select(last_word.alias("word")))
        .agg(F.countDistinct("word").alias("v"))
    )
    return cb, ch, vocab


def _q4_logprob(c_b: Column, c_h: Column, v: Column) -> Column:
    """Quantized per-token log-probability (1e-4 nats, bigint)."""
    lp = F.log(c_b + F.lit(1).cast("double")) - F.log(
        c_h + v.cast("double")
    )
    return F.round(lp * F.lit(_Q4)).cast("bigint")


def perplexity_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_docs: DataFrame | None = None,
    max_nll_q4_per_token: int | None = None,
) -> DataFrame:
    """Per-document bigram NLL + keep flag (CCNet quality filter).

    Output columns: ``(id_col, n_bigrams:bigint, nll_q4:bigint,
    keep:boolean)`` where ``nll_q4`` is the negative sum of quantized
    per-token log-probs (1e-4 nats) and ``keep`` is::

        n_bigrams == 0 OR nll_q4 <= max_nll_q4_per_token * n_bigrams

    i.e. mean NLL per token below the threshold — a pure integer
    comparison.  ``max_nll_q4_per_token`` is ``round(ln(P) * 1e4)`` for
    a perplexity threshold ``P``; default keeps everything (score-only
    mode).

    ``lm_docs`` trains the LM on a different corpus (the CCNet shape:
    score web text under a Wikipedia LM); unseen bigrams/histories
    score with count 0 via left joins.
    """
    # no fan_out_small_scan here: docs feeds FOUR consumers (LM counts,
    # vocab last-words, the scoring explode, the id recovery join) and
    # each would re-pay the fan-out exchange — measured net-negative on
    # the single-row-group corpus (1.35 -> 1.83 s)
    cb, ch, vocab = lm_counts(lm_docs if lm_docs is not None else docs, text_col)
    grams = docs.select(
        F.col(id_col), F.explode(bigrams_col(text_col)).alias("gram")
    ).withColumn("hist", F.substring_index(F.col("gram"), " ", 1))
    scored = (
        grams.join(cb, "gram", "left")
        .join(ch, "hist", "left")
        .crossJoin(vocab)
        .select(
            id_col,
            _q4_logprob(
                F.coalesce(F.col("c_b"), F.lit(0)),
                F.coalesce(F.col("c_h"), F.lit(0)),
                F.col("v"),
            ).alias("q"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), (-F.sum("q")).alias("nll_q4")
    )
    # docs with < 2 words produce no bigrams — recover them with 0/0
    base = docs.select(id_col).distinct()
    out = base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce(F.col("nll_q4"), F.lit(0)).cast("bigint").alias("nll_q4"),
    )
    if max_nll_q4_per_token is None:
        keep = F.lit(True)
    else:
        keep = (F.col("n_bigrams") == 0) | (
            F.col("nll_q4")
            <= F.lit(int(max_nll_q4_per_token)) * F.col("n_bigrams")
        )
    return out.withColumn("keep", keep)
