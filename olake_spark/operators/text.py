"""Text-analysis operators for training-data pipelines.

All hot-path compute is JVM-side Catalyst expressions (split, filter,
transform, aggregate) so a 100 TB corpus pass stays inside whole-stage
codegen — no Python per row anywhere. Each operator has an ANSI-SQL
oracle twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stopword profiles for the n-gram/stopword language heuristic
LANG_PROFILES = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}

STOPWORDS_EN = LANG_PROFILES["en"]

_PUNCT = list(".,;:!?'\"()-")


def words_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin fan-out of an under-partitioned input before a
    per-row-heavy stage (explode/HOF metrics/regex): a small corpus in
    ONE unsplittable parquet row group otherwise runs the whole map
    stage on a single task while every other core idles (guide §2.5,
    input skew). Scale-adaptive, not a local[32] constant: the probe is
    the plan's actual partition count vs the session's parallelism, so
    any real corpus scan (>= cores partitions) passes through untouched
    and never pays the exchange. Row values are unchanged — only
    placement — so deterministic aggregates/windows downstream are
    unaffected; do NOT use in front of scan-order-dependent sampling
    (semantic_dedup's codebook, ANN builds)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target > 1 and df.rdd.getNumPartitions() * 4 <= target:
        return df.repartition(target)
    return df


def token_count(text: str | Column = "text") -> Column:
    """Whitespace token count — the cheap proxy used for sequence-length
    accounting before real tokenization."""
    return F.size(words_col(text))


# Each metric has an *_of variant taking a materialized word ARRAY —
# the array expressions are higher-order functions, which Spark
# evaluates interpreted, so feeding an unmaterialized split() re-runs
# the split per reference. One-pass callers (analyze_documents) stage
# the array once; the string-input forms bind the split through
# ``bind_once`` so standalone use doesn't pay the re-evaluation either.


def bind_once(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE per row and feed it to ``fn`` as a bound
    lambda variable — a single-element ``transform``. Higher-order
    functions evaluate interpreted with no common-subexpression
    elimination, so an expression referencing e.g. ``split(text)`` k
    times re-runs the split k times per element; binding it makes each
    reference an O(1) variable read (measured 10x on the n-gram
    explode: 5.0 s -> 0.5 s at sf0.1)."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def stopword_ratio_of(w: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    hits = F.size(F.filter(w, lambda x: F.lower(x).isin(sw)))
    return hits / F.greatest(F.size(w), F.lit(1))


def stopword_ratio(text: str | Column = "text", stopwords: list[str] | None = None) -> Column:
    return bind_once(words_col(text), lambda w: stopword_ratio_of(w, stopwords))


def mean_word_len_of(w: Column) -> Column:
    total = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return total / F.greatest(F.size(w), F.lit(1))


def mean_word_len(text: str | Column = "text") -> Column:
    return bind_once(words_col(text), mean_word_len_of)


def quality_score_of(w: Column) -> Column:
    n = F.size(w)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio_of(w)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3)) / F.lit(0.3)
    mwl = mean_word_len_of(w)
    mwl_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    score = (len_score + F.greatest(sw_score, F.lit(0.0)) + mwl_score) / F.lit(3.0)
    return F.round(score, 6)


def quality_score(text: str | Column = "text") -> Column:
    """Composite heuristic quality score in [0,1]: rewards moderate
    length, mid-range stopword density, sane mean word length — the
    usual pre-training corpus filters (C4/Gopher-style rules)."""
    return bind_once(words_col(text), quality_score_of)


def lang_id_of(w: Column) -> Column:
    scores = [
        (lang, F.size(F.filter(w, lambda x: F.lower(x).isin(sw))))
        for lang, sw in LANG_PROFILES.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # build reversed so earlier profiles win ties
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def lang_id(text: str | Column = "text") -> Column:
    """Stopword-profile language ID: argmax over per-language stopword
    hit counts, 'und' (undetermined) when no profile scores > 0.
    Deterministic tie-break by profile order."""
    return bind_once(words_col(text), lang_id_of)


def fingerprint_of(w: Column) -> Column:
    return F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(
            acc * F.lit(31) + F.ascii(x) + F.length(x), F.lit(2147483647)
        ),
    )


def fingerprint(text: str | Column = "text") -> Column:
    """Rolling polynomial document fingerprint over (first-char code +
    word length), bounded mod 2^31-1 each step so ANSI arithmetic never
    overflows. Cross-engine reproducible (ascii()/length() exist in
    DuckDB with identical semantics)."""
    return bind_once(words_col(text), fingerprint_of)


# ---------------------------------------------------------------- repetition
# Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
# Models", Table A1): documents dominated by one word / one bigram /
# duplicated lines are boilerplate and removed before training. All
# metrics are per-row Catalyst array expressions — no explode, no
# shuffle, so a 100 TB pass is a single scan inside codegen.


def _mode_count(arr: Column) -> Column:
    """Count of the most frequent element of an array, computed as the
    longest run of the sorted array (struct-accumulator aggregate) —
    O(n log n) per row, zero shuffle, JVM-side."""
    s = F.array_sort(arr)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = (
            F.when(acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(s, acc0, step, lambda acc: acc["best"])


def ngrams_from_words(w: Column, n: int) -> Column:
    """All adjacent n-grams of a word ARRAY as space-joined strings, in
    order and WITH repeats (empty array for arrays shorter than n).
    Take a materialized array column: higher-order functions evaluate
    interpreted (outside codegen), so feeding an unmaterialized split()
    re-runs it per reference."""
    sz = F.size(w)
    # guard sz<n: sequence(1, sz-n+1) would generate a DESCENDING range
    # in Spark, and element_at(w, 0) is an error under ANSI mode
    return F.when(sz < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        )
    )


def ngrams_col(text: str | Column = "text", n: int = 2) -> Column:
    """All adjacent word n-grams as space-joined strings, in order and
    WITH repeats (empty array for docs shorter than n words)."""
    return bind_once(words_col(text), lambda w: ngrams_from_words(w, n))


def bigrams_col(text: str | Column = "text") -> Column:
    """Adjacent word bigrams as 'w_i w_{i+1}' strings (empty array for
    single-word docs)."""
    return ngrams_col(text, 2)


def max_word_ratio(text: str | Column = "text") -> Column:
    """Fraction of all words taken by the single most frequent word."""
    return bind_once(
        words_col(text),
        lambda w: _mode_count(w) / F.greatest(F.size(w), F.lit(1)),
    )


def top_bigram_ratio(text: str | Column = "text") -> Column:
    """Fraction of all word-bigram occurrences taken by the most
    frequent bigram (0.0 for docs with < 2 words)."""
    return bind_once(
        bigrams_col(text),
        lambda b: F.when(F.size(b) == 0, F.lit(0.0)).otherwise(
            _mode_count(b) / F.greatest(F.size(b), F.lit(1))
        ),
    )


def dup_line_ratio(text: str | Column = "text") -> Column:
    """Fraction of lines that are duplicates of an earlier line
    (1 - distinct/total over '\\n'-split lines)."""
    c = F.col(text) if isinstance(text, str) else text
    return bind_once(
        F.split(c, "\n"),
        lambda lines: F.lit(1.0)
        - F.size(F.array_distinct(lines)) / F.greatest(F.size(lines), F.lit(1)),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    max_word: float = 0.20,
    max_bigram: float = 0.18,
    max_dup_lines: float = 0.30,
    min_words: int = 20,
) -> DataFrame:
    """Per-document repetition metrics + a keep flag under the Gopher
    thresholds. Ratio thresholds only apply to docs with at least
    ``min_words`` words — a 5-word doc has top_bigram_ratio >= 0.25 by
    construction, and Gopher's repetition rules target long boilerplate,
    not short snippets (length filtering is a separate policy). One
    scan; the word/bigram arrays are materialized ONCE as intermediate
    projection columns — the array expressions are higher-order
    functions, which Spark evaluates interpreted, so every extra
    reference to an unmaterialized array re-runs its whole construction
    (measured 3x on the bigram path). At 10^12 docs this is the
    cheapest filter in the curation funnel and should run first."""
    w, bg = "_rs_w", "_rs_bg"
    docs = fan_out_small_scan(docs)
    staged = docs.withColumn(w, words_col(text_col)).withColumn(
        bg, ngrams_from_words(F.col(w), 2)
    )
    nbg = F.size(F.col(bg))
    return staged.select(
        *docs.columns,
        F.round(
            _mode_count(F.col(w)) / F.greatest(F.size(F.col(w)), F.lit(1)), 6
        ).alias("max_word_ratio"),
        F.round(
            F.when(nbg == 0, F.lit(0.0)).otherwise(
                _mode_count(F.col(bg)) / F.greatest(nbg, F.lit(1))
            ),
            6,
        ).alias("top_bigram_ratio"),
        F.round(dup_line_ratio(text_col), 6).alias("dup_line_ratio"),
        F.size(F.col(w)).alias("_rs_nw"),  # free: the staged array's size
    ).withColumn(
        "keep",
        (F.col("_rs_nw") < min_words)
        | (
            (F.col("max_word_ratio") <= max_word)
            & (F.col("top_bigram_ratio") <= max_bigram)
            & (F.col("dup_line_ratio") <= max_dup_lines)
        ),
    ).drop("_rs_nw")


# ------------------------------------------------------------------ C4 rules
# Line/page cleanup of Raffel et al. 2020 ("Exploring the Limits of
# Transfer Learning...", C4 appendix): keep only lines that look like
# sentences (enough words, terminal punctuation), drop boilerplate pages
# (lorem ipsum, code braces, javascript notices). Pure array/regex
# Catalyst expressions — one scan, no shuffle.

_TERMINAL = r'[.!?"]\s*$'


def c4_page_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """Per-page C4 cleanup: ``clean_text`` keeps only lines with at
    least ``min_line_words`` words that end in terminal punctuation;
    ``keep`` additionally drops pages containing 'lorem ipsum', curly
    braces (code), or a javascript notice, and pages with fewer than
    ``min_kept_lines`` surviving lines.

    Returns the input plus (n_lines, n_kept, clean_text, keep).
    """
    c = F.col(text_col)
    lines = "_c4_lines"
    kept = "_c4_kept"
    docs = fan_out_small_scan(docs)
    staged = docs.withColumn(lines, F.split(c, "\n")).withColumn(
        kept,
        F.filter(
            F.col(lines),
            lambda ln: (F.size(F.split(ln, " ")) >= min_line_words)
            & ln.rlike(_TERMINAL),
        ),
    )
    low = F.lower(c)
    bad_page = (
        low.contains("lorem ipsum")
        | c.contains("{")
        | low.contains("javascript")
    )
    return staged.select(
        *docs.columns,
        F.size(F.col(lines)).alias("n_lines"),
        F.size(F.col(kept)).alias("n_kept"),
        F.array_join(F.col(kept), "\n").alias("clean_text"),
        (~bad_page & (F.size(F.col(kept)) >= min_kept_lines)).alias("keep"),
    )


# ----------------------------------------------------------------------- PII
# Pre-training corpora scrub obvious PII before the tokenizer sees it.
# Patterns are RE2-compatible (no backreferences/lookaround) so the same
# regex runs identically in Spark (Java regex) and the DuckDB oracle.

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]?\d{3}[- ]?\d{3,4}(?:[- ]?\d{3,4})?",
}
PII_TOKENS = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}
# emails first (contain dots that would partially match the IP pattern),
# then IPs, then phones
PII_ORDER = ("email", "ip", "phone")


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4s / international-format phone numbers with
    typed placeholder tokens and count each kind per document. Each kind
    is counted on the PROGRESSIVELY-scrubbed text (same order as the
    replacements), so the counts always reconcile with the placeholder
    tokens in ``text_clean`` even when patterns overlap (an IP inside an
    email address counts once, as the email). Pure regexp expressions —
    single codegen'd scan."""
    docs = fan_out_small_scan(docs)
    cur = F.col(text_col)
    counts = []
    for k in PII_ORDER:
        counts.append(
            F.size(
                F.regexp_extract_all(cur, F.lit(PII_PATTERNS[k]), F.lit(0))
            ).alias(f"n_{k}s")
        )
        cur = F.regexp_replace(cur, PII_PATTERNS[k], PII_TOKENS[k])
    return docs.select("*", *counts, cur.alias("text_clean"))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: all metrics as extra columns. The word
    array is staged once (see the *_of variants' interpreted-HOF note) —
    the unstaged form split the text ~10x per row across the metrics."""
    staged = fan_out_small_scan(docs).withColumn("_ad_w", words_col(text_col))
    w = F.col("_ad_w")
    return staged.select(
        *docs.columns,
        F.size(w).alias("tok_count"),
        F.round(stopword_ratio_of(w), 6).alias("stop_ratio"),
        F.round(mean_word_len_of(w), 6).alias("mean_wlen"),
        quality_score_of(w).alias("quality"),
        lang_id_of(w).alias("pred_lang"),
        fingerprint_of(w).alias("fp"),
    )
