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


def token_count(text: str | Column = "text") -> Column:
    """Whitespace token count — the cheap proxy used for sequence-length
    accounting before real tokenization."""
    return F.size(words_col(text))


def stopword_ratio(text: str | Column = "text", stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    w = words_col(text)
    hits = F.size(F.filter(w, lambda x: F.lower(x).isin(sw)))
    return hits / F.greatest(F.size(w), F.lit(1))


def mean_word_len(text: str | Column = "text") -> Column:
    w = words_col(text)
    total = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return total / F.greatest(F.size(w), F.lit(1))


def quality_score(text: str | Column = "text") -> Column:
    """Composite heuristic quality score in [0,1]: rewards moderate
    length, mid-range stopword density, sane mean word length — the
    usual pre-training corpus filters (C4/Gopher-style rules)."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3)) / F.lit(0.3)
    mwl = mean_word_len(c)
    mwl_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    score = (len_score + F.greatest(sw_score, F.lit(0.0)) + mwl_score) / F.lit(3.0)
    return F.round(score, 6)


def lang_id(text: str | Column = "text") -> Column:
    """Stopword-profile language ID: argmax over per-language stopword
    hit counts, 'und' (undetermined) when no profile scores > 0.
    Deterministic tie-break by profile order."""
    w = words_col(text)
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


def fingerprint(text: str | Column = "text") -> Column:
    """Rolling polynomial document fingerprint over (first-char code +
    word length), bounded mod 2^31-1 each step so ANSI arithmetic never
    overflows. Cross-engine reproducible (ascii()/length() exist in
    DuckDB with identical semantics)."""
    w = words_col(text)
    return F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(
            acc * F.lit(31) + F.ascii(x) + F.length(x), F.lit(2147483647)
        ),
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: all metrics as extra columns."""
    return docs.select(
        "*",
        token_count(text_col).alias("tok_count"),
        F.round(stopword_ratio(text_col), 6).alias("stop_ratio"),
        F.round(mean_word_len(text_col), 6).alias("mean_wlen"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("pred_lang"),
        fingerprint(text_col).alias("fp"),
    )
