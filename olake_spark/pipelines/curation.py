"""End-to-end training-corpus curation: the engine's ops composed the
way a 100 TB data pipeline actually runs them.

    raw docs -> [repetition filter] -> [PII scrub]
             -> exact dedup -> benchmark decontamination
             -> source-weighted mixture -> per-source token budget

Every stage is one of the already-tested operators (text.repetition_stats,
text.pii_scrub, dedup.exact_dedup, dedup.decontaminate,
sampling.stratified_sample, sampling.token_budget_select), so the whole
pipeline is a single lazy DataFrame plan: narrow codegen'd scans for the
quality gates (run FIRST — cheapest per byte, biggest cut), one shuffle
for dedup, a broadcast semi-join for decontamination, a narrow filter
for the mixture, and the two-level bucketized window for the budget.
Stage seeds are decorrelated (mixture at ``seed``, budget at
``seed + 1``) so the budget's shuffle order is independent of which
docs survived the mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.dedup import decontaminate, exact_dedup
from olake_spark.operators.sampling import (
    stratified_sample,
    token_budget_select,
)
from olake_spark.operators.text import pii_scrub, repetition_stats


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    dedup_keys: list[str] | None = None,
    shingle_k: int = 3,
    mixture_rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    token_budget: int | dict[str, int] | None = None,
    weight_col: str = "n_tok",
    seed: int = 0,
    repetition: dict | None = None,
    scrub_pii: bool = False,
    materialize: bool = False,
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Curated corpus: quality-gated, scrubbed, deduped, decontaminated,
    mixed, budgeted.

    ``repetition``: kwargs for text.repetition_stats (e.g.
    ``{"max_word": 0.1}``); docs failing the Gopher thresholds are
    dropped before any shuffle. ``scrub_pii``: replace the text column
    with its PII-scrubbed form BEFORE dedup, so near-identical docs
    differing only in embedded PII dedup together.

    Stages whose arguments are None/False are skipped, so the same
    entry point serves partial pipelines (e.g. dedup + decontaminate
    only).

    ``materialize``: persist the frame at the two fan-out points (after
    dedup, and after the mixture) — decontamination and the two-level
    budget each reference their input twice, and Catalyst does NOT
    reuse the shared subtree (per-branch column pruning makes the
    exchanges non-identical, so ReuseExchange never fires), which
    re-runs the whole upstream funnel per branch. Lazy by default to
    keep the single-plan contract; at scale you materialize between
    macro-stages anyway (typically by writing an intermediate table).
    Callers own cache lifetime: pass ``persisted`` (a list) to receive
    the persisted handles and ``unpersist()`` them after the final
    action — a long session (bench/correctness loop) that skips this
    leaks cached partitions until spark.catalog.clearCache().
    """
    out = docs
    if repetition is not None:
        out = (
            repetition_stats(out, text_col=text_col, **repetition)
            .filter(F.col("keep"))
            .drop("max_word_ratio", "top_bigram_ratio", "dup_line_ratio", "keep")
        )
    if scrub_pii:
        out = (
            pii_scrub(out, text_col)
            .drop("n_emails", "n_ips", "n_phones", text_col)
            .withColumnRenamed("text_clean", text_col)
        )
    out = exact_dedup(out, dedup_keys or [text_col], order_col=id_col)
    if materialize and benchmark is not None:
        out = out.persist()
        if persisted is not None:
            persisted.append(out)
    if benchmark is not None:
        out = decontaminate(
            out, benchmark, id_col=id_col, text_col=text_col,
            shingle_k=shingle_k,
        )
    if mixture_rates is not None:
        out = stratified_sample(
            out, mixture_rates, strata_col=strata_col, key_col=id_col,
            seed=seed, default_rate=default_rate,
        )
    if materialize and token_budget is not None:
        out = out.persist()
        if persisted is not None:
            persisted.append(out)
    if token_budget is not None:
        out = token_budget_select(
            out, token_budget, weight_col=weight_col,
            strata_col=strata_col, key_col=id_col, seed=seed + 1,
        )
    return out
