"""Byte-pair-encoding vocabulary training and encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

Upgrades the whitespace+hash stand-in tokenizer
(``sources/tokenizer.py``) to a real learned subword vocabulary — the
step that turns a text corpus into the engine's primary input shape
(doc_id, tokens:array<int32>, n_tok, source).  The reference engine has
no tokenizer at all; this is part of the training-data-pipeline layer
(SURVEY.md §2.8+), built from the public BPE algorithm.

Scale shape
-----------
BPE trains on the **word-frequency table**, not the corpus: one
distributed ``groupBy(word).count()`` reduces 100 TB of text to a
Zipf-bounded table of distinct words (10^6–10^8 rows).  Training then
runs in one of two modes, pinned equal by test:

* **driver mode** (default): collect the count table (guarded by
  ``max_words`` — overflow raises, never silently truncates; use
  ``min_count`` to shrink the tail first) and run the classic local
  trainer.  This is the industry-standard shape: distributed count,
  single-node merge loop.
* **distributed mode**: the symbol table stays a DataFrame; each merge
  iteration is a pair-count ``groupBy`` + a 1-row argmax collect + a
  pure-Catalyst fold that applies the merge (no Python in the loop —
  the greedy left-to-right merge is an ``F.aggregate`` over the symbol
  array).  ``localCheckpoint`` every ``checkpoint_every`` iterations
  truncates the growing lineage.  Use when the distinct-word table
  itself cannot sit on the driver.

Encoding is a vectorized pandas UDF (Arrow batches) with a
per-executor word→ids memo — the Zipf skew means the memo hit rate is
the corpus duplicate-word rate (>99% for natural text), so the Python
merge loop runs roughly once per *distinct* word per executor.

Determinism: merge ties break (count desc, pair lexicographic asc);
vocabulary ids are (UNK=0, sorted base alphabet, then merge products in
merge order) — identical across modes and cluster sizes.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.operators.text import words_col

EOW = "</w>"  # end-of-word marker symbol (never merges with next word)
UNK_ID = 0
_PAIR_SEP = " "  # symbols derive from split(' ') words: never contain spaces


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one pass that touches all data."""
    return (
        docs.select(F.explode(words_col(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(word: str) -> list[str]:
    return list(word) + [EOW]


def _merge_syms(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right application of one merge to a symbol list."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _train_local(
    words: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (symbols, count) table."""
    merges: list[tuple[str, str]] = []
    words = [(list(s), c) for s, c in words]
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, cnt in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_pair_count:
            break
        merges.append((a, b))
        words = [(_merge_syms(s, a, b), c) for s, c in words]
    return merges


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Pure-Catalyst greedy merge: fold the symbol array, fusing each
    adjacent (a, b) into a+b.  After a fuse the tail becomes a+b != a,
    so a plain last-element check implements the standard greedy
    left-to-right semantics (overlaps like 'aaa' under (a,a) -> (aa,a))."""
    fused = F.lit(a + b)

    def step(acc, x):
        append = F.concat(acc, F.array(x))
        fuse = F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused))
        # CaseWhen evaluates conditions in order — element_at never
        # touches an empty array (ANSI mode would raise)
        return (
            F.when(F.size(acc) == 0, append)
            .when((F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)), fuse)
            .otherwise(append)
        )

    return F.aggregate(syms, F.expr("CAST(array() AS array<string>)"), step)


def _train_distributed(
    wc: DataFrame,
    num_merges: int,
    min_pair_count: int,
    checkpoint_every: int,
) -> list[tuple[str, str]]:
    """Merge loop with the symbol table held as a DataFrame.

    Per iteration: one pair-count shuffle over the *distinct-word*
    table + a single-row argmax collect + a zero-shuffle Catalyst fold.
    The table is re-cached after each merge; ``localCheckpoint`` every
    ``checkpoint_every`` iterations keeps the plan depth bounded.
    """
    df = wc.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
        F.col("cnt"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        pair = F.transform(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: F.concat_ws(
                _PAIR_SEP,
                F.element_at(F.col("syms"), i + 1),
                F.element_at(F.col("syms"), i + 2),
            ),
        )
        # tie-break (count desc, a asc, b asc) — exactly the driver
        # trainer's tuple order (symbols never contain spaces, so
        # the two split parts reconstruct the pair losslessly)
        best = (
            df.filter(F.size("syms") >= 2)
            .select(F.explode(pair).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(
                F.desc("total"),
                F.asc(F.substring_index("pair", _PAIR_SEP, 1)),
                F.asc(F.substring_index("pair", _PAIR_SEP, -1)),
            )
            .limit(1)
            .collect()
        )
        if not best or best[0].total < min_pair_count:
            break
        a, b = best[0].pair.split(_PAIR_SEP, 1)
        merges.append((a, b))
        df = df.select(_merge_fold(F.col("syms"), a, b).alias("syms"), "cnt")
        if (it + 1) % checkpoint_every == 0:
            df = df.localCheckpoint()
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    distributed: bool = False,
    max_words: int = 5_000_000,
    min_count: int = 1,
    checkpoint_every: int = 16,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the ordered merge list ``[(a, b), ...]`` — rank = position.
    Stops early when no pair reaches ``min_pair_count``.
    """
    wc = word_counts(docs, text_col).filter(F.col("cnt") >= min_count)
    if distributed:
        return _train_distributed(wc, num_merges, min_pair_count, checkpoint_every)
    rows = wc.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"distinct-word table exceeds max_words={max_words}; raise "
            "min_count, raise max_words, or use distributed=True"
        )
    table = [(_initial_symbols(r.word), int(r.cnt)) for r in rows]
    # deterministic driver-side order (collect order is partition order)
    table.sort(key=lambda t: t[0])
    return _train_local(table, num_merges, min_pair_count)


def corpus_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct characters of the corpus (one distributed pass) —
    the base alphabet a real tokenizer ships alongside its merges, so
    unmerged rare characters still encode without UNK."""
    rows = (
        docs.select(
            F.explode(F.split(F.col(text_col), "")).alias("ch")
        )
        .filter((F.col("ch") != "") & (F.col("ch") != " "))
        .distinct()
        .collect()
    )
    return sorted(r.ch for r in rows)


def bpe_vocab(
    merges: list[tuple[str, str]], alphabet: list[str] | None = None
) -> dict[str, int]:
    """Symbol -> id.  UNK=0, then the sorted base alphabet (defaults to
    every symbol consumed by a merge, minus merge products; pass the
    ``corpus_alphabet`` to cover unmerged rare characters), plus EOW,
    then merge products in merge order.  Purely a function of its
    inputs, so identical everywhere."""
    products = {a + b for a, b in merges}
    base = {s for m in merges for s in m if s not in products} | {EOW}
    if alphabet:
        base |= set(alphabet)
    vocab: dict[str, int] = {}
    next_id = UNK_ID + 1
    for s in sorted(base):
        vocab[s] = next_id
        next_id += 1
    for a, b in merges:
        vocab[a + b] = next_id
        next_id += 1
    return vocab


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE encode of one word (lowest-rank pair first) —
    reproduces the training segmentation exactly."""
    syms = _initial_symbols(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
    alphabet: list[str] | None = None,
) -> DataFrame:
    """text -> array<int32> token ids under the learned vocabulary.

    Vectorized pandas UDF; unknown symbols (characters outside the
    training alphabet, or never-merged rare chars) map to ``UNK_ID``.
    A per-executor word->ids memo makes the Python merge loop run once
    per distinct word per executor (Zipf: >99% memo hits on text)."""
    ranks = {m: i for i, m in enumerate(merges)}
    vocab = bpe_vocab(merges, alphabet)
    memo: dict[str, list[int]] = {}

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            ids: list[int] = []
            for w in (t or "").split(" "):
                if w == "":
                    continue
                hit = memo.get(w)
                if hit is None:
                    hit = [vocab.get(s, UNK_ID) for s in encode_word(w, ranks)]
                    memo[w] = hit
                ids.extend(hit)
            out.append(ids)
        return pd.Series(out)

    enc = docs.withColumn(out_col, _enc(F.col(text_col)))
    return enc.withColumn("n_tok", F.size(out_col).cast("int"))


def bpe_decode_ids(
    ids: list[int],
    merges: list[tuple[str, str]],
    alphabet: list[str] | None = None,
) -> str:
    """ids -> text (driver-side helper for tests/inspection); UNK ids
    decode to the empty string."""
    inv = {v: k for k, v in bpe_vocab(merges, alphabet).items()}
    words: list[str] = []
    cur: list[str] = []
    for i in ids:
        s = inv.get(i, "")
        if s.endswith(EOW):
            cur.append(s[: -len(EOW)])
            words.append("".join(cur))
            cur = []
        else:
            cur.append(s)
    if cur:
        words.append("".join(cur))
    return " ".join(words)
