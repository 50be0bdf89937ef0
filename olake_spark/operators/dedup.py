"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a documents
table. Design notes for the 100 TB case are per-operator; the common
theme is: shuffles happen on *hash keys* (uniform), signatures are
fixed-width (bounded state), and candidates come from hash buckets —
never an all-pairs product. Buckets (LSH bands, simhash segments)
generate pairs in-bucket after one grouping, so the signature pipeline
runs once — with per-bucket state BOUNDED by ``max_bucket``: oversized
buckets (mega near-duplicate clusters) fall back to star pairs through
the bucket representative (see _bucket_pairs). Potentially-large blocks
(source/label blocking) use an equi-join, which distributes when a
block outgrows a task. Exact-similarity verification runs only on the
candidate set.

References for the technique (public literature): Broder '97 (MinHash),
Charikar '02 (SimHash), Leskovec et al., "Mining of Massive Datasets"
ch.3 (banding/LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ------------------------------------------------------------------ exact
def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per content key (hash-groupBy dedup).

    One shuffle on the md5 content hash; ties broken by ``order_col``
    then the hash, so output is deterministic. This is the engine-side
    version of the reference's reader-side `olake_id` dedup contract
    (/root/reference/types/data_types.go:26-31).
    """
    ckey = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]))
    w = Window.partitionBy(ckey).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ----------------------------------------------------------------- shingles
def word_shingles(text_col: str, k: int = 3) -> F.Column:
    """Distinct k-word shingles of a text column — pure Catalyst:
    split + sequence + transform + array_distinct. The split is bound
    once per row (``bind_once``): HOFs evaluate interpreted with no
    CSE, so an inline split would re-run k times per shingle."""
    from olake_spark.operators.text import bind_once, words_col

    return bind_once(words_col(text_col), lambda w: _shingles_of(w, k))


def _shingles_of(w: F.Column, k: int) -> F.Column:
    n = F.size(w)
    # sequence(1, 0) would step BACKWARDS ([1,0]) — guard short docs
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)])
    )
    return F.array_distinct(sh)


def token_shingles(tokens_col: str | F.Column, k: int = 5) -> F.Column:
    """Distinct k-token shingles of a pre-tokenized ``array<int>`` column
    (the engine's primary input shape: doc_id, tokens, n_tok, source) —
    the token-level twin of ``word_shingles``, so every MinHash/LSH
    near-dup path runs on corpora that ship without raw text.  Token ids
    are stringified inside one bound transform; everything downstream is
    the identical banded pipeline."""
    from olake_spark.operators.text import bind_once

    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    stringified = F.transform(c, lambda t: t.cast("string"))
    return bind_once(stringified, lambda w: _shingles_of(w, k))


# ------------------------------------------------------- decontamination
def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Drop every training document sharing ANY k-word shingle with the
    benchmark/eval set (n-gram decontamination, the public-practice
    guard against test-set leakage into training corpora).

    Scale shape: the benchmark side is tiny relative to a 100 TB corpus,
    so its distinct shingles are hashed to int64 (xxhash64 — 8 bytes a
    shingle instead of the string) and broadcast; the corpus side is a
    flatMap explode feeding a broadcast semi-join — no shuffle until the
    final distinct on contaminated ids (small). Set
    ``broadcast_benchmark=False`` for a benchmark too large to ship
    (falls back to a hash-partitioned semi-join).
    """
    bsh = benchmark.select(
        F.explode(word_shingles(text_col, shingle_k)).alias("_sh")
    ).select(F.xxhash64("_sh").alias("_h")).distinct()
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    from olake_spark.operators.text import fan_out_small_scan

    dsh = fan_out_small_scan(docs).select(
        F.col(id_col),
        F.explode(word_shingles(text_col, shingle_k)).alias("_sh"),
    ).select(id_col, F.xxhash64("_sh").alias("_h"))
    contaminated = (
        dsh.join(bsh, "_h", "left_semi").select(id_col).distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")


# ------------------------------------------------------------------ minhash
def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    shingle_k: int = 3,
    shingles: F.Column | None = None,
) -> DataFrame:
    """MinHash signature per document: explode distinct shingles, then
    one hash-aggregation computing min(xxhash64(shingle, seed)) for all
    permutations simultaneously — a single shuffle keyed on the doc id,
    map-side partial aggregation included, all JVM-side.

    ``shingles`` overrides the shingle source (default: word shingles of
    ``text_col``) — pass ``token_shingles('tokens', k)`` to fingerprint
    pre-tokenized sequences instead of text.
    """
    sh_expr = (
        shingles if shingles is not None else word_shingles(text_col, shingle_k)
    )
    # generated-SQL aggregates: the Column-object loop costs ~100 py4j
    # round trips per plan build (see simhash) for identical expressions
    exploded = docs.select(F.col(id_col), F.explode(sh_expr).alias("sh"))
    aggs = [
        F.expr(f"min(xxhash64(sh, {seed}))").alias(f"mh{seed}")
        for seed in range(num_perm)
    ]
    sigs = exploded.groupBy(id_col).agg(*aggs)
    arr = ", ".join(f"mh{s}" for s in range(num_perm))
    return sigs.select(id_col, F.expr(f"array({arr})").alias("sig"))


def _bucket_pairs(
    keyed: DataFrame, key_cols: list[str], payload: str, max_bucket: int
) -> DataFrame:
    """Candidate pairs from hash buckets with BOUNDED per-bucket state.

    One window pass (a single Exchange+Sort on the uniform bucket key)
    ranks each bucket's members by id and attaches the bucket's first
    (min-id) member as the representative. Members ranked within
    ``max_bucket`` aggregate into ONE group per bucket and emit in-bucket
    all-pairs (aggregation state capped at max_bucket structs, pair array
    at max_bucket^2/2 — ~5*10^7 at the default 10^4: one task, fine).
    Members beyond the cap — the tail of a mega near-duplicate cluster,
    the very thing dedup targets — become SINGLETON groups that emit one
    STAR pair (representative, member) each: O(tail) extra pairs instead
    of O(b^2), per-group state O(1), and the whole cluster stays
    connected through the representative for keep-one-per-cluster dedup.
    The cost is pair recall among tail members (their mutual pairs are
    not emitted); every emitted pair still flows through the downstream
    exact-similarity verify/threshold.

    The group key extends the bucket key, so the groupBy reuses the
    window's partitioning — the whole operator is ONE shuffle of the
    keyed rows on a uniform hash key, with the signature pipeline
    evaluated once (no self-join, no union of branches; asserted in
    tests/test_plan_shapes.py).

    Returns (id_a, id_b, pay_a, pay_b) with id_a < id_b.
    """
    kc = [F.col(c) for c in key_cols]
    wb = Window.partitionBy(*kc).orderBy(F.col("i"))
    member = F.struct(F.col("i"), F.col(payload))
    ranked = keyed.select(
        *kc,
        "i",
        payload,
        F.row_number().over(wb).alias("_rn"),
        F.first(member).over(wb).alias("_rep"),
    )
    # capped members share group 0; each tail member is isolated by its
    # rank so no group ever collects more than max_bucket structs
    g = F.when(F.col("_rn") <= max_bucket, F.lit(0)).otherwise(F.col("_rn"))
    grouped = ranked.groupBy(*kc, g.alias("_g")).agg(
        F.sort_array(F.collect_list(member)).alias("m"),
        F.first("_rep").alias("_r"),
    )
    # generated SQL (see simhash): nested py4j lambda construction is
    # the plan-build hot spot; the parsed expressions are identical
    pay = f"`{payload}`"
    all_pairs = F.expr(
        "flatten(transform(m, (x, i) -> "
        "transform(slice(m, i + 2, size(m)), y -> "
        "named_struct('id_a', x.i, 'id_b', y.i, "
        f"'pay_a', x.{pay}, 'pay_b', y.{pay}))))"
    )
    # tail member's id is > every capped member's id (ranked by id), so
    # id_a = rep.i = bucket min < id_b always holds
    star = F.expr(
        "array(named_struct('id_a', _r.i, 'id_b', m[0].i, "
        f"'pay_a', _r.{pay}, 'pay_b', m[0].{pay}))"
    )
    return (
        grouped.select(
            F.explode(F.when(F.col("_g") == 0, all_pairs).otherwise(star)).alias(
                "p"
            )
        )
        .select("p.*")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    verify: bool = False,
    max_bucket: int = 10_000,
    shingles: F.Column | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    ``shingles`` overrides the shingle source for BOTH the signature
    pass and the exact-Jaccard verify join (default: word shingles of
    ``text_col``; pass ``token_shingles(...)`` for tokenized corpora).

    1. signatures (one shuffle);
    2. band keys: hash of each band's slice of the signature; explode
       bands -> candidate buckets; in-bucket pair generation after ONE
       grouping on the uniform (band, key) hash, state bounded by
       ``max_bucket`` (_bucket_pairs);
    3. ``verify=False`` (default): filter candidates on the MinHash
       *estimate* >= threshold; returns (id_a, id_b, est_jaccard) — the
       estimate, NOT exact similarity.
       ``verify=True``: join candidates back to their shingle sets and
       filter on EXACT Jaccard >= threshold; returns (id_a, id_b,
       jaccard). Exactness costs one extra equi-join on the candidate
       set only (never all-pairs).

    At 10^12 docs the all-pairs product is impossible; this plan's cost
    is O(docs x bands) rows through one uniform-key shuffle plus, when
    verifying, O(candidates) shingle-set intersections — with every
    per-bucket quantity capped by ``max_bucket``.
    """
    from olake_spark.operators.text import fan_out_small_scan

    r = num_perm // bands
    docs = fan_out_small_scan(docs)
    sigs = minhash_signatures(
        docs, id_col, text_col, num_perm, shingle_k, shingles=shingles
    )
    # generated SQL (see simhash): identical expressions, ~5% of the
    # py4j plan-construction cost of the Column-object loops
    band_arr = F.expr(
        "array("
        + ", ".join(
            "xxhash64(concat_ws(',', "
            + ", ".join(
                f"CAST(sig[{b * r + i}] AS STRING)" for i in range(r)
            )
            + f"), {b})"
            for b in range(bands)
        )
        + ")"
    )
    banded = sigs.select(
        F.col(id_col), "sig", F.posexplode(band_arr).alias("band", "bkey")
    )
    # candidate pairs WITHOUT a self-join: group each (band, bucket) and
    # emit in-bucket pairs with higher-order functions. A self-join
    # evaluates the whole signature pipeline (shingle explode + 32-way
    # min-agg) once per side — neither static ReuseExchange nor AQE
    # stage reuse deduplicates it in practice; grouping computes it
    # ONCE and shuffles each signature exactly once per band. Buckets
    # larger than ``max_bucket`` (a mega near-duplicate cluster) switch
    # to star pair generation so per-task state stays bounded — see
    # _bucket_pairs.
    cand = _bucket_pairs(
        banded.select(
            "band", "bkey", F.col(id_col).alias("i"), F.col("sig")
        ),
        ["band", "bkey"],
        "sig",
        max_bucket,
    ).select(
        "id_a", "id_b",
        F.col("pay_a").alias("sig_a"), F.col("pay_b").alias("sig_b"),
    )
    if verify:
        sh_expr = (
            shingles
            if shingles is not None
            else word_shingles(text_col, shingle_k)
        )
        sh = docs.select(F.col(id_col), sh_expr.alias("sh"))
        pairs = (
            cand.select("id_a", "id_b")
            .join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
            .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        jac = inter / F.greatest(union, F.lit(1))
        return (
            pairs.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", "jaccard")
        )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            lambda x: x == 1,
        )
    ) / F.lit(float(num_perm))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ------------------------------------------------------------------ simhash
def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document: explode words, per-bit sign vote via
    conditional sums in ONE aggregation (64 agg columns, still a single
    shuffle with partial aggregation), recombined into a long.

    ``word_hash``: 'xxhash64' (default — JVM-codegen, the production
    hot path) or 'md5_60' (first 15 hex digits of md5 as a 60-bit int
    — slower, but expressible IDENTICALLY in DuckDB, which makes the
    whole near-dup pipeline hash-exact oracle-checkable; bits 60-63 are
    then always zero, an immaterial quality delta for banding)."""
    if word_hash == "xxhash64":
        wordsh = "xxhash64(w)"
    elif word_hash == "md5_60":
        wordsh = "CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)"
    else:
        raise ValueError(f"word_hash must be 'xxhash64' or 'md5_60', got {word_hash!r}")
    # the 64 vote aggregates and the 64-term recombine are built as
    # generated SQL strings: the equivalent Column-object loops cost
    # ~600 py4j round trips (~1 s of driver wall per invocation) just to
    # CONSTRUCT the plan — parsing one SQL string is milliseconds, and
    # the parsed expressions (and results) are identical
    from olake_spark.operators.text import fan_out_small_scan

    exploded = fan_out_small_scan(docs).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).withColumn("h", F.expr(wordsh))
    one = "CAST(1 AS BIGINT)"
    if bits % 2:
        # odd widths keep the one-sum-per-bit form
        votes = [
            F.expr(
                f"sum(CASE WHEN (h & shiftleft({one}, {b})) != 0 "
                "THEN 1 ELSE -1 END)"
            ).alias(f"b{b}")
            for b in range(bits)
        ]
        agg = exploded.groupBy(id_col).agg(*votes)
        sim = " + ".join(
            f"(CASE WHEN b{b} > 0 THEN shiftleft({one}, {b}) "
            f"ELSE {one} * 0 END)"
            for b in range(bits)
        )
        return agg.select(id_col, F.expr(sim).alias("simhash"))
    # two 32-bit set-bit counters per aggregate: p_b accumulates
    # (count of bit b) + (count of bit b+bits/2 << 32) in one bigint —
    # carry-free because a per-doc word count is far below 2^31 (a
    # Spark string caps at 2 GB ~ 2^30 words). Halving the aggregate
    # count matters twice: a 64-sum hash aggregate's generated update
    # method exceeds HotSpot's JIT huge-method limit and runs as
    # interpreted bytecode (measured: codegen OFF was no slower), and
    # each when/sum is an agg-buffer slot. The per-bit vote is
    # recovered exactly: sum(+-1) > 0  <=>  2*count_set > n_words.
    half = bits // 2
    lanes = [
        F.expr(
            f"sum((shiftrightunsigned(h, {b}) & 1) + "
            f"shiftleft(shiftrightunsigned(h, {b + half}) & 1, 32))"
        ).alias(f"p{b}")
        for b in range(half)
    ]
    lanes.append(F.expr("count(*)").alias("n"))
    agg = exploded.groupBy(id_col).agg(*lanes)
    # shiftleft keeps bit 63 in JVM long range (wraps to sign bit)
    sim = " + ".join(
        f"(CASE WHEN 2 * (p{b} & 4294967295) > n "
        f"THEN shiftleft({one}, {b}) ELSE {one} * 0 END) + "
        f"(CASE WHEN 2 * shiftrightunsigned(p{b}, 32) > n "
        f"THEN shiftleft({one}, {b + half}) ELSE {one} * 0 END)"
        for b in range(half)
    )
    return agg.select(id_col, F.expr(sim).alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    max_bucket: int = 10_000,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """Hamming-distance near-dup via the pigeonhole block trick: split
    the 64-bit simhash into ``blocks`` segments; any pair within
    ``max_hamming`` (< blocks) must agree on >= 1 segment, so candidate
    generation is an equi-join per segment — no all-pairs. Segments with
    more than ``max_bucket`` members fall back to star pairs
    (_bucket_pairs) so one mega-cluster cannot blow a single task."""
    width = 64 // blocks
    mask = (1 << width) - 1
    sh = simhash(docs, id_col, text_col, word_hash=word_hash)
    seg = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(blocks)
        ]
    )
    seged = sh.select(id_col, "simhash", F.posexplode(seg).alias("blk", "seg"))
    # in-bucket pair generation instead of a self-join: the 64-agg
    # simhash pipeline is computed once (see minhash_lsh_pairs)
    cand = _bucket_pairs(
        seged.select("blk", "seg", F.col(id_col).alias("i"), "simhash"),
        ["blk", "seg"],
        "simhash",
        max_bucket,
    ).select(
        "id_a", "id_b",
        F.col("pay_a").alias("ha"), F.col("pay_b").alias("hb"),
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------------ dedup clusters
def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the step
    that turns pairwise candidates (minhash_lsh_pairs / ngram_jaccard /
    simhash) into keep-one-per-cluster dedup decisions.

    Iterative min-label propagation with pointer doubling: every doc
    starts labeled with its own id; each round a doc adopts the minimum
    label among itself and its neighbors, then compresses one hop
    through the label table (label := label(label)) — the doubling step
    makes convergence O(log diameter) rounds instead of O(diameter)
    (the standard Hash-to-Min-style shortcut, Rastogi et al. 2012).
    Each round is two uniform equi-joins + one min-agg — all shuffled
    on the doc id, no skew, no driver-side graph. Labels persist per
    round (and the previous round unpersists) so the plan does not grow
    exponentially with iterations.

    Returns (id_col, cluster_rep) for EVERY doc; singletons are their
    own rep. The canonical keeper of a cluster is its min id.

    Notes: ``pairs`` must reference ids present in ``docs`` (foreign ids
    would surface as extra rows). The edge set and the final label table
    stay persisted — the iterative lineage is not cheaply re-executable,
    so callers running many clusterings in one long session should
    materialize the result and ``spark.catalog.clearCache()``.
    """
    labels = docs.select(F.col(id_col).alias("_id")).withColumn(
        "_lbl", F.col("_id")
    )
    # both edge directions from ONE pass over pairs: a union of two
    # selects would evaluate the (potentially expensive — at scale, the
    # whole MinHash candidate pipeline) pairs subtree twice, and Spark
    # 4.1 AQE does not ReuseExchange across union branches even when
    # canonically identical
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("_u"), F.col("id_b").alias("_v")
                    ),
                    F.struct(
                        F.col("id_b").alias("_u"), F.col("id_a").alias("_v")
                    ),
                )
            ).alias("_e")
        )
        .select("_e._u", "_e._v")
        .distinct()
        .persist()
    )
    labels = labels.persist()
    labels.count()
    try:
        for _ in range(max_iter):
            msgs = edges.join(
                labels.select(F.col("_id").alias("_v"), "_lbl"), "_v"
            ).select(F.col("_u").alias("_id"), "_lbl")
            stepped = (
                labels.select("_id", "_lbl")
                .unionByName(msgs)
                .groupBy("_id")
                .agg(F.min("_lbl").alias("_lbl"))
            )
            # pointer doubling: follow the label one extra hop
            hop = stepped.select(
                F.col("_id").alias("_lbl"), F.col("_lbl").alias("_hop")
            )
            # localCheckpoint, not persist: each round references the
            # previous round's frame TWICE (stepped + the hop self-join),
            # so the LOGICAL plan doubles per round even though persist
            # caches the data — by round ~10 the plan tree is 2^10 x the
            # pair pipeline and its stringification/canonicalization
            # OOMs the driver (observed at sf0.1 semantic_dedup).
            # localCheckpoint materializes the same partitions AND cuts
            # the lineage, keeping every round's plan O(1). Trade-off:
            # a lost executor can no longer recompute a round (standard
            # for iterative label propagation; re-run the clustering).
            new_labels = (
                stepped.join(hop, "_lbl", "left")
                .select(
                    "_id",
                    F.least(
                        F.col("_lbl"), F.coalesce("_hop", "_lbl")
                    ).alias("_lbl"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("_lbl", "_old"), "_id"
                )
                .filter(F.col("_lbl") != F.col("_old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select(
            F.col("_id").alias(id_col), F.col("_lbl").alias("cluster_rep")
        )
    finally:
        edges.unpersist()


def dedup_near_duplicates(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one document per near-duplicate cluster (the min-id
    representative); singletons survive untouched. ``pairs`` is any
    (id_a, id_b) candidate output (verified or thresholded upstream)."""
    clusters = near_dup_clusters(docs, pairs, id_col)
    keep = clusters.filter(F.col(id_col) == F.col("cluster_rep")).select(id_col)
    return docs.join(keep, id_col, "left_semi")


# -------------------------------------------------------------- exact jaccard
_REQUIRED = object()  # sentinel: caller must choose blocking explicitly


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = _REQUIRED,  # type: ignore[assignment]
    shingle_k: int = 2,
    threshold: float = 0.6,
    max_block: int | None = 1_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key.

    The self-join is QUADRATIC within a block — this is the small-input /
    candidate-verifier path, not a standalone dedup strategy at scale
    (use minhash_lsh_pairs(verify=True) for that). Two guards enforce it:

    - ``block_col`` has no default: the caller must name a blocking
      column (or pass None for the all-pairs product) so quadratic
      blow-up is an explicit choice, never an accident;
    - before planning the join, one cheap count-aggregation checks that
      no block exceeds ``max_block`` rows (~10^12 pairs at the 10^6
      default) and raises with guidance otherwise. Pass max_block=None
      to skip the pre-check when block sizes are known.
    """
    if block_col is _REQUIRED:
        raise TypeError(
            "ngram_jaccard_pairs requires an explicit block_col: name a "
            "blocking column, or pass block_col=None to accept the "
            "quadratic all-pairs product on a small input"
        )
    if max_block is not None:
        if block_col:
            biggest = (
                docs.groupBy(block_col).count().agg(F.max("count")).first()[0]
            )
        else:
            biggest = docs.count()
        if biggest and biggest > max_block:
            raise ValueError(
                f"largest {block_col or 'input'} block has {biggest} rows > "
                f"max_block={max_block}: the in-block self-join is "
                f"quadratic ({biggest * (biggest - 1) // 2} pairs). Use "
                "minhash_lsh_pairs(verify=True) for near-dup detection at "
                "this scale, or raise max_block deliberately."
            )
    with_sh = docs.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        word_shingles(text_col, shingle_k).alias("sh"),
    )
    l, r = with_sh.alias("l"), with_sh.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    if block_col:
        cond = (F.col(f"l.{block_col}") == F.col(f"r.{block_col}")) & cond
    pairs = l.join(r, cond).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        F.col("l.sh").alias("sh_a"),
        F.col("r.sh").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------- repeated-passage stats
#: Above this corpus size, ``strategy='auto'`` switches to the
#: AQE-skew-splittable join shape — with 10^6+ docs a single templated
#: boilerplate n-gram can plausibly occur millions of times, and the
#: window shape buffers that whole occurrence group in ONE task.
WINDOW_MAX_ROWS = 1_000_000


def repeated_ngram_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_repeats: int = 3,
    strategy: str = "auto",
    window_max_rows: int = WINDOW_MAX_ROWS,
    approx_rows: int | None = None,
) -> DataFrame:
    """Per-document coverage by corpus-level repeated n-grams — the
    duplicated-passage signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499),
    approximated at n-gram granularity instead of suffix arrays: an
    n-gram is HOT when it occurs >= ``min_repeats`` times corpus-wide;
    each doc reports how much of it is covered by hot n-grams. Docs with
    high ``hot_fraction`` are templated/boilerplate candidates; docs
    shorter than ``n`` words have no n-grams and drop out.

    Strategy tradeoff at corpus scale:

    - ``window``: ONE corpus scan; corpus counts come from a
      count-over-Window on the gram key, so occurrences shuffle once.
      An ultra-hot n-gram buffers its whole group in one window task
      (spills to disk — completes, but that task is the straggler).
    - ``join``: explode -> groupBy count (map-side partial combine keeps
      the count shuffle at distinct-gram volume) -> equi-join back.
      TWO corpus scans, but the hot-key join is AQE-skew-splittable,
      which is the safer shape when a handful of n-grams dominate a
      10^12-doc corpus.
    - ``auto`` (default): ``window`` when the corpus has at most
      ``window_max_rows`` docs, else ``join``. The scale-safe shape is
      the default: any corpus big enough for a boilerplate gram to
      produce a straggler-sized window group trips the threshold; the
      single-scan window plan stays the small-corpus fast path. The
      probe is one ``docs.count()`` — cheap on a bare parquet scan
      (footer metadata) but a FULL extra evaluation of a derived
      upstream plan; callers holding an expensive frame should pass
      ``approx_rows`` (any upstream estimate, rough is fine — it only
      picks a physical strategy) or an explicit strategy instead.

    Returns (id_col, n_grams, n_hot, hot_fraction).
    """
    from olake_spark.operators.text import ngrams_col

    if strategy == "auto":
        n_docs = approx_rows if approx_rows is not None else docs.count()
        strategy = "window" if n_docs <= window_max_rows else "join"
    from olake_spark.operators.text import fan_out_small_scan

    docs = fan_out_small_scan(docs)
    grams = docs.select(
        F.col(id_col), F.explode(ngrams_col(text_col, n)).alias("gram")
    )
    if strategy == "window":
        hot = (
            F.count("*").over(Window.partitionBy("gram")) >= min_repeats
        ).cast("int")
        joined = grams.select(F.col(id_col), hot.alias("_hot"))
    elif strategy == "join":
        counts = grams.groupBy("gram").agg(F.count("*").alias("_cnt"))
        joined = grams.join(counts, "gram").select(
            id_col, (F.col("_cnt") >= min_repeats).cast("int").alias("_hot")
        )
    else:
        raise ValueError(f"strategy must be 'window' or 'join', got {strategy!r}")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum("_hot").alias("n_hot"),
        F.round(F.sum("_hot") / F.count("*"), 6).alias("hot_fraction"),
    )


def drop_repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_repeats: int = 3,
) -> DataFrame:
    """Span-level exact-substring dedup — the actual Lee et al. 2022
    operation (arXiv:2107.06499 §ExactSubstr): REMOVE the duplicated
    span from every document, not just score the document. A word
    position is covered when any corpus-hot n-gram (>= ``min_repeats``
    occurrences corpus-wide) starts at most ``n-1`` words before it;
    covered positions are dropped and the survivors rejoined.

    Token conservation invariants (tested): ``n_words - n_dropped ==
    len(split(clean_text))`` per doc, every doc survives (possibly with
    empty clean_text), and docs shorter than ``n`` words pass through
    untouched.

    Scale shape (mirrors repeated_ngram_stats' join strategy): gram
    counts via explode -> groupBy (map-side partial combine), hot
    occurrences recovered by an AQE-skew-splittable equi-join on the
    gram, then ONE groupBy(doc) collects the per-doc hot-start list —
    bounded by the doc's own word count, never by corpus-wide gram
    frequency. At 10^12-doc scale, shuffle xxhash64(gram) instead of
    the gram string to cut shuffle bytes ~3x (collision odds are
    negligible); measured NOT faster at sf0.1 (hash compute exceeds the
    tiny-shuffle savings), so the oracle-exact string key stays. The
    span mask itself is pure Catalyst array logic in O(words +
    starts*n) per doc: covered indices enumerated from the hot starts,
    removed with one hash-set ``array_except`` (the arrays are
    materialized once per row; Spark evaluates higher-order functions
    interpreted, so each is referenced a single time)."""
    from olake_spark.operators.text import (
        fan_out_small_scan,
        ngrams_col,
        words_col,
    )

    docs = fan_out_small_scan(docs)
    base = docs.select(F.col(id_col), words_col(text_col).alias("_w"))
    grams = docs.select(
        F.col(id_col),
        F.posexplode(ngrams_col(text_col, n)).alias("_pos", "gram"),
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("_cnt"))
    hot = counts.filter(F.col("_cnt") >= min_repeats).select("gram")
    starts = (
        grams.join(hot, "gram")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_starts"))
    )
    out = base.join(starts, id_col, "left").withColumn(
        "_starts",
        F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
    )
    # covered-position mask in O(words + starts*n): enumerate the covered
    # index set from the hot starts (each start covers [s, s+n-1]), then
    # array_except — Spark's implementation builds a hash set over the
    # right side, so the per-word test is O(1) instead of the previous
    # O(starts) per word (F.exists over _starts was the suite's slowest
    # query at 10 s local sf0.1). array_except preserves left-arg order,
    # so surviving words rejoin in document order.
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("_starts"), lambda s: F.sequence(s, s + F.lit(n - 1))
            )
        )
    )
    all_idx = F.when(
        F.size("_w") > 0, F.sequence(F.lit(0), F.size("_w") - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    kept_idx = F.array_except(all_idx, covered)
    kept = F.transform(
        kept_idx, lambda i: F.element_at(F.col("_w"), i + F.lit(1))
    )
    # stage the kept array ONCE: it is referenced twice below, and
    # higher-order functions evaluate interpreted — an unstaged reference
    # re-runs the whole mask per use (CollapseProject keeps the staging
    # projection because the expression is non-cheap)
    staged = out.withColumn("_kept", kept)
    return staged.select(
        F.col(id_col),
        F.size("_w").alias("n_words"),
        (F.size("_w") - F.size("_kept")).alias("n_dropped"),
        F.array_join("_kept", " ").alias("clean_text"),
    )


# ------------------------------------------------------- semantic dedup
def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_cells: int = 16,
    seed: int = 7,
    sample_rows: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cells over the embedding space bound the
    pairwise work, within-cell cosine pairs above ``threshold`` form
    clusters (connected components), and one representative per cluster
    (the min id) is marked ``keep``.

    100 TB design: the codebook comes from a bounded driver-side sample
    (``sample_rows`` vectors); the full-table pass is one Arrow-batched
    assignment UDF, and pair generation is an equi-join on the cell id —
    quadratic only WITHIN a cell, and cell population is ~n/n_cells for
    k-means cells on non-degenerate data. At the 10^12 scale n_cells
    rises to ~100k (SemDeDup uses 50k clusters on LAION), keeping cells
    at ~10^7 rows, and the within-cell join distributes across tasks
    because it is a plain shuffle join on the cell key. A degenerate
    cell (mass of identical embeddings) is a skewed join key — AQE's
    skew-join split (enabled in session.py) chunks it across tasks,
    and the threshold filter is pipelined into the join so candidate
    pairs never materialize; the O(cell^2) comparison cost itself is
    inherent to SemDeDup and is bounded by raising n_cells. Components
    are pointer-doubling label propagation (O(log diameter) rounds).

    Returns (id_col, cluster_rep, keep) for every input row; singletons
    keep themselves.
    """
    from olake_spark.operators.similarity import ivf_bucket_udf, sample_codebook

    C = sample_codebook(emb, vec_col, n_cells, seed, sample_rows)
    if C is None:  # empty input: everything (nothing) keeps itself
        return emb.select(
            F.col(id_col),
            F.col(id_col).alias("cluster_rep"),
            F.lit(True).alias("keep"),
        )
    cell = ivf_bucket_udf(C)
    e = emb.withColumn("_cell", cell(F.col(vec_col)))
    pairs = embedding_near_dup_pairs(
        e, id_col, vec_col, block_col="_cell", threshold=threshold
    )
    clusters = near_dup_clusters(emb.select(id_col), pairs, id_col)
    return clusters.withColumn("keep", F.col(id_col) == F.col("cluster_rep"))


# ------------------------------------------------------- embedding near-dup
def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicates over an array<float> embedding column.

    Dot products via zip_with + aggregate (JVM, no UDF). Blocking keeps
    the join linear-ish; the LSH variant for unblocked data lives in
    operators/similarity.py.
    """
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    norm = lambda v: F.sqrt(dot(v, v))  # noqa: E731
    base = emb.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    l, r = base.alias("l"), base.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    if block_col:
        cond = (F.col(f"l.{block_col}") == F.col(f"r.{block_col}")) & cond
    pairs = l.join(r, cond)
    cos = dot(F.col("l.v"), F.col("r.v")) / (F.col("l.nrm") * F.col("r.nrm"))
    # threshold on the ROUNDED value: float32-product sums differ across
    # engines by ~1e-8 depending on summation order, so an exact-threshold
    # pair would flip in/out of the result nondeterministically
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
