"""Property-based tests (hypothesis) for the pure math: promotion
lattice laws and space-filling-curve invariants."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from olake_spark.functions.reformat import promote_type
from olake_spark.functions.zorder import (
    hilbert_index_np,
    interleave_bits_np,
    splitmix64_np,
)

_TYPES = [
    T.BooleanType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
    T.DateType(),
    T.TimestampType(),
]
type_st = st.sampled_from(_TYPES)


@given(type_st, type_st)
def test_promote_commutative(a, b):
    assert promote_type(a, b) == promote_type(b, a)


@given(type_st)
def test_promote_idempotent(a):
    assert promote_type(a, a) == a


@given(type_st, type_st)
def test_promote_is_upper_bound(a, b):
    """a ⊔ b absorbs both: promoting either input with the result is
    a no-op (lattice join property)."""
    j = promote_type(a, b)
    assert promote_type(a, j) == j
    assert promote_type(b, j) == j


@given(type_st, type_st, type_st)
@settings(max_examples=200)
def test_promote_associative(a, b, c):
    assert promote_type(promote_type(a, b), c) == promote_type(
        a, promote_type(b, c)
    )


@given(st.integers(min_value=2, max_value=3), st.integers(min_value=2, max_value=6),
       st.integers(min_value=0, max_value=2**32))
@settings(max_examples=50, deadline=None)
def test_curves_are_injective_on_random_points(k, bits, seed):
    rng = np.random.default_rng(seed)
    n = 200
    cols = [rng.integers(0, 1 << bits, n).astype(np.uint64) for _ in range(k)]
    z = interleave_bits_np(cols, bits)
    h = hilbert_index_np(cols, bits)
    # distinct points -> distinct keys, and keys stay inside k*bits bits
    zs = {}
    hs = {}
    for i, p in enumerate(zip(*[c.tolist() for c in cols])):
        if p in zs:
            assert zs[p] == z[i] and hs[p] == h[i]  # deterministic
        zs[p] = z[i]
        hs[p] = h[i]
    uniq_pts = len(zs)
    assert len(set(zs.values())) == uniq_pts  # injective
    assert len(set(hs.values())) == uniq_pts
    limit = 1 << (k * bits)
    assert int(z.max()) < limit and int(h.max()) < limit


@given(st.integers(min_value=0, max_value=2**63 - 1))
@settings(max_examples=100)
def test_splitmix_deterministic_scalarwise(x):
    a = splitmix64_np(np.array([x], dtype=np.uint64))
    b = splitmix64_np(np.array([x, x], dtype=np.uint64))
    assert a[0] == b[0] == b[1]


# ---------------------------------------------------------- round-2 additions
@given(
    st.lists(
        st.integers(min_value=1, max_value=20), min_size=1, max_size=4
    ),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_variable_interleave_is_bijective(widths, seed):
    """Distinct coordinate tuples map to distinct keys (the interleave
    is a bijection onto sum(widths) bits)."""
    from olake_spark.functions.zorder import interleave_var_np

    if sum(widths) > 20:  # keep the exhaustive check small
        widths = widths[:1]
    rng = np.random.default_rng(seed)
    n = 128
    cols = [
        rng.integers(0, 1 << w, n).astype(np.uint64) for w in widths
    ]
    keys = interleave_var_np(cols, widths)
    tuples = set(zip(*[c.tolist() for c in cols]))
    assert len(set(keys.tolist())) == len(tuples)


@given(st.integers(min_value=1, max_value=257))
@settings(max_examples=25)
def test_salts_route_every_bin(n_bins):
    """salts_for_bins must produce, for every bin b, a salt whose
    murmur3 lands on partition b — the exact-routing invariant."""
    from olake_spark.functions.partitioning import murmur3_int32, salts_for_bins

    salts = salts_for_bins(n_bins)
    assert len(salts) == n_bins
    for b, s in enumerate(salts):
        assert murmur3_int32(s) % n_bins == b


@given(
    st.lists(
        st.sampled_from(["categorical", "numeric", "hash"]),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=50)
def test_allocate_bits_within_budget_and_positive(kinds):
    from olake_spark.functions.zorder import ClusterCol, allocate_bits

    specs = []
    for i, kind in enumerate(kinds):
        if kind == "categorical":
            specs.append(
                ClusterCol(f"c{i}", "categorical", categories=[f"x{j}" for j in range(7)])
            )
        elif kind == "numeric":
            specs.append(ClusterCol(f"c{i}", "numeric", lo=0, hi=1000))
        else:
            specs.append(ClusterCol(f"c{i}", "hash"))
    w = allocate_bits(specs)
    assert len(w) == len(specs)
    assert all(x >= 1 for x in w)
    assert sum(w) <= 63


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40))
@settings(max_examples=50)
def test_packing_bin_math_conserves(ns):
    """FFD bin logic (pure python mirror of operators/packing.py):
    every sequence placed exactly once, bins never exceed the budget
    unless singleton-oversized."""
    block = 2048
    sizes = [n % 4096 for n in ns]
    bins = []
    for n in sorted(sizes, reverse=True):
        placed = None
        for b in bins:
            if b[0] >= n:
                placed = b
                break
        if placed is None:
            placed = [block, 0, 0]
            bins.append(placed)
        placed[0] -= n
        placed[1] += n
        placed[2] += 1
    assert sum(b[1] for b in bins) == sum(sizes)
    for rem, tok, cnt in bins:
        assert tok <= block or cnt == 1


def test_merge_and_changelog_match_dict_model(spark, tmp_path):
    """Model-based check: a seeded-random sequence of CDC batches
    (upserts, deletes, ghost deletes, interleaved compactions) applied
    through MERGE must leave the table equal to a plain dict model at
    every step, with per-batch counts and snapshot-changelog diffs
    matching the model's deltas exactly."""
    import random

    from pyspark.sql import functions as F

    from olake_spark.operators.changelog import CHANGE_TYPE, snapshot_changes
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT
    from olake_spark.table import Table

    rng = random.Random(20260817)
    universe = [f"d{i:04d}" for i in range(240)]

    def row(d, n):
        return (d, list(range(n)), n, f"src{hash(d) % 3}")

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    model: dict[str, int] = {d: rng.randint(1, 9) for d in rng.sample(universe, 120)}
    t = Table.create(spark, str(tmp_path / "model"))
    # bare payload frame: append must inject the system columns itself
    # (a NULL _olake_id here once made every later MERGE match nothing)
    t.append(
        spark.createDataFrame([row(d, n) for d, n in model.items()], schema)
        .repartition(5)
    )

    def table_state():
        return {r.doc_id: r.n_tok for r in t.scan().select("doc_id", "n_tok").collect()}

    assert table_state() == model
    for rnd in range(5):
        if rnd % 2 == 1:
            compact(t, target_file_bytes=1 << 20)
        prev_snap = t.current_snapshot_id
        prev_model = dict(model)

        keys = rng.sample(universe, 50)
        ups = {d: rng.randint(10, 99) for d in keys[:30]}
        dels = set(keys[30:])  # some exist in the model, some are ghosts
        batch = [row(d, n) + (None,) for d, n in ups.items()] + [
            row(d, 1) + ("del",) for d in dels
        ]
        bdf = spark.createDataFrame(
            batch, schema + ", _op string"
        ).withColumn(
            CDC_DELETED_AT,
            F.when(F.col("_op") == "del", F.current_timestamp()),
        ).drop("_op")

        res = merge_into(t, bdf, target_file_bytes=64 * 1024)
        exp_updated = len(set(ups) & set(prev_model))
        exp_deleted = len(dels & set(prev_model))
        exp_inserted = len(set(ups) - set(prev_model))
        assert (res.inserted, res.updated, res.deleted) == (
            exp_inserted, exp_updated, exp_deleted,
        ), f"round {rnd}"

        for d, n in ups.items():
            model[d] = n
        for d in dels:
            model.pop(d, None)
        assert table_state() == model, f"round {rnd}"

        got = {
            (r.doc_id, r[CHANGE_TYPE])
            for r in snapshot_changes(t.refresh(), prev_snap)
            .select("doc_id", CHANGE_TYPE)
            .collect()
        }
        want = (
            {(d, "insert") for d in set(model) - set(prev_model)}
            | {(d, "delete") for d in set(prev_model) - set(model)}
            | {
                (d, "update")
                for d in set(model) & set(prev_model)
                if True  # matched upserts rewrite the row (new insert time)
                and d in ups
            }
        )
        assert got == want, f"round {rnd}"
