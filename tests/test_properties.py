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
