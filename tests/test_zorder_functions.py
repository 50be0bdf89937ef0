"""Pure-numpy tests for the space-filling-curve math (no Spark needed)."""

import numpy as np
import pytest

from olake_spark.functions.zorder import (
    hilbert_index_np,
    interleave_bits_np,
    splitmix64_np,
)


def test_splitmix64_deterministic_and_dispersed():
    x = np.arange(10_000, dtype=np.uint64)
    h1 = splitmix64_np(x)
    h2 = splitmix64_np(x)
    assert np.array_equal(h1, h2)
    assert len(np.unique(h1)) == len(h1)
    # top bits should be roughly uniform
    top = (h1 >> np.uint64(56)).astype(np.int64)
    counts = np.bincount(top, minlength=256)
    assert counts.std() < counts.mean()  # loose uniformity


def test_interleave_2d_matches_reference_morton():
    def morton2(x, y, bits):
        out = 0
        for q in range(bits):
            out |= ((x >> q) & 1) << (2 * q)
            out |= ((y >> q) & 1) << (2 * q + 1)
        return out

    bits = 8
    rng = np.random.default_rng(42)
    x = rng.integers(0, 1 << bits, 500).astype(np.uint64)
    y = rng.integers(0, 1 << bits, 500).astype(np.uint64)
    got = interleave_bits_np([x, y], bits)
    want = np.array([morton2(int(a), int(b), bits) for a, b in zip(x, y)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_interleave_budget_guard():
    with pytest.raises(ValueError):
        interleave_bits_np([np.zeros(1, np.uint64)] * 4, 16)


@pytest.mark.parametrize("k,bits", [(2, 3), (2, 5), (3, 3)])
def test_hilbert_is_a_hamiltonian_path_on_the_grid(k, bits):
    """Gold property: sorting grid cells by Hilbert index yields a path
    where consecutive cells are grid neighbors (Manhattan distance 1),
    and the index is a bijection onto [0, 2**(k*bits))."""
    side = 1 << bits
    grids = np.meshgrid(*[np.arange(side, dtype=np.uint64)] * k, indexing="ij")
    coords = [g.ravel() for g in grids]
    idx = hilbert_index_np(coords, bits)
    n = side**k
    assert sorted(idx.tolist()) == list(range(n))  # bijection
    order = np.argsort(idx)
    pts = np.stack(coords, axis=1).astype(np.int64)[order]
    step = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    assert (step == 1).all()  # every consecutive pair is a neighbor


def test_hilbert_locality_beats_random_order():
    """Average index-distance of grid neighbors should be far smaller
    than for a random labeling (locality sanity check)."""
    bits = 5
    side = 1 << bits
    xs, ys = np.meshgrid(np.arange(side, dtype=np.uint64), np.arange(side, dtype=np.uint64))
    x, y = xs.ravel(), ys.ravel()
    idx = hilbert_index_np([x, y], bits).astype(np.int64).reshape(side, side)
    horiz = np.abs(np.diff(idx, axis=1)).mean()
    rng = np.random.default_rng(0)
    rand = rng.permutation(side * side).reshape(side, side)
    rand_horiz = np.abs(np.diff(rand, axis=1)).mean()
    assert horiz < rand_horiz / 5


def test_variable_interleave_uniform_case_is_morton():
    """With equal widths, the variable interleave is a Morton code —
    verify against a brute-force per-bit reference (MSB-first layout)."""
    from olake_spark.functions.zorder import interleave_var_np

    rng = np.random.default_rng(3)
    bits = 5
    x = rng.integers(0, 1 << bits, 64).astype(np.uint64)
    y = rng.integers(0, 1 << bits, 64).astype(np.uint64)
    got = interleave_var_np([x, y], [bits, bits])
    want = np.zeros(64, dtype=np.uint64)
    pos = 2 * bits
    for level in range(bits):
        for c in (x, y):
            pos -= 1
            want |= ((c >> np.uint64(bits - 1 - level)) & np.uint64(1)) << np.uint64(pos)
    assert (got == want).all()


def test_variable_interleave_narrow_dim_dominates_top_bits():
    """A 2-bit categorical's rank must control the top of the key while
    a 10-bit dim refines below — sorting by key groups by category."""
    from olake_spark.functions.zorder import interleave_var_np

    cat = np.array([0, 1, 2, 3] * 8, dtype=np.uint64)
    fine = np.arange(32, dtype=np.uint64) * 31 % 1024
    key = interleave_var_np([cat, fine], [2, 10])
    # top-level bit of the key is the categorical MSB
    assert ((key >> np.uint64(11)) & np.uint64(1) == (cat >> np.uint64(1))).all()
    # budget guard
    with pytest.raises(ValueError):
        interleave_var_np([cat, fine], [32, 32])


def test_allocate_bits_cardinality_aware():
    from olake_spark.functions.zorder import (
        ClusterCol,
        allocate_bits,
        integer_span_bits,
    )

    assert integer_span_bits(8, 1024) == 10  # ceil(log2(1016 + 1))
    specs = [
        ClusterCol("source", "categorical", categories=[f"s{i}" for i in range(20)]),
        ClusterCol("n_tok", "numeric", lo=8, hi=1024,
                   bits=integer_span_bits(8, 1024)),
        ClusterCol("doc_id", "hash"),
    ]
    w = allocate_bits(specs)
    assert w[0] == 5          # ceil(log2(20))
    assert w[1] == 10         # pinned integer span
    assert w[2] == 63 - 15    # hash takes the remainder
    assert sum(w) <= 63
    # UNPINNED numeric is flexible (a float score in [0,1] must not
    # collapse to 4 bits): it splits the remainder with the hash dim
    free = [
        ClusterCol("score", "numeric", lo=0.0, hi=1.0),
        ClusterCol("doc_id", "hash"),
    ]
    wf = allocate_bits(free)
    assert min(wf) >= 31 and sum(wf) <= 63
    # explicit pin wins
    specs[0].bits = 7
    assert allocate_bits(specs)[0] == 7
