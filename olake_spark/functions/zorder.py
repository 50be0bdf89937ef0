"""Vectorized Z-order and Hilbert-curve key computation.

The reference clusters data only by processing chunks in key order
(/root/reference/drivers/mongodb/internal/backfill.go:61-64); we generalize
to multi-dimensional space-filling-curve clustering. All math is numpy
bitwise ops over whole Arrow batches — no per-row Python (input_hint).

Public pieces:
- ``splitmix64_np``        — counter-based 64-bit hash (SplitMix64, public
  domain algorithm from Steele et al., "Fast Splittable PRNGs").
- ``interleave_bits_np``   — Morton/Z-order bit interleave of k uint arrays.
- ``hilbert_index_np``     — Hilbert index via Skilling's transpose
  algorithm ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004).
- ``make_cluster_key_udf`` — pandas UDF factory mapping Spark columns into
  a 63-bit curve key (numeric → min/max scale, string → hash or rank).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U64 = np.uint64


def splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer: uint64 array -> uint64 array."""
    x = x.astype(_U64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def interleave_bits_np(cols: list[np.ndarray], bits: int) -> np.ndarray:
    """Morton/Z-order interleave: k arrays of ``bits``-bit uints -> uint64.

    Bit layout: output bit (q*k + j) = bit q of column j, so column 0
    holds the least-significant position at each bit level. k*bits must
    be <= 63 so the result round-trips through a Spark LongType.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds 63-bit key budget")
    out = np.zeros(len(cols[0]), dtype=_U64)
    one = _U64(1)
    for q in range(bits):
        for j, c in enumerate(cols):
            out |= ((c.astype(_U64) >> _U64(q)) & one) << _U64(q * k + j)
    return out


def interleave_var_np(cols: list[np.ndarray], bits_list: list[int]) -> np.ndarray:
    """Variable-width Morton interleave: dim j contributes ``bits_list[j]``
    bits, MSB-first, level-interleaved.

    Uniform-width interleave wastes key budget on low-cardinality dims
    (a 20-category ``source`` padded to 21 bits spends 16 interleave
    slots on quantization noise, diluting every other dim's locality).
    Here level 0 takes every dim's MSB, level 1 the next bit of every
    dim that still has bits, and so on — dims exhaust early and the
    remaining levels refine only the wide dims. Output MSB-aligned
    within sum(bits_list) <= 63.
    """
    total = sum(bits_list)
    if total > 63:
        raise ValueError(f"{bits_list} sums to {total} > 63-bit key budget")
    n = len(cols[0])
    out = np.zeros(n, dtype=_U64)
    one = _U64(1)
    pos = total  # next output bit position + 1, filled from the top
    for level in range(max(bits_list)):
        for j, (c, bj) in enumerate(zip(cols, bits_list)):
            if level < bj:
                pos -= 1
                bit = (c.astype(_U64) >> _U64(bj - 1 - level)) & one
                out |= bit << _U64(pos)
    return out


def hilbert_index_np(cols: list[np.ndarray], bits: int) -> np.ndarray:
    """Hilbert curve index of k-dimensional points, each coord < 2**bits.

    Skilling's AxesToTranspose (vectorized over rows with numpy where),
    then bit-interleave of the transposed coords gives the index. The
    curve property (consecutive indices are grid neighbors) is verified
    against a brute-force oracle in tests/test_zorder_functions.py.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds 63-bit key budget")
    X = [c.astype(_U64, copy=True) for c in cols]
    M = _U64(1) << _U64(bits - 1)
    ALL = _U64(0xFFFFFFFFFFFFFFFF)

    # Inverse undo excess work — branchless: fm is an all-ones mask where
    # the Q bit is SET (invert branch), zero where clear (exchange
    # branch); everything is in-place XOR, no np.where triples.
    Q = M
    while Q > _U64(1):
        P = Q - _U64(1)
        for i in range(k):
            fm = ((X[i] & Q) >> _U64(int(Q).bit_length() - 1)) * ALL
            if i == 0:
                X[0] ^= P & fm  # invert branch only; self-exchange is a no-op
                continue
            t = (X[0] ^ X[i]) & P & ~fm  # exchange amount, 0 on invert branch
            X[0] ^= (P & fm) ^ t
            X[i] ^= t
        Q >>= _U64(1)

    # Gray encode
    for i in range(1, k):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > _U64(1):
        fm = ((X[k - 1] & Q) >> _U64(int(Q).bit_length() - 1)) * ALL
        t ^= (Q - _U64(1)) & fm
        Q >>= _U64(1)
    for i in range(k):
        X[i] ^= t

    # transposed form -> index: X[0] holds the MOST significant bit at
    # each level in Skilling's convention, so reverse for interleave.
    return interleave_bits_np(list(reversed(X)), bits)


@dataclass
class ClusterCol:
    """How one Spark column maps into curve space.

    kind:
      'numeric'     — linear min/max scale into [0, 2**bits)
      'hash'        — splitmix64 of the value (string or int), top bits;
                      right for high-cardinality ids (doc_id)
      'categorical' — rank in a sorted dictionary of distinct values;
                      right for low-cardinality keys (source)

    ``bits`` pins this dim's key width (zorder only); None = allocated
    by cardinality (see allocate_bits).
    """

    name: str
    kind: str = "numeric"
    lo: float | None = None  # numeric: domain min (from manifest stats)
    hi: float | None = None  # numeric: domain max
    categories: list[str] = field(default_factory=list)
    bits: int | None = None


def allocate_bits(specs: list[ClusterCol], budget: int = 63) -> list[int]:
    """Cardinality-aware key-bit allocation for the variable interleave.

    Uniform 63//k splits waste the budget: a 20-category source needs 5
    bits, not 21 — the padding dilutes every other dim's locality and
    directly costs manifest-stats pruning power. Widths:
    - categorical: ceil(log2(ncat)) (exact rank resolution);
    - numeric: FLEXIBLE (shares the remainder) unless ``spec.bits`` pins
      it — only the caller knows whether the column is integer-valued;
      a continuous float in [0,1] sized by its "span" would collapse to
      16 quantization levels. integer_span_bits() is the helper callers
      use to pin integer columns;
    - hash: flexible — splits whatever budget remains (>= 8 each).
    Explicit ``spec.bits`` wins. Falls back to uniform 63//k if the
    fixed dims alone would exceed the budget.
    """
    k = len(specs)
    widths: list[int | None] = []
    for s in specs:
        if s.bits is not None:
            widths.append(int(s.bits))
        elif s.kind == "categorical":
            ncat = max(len(s.categories), 2)
            widths.append(max(1, math.ceil(math.log2(ncat))))
        else:  # numeric (unpinned) and hash — flexible
            widths.append(None)
    fixed = sum(w for w in widths if w is not None)
    flex = [i for i, w in enumerate(widths) if w is None]
    if fixed + 8 * len(flex) > budget:
        return [budget // k] * k  # degenerate geometry: uniform fallback
    rem = budget - fixed
    for rank, i in enumerate(flex):
        share = rem // len(flex) + (1 if rank < rem % len(flex) else 0)
        widths[i] = share
    return [int(w) for w in widths]


def _encode_col(s: pd.Series, spec: ClusterCol, bits: int) -> np.ndarray:
    n_levels = 1 << bits
    if spec.kind == "numeric":
        lo = 0.0 if spec.lo is None else float(spec.lo)
        hi = lo + 1.0 if spec.hi is None else float(spec.hi)
        span = max(hi - lo, 1e-12)
        v = s.to_numpy(dtype=np.float64, na_value=lo)
        q = np.clip((v - lo) / span * n_levels, 0, n_levels - 1)
        return q.astype(_U64)
    if spec.kind == "hash":
        if s.dtype == object or str(s.dtype) == "string":
            # vectorized string hash: pandas' hash_pandas_object is a
            # C-level (cython) per-array hash — no Python-level loop.
            h = pd.util.hash_pandas_object(s.astype("string"), index=False).to_numpy(
                dtype=np.uint64
            )
        else:
            h = s.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
        return splitmix64_np(h) >> _U64(64 - bits)
    if spec.kind == "categorical":
        cats = pd.CategoricalDtype(categories=spec.categories, ordered=True)
        codes = s.astype(cats).cat.codes.to_numpy()
        ncat = max(len(spec.categories), 1)
        # spread ranks across the full bit range so the curve sees them
        # as well-separated coordinates
        q = (codes.clip(min=0).astype(np.float64) + 0.5) / ncat * n_levels
        return np.clip(q, 0, n_levels - 1).astype(_U64)
    raise ValueError(f"unknown ClusterCol kind: {spec.kind}")


def integer_span_bits(lo: float, hi: float, cap: int = 16) -> int:
    """Key width for an INTEGER-valued numeric dim: beyond
    ceil(log2(span+1)) extra bits encode nothing."""
    span = max(float(hi) - float(lo), 1.0)
    return min(cap, max(4, math.ceil(math.log2(span + 1))))


def curve_keys_np(
    series: list[pd.Series], specs: list[ClusterCol], curve: str
) -> np.ndarray:
    """Curve keys (int64) for aligned column Series — the shared kernel
    behind the executor-side pandas UDF AND driver-side boundary
    sampling (clustering reads a few files' key columns via pyarrow and
    quantiles these keys without launching a Spark job).

    zorder uses cardinality-aware variable widths (allocate_bits);
    hilbert needs a uniform per-dim width (Skilling's transform operates
    on a cube), so it stays at 63 // k.
    """
    k = len(specs)
    if curve == "zorder":
        widths = allocate_bits(specs)
        coords = [
            _encode_col(s, spec, b)
            for s, spec, b in zip(series, specs, widths)
        ]
        key = interleave_var_np(coords, widths)
    elif curve == "hilbert":
        bits = 63 // k
        coords = [_encode_col(s, spec, bits) for s, spec in zip(series, specs)]
        key = hilbert_index_np(coords, bits)
    else:
        raise ValueError(f"unknown curve: {curve}")
    return key.astype(np.int64)


def make_cluster_key_udf(specs: list[ClusterCol], curve: str = "zorder"):
    """Build a pandas UDF computing the curve key over the given columns.

    Returns (udf, input_col_names). zorder allocates per-dim widths by
    cardinality (allocate_bits); hilbert is uniform 63 // k.
    Usage::

        key_udf, cols = make_cluster_key_udf(specs, curve="hilbert")
        df = df.withColumn("_ckey", key_udf(*[F.col(c) for c in cols]))
    """
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve: {curve}")

    @F.pandas_udf(T.LongType())
    def curve_key(*series: pd.Series) -> pd.Series:
        return pd.Series(curve_keys_np(list(series), specs, curve))

    return curve_key, [s.name for s in specs]
