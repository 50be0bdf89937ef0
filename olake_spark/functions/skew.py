"""Salted-skew join — explicit hot-key handling (north_star: "salted-skew
handling for hot sources").

AQE's skew-join splitter handles skew it can SEE (sort-merge joins with
oversized partitions); a pathologically hot key in a shuffled join still
funnels through few tasks when AQE is off or thresholds miss. Classic
salting fixes it structurally:

- the BIG side gets a deterministic per-row salt in [0, n_salts)
  (xxhash64 over all columns — no rand(), so retried tasks recompute the
  same salt and resumability holds);
- the SMALL side is replicated n_salts times (explode);
- the equi-join runs on (key, salt): the hot key's rows spread across
  n_salts reduce tasks instead of one.

Cost model: small side bytes x n_salts extra shuffle — choose n_salts ~
(hot-key rows / target rows-per-task). Results are exactly the plain
join's (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_skew_salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic row salt: uniform, stable across task retries."""
    return df.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the (small) side with every salt value."""
    return df.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot-key shuffle spread across ``n_salts`` tasks.

    Output columns = plain ``big.join(small, on, how)`` (salt dropped).
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, n_salts)
    s = replicate_salts(small, n_salts)
    return b.join(s, keys + [SALT], how).drop(SALT)


def salted_hot_group_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase (salted partial -> final) count per key. Spark's own
    map-side partial aggregation usually makes this unnecessary for
    algebraic aggregates — it exists for HLL-style or collecting aggs
    where partials are large; the two-phase shape is the documented
    pattern."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, SALT).agg(F.count("*").alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("cnt"))
