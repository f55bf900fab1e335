"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
the session factory) covers moderate skew at runtime; *salting* is the
explicit tool for pathological hot keys (one user id holding 10% of a
100 TB fact table):

- **salted_join**: fact side gets a deterministic salt in ``[0, n)``
  derived from a high-cardinality column; the dim side is replicated
  ×n with every salt value; the join key becomes (key, salt), splitting
  each hot key's rows across n reducers.
- **two_phase_agg**: aggregate first on (key, salt) — map-side +
  n-way-split partials — then re-aggregate on key. Works for any
  algebraic aggregate (sum/count/min/max).

Both are pure DataFrame transforms with deterministic salts (hash of a
unique column, never ``rand()`` — replay/retry safety in streaming).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_join", "two_phase_agg"]


def with_salt(df: DataFrame, unique_col: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): pmod(hash(unique_col), n).
    ``unique_col`` should be high-cardinality (row id), NOT the skewed
    key — hot-key rows must spread across salts."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def _replicate(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    # explode can't be nested inside a cast — generate then cast
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact ⋈ dim`` on ``on`` with the fact side salted and the
    dim side replicated ×``n_salts``: each hot key splits into n
    shuffle partitions instead of one straggler. Result is identical to
    the unsalted join (salt columns dropped)."""
    f = with_salt(fact, unique_col, n_salts)
    d = _replicate(dim, n_salts)
    return f.join(d, on=[on, "_salt"], how=how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: (keys, salt) partial → keys final.
    ``aggs`` maps column → one of sum/count/min/max (algebraic only;
    avg = sum+count composed by the caller)."""
    allowed = {"sum", "count", "min", "max"}
    if not set(aggs.values()) <= allowed:
        raise ValueError(f"two_phase_agg supports {allowed}")
    salted = with_salt(df, unique_col, n_salts)
    partial_exprs = []
    for col, fn in aggs.items():
        partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{col}"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    final_exprs = []
    for col, fn in aggs.items():
        refn = "sum" if fn in ("sum", "count") else fn  # partial counts re-sum
        final_exprs.append(getattr(F, refn)(f"_p_{col}").alias(f"{fn}_{col}"))
    return partial.groupBy(*keys).agg(*final_exprs)
