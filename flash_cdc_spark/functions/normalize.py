"""Normalization expressions for the change-feed pipeline.

These are faithful Column-expression re-expressions of the reference's
dynamic-typing behaviors (no UDFs — pure ``F.when`` chains that stay
inside whole-stage codegen):

- :func:`normalize_commit_ms` — commit-timestamp unit inference
  (reference ``app/services/sf_pubsub.py:215-227``).
- :func:`truthy_flag` — lenient boolean coercion of the flag field
  (reference ``app/services/sf_pubsub.py:690-716``).
- :func:`mask_secret` — last-4 secret masking for admin read DTOs
  (reference ``app/models.py:26-31``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_commit_ms", "truthy_flag", "mask_secret", "TRUE_TOKENS", "FALSE_TOKENS"]

# Token sets from sf_pubsub.py:699-701 (lowercased, trimmed).
TRUE_TOKENS = ("true", "1", "yes", "y")
FALSE_TOKENS = ("false", "0", "no", "n", "")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_commit_ms(c: Column | str) -> Column:
    """Normalize an ambiguous epoch value to milliseconds.

    Unit heuristic (reference ``_normalize_commit_ms``,
    ``sf_pubsub.py:215-227``): ``> 1e14`` → nanoseconds (floor-div 1e6),
    ``> 1e11`` → already ms, ``> 1e9`` → seconds (×1000), else returned
    as-is ("small test values"). Non-integer input → null (``try_cast``).
    """
    x = _col(c).try_cast("bigint")
    # Integer floor-division via decimal: bigint `/` is double division and
    # loses exactness above 2^53, which would mis-floor large ns values.
    ns_to_ms = F.floor(x.cast("decimal(38,0)") / F.lit(1_000_000)).cast("bigint")
    return (
        F.when(x.isNull(), F.lit(None).cast("bigint"))
        .when(x > F.lit(10**14), ns_to_ms)
        .when(x > F.lit(10**11), x)
        .when(x > F.lit(10**9), x * F.lit(1000))
        .otherwise(x)
    )


def truthy_flag(c: Column | str) -> Column:
    """Lenient boolean normalization of a (string-typed) flag column.

    Mirrors the reference's normalization (``sf_pubsub.py:690-716``):

    - null → null,
    - trimmed+lowercased in ``{"true","1","yes","y"}`` → true,
    - in ``{"false","0","no","n",""}`` → false,
    - other *numeric* strings → Python ``bool(x)`` best-effort
      (non-zero → true),
    - anything else → null (the reference logs a warning and leaves the
      value un-normalized, which the strict ``IS TRUE`` filter then drops).

    The downstream filter must be ``flag IS TRUE`` — never ``flag`` or
    ``flag != false`` — to reproduce ``flash_field_normalized is not True``
    (``sf_pubsub.py:720``).

    Documented divergence (pinned in FIXTURES.md §2): the reference
    applies ``bool()`` only to values that arrive as JSON *numbers* and
    leaves unexpected *strings* (e.g. ``"2.5"``) un-normalized → dropped.
    Our envelope decode declares the flag column as string, so the JSON
    number/string distinction is gone by the time this runs; we therefore
    coerce any numeric-parsable token (``"2.5"`` and ``2.5`` alike) via
    the numeric branch. Tests and the oracle pin this behavior.
    """
    s = F.lower(F.trim(_col(c).cast("string")))
    num = s.try_cast("double")
    return (
        F.when(_col(c).isNull(), F.lit(None).cast("boolean"))
        .when(s.isin(*TRUE_TOKENS), F.lit(True))
        .when(s.isin(*FALSE_TOKENS), F.lit(False))
        .when(num.isNotNull(), num != F.lit(0.0))
        .otherwise(F.lit(None).cast("boolean"))
    )


def mask_secret(c: Column | str, keep_last: int = 4) -> Column:
    """Mask all but the last ``keep_last`` chars (reference ``_mask``,
    ``app/models.py:26-31``): null/empty pass through; short values are
    fully masked; otherwise stars + last-``keep_last`` suffix.
    """
    col = _col(c)
    n = F.length(col)
    return (
        F.when(col.isNull() | (n == 0), col)
        .when(n <= F.lit(keep_last), F.repeat(F.lit("*"), n))
        .otherwise(
            F.concat(
                F.repeat(F.lit("*"), (n - F.lit(keep_last)).cast("int")),
                F.substring(col, -keep_last, keep_last),
            )
        )
    )
