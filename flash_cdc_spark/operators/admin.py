"""Admin/metadata relational operators — the reference's only classical
query surface (``app/routers/clients.py``), generalized into reusable
DataFrame combinators.

Reference parity map (SURVEY.md §2.6):

- Q1 predicate filter (ILIKE + equality)  → :func:`ilike_filter`
- Q2 sort + limit + offset pagination      → :func:`paginate`
- Q3 count with same predicates            → plain ``df.count()``
- Q4 point lookup                          → :func:`point_lookup`
- Q5 status left-outer join w/ defaults    → :func:`status_join`
- Q6 duplicate/uniqueness checks           → :func:`find_duplicates`
- Q7 upsert                                → :func:`upsert`
- P11 secret masking                       → :func:`mask_columns`

Scale notes: pagination uses a global sort — fine for metadata tables
(thousands of rows); ``status_join`` broadcasts the probe side, exactly
the reference's in-memory dict probe (``clients.py:152-188``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from flash_cdc_spark.functions.normalize import mask_secret

__all__ = [
    "ilike_filter",
    "paginate",
    "point_lookup",
    "status_join",
    "find_duplicates",
    "upsert",
    "mask_columns",
]


def ilike_filter(df: DataFrame, column: str, pattern: str | None) -> DataFrame:
    """Q1: case-insensitive substring match (`client_name ILIKE '%q%'`,
    ``clients.py:209-214``). ``None``/empty pattern → no-op."""
    if not pattern:
        return df
    return df.filter(F.col(column).ilike(f"%{pattern}%"))


def paginate(
    df: DataFrame, order_by: str | Sequence[str], limit: int = 50, offset: int = 0
) -> DataFrame:
    """Q2: ``ORDER BY ... LIMIT l OFFSET o`` (``clients.py:200-216``;
    limit default 50, capped 200 like the reference). The sort key must be
    a unique total order for deterministic pages."""
    limit = max(1, min(int(limit), 200))
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    out = df.orderBy(*cols)
    if offset:
        out = out.offset(int(offset))
    return out.limit(limit)


def point_lookup(df: DataFrame, key_col: str, key):
    """Q4: single-row fetch by primary key (``clients.py:31-35``);
    returns the Row or None (caller maps None → 404)."""
    rows = df.filter(F.col(key_col) == F.lit(key)).limit(1).collect()
    return rows[0] if rows else None


def status_join(
    config_df: DataFrame,
    status_df: DataFrame,
    key: str = "client_id",
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Q5: left-outer join of config rows against the (small, in-memory)
    status snapshot with per-column defaults for missing probes — the
    reference's dict-probe loop (``clients.py:152-188``) is literally a
    broadcast hash left-outer join.

    ``defaults`` maps status-side column → value to coalesce when no
    status row exists (reference default: ``{status:'stopped',
    running:false}``)."""
    defaults = defaults or {"status": "stopped", "running": False}
    joined = config_df.join(F.broadcast(status_df), on=key, how="left")
    for col_name, default in defaults.items():
        if col_name in status_df.columns:
            joined = joined.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
    return joined


def find_duplicates(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Q6: rows violating a uniqueness constraint over ``cols``
    (``clients.py:92-114``; DB constraint ``models.py:123-125``).
    Returns the key tuples with their duplicate counts (>1)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Q7: merge semantics over a config table without Delta: new rows
    replace same-key rows, others pass through (``clients.py:244-324``).
    Expressed as anti-join + union (a broadcastable pattern for small
    config tables; a production deployment would use Delta ``MERGE``)."""
    keep = target.join(updates.select(key), on=key, how="left_anti")
    # allowMissingColumns: a target table written by an older release
    # (fewer columns) must still accept upserts — the missing columns
    # null-fill on the old rows instead of raising NUM_COLUMNS_MISMATCH
    return keep.unionByName(updates, allowMissingColumns=True)


def mask_columns(df: DataFrame, cols: Sequence[str], keep_last: int = 4) -> DataFrame:
    """P11: masked read-DTO projection (``models.py:26-31``, ``206-221``)."""
    out = df
    for c in cols:
        out = out.withColumn(c, mask_secret(F.col(c), keep_last=keep_last))
    return out
