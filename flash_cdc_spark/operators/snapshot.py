"""Snapshot diff — the CDC reconciliation operator: given two
versions of a keyed table (yesterday's snapshot and today's, a source
extract and the warehouse mirror, pre- and post-backfill), emit the
row-level change set ``added / deleted / changed / unchanged`` plus
per-column change flags.

This is the audit twin of the engine's MERGE sinks (reference parity:
the latest-state table `streaming/upsert.py` maintains is exactly what
this operator verifies against a fresh extract — the standard
"reconcile the CDC mirror" job; cf. reference app/services/feed.py's
per-event upsert whose correctness such audits check in production).

Scale shape: ONE full-outer equi-join on the key (the only shuffle —
and zero-shuffle when both snapshots are bucketed/partitioned by the
key, which a CDC mirror is), column comparisons in whole-stage
codegen, and the downstream census a partial-aggregable groupBy over
4 change types. No hashing trick is used for row comparison —
column-wise null-safe equality is exact, type-faithful, and gives the
per-column counters for free (a concat-hash would be cheaper per byte
but loses column attribution and is collision-exposed at 100 TB row
counts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def _nse(a: Column, b: Column) -> Column:
    """Null-safe equality (both-null counts as equal)."""
    return a.eqNullSafe(b)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of two snapshot versions of the same table.

    Returns one row per key present in either snapshot with:

    - the key columns,
    - ``change_type``: ``added`` (key only in ``new``), ``deleted``
      (only in ``old``), ``changed`` (present in both, any compare
      column differs), ``unchanged``,
    - one ``chg_<col>`` int flag per compare column (1 when that
      column differs; always 0 for added/deleted rows — column
      attribution only makes sense for rows present on both sides).
    """
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, list(key_cols), "full_outer")
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    col_changed = {
        c: F.when(
            both & ~_nse(F.col(f"__old_{c}"), F.col(f"__new_{c}")), 1
        ).otherwise(0)
        for c in compare_cols
    }
    any_changed = None
    for flag in col_changed.values():
        any_changed = flag if any_changed is None else any_changed + flag
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(any_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_cols,
        change_type.alias("change_type"),
        *[flag.alias(f"chg_{c}") for c, flag in col_changed.items()],
    )
