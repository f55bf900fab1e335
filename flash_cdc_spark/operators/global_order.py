"""Exact global rank / running sum without a single-partition sort.

``Window.orderBy(...)`` with no partition spec is the classic Spark
scale killer: Catalyst plans it as ``Exchange SinglePartition`` +
``Window`` — the ENTIRE input relation sorted and windowed on ONE
task. Fine for a bounded bucket/grid relation; fatal for anything
that grows with the corpus (per-customer, per-part, per-order rows at
100 TB are billions).

This module implements the scale-safe two-phase form as a reusable
operator, the same decomposition ``q_train_sequence_packing`` pioneered
for bucketed cumsums but generalized to ANY total order and made
skew-proof by range partitioning on the FULL composite sort key
(ties split across partitions by the unique tiebreak column, so a
value pile-up — a million customers with frequency=1 — cannot recreate
the single hot task):

1. ``repartitionByRange(buckets, *order)`` — Spark's range partitioner
   (seeded, deterministic sampling) splits the total order into
   ``buckets`` contiguous, parallel ranges.
2. A within-partition window ``partitionBy(spark_partition_id())``
   computes each row's running count/sum inside its range (parallel —
   every partition is its own window group).
3. Per-partition totals (one tiny ``groupBy`` over ≤ ``buckets`` rows)
   are turned into prefix offsets with a triangular self-join on the
   bounded totals relation — deliberately NOT a window, so the final
   plan contains NO ``Exchange SinglePartition`` feeding a ``Window``
   anywhere (the invariant ``tests/test_plan_audit.py`` now enforces
   registry-wide).
4. Offsets broadcast-join back on the partition id; global rank =
   within-rank + offset (and likewise for running sums).

Correctness does not depend on the range boundaries being balanced —
only on every row landing in exactly one range and ranges being
order-contiguous, which the partitioner guarantees; boundary placement
only affects parallelism. The whole composition is ONE DataFrame plan,
so the range exchange is planned once and reused across the totals and
main branches (ReusedExchange), not recomputed.

``global_ntile`` layers exact SQL NTILE semantics on top of the rank
(first ``n mod k`` buckets get ``ceil(n/k)`` rows), so queries keep
bit-identical cross-engine semantics with a DuckDB ``ntile`` oracle
while dropping the global sort.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_order", "global_ntile"]

_PID = "__go_pid"
_CNT = "__go_cnt"
_OFF = "__go_off"


def with_global_order(
    df: DataFrame,
    order: Sequence[Column | str],
    *,
    rank_col: str | None = None,
    sums: Mapping[str, Column] | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Attach exact 1-based global rank (``rank_col``) and/or exact
    global running sums (``sums``: out-name → value expression, summed
    in ``order`` with ROWS UNBOUNDED PRECEDING..CURRENT ROW frame) to
    ``df`` under the total order ``order``, with no single-partition
    window. ``order`` must be a total order (include a unique tiebreak
    column) — required anyway for deterministic rank/cumsum semantics.

    ``buckets`` bounds the offsets relation (and the parallelism of the
    within-range phase); at cluster scale raise it toward the shuffle
    partition count.
    """
    if rank_col is None and not sums:
        raise ValueError("request at least one of rank_col / sums")
    sums = dict(sums or {})

    # The ranged+pid frame feeds TWO consumers (the per-range window
    # and the totals aggregate). Without materialization, each consumer
    # may evaluate its own copy of the range exchange, and the range
    # partitioner SAMPLES its boundaries — exact only while the data is
    # small enough that the sample sees every row. Past that, two
    # evaluations can draw different boundaries, the partition ids the
    # offsets were computed for no longer match the ids the window saw,
    # and ranks silently mis-assign (caught at sf0.1 in r7: the chained
    # RFM output was wrong AND run-to-run nondeterministic while both
    # oracle scales — small enough for exact sampling — stayed green).
    # The eager localCheckpoint pins ONE materialized assignment that
    # both consumers read; the cost is one executor-disk write of the
    # relation, comparable to the shuffle itself.
    # Regression test: tests/test_global_order.py::
    # test_sampled_boundaries_stay_consistent (100k rows — large enough
    # that the range sampler actually samples).
    ranged = (
        df.repartitionByRange(buckets, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # Phase 1: within-range running aggregates (parallel window; the
    # hash exchange on the partition id keeps each range one group).
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = ranged
    if rank_col is not None:
        within = within.withColumn(rank_col, F.count(F.lit(1)).over(w))
    for out, expr in sums.items():
        within = within.withColumn(out, F.sum(expr).over(w))

    # Phase 2: per-range totals (≤ buckets rows) → prefix offsets via a
    # triangular self-join on the bounded relation — no window, so no
    # SinglePartition exchange feeds one.
    aggs = [F.count(F.lit(1)).alias(_CNT)] + [
        F.sum(expr).alias(f"__go_s_{out}") for out, expr in sums.items()
    ]
    totals = ranged.groupBy(_PID).agg(*aggs)
    a, b = totals.alias("__go_a"), totals.alias("__go_b")
    off_aggs = []
    if rank_col is not None:
        off_aggs.append(
            F.coalesce(F.sum(f"__go_b.{_CNT}"), F.lit(0)).alias(_OFF)
        )
    for out in sums:
        off_aggs.append(
            F.coalesce(F.sum(f"__go_b.__go_s_{out}"), F.lit(0)).alias(
                f"{_OFF}_{out}"
            )
        )
    offsets = (
        a.join(b, F.col(f"__go_b.{_PID}") < F.col(f"__go_a.{_PID}"), "left")
        .groupBy(F.col(f"__go_a.{_PID}").alias(_PID))
        .agg(*off_aggs)
    )

    out_df = within.join(F.broadcast(offsets), _PID)
    if rank_col is not None:
        out_df = out_df.withColumn(
            rank_col, (F.col(rank_col) + F.col(_OFF)).cast("bigint")
        )
    for out in sums:
        out_df = out_df.withColumn(out, F.col(out) + F.col(f"{_OFF}_{out}"))
    drop = [_PID] + ([_OFF] if rank_col is not None else []) + [
        f"{_OFF}_{out}" for out in sums
    ]
    return out_df.drop(*drop)


def global_ntile(rank: Column, n_total: Column, k: int) -> Column:
    """Exact SQL ``NTILE(k)`` bucket from a 1-based global rank and the
    total row count: the first ``n mod k`` buckets hold ``n div k + 1``
    rows, the rest ``n div k`` (degenerates to bucket = rank when
    ``n < k``, exactly as NTILE does). Pair with
    :func:`with_global_order` to get NTILE semantics — bit-identical to
    a ``ntile(k) OVER (ORDER BY ...)`` oracle — without its
    single-partition sort."""
    q = F.floor(n_total / k)
    rem = n_total % k
    boundary = rem * (q + 1)
    return (
        F.when(rank <= boundary, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((rank - boundary - 1) / q) + 1)
        .cast("int")
    )
