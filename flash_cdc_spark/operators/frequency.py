"""Bounded-memory frequent-items (heavy hitters) — Misra-Gries
candidate pruning + exact verification.

At 100 TB a plain ``GROUP BY key`` over a high-cardinality column
shuffles every distinct key; when the question is only "which keys
exceed n/k of the stream", the Misra-Gries summary (Misra & Gries
1982, "Finding repeated elements") answers it with k counters per
partition and NO false negatives: if a value's global frequency
exceeds n/k, at least one partition must see it above its local
n_p/k (sum argument), so the union of per-partition MG(k) candidate
sets is a superset of the true heavy hitters.

The scalable exact shape is therefore two passes:

1. per-partition MG(k) via Arrow-batched ``mapInPandas`` — O(k)
   memory per task, emits at most k candidate values per partition
   (metadata-sized: partitions × k rows total);
2. exact count of ONLY the candidates (broadcast semi-join against
   the fact table) + the exact ``cnt * k > n`` filter — so the final
   answer is exact, independent of partitioning, and bit-comparable
   to a plain ``GROUP BY ... HAVING`` oracle.

The reference has no frequency-sketch surface; this is part of the
north-star gap list (SURVEY §2.9 / LLM-pipeline analytics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "misra_gries_candidates",
    "batch_frequent_candidates",
    "exact_heavy_hitters",
]


def batch_frequent_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct candidate values from a vectorized per-Arrow-batch
    frequency prune over ``df[col]`` — the default candidate pass.

    Per batch b of n_b rows, keep every value whose batch count
    satisfies ``cnt_b * k > n_b``. Superset guarantee by pigeonhole
    over batches: if a value's GLOBAL count satisfies ``cnt * k > n``
    but ``cnt_b * k <= n_b`` held in every batch, summing over batches
    would give ``cnt * k <= n`` — contradiction. At most k-1 values
    can exceed n_b/k within one batch, so output stays metadata-sized
    (batches × k rows before the distinct), and memory per task is
    bounded by the Arrow batch size — with the whole count done by
    ``pandas.value_counts`` (vectorized C path), not a per-row Python
    loop.

    Null handling: nulls are dropped before counting (a null key is
    not a reportable heavy hitter here — see ``exact_heavy_hitters``);
    n_b is taken after the drop, which only lowers the threshold and
    therefore preserves the superset guarantee.
    """
    field = df.schema[col]
    out_schema = f"`{field.name}` {field.dataType.simpleString()}"

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf[col].dropna()
            n_b = len(s)
            if n_b == 0:
                continue
            vc = s.value_counts()
            yield pd.DataFrame({col: vc.index[vc * k > n_b]})

    return df.select(col).mapInPandas(prune, schema=out_schema).distinct()


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct candidate values from a per-partition Misra-Gries(k)
    pass over ``df[col]``. Guaranteed superset of every value with
    global frequency > n/k; at most k rows per partition.

    This is the documented CONSTANT-MEMORY fallback (O(k) counters per
    task regardless of batch size); the default candidate pass is the
    vectorized ``batch_frequent_candidates`` — same superset
    guarantee, batch-bounded memory, no interpreted per-row loop.

    Null handling: MG tracks nulls like any other value (pandas NaN
    keys are dropped before emission — a null key cannot be a heavy
    hitter in any query here; the exact verify pass would drop it in
    the join anyway).
    """
    field = df.schema[col]
    out_schema = f"`{field.name}` {field.dataType.simpleString()}"

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        vals = [v for v in counters if not pd.isna(v)]
        yield pd.DataFrame({col: vals})

    return df.select(col).mapInPandas(mg, schema=out_schema).distinct()


def exact_heavy_hitters(
    df: DataFrame, col: str, k: int, method: str = "batch"
) -> DataFrame:
    """Exact values of ``col`` with frequency strictly above n/k,
    with their exact counts — computed via a bounded candidate prune
    (pass 1; ``method="batch"`` = vectorized per-batch prune, default;
    ``method="mg"`` = constant-memory Misra-Gries) + candidate-only
    exact count (pass 2). Output: ``(col, cnt)``; the
    integer-arithmetic filter ``cnt * k > n`` avoids float division.

    PRECONDITION — non-null keys: a NULL key is never reported (the
    candidate passes drop NaN and the equi-join in pass 2 drops null
    keys), whereas the documented ``GROUP BY ... HAVING`` equivalence
    would report a NULL group if nulls exceeded n/k; ``n_total``
    still counts null rows. Callers on null-bearing columns must
    filter or coalesce nulls first.
    """
    if method == "mg":
        cands = misra_gries_candidates(df, col, k)
    else:
        cands = batch_frequent_candidates(df, col, k)
    total = df.agg(F.count("*").alias("n_total"))
    counts = (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(col, "cnt")
    )
