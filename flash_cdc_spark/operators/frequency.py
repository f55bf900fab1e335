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

__all__ = ["misra_gries_candidates", "exact_heavy_hitters"]


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct candidate values from a per-partition Misra-Gries(k)
    pass over ``df[col]``. Guaranteed superset of every value with
    global frequency > n/k; at most k rows per partition.

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


def exact_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact values of ``col`` with frequency strictly above n/k,
    with their exact counts — computed via the MG candidate prune
    (pass 1) + candidate-only exact count (pass 2). Output:
    ``(col, cnt)``; the integer-arithmetic filter ``cnt * k > n``
    avoids any float division."""
    cands = misra_gries_candidates(df, col, k)
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
