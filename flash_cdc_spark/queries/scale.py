"""Scale-hardening queries: explicit skew mitigation, driver-checked.

``operators/skew.py`` holds the mechanisms (deterministic salting,
two-phase aggregation); this module runs them against the benchmark
tables with a *deliberately pathological* key distribution so the
salted path is exercised end-to-end, oracle-checked, and visible to the
bench. The skew shape mirrors the real 100 TB hazard: one hot key
(a mega-customer, a default value, an empty string) holding most of a
fact table, which turns one reducer into the job's straggler unless the
key is split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.operators.skew import salted_join
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

N_SALTS = 16


@query(
    "q_skew_salted_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 4 <> 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(l_suppkey % 100 AS BIGINT) END AS hot_key,
               l_quantity, l_extendedprice
        FROM lineitem
    ),
    dim AS (
        SELECT CAST(unnest(range(100)) AS BIGINT) AS hot_key
    ),
    dim2 AS (
        SELECT hot_key,
               'seg_' || CAST(hot_key % 7 AS VARCHAR) AS segment
        FROM dim
    )
    SELECT segment,
           count(*)                          AS n_rows,
           sum(l_quantity)                   AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18, 2))), 2)
                AS DOUBLE)                       AS sum_price
    FROM fact JOIN dim2 USING (hot_key)
    GROUP BY segment
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted sort-merge join under a 75%-hot key.

    ~75% of lineitem rows collapse onto hot_key 0; an unsalted SMJ puts
    all of them in ONE shuffle partition (the straggler that kills a
    1000-executor job). ``salted_join`` re-keys the fact side with a
    deterministic salt in [0, 16) from the high-cardinality l_orderkey
    and replicates the dim ×16, so the hot key spreads across 16
    reducers; the result is provably identical to the unsalted join
    (the oracle computes exactly that). The merge hint pins SMJ — with
    a broadcastable dim the skew would be moot by definition; at the
    100 TB design point the dim side is itself too large to broadcast.
    Plan contract: tests/test_plan_contract.py asserts the shuffle key
    is (hot_key, _salt)."""
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(0).cast("bigint"))
        .otherwise((F.col("l_suppkey") % 100).cast("bigint"))
        .alias("hot_key"),
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
    )
    dim = spark.range(100).select(
        F.col("id").alias("hot_key"),
        F.concat(F.lit("seg_"), (F.col("id") % 7).cast("string")).alias("segment"),
    )
    joined = salted_join(
        fact, dim.hint("merge"), on="hot_key", unique_col="l_orderkey", n_salts=N_SALTS
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_price"),
    )
