"""sf0.1 parity tier for scale-sensitive rewrites (r7).

Why this exists: the driver's oracle gates run at sf0.001/sf0.01 —
small enough that Spark's range partitioner samples EXACTLY, so a
whole class of bugs (anything downstream of sampled boundaries,
partition counts, or AQE decisions that only engage past a size
threshold) is invisible to them. The r7 `with_global_order` defect was
exactly that: wrong and nondeterministic at sf0.1, green at both
oracle scales. This module pins each two-phase rewrite against its
naive single-partition definition AT sf0.1, where sampling is active.

These are the most expensive tests in the suite (~1-2 min total, full
sf0.1 scans); they buy the guarantee the oracle gates structurally
cannot.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flash_cdc_spark.queries import QUERIES
from flash_cdc_spark.tables import load_table

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def sf01_available():
    import os

    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    return SF01


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_rfm_matches_naive_ntile_at_sf01(spark, sf01_available):
    o = load_table(spark, SF01, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_d"))
    rfm = (
        o.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("ref_d"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            # r8: DECIMAL-accumulated, mirroring the query's strict fix
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    naive = (
        rfm.select(
            "o_custkey",
            "monetary",
            F.ntile(5)
            .over(Window.orderBy(F.col("recency_days").desc(), "o_custkey"))
            .alias("r_score"),
            F.ntile(5)
            .over(Window.orderBy(F.col("frequency").asc(), "o_custkey"))
            .alias("f_score"),
            F.ntile(5)
            .over(Window.orderBy(F.col("monetary").asc(), "o_custkey"))
            .alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.col("monetary").cast("decimal(38,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_monetary"),
            F.min("o_custkey").alias("min_custkey"),
        )
    )
    assert _rows(QUERIES["q_customer_rfm_segments"](spark, SF01)) == _rows(naive)


def test_equidepth_matches_naive_ntile_at_sf01(spark, sf01_available):
    o = load_table(spark, SF01, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    naive = (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_in_bucket"),
        )
    )
    assert _rows(QUERIES["q_stats_equidepth_histogram"](spark, SF01)) == _rows(naive)


def test_pareto_matches_naive_cumsum_at_sf01(spark, sf01_available):
    li = load_table(spark, SF01, "lineitem")
    # r8: DECIMAL-accumulated per-part revenue, mirroring the query's
    # strict fix (the raw double sum was the r7 red driver row)
    rev = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    cw = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tw = Window.partitionBy()
    dec = F.col("revenue").cast("decimal(38,2)")
    share = F.round(
        F.sum(dec).over(cw).cast("double") / F.sum(dec).over(tw).cast("double"),
        9,
    )
    naive = (
        rev.select(
            "l_partkey",
            "revenue",
            F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
            .alias("abc_class"),
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("revenue").cast("decimal(38,2)")).cast("double")
            .alias("class_revenue"),
            F.min("l_partkey").alias("min_partkey"),
        )
    )
    assert _rows(QUERIES["q_sales_pareto_abc"](spark, SF01)) == _rows(naive)


def test_sla_percentiles_match_bruteforce_at_sf01(spark, sf01_available):
    out = {
        r["label"]: r
        for r in QUERIES["q_events_sla_percentiles"](spark, SF01).collect()
    }
    vals = sorted(
        (r["value"], r["event_id"])
        for r in load_table(spark, SF01, "events")
        .filter(F.col("value").isNotNull())
        .select("value", "event_id")
        .collect()
    )
    n = len(vals)
    for q, label in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"), (0.999, "p999")):
        rank = math.ceil(q * n)
        assert out[label]["at_rank"] == rank
        assert abs(out[label]["value"] - round(vals[rank - 1][0], 6)) < 1e-9
