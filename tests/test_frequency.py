"""Misra-Gries heavy hitters: candidate-superset guarantee + exactness
of the verified result, independent of partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from flash_cdc_spark.operators.frequency import (
    batch_frequent_candidates,
    exact_heavy_hitters,
    misra_gries_candidates,
)


def _skewed_df(spark, n_parts: int):
    # 3 heavy keys (about 30%/15%/8% of 2000 rows) + 500 long-tail keys
    rows = (
        [(1,)] * 600
        + [(2,)] * 300
        + [(3,)] * 160
        + [(1000 + i % 500,) for i in range(940)]
    )
    return spark.createDataFrame(rows, "user_id bigint").repartition(n_parts)


def test_mg_candidates_superset_of_heavy_hitters(spark):
    df = _skewed_df(spark, n_parts=7)
    k = 20  # threshold n/k = 100 -> true heavy hitters {1, 2, 3}
    cands = {r.user_id for r in misra_gries_candidates(df, "user_id", k).collect()}
    exact = {
        r.user_id
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") * k > df.count())
        .collect()
    }
    assert exact == {1, 2, 3}
    assert exact <= cands  # MG never drops a true heavy hitter
    # candidate set stays metadata-sized: <= partitions * k
    assert len(cands) <= 7 * k


def test_batch_candidates_superset_of_heavy_hitters(spark):
    df = _skewed_df(spark, n_parts=7)
    k = 20  # threshold n/k = 100 -> true heavy hitters {1, 2, 3}
    cands = {
        r.user_id for r in batch_frequent_candidates(df, "user_id", k).collect()
    }
    exact = {
        r.user_id
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") * k > df.count())
        .collect()
    }
    assert exact == {1, 2, 3}
    assert exact <= cands  # per-batch prune never drops a true heavy hitter


def test_exact_heavy_hitters_both_methods_agree(spark):
    df = _skewed_df(spark, n_parts=5)
    k = 20
    batch = {
        (r.user_id, r.cnt)
        for r in exact_heavy_hitters(df, "user_id", k, method="batch").collect()
    }
    mg = {
        (r.user_id, r.cnt)
        for r in exact_heavy_hitters(df, "user_id", k, method="mg").collect()
    }
    assert batch == mg and batch


def test_exact_heavy_hitters_matches_plain_groupby_any_partitioning(spark):
    for n_parts in (1, 3, 13):
        df = _skewed_df(spark, n_parts=n_parts)
        k = 20
        got = {
            (r.user_id, r.cnt)
            for r in exact_heavy_hitters(df, "user_id", k).collect()
        }
        want = {
            (r.user_id, r.c)
            for r in df.groupBy("user_id")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") * k > df.count())
            .collect()
        }
        assert got == want


def test_mg_handles_empty_and_all_distinct(spark):
    empty = spark.createDataFrame([], "user_id bigint")
    assert misra_gries_candidates(empty, "user_id", 5).count() == 0
    distinct = spark.createDataFrame([(i,) for i in range(100)], "user_id bigint")
    # no key exceeds n/k -> exact result is empty even though MG emits candidates
    assert exact_heavy_hitters(distinct, "user_id", 5).count() == 0
