"""Salted join / two-phase aggregation must be result-identical to
their unsalted equivalents while splitting hot keys across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from flash_cdc_spark.operators.skew import salted_join, two_phase_agg, with_salt
from flash_cdc_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")  # user_id is the join key
    users = (
        events.select("user_id").distinct().withColumn("segment", F.col("user_id") % 3)
    )
    plain = (
        events.join(users, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    salted = (
        salted_join(events, users, on="user_id", unique_col="event_id", n_salts=8)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    p = {r["segment"]: (r["n"], round(r["v"], 6)) for r in plain.collect()}
    s = {r["segment"]: (r["n"], round(r["v"], 6)) for r in salted.collect()}
    assert p == s


def test_salt_spreads_hot_key(spark):
    # one pathological key with 1000 rows → salts must split it
    rows = [(i, "hot" if i < 1000 else f"k{i}") for i in range(1100)]
    df = spark.createDataFrame(rows, "row_id long, key string")
    salted = with_salt(df, "row_id", 8)
    dist = (
        salted.filter(F.col("key") == "hot")
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(dist) == 8  # all salts used
    assert max(r["count"] for r in dist) < 1000 * 0.3  # no salt holds the key


def test_two_phase_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r["l_returnflag"]: (round(r["s"], 4), r["n"], r["m"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.sum("l_linenumber").alias("n"),
            F.max("l_tax").alias("m"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (
            round(r["sum_l_quantity"], 4),
            r["sum_l_linenumber"],
            r["max_l_tax"],
        )
        for r in two_phase_agg(
            li,
            ["l_returnflag"],
            {"l_quantity": "sum", "l_linenumber": "sum", "l_tax": "max"},
            unique_col="l_orderkey",
            n_salts=8,
        ).collect()
    }
    assert set(salted) == set(direct)
    for flag, (s, n, m) in salted.items():
        ds, dn, dm = direct[flag]
        assert abs(s - ds) < 1e-3 and n == dn and m == dm
