"""Semantic units for r6 batch 4: referential audit detects injected
violations and passes clean data; decimal totals are partitioning-
invariant (exactness, not tolerance); dwell transitions conserve
event counts; bipartite projection edges are canonical and verified
against a recount."""

from __future__ import annotations

from pyspark.sql import functions as F

from flash_cdc_spark.queries.analytics_ext3 import (
    q_events_dwell_time,
    q_graph_bipartite_projection,
    q_quality_exact_decimal_totals,
    q_quality_referential_audit,
)
from flash_cdc_spark.tables import load_table


def test_referential_audit_clean_on_fixture(spark, sf_dir):
    out = {r["fk"]: r["n_violations"] for r in
           q_quality_referential_audit(spark, sf_dir).collect()}
    assert set(out) == {
        "lineitem->orders", "orders_without_lines", "orders->customer",
        "lineitem->supplier", "lineitem->part",
    }
    # The synthetic fixture is FK-clean on the reference joins but DOES
    # contain childless orders (orders with no lineitem rows) — the
    # audit must report them, not hide them.
    for fk in ("lineitem->orders", "orders->customer",
               "lineitem->supplier", "lineitem->part"):
        assert out[fk] == 0, (fk, out[fk])
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expected_childless = (
        o.select("o_orderkey").count()
        - li.select("l_orderkey").distinct().count()
    )
    assert out["orders_without_lines"] == expected_childless


def test_referential_audit_detects_injected_orphans(spark, sf_dir, tmp_path):
    d = tmp_path / "broken"
    d.mkdir()
    for t in ("orders", "customer", "supplier", "part"):
        load_table(spark, sf_dir, t).write.parquet(str(d / f"{t}.parquet"))
    li = load_table(spark, sf_dir, "lineitem")
    # corrupt 3 rows: point their orderkey at a key that can't exist
    bad = li.limit(3).withColumn("l_orderkey", F.lit(-999).cast("bigint"))
    li.unionByName(bad).write.parquet(str(d / "lineitem.parquet"))
    out = {r["fk"]: r["n_violations"] for r in
           q_quality_referential_audit(spark, str(d)).collect()}
    assert out["lineitem->orders"] == 3


def test_exact_decimal_totals_partitioning_invariant(spark, sf_dir, tmp_path):
    """The whole point of decimal aggregation: identical results under
    any partitioning (float sums would differ in the last ulps)."""
    base = {r["o_orderpriority"]: r["exact_total"] for r in
            q_quality_exact_decimal_totals(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    d = tmp_path / "repart"
    d.mkdir()
    o.repartition(17).write.parquet(str(d / "orders.parquet"))
    re = {r["o_orderpriority"]: r["exact_total"] for r in
          q_quality_exact_decimal_totals(spark, str(d)).collect()}
    assert base == re
    for v in base.values():
        whole, frac = v.split(".")
        assert len(frac) == 2


def test_dwell_transitions_conserve_counts(spark, sf_dir):
    out = q_events_dwell_time(spark, sf_dir).collect()
    n_transitions = sum(r["n_transitions"] for r in out)
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert n_transitions == n_events - n_users
    for r in out:
        assert r["avg_dwell_s"] >= 0.0
        assert r["max_dwell_s"] >= r["median_dwell_s"] >= 0.0


def test_bipartite_top_edge_recount(spark, sf_dir):
    out = q_graph_bipartite_projection(spark, sf_dir).collect()
    assert len(out) == 20
    for r in out:
        assert r["supp_a"] < r["supp_b"]
    weights = [r["n_shared_parts"] for r in out]
    assert weights == sorted(weights, reverse=True)
    top = out[0]
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    shared = (
        ps.filter(F.col("l_suppkey") == top["supp_a"])
        .select("l_partkey")
        .intersect(
            ps.filter(F.col("l_suppkey") == top["supp_b"]).select("l_partkey")
        )
        .count()
    )
    assert shared == top["n_shared_parts"]
