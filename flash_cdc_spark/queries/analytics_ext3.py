"""Operational analytics extensions (r6, batch 4): state-transition
dwell times, referential-integrity auditing, bipartite graph
projection, and exact decimal aggregation parity.

The referential audit and decimal-exactness queries are the data-
quality checks a warehouse runs on every load; dwell time extends the
Markov-transition family with duration semantics; the bipartite
projection is the co-engagement graph build that powers
"suppliers-who-also-supply" style recommendations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# ---------------------------------------------------------------------
# State-transition dwell time
# ---------------------------------------------------------------------


@query(
    "q_events_dwell_time",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS from_state, ts,
               lead(event_type) OVER w AS to_state,
               epoch_ms(lead(ts) OVER w) - epoch_ms(ts) AS gap_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT from_state, to_state,
           CAST(count(*) AS BIGINT) AS n_transitions,
           round(avg(gap_ms) / 1000.0, 4) AS avg_dwell_s,
           round(quantile_cont(gap_ms, 0.5) / 1000.0, 4) AS median_dwell_s,
           round(max(gap_ms) / 1000.0, 4) AS max_dwell_s
    FROM seq WHERE to_state IS NOT NULL
    GROUP BY from_state, to_state
    """,
)
def q_events_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time per state transition — the duration companion to
    ``q_events_markov_transitions``: for every (from → to) event-type
    pair, how long users actually sit in the source state (avg /
    median / max seconds). The transition matrix says where users go;
    dwell time says how fast — the pair feeds funnel latency SLAs and
    abandonment models.

    Shape: one user-partitioned window pass (lead of type and ts in
    the same sorted pass), then a partial-aggregatable groupBy on the
    (from, to) pair — types² output rows. Gaps are exact integer
    milliseconds; only the final divisions are floats. At 100 TB the
    window keys by user — uniform by construction — and the exact
    median over per-pair gaps swaps to ``approx_percentile``.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_state"),
        F.lead("event_type").over(w).alias("to_state"),
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias("gap_ms"),
    ).filter(F.col("to_state").isNotNull())
    return seq.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(F.avg("gap_ms") / 1000.0, 4).alias("avg_dwell_s"),
        F.round(F.expr("percentile(gap_ms, 0.5)") / 1000.0, 4).alias(
            "median_dwell_s"
        ),
        F.round(F.max("gap_ms") / 1000.0, 4).alias("max_dwell_s"),
    )


# ---------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------


@query(
    "q_quality_referential_audit",
    oracle="""
    WITH orphan_lines AS (
        SELECT count(*) AS c FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    ),
    childless AS (
        SELECT count(*) AS c FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)
    ),
    bad_cust AS (
        SELECT count(*) AS c FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c2
                          WHERE c2.c_custkey = o.o_custkey)
    ),
    bad_supp AS (
        SELECT count(*) AS c FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey)
    ),
    bad_part AS (
        SELECT count(*) AS c FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey)
    )
    SELECT 'lineitem->orders' AS fk, CAST(c AS BIGINT) AS n_violations
    FROM orphan_lines
    UNION ALL SELECT 'orders_without_lines', CAST(c AS BIGINT) FROM childless
    UNION ALL SELECT 'orders->customer', CAST(c AS BIGINT) FROM bad_cust
    UNION ALL SELECT 'lineitem->supplier', CAST(c AS BIGINT) FROM bad_supp
    UNION ALL SELECT 'lineitem->part', CAST(c AS BIGINT) FROM bad_part
    """,
)
def q_quality_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the constraint check a lakehouse
    runs on every load because parquet enforces nothing: count
    foreign-key violations across the star schema (orphaned lineitems,
    childless orders, dangling customer/supplier/part references).
    All-zeros is the expected PASS on consistent data; any non-zero
    row pinpoints the broken relationship.

    Shape: each branch is a LEFT ANTI join — the dimension sides
    (customer/supplier/part) broadcast; the orders↔lineitem pair
    shuffles once on the shared orderkey. Anti joins short-circuit per
    probe row and never materialize matches; each FK branch costs one
    scan of its fact side (lineitem is scanned once per audited
    relationship — fuse the three lineitem branches into one pass with
    three existence flags if the 100 TB scan dominates). Childless-
    orders anti-joins the aggregated DISTINCT line keys — dedup before
    the join, not after.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")

    def count_row(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("fk"), F.count(F.lit(1)).alias("n_violations")
        )

    orphan = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    childless = o.join(
        li.select("l_orderkey").distinct(),
        o.o_orderkey == F.col("l_orderkey"),
        "left_anti",
    )
    bad_cust = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
    bad_supp = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left_anti")
    bad_part = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_anti")
    out = count_row("lineitem->orders", orphan)
    for label, df in (
        ("orders_without_lines", childless),
        ("orders->customer", bad_cust),
        ("lineitem->supplier", bad_supp),
        ("lineitem->part", bad_part),
    ):
        out = out.unionAll(count_row(label, df))
    return out


# ---------------------------------------------------------------------
# Bipartite co-supply projection
# ---------------------------------------------------------------------


@query(
    "q_graph_bipartite_projection",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
               count(*) AS n_shared_parts
        FROM ps a JOIN ps b
          ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        GROUP BY a.l_suppkey, b.l_suppkey
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY n_shared_parts DESC,
                                     supp_a, supp_b) AS rk
        FROM pairs
    )
    SELECT CAST(rk AS INT) AS rk,
           CAST(supp_a AS BIGINT) AS supp_a,
           CAST(supp_b AS BIGINT) AS supp_b,
           CAST(n_shared_parts AS BIGINT) AS n_shared_parts
    FROM ranked WHERE rk <= 20
    """,
)
def q_graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite graph projection: project the part↔supplier bipartite
    graph onto suppliers — edge weight = number of co-supplied parts —
    the co-engagement build behind "users who bought X" / co-author /
    co-supply networks. Top-20 heaviest edges.

    Scale: the projection joins the DEDUPLICATED (part, supplier)
    incidence relation with itself on the part key, so the expansion
    per part is C(suppliers-per-part, 2) — bounded by the fact-table
    fanout (~30 lines/part in TPC-H shape → ≤435 pairs/part), NOT by
    corpus size; a hub part with huge degree is the known hazard and
    shows up first in ``q_maintenance_skew_report``. Pair counting is
    partial-aggregatable on the (a, b) key; the top-20 is TakeOrdered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    a = ps.alias("a")
    b = ps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"),
            F.col("b.l_suppkey").alias("supp_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_parts"))
    )
    rk_w = Window.orderBy(F.col("n_shared_parts").desc(), "supp_a", "supp_b")
    return (
        pairs.withColumn("rk", F.row_number().over(rk_w))
        .filter(F.col("rk") <= 20)
        .select(
            F.col("rk").cast("int").alias("rk"),
            "supp_a",
            "supp_b",
            "n_shared_parts",
        )
    )


# ---------------------------------------------------------------------
# Exact decimal aggregation parity
# ---------------------------------------------------------------------


@query(
    "q_quality_exact_decimal_totals",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38, 2))) AS VARCHAR)
               AS exact_total,
           CAST(min(CAST(o_totalprice AS DECIMAL(38, 2))) AS VARCHAR)
               AS min_price,
           CAST(max(CAST(o_totalprice AS DECIMAL(38, 2))) AS VARCHAR)
               AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_quality_exact_decimal_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal money totals — the financial-reconciliation
    aggregate where float drift is NOT acceptable: totals are summed
    in DECIMAL(38,2), where addition is exact and associative, so the
    result is bit-identical regardless of partitioning, add order, or
    engine — the property every float query in this repo approximates
    with rounding devices, delivered exactly here. Output as canonical
    strings so the cross-engine compare is representation-exact.

    Scale: Spark decimal sums are partial-aggregatable (Tungsten
    128-bit decimal accumulators inside codegen); one shuffle to the
    group key. This is the pattern ledger/billing pipelines must use
    at 100 TB — the docstring is the point: double-sum money drifts,
    decimal-sum money doesn't.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(38,2)")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec).cast("decimal(38,2)").cast("string").alias("exact_total"),
        F.min(dec).cast("string").alias("min_price"),
        F.max(dec).cast("string").alias("max_price"),
    )
