"""Relational batch-analytics inventory over the TPC-H-ish test tables.

The reference has almost no relational surface (SURVEY.md §2.6/§2.9) —
this module supplies the full classical-operator coverage the target
engine needs: scans with pushed-down predicates, hash/broadcast/
sort-merge joins, semi/anti joins, aggregations (incl. rollup/cube/
grouping sets, distinct aggs), window functions (ranking, running,
lag), sorts/top-k, set operations, pagination, and the admin
projections (masking, status join) generalized from the reference.

Every query is written with the DataFrame API (declarative; Catalyst
does pushdown/pruning/join-selection) and paired with a DuckDB oracle.

Scale notes (100 TB design point), applied throughout:

- dimension tables (``region``, ``nation``, ``supplier``) are joined
  with ``F.broadcast`` — no shuffle of the fact side;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  reuse it for the following aggregate when keys align;
- aggregates are expressed as ``groupBy().agg`` → map-side partial
  aggregation for free;
- top-k = ``orderBy().limit(k)`` → Spark's ``TakeOrderedAndProject``
  (per-partition heaps + driver merge, no global sort);
- filters appear before joins/explodes so they reach the parquet scan
  (verify with ``.explain``: ``PushedFilters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.admin import ilike_filter, mask_columns, paginate, status_join
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
                                                                  AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 2))) AS DOUBLE)
                                                                  AS sum_disc_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18, 2))
                         * CAST(1 - l_discount AS DECIMAL(18, 2))
                         AS DECIMAL(18, 4))
                    * CAST(1 + l_tax AS DECIMAL(18, 2))) AS DOUBLE)
                                                                  AS sum_charge,
           avg(l_quantity)                                        AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
               / count(*)                                         AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18, 2))) AS DOUBLE)
               / count(*)                                         AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter + 6-way aggregate. One shuffle on
    the (tiny-cardinality) grouping key; partial aggregation map-side.

    Money sums/averages accumulate in DECIMAL (exact, fold-order-free;
    r8 strict fix, second pass — raw double sums are a run-to-run dice
    roll under the driver's exact value hash); the quantity columns
    stay double because integral doubles sum exactly in any order.
    The three-factor charge product steps through DECIMAL(18,4) so
    both engines' precision rules keep the arithmetic exact."""
    li = _t(spark, sf_dir, "lineitem")
    # r11: NARROW decimal factors so the products stay Long-backed.
    # (18,2)×(18,2) infers decimal(37,4) — every row allocates a
    # JavaBigDecimal — while (14,2)×(3,2) infers decimal(18,4), which
    # Spark keeps in a compact long (measured ~15% off this query's
    # single-task aggregate; the same per-row cost repeats at any
    # scale). Exactness is unchanged: TPC-H bounds l_extendedprice
    # below 10^6 (fits (14,2) with 10^6 headroom) and discount/tax are
    # 2-dp values in [0, 0.11] (exact in (3,2)); values proven
    # identical by the strict oracle at both SFs.
    ep = F.col("l_extendedprice").cast("decimal(14,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    tax1 = (F.lit(1) + F.col("l_tax")).cast("decimal(3,2)")
    disc_price = ep * disc
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price.cast("decimal(14,4)") * tax1)
            .cast("double")
            .alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            (F.sum(ep).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(l_discount AS DECIMAL(18, 2))) AS DOUBLE)
               AS revenue,
           count(*)                          AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.08
      AND l_quantity < 25
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-down range scan + global aggregate —
    the plan should show all four predicates in PushedFilters."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.08))
            & (F.col("l_quantity") < 25)
        )
        .agg(
            # DECIMAL-accumulated (exact, fold-order-free; r8 strict
            # fix); narrow factors keep the product Long-backed (r11,
            # see q01 — TPC-H bounds make (14,2)×(3,2) exact)
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * F.col("l_discount").cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_distinct_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           count(*)                                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate (expand-based plan in Spark)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_rollup_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)          AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
                             AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (priority → status → grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "q_cube_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           count(*)        AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over the two flag dimensions."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)          AS n_orders,
           avg(o_totalprice) AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint single-column sets)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*)          AS n_orders,
               avg(o_totalprice) AS avg_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 2))) AS DOUBLE)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    customer (filtered) is broadcast; top-k is TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix) —
        # also pins the revenue-DESC top-k order across engines
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 2))) AS DOUBLE)
               AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; region/nation/supplier broadcast, the
    only shuffle joins are the two fact-fact edges."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 2))) AS DOUBLE)
               AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving zero-order customers, then
    a histogram over the per-customer counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18, 2))
                                  * CAST(1 - l_discount AS DECIMAL(18, 2))
                             ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                            * CAST(1 - l_discount AS DECIMAL(18, 2)))
                        AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast join + conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    # DECIMAL-accumulated numerator/denominator (exact, fold-order-free;
    # r8 strict fix); the ratio divides the two exact totals as doubles
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered semi join back onto the fact."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q_semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having >=1 finished order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all —
    the reference's uniqueness pre-check shape (clients.py:92-114)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_scalar_subquery_rich_dormant",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18, 2)))
                                   AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_scalar_subquery_rich_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # threshold = exact decimal total divided as a double (r8 strict
    # fix: a raw double avg is fold-order-sensitive and could flip
    # customers sitting on the threshold between engines)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
        .first()["a"]
    )
    return (
        c.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@query(
    "q_window_topk_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window (Spark optimizes the rn<=k
    filter into a per-partition top-k: WindowGroupLimit)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
           o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS delta_prev
    FROM orders
    """,
)
def q_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag delta per customer order history. The
    running sum accumulates in DECIMAL(18,2): windowed double sums are
    fold-order-dependent (DuckDB evaluates them with a segment tree, a
    different association than sequential accumulation — r8 strict
    sweep caught the last-ulp drift)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
    )


@query(
    "q_window_brand_price_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(price_rank AS INT) AS price_rank,
           round(p_retailprice - brand_avg, 6) AS price_vs_brand_avg
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               dense_rank() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC) AS price_rank,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18, 2)))
                        OVER (PARTITION BY p_brand) AS DOUBLE)
                   / count(*) OVER (PARTITION BY p_brand)      AS brand_avg
        FROM part
    )
    WHERE price_rank <= 2
    """,
)
def q_window_brand_price_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + partition-wide avg in one window pass."""
    p = _t(spark, sf_dir, "part")
    wr = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    wa = Window.partitionBy("p_brand")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.dense_rank().over(wr).alias("price_rank"),
            # brand mean = exact decimal window total / count (r8
            # strict fix; the raw window avg fold was a dice roll)
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).over(wa)
                .cast("double")
                / F.count(F.lit(1)).over(wa)
            ).alias("brand_avg"),
        )
        .filter(F.col("price_rank") <= 2)
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            "price_rank",
            F.round(F.col("p_retailprice") - F.col("brand_avg"), 6).alias("price_vs_brand_avg"),
        )
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "q_set_ops_nations",
    oracle="""
    SELECT 'both' AS tag, n_key FROM (
        SELECT DISTINCT c_nationkey AS n_key FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS n_key FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS tag, n_key FROM (
        SELECT DISTINCT c_nationkey AS n_key FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS n_key FROM supplier)
    """,
)
def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result, tagged."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_key")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_key")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n_key")
    cust_only = c.exceptAll(s).select(F.lit("customer_only").alias("tag"), "n_key")
    return both.unionByName(cust_only)


# --------------------------------------------------------------------------
# Admin surface (reference Q1/Q2/Q5 + P11 over stand-in tables)
# --------------------------------------------------------------------------

@query(
    "q_admin_filter_paginate",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_name ILIKE '%42%'
    ORDER BY c_custkey
    LIMIT 50 OFFSET 10
    """,
)
def q_admin_filter_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q1+Q2: ILIKE filter + ordered pagination
    (clients.py:197-227), over the customer stand-in table."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    return paginate(ilike_filter(c, "c_name", "42"), "c_custkey", limit=50, offset=10)


@query(
    "q_admin_masked_projection",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_name IS NULL OR length(c_name) = 0 THEN c_name
                WHEN length(c_name) <= 4 THEN repeat('*', length(c_name))
                ELSE repeat('*', length(c_name) - 4) || right(c_name, 4)
           END AS c_name,
           c_acctbal
    FROM customer
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def q_admin_masked_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P11: last-4 masking in the read DTO projection."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    return paginate(mask_columns(c, ["c_name"]), "c_custkey", limit=100)


@query(
    "q_admin_status_join",
    oracle="""
    SELECT c_custkey, c_name,
           coalesce(o.n_orders, 0)       AS n_orders,
           coalesce(o.last_status, 'none') AS last_status,
           coalesce(o.total_spend, 0.0)  AS total_spend
    FROM customer
    LEFT JOIN (
        SELECT o_custkey,
               count(*)          AS n_orders,
               max(o_orderstatus) AS last_status,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
                                 AS total_spend
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o.o_custkey
    """,
)
def q_admin_status_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q5 status join (clients.py:152-188): config rows left-
    joined to a probe-side summary with defaults for missing keys."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey"), F.col("c_name"))
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_orderstatus").alias("last_status"),
            # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )
    return status_join(
        c,
        o,
        key="c_custkey",
        defaults={"n_orders": 0, "last_status": "none", "total_spend": 0.0},
    )


@query(
    "q_window_frames_advanced",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ntile(4) OVER w_price AS INT)        AS price_quartile,
           percent_rank() OVER w_price               AS pct_rank,
           cume_dist() OVER w_price                  AS cume,
           first_value(o_orderkey) OVER w_time       AS first_order,
           last_value(o_orderkey) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                                     AS last_order,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) OVER
               (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
                RANGE BETWEEN 31536000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE)                           AS trailing_year_spend
    FROM orders
    WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
           w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_frames_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage beyond ranking: ntile, percent_rank,
    cume_dist, first/last_value with explicit ROWS frames, and a
    RANGE frame over epoch-ms (trailing-365-day running spend)."""
    o = _t(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-31_536_000_000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w_price).cast("int").alias("price_quartile"),
        F.percent_rank().over(w_price).alias("pct_rank"),
        F.cume_dist().over(w_price).alias("cume"),
        F.first("o_orderkey").over(w_time).alias("first_order"),
        F.last("o_orderkey")
        .over(w_time.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("last_order"),
        # DECIMAL windowed sum (r8 strict fix: DuckDB folds windowed
        # doubles with a segment tree, a different fold association)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_range)
        .cast("double")
        .alias("trailing_year_spend"),
    )


@query(
    "q_array_function_suite",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(toks) AS INT)                                   AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT)                    AS n_distinct,
           CAST(list_contains(toks, 'the') AS BOOLEAN)              AS has_the,
           list_sort(list_distinct(toks))[1]                        AS first_token_sorted,
           list_reverse_sort(list_distinct(toks))[1]                AS last_token_sorted,
           CAST(coalesce(list_position(toks, 'data'), 0) AS INT)    AS data_pos,
           CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT)  AS n_long_tokens,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS BIGINT)
                                                                    AS total_chars,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(toks,
               t -> t IN ('scan','join','sort')))), ','), '')       AS ops_present
    FROM base
    """,
)
def q_array_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function coverage: size, distinct, contains,
    sort (asc/desc), position (1-based), filter, transform+aggregate,
    and a filter→sort→join composition — all JVM-side, no explode."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("first_token_sorted"),
        F.element_at(F.reverse(F.array_sort(F.array_distinct(toks))), 1).alias(
            "last_token_sorted"
        ),
        F.array_position(toks, "data").cast("int").alias("data_pos"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.filter(toks, lambda t: t.isin("scan", "join", "sort")))
            ),
            ",",
        ).alias("ops_present"),
    )


@query(
    "q_cross_join_region_matrix",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region,
           (a.r_regionkey = b.r_regionkey) AS same_region
    FROM region a CROSS JOIN region b
    """,
)
def q_cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (cartesian) over a bounded dimension — the
    only safe cartesian shape at scale: both sides tiny, result 25 rows
    (fact-side cartesians are never allowed in this engine's queries)."""
    r = _t(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("ka"))
    b = r.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("kb"))
    return a.crossJoin(b).select(
        "from_region", "to_region", (F.col("ka") == F.col("kb")).alias("same_region")
    )
