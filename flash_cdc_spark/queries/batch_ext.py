"""Extended relational coverage: correlated subqueries, OR-predicate
pushdown, nested EXISTS/NOT EXISTS, group-filtered aggregates, and a
scalar-function suite — the rest of the classical surface a user would
expect (SURVEY.md §2.9 gap list)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS with an inequality on both sides →
    left-semi join on (orderkey) with the date comparison in the join
    condition."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH supp_value AS (
        SELECT l_suppkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                        * CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE)
                   AS value
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, value
    FROM supp_value
    WHERE value > (SELECT 0.02 * CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                                          * CAST(l_quantity AS DECIMAL(18, 2)))
                                      AS DOUBLE)
                   FROM lineitem)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: aggregate vs a scalar-subquery fraction of the
    global aggregate. DECIMAL-accumulated (exact, fold-order-free; r8
    strict fix); both sides compare identical doubles derived from the
    exact decimal totals, so the threshold cannot split across
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    val = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    total = li.agg(val.alias("t")).first()["t"]
    return (
        li.groupBy("l_suppkey")
        .agg(val.cast("double").alias("value"))
        .filter(F.col("value") > F.lit(0.02) * F.lit(float(total)))
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 20
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count per part attribute group."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average) → join
    against a pre-aggregated per-part threshold (the decorrelated plan
    Catalyst/DuckDB both choose)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            # DECIMAL-accumulated money sum (exact, fold-order-free),
            # divided as a double of identical operands (r8 strict fix)
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 2))) AS DOUBLE)
               AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute predicate across both join
    sides (tests OR handling through the join)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q21_waiting_orders",
    oracle="""
    SELECT l_suppkey, count(*) AS n_waiting
    FROM lineitem l1
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY l_suppkey
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact with
    inequality correlation (semi + anti join stack)."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    step1 = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    step2 = step1.alias("l1").join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return step2.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_waiting"))


@query(
    "q_scalar_function_suite",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                      AS pri_upper,
           substr(o_orderpriority, 1, 1)               AS pri_code,
           length(o_orderpriority)                     AS pri_len,
           abs(o_totalprice - 100000.0)                AS dist_100k,
           round(o_totalprice, 1)                      AS price_r1,
           CAST(floor(o_totalprice / 1000) AS BIGINT)  AS price_k,
           CAST(ceil(o_totalprice / 1000) AS BIGINT)   AS price_k_up,
           CAST(extract(year FROM o_orderdate) AS BIGINT)  AS order_year,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(extract(day FROM o_orderdate) AS BIGINT)   AS order_day,
           coalesce(NULL, o_orderstatus, 'X')          AS status_nz,
           CASE WHEN o_totalprice > 150000 THEN 'large'
                WHEN o_totalprice > 50000  THEN 'medium'
                ELSE 'small' END                       AS size_class,
           concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
           replace(o_orderpriority, '-', '_')          AS pri_snake,
           trim('  pad  ')                             AS trimmed,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0')  AS key_padded,
           greatest(o_totalprice, 100000.0)            AS at_least_100k,
           least(o_totalprice, 100000.0)               AS at_most_100k,
           power(2.0, 10)                              AS p1024,
           sqrt(abs(o_totalprice))                     AS price_sqrt,
           CAST(trunc(o_totalprice) AS BIGINT)         AS price_int
    FROM orders
    ORDER BY o_orderkey
    LIMIT 500
    """,
)
def q_scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function coverage: string/math/date/conditional builtins
    with engine-portable semantics (everything here is whole-stage
    codegen JVM intrinsics — the fast path UDF users should target)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("pri_upper"),
            F.substring("o_orderpriority", 1, 1).alias("pri_code"),
            F.length("o_orderpriority").alias("pri_len"),
            F.abs(F.col("o_totalprice") - 100000.0).alias("dist_100k"),
            F.round(F.col("o_totalprice"), 1).alias("price_r1"),
            F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k"),
            F.ceil(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k_up"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
            F.coalesce(F.lit(None), F.col("o_orderstatus"), F.lit("X")).alias("status_nz"),
            F.when(F.col("o_totalprice") > 150000, "large")
            .when(F.col("o_totalprice") > 50000, "medium")
            .otherwise("small")
            .alias("size_class"),
            F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
                "status_pri"
            ),
            F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("pri_snake"),
            F.trim(F.lit("  pad  ")).alias("trimmed"),
            F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
            F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("at_least_100k"),
            F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("at_most_100k"),
            F.pow(F.lit(2.0), F.lit(10)).alias("p1024"),
            F.sqrt(F.abs("o_totalprice")).alias("price_sqrt"),
            F.col("o_totalprice").cast("bigint").alias("price_int"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "q07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18, 2))
                   * CAST(1 - l_discount AS DECIMAL(18, 2)) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year
    (double nation join with a disjunctive pair predicate)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            # DECIMAL-accumulated (exact, fold-order-free): the raw
            # double sum was a run-to-run dice roll — it passed the r8
            # pre-flight sweep and failed the re-run on a different
            # task-completion fold order (r8 strict fix, second pass)
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q08_market_share",
    oracle="""
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                AS DOUBLE)
               / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18, 2))
                   * CAST(1 - l_discount AS DECIMAL(18, 2)) AS volume,
               n2.n_name AS nation
        FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA'
          AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's supplier market share inside one
    customer region, by order year (conditional share aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # DECIMAL-accumulated numerator/denominator (exact, fold-order-free;
    # r8 strict fix); the share divides the two exact totals as doubles
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q_full_outer_nation_presence",
    oracle="""
    WITH cust_n AS (
        SELECT c_nationkey AS nkey, count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    supp_n AS (
        SELECT s_nationkey AS nkey, count(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cust_n.nkey, supp_n.nkey) AS nkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers,
           CASE WHEN cust_n.nkey IS NULL THEN 'suppliers_only'
                WHEN supp_n.nkey IS NULL THEN 'customers_only'
                ELSE 'both' END AS presence
    FROM cust_n FULL OUTER JOIN supp_n ON cust_n.nkey = supp_n.nkey
    """,
)
def q_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nation presence across two aggregates with
    null-side classification + coalesced defaults."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = c.join(s, c.c_nkey == s.s_nkey, "full_outer")
    return joined.select(
        F.coalesce("c_nkey", "s_nkey").alias("nkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.when(F.col("c_nkey").isNull(), "suppliers_only")
        .when(F.col("s_nkey").isNull(), "customers_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "q_multiset_ops",
    oracle="""
    SELECT 'intersect_all' AS op, l_returnflag, l_linestatus FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 3
        INTERSECT ALL
        SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.09
    )
    UNION ALL
    SELECT 'except_all' AS op, l_returnflag, l_linestatus FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 3
        EXCEPT ALL
        SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.09
    )
    """,
)
def q_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) semantics: INTERSECT ALL / EXCEPT ALL preserve
    duplicate multiplicities — counts, not just membership."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 3).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_discount") > 0.09).select("l_returnflag", "l_linestatus")
    inter = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "*")
    diff = a.exceptAll(b).select(F.lit("except_all").alias("op"), "*")
    return inter.unionByName(diff)


@query(
    "q_null_semantics",
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P')            AS status_or_null,
               CASE WHEN o_totalprice < 2000 THEN NULL
                    ELSE o_totalprice END            AS price_or_null
        FROM orders WHERE o_orderkey < 3000
    )
    SELECT o_orderkey, status_or_null,
           coalesce(status_or_null, '?')             AS status_nz,
           (status_or_null IS NOT DISTINCT FROM 'F') AS is_f_nullsafe,
           (price_or_null IS NULL)                   AS price_missing,
           CAST(row_number() OVER (PARTITION BY status_or_null
                              ORDER BY price_or_null ASC NULLS FIRST,
                              o_orderkey) AS INT)    AS rn_nulls_first,
           CAST(row_number() OVER (PARTITION BY status_or_null
                              ORDER BY price_or_null DESC NULLS LAST,
                              o_orderkey) AS INT)    AS rn_nulls_last
    FROM o
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics suite: nullif, null-safe equality (<=> / IS NOT
    DISTINCT FROM), *explicit* null ordering — Spark defaults to
    NULLS FIRST ascending while DuckDB defaults NULLS LAST, so portable
    queries must always spell it out (as these do) — and null window
    PARTITIONING: both engines group all NULL partition keys into ONE
    window partition (grouping semantics, not join semantics), which
    the per-status row numbers exercise directly.

    r7: the row-number windows are partitioned by ``status_or_null``
    (VERDICT r6 item #3 cleanup) — the r6 form ranked the whole
    filtered relation through one partition; partitioned ranks keep
    every null-ordering behavior under test while planning parallel.
    """
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 3000)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
            F.when(F.col("o_totalprice") < 2000, F.lit(None))
            .otherwise(F.col("o_totalprice"))
            .alias("price_or_null"),
        )
    )
    from pyspark.sql import Window

    w_first = Window.partitionBy("status_or_null").orderBy(
        F.col("price_or_null").asc_nulls_first(), F.col("o_orderkey")
    )
    w_last = Window.partitionBy("status_or_null").orderBy(
        F.col("price_or_null").desc_nulls_last(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "status_or_null",
        F.coalesce("status_or_null", F.lit("?")).alias("status_nz"),
        F.col("status_or_null").eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
        F.col("price_or_null").isNull().alias("price_missing"),
        F.row_number().over(w_first).alias("rn_nulls_first"),
        F.row_number().over(w_last).alias("rn_nulls_last"),
    )


@query(
    "q_stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)               AS qty_stddev,
           round(var_samp(l_quantity), 6)                  AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6)     AS qty_price_corr,
           round(covar_samp(l_discount, l_tax), 8)         AS disc_tax_covar,
           round(skewness(l_extendedprice), 3)             AS price_skew,
           round(kurtosis(l_extendedprice), 3)             AS price_kurtosis
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate coverage: stddev/variance (sample),
    correlation, covariance, skewness, kurtosis — all partial-
    aggregable JVM builtins (single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
        F.round(F.skewness("l_extendedprice"), 3).alias("price_skew"),
        F.round(F.kurtosis("l_extendedprice"), 3).alias("price_kurtosis"),
    )


@query(
    "q_exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6)  AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 6)  AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price,
           round(min(o_totalprice), 6)                 AS min_price,
           round(max(o_totalprice), 6)                 AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``) — the exact twin of the sketch-based
    ``q_events_sketches``."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99_price"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
    )


@query(
    "q_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP)   AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)   AS month_end,
           CAST(extract(dow FROM o_orderdate) AS INT)          AS day_of_week,
           CAST(extract(quarter FROM o_orderdate) AS INT)      AS quarter
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: day diffs, interval add, month
    truncation, month-end, day-of-week (Sunday=0 — Spark ``dayofweek``
    is 1-based Sunday=1, shifted to match the extract(dow) convention),
    quarter."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("bigint").alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("timestamp").alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("timestamp").alias("order_month"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        (F.dayofweek(F.col("o_orderdate")) - 1).cast("int").alias("day_of_week"),
        F.quarter("o_orderdate").cast("int").alias("quarter"),
    )


@query(
    "q_levenshtein_name_pairs",
    oracle="""
    WITH names AS (
        SELECT c_custkey, c_name FROM customer WHERE c_custkey < 30
    )
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
    FROM names a JOIN names b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def q_levenshtein_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity (near-identical serial names differ in
    1-2 digits): blocked pairwise levenshtein — the string-metric
    complement to the token/hash dedup family."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 30).select(
        "c_custkey", "c_name"
    )
    a = c.select(F.col("c_custkey").alias("cust_a"), F.col("c_name").alias("name_a"))
    b = c.select(F.col("c_custkey").alias("cust_b"), F.col("c_name").alias("name_b"))
    return (
        a.join(b, F.col("cust_a") < F.col("cust_b"))
        .select(
            "cust_a",
            "cust_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 2)
    )


_PROFILE_COLS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("customer", "c_name"),
    ("documents", "lang"),
    ("documents", "source"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
]


@query(
    "q_profile_columns",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM {t}"""
        for t, c in _PROFILE_COLS
    ),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (data-quality surface): row/null/distinct counts
    + min/max per configured column across tables — the standard
    pre-training data audit. Each table contributes one aggregate pass;
    results union into a single profile relation."""
    parts = []
    for t, c in _PROFILE_COLS:
        df = _t(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            ).select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# r4: the remaining six TPC-H query shapes (Q2, Q9, Q12, Q15, Q20, Q22),
# completing all 22. The driver fixture trims some classic columns
# (no partsupp table, no l_shipmode/l_commitdate, no c_phone), so each
# query keeps its defining PLAN SHAPE — the thing being tested — with
# the nearest available columns, documented per query.


@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, min(supply_cost) AS best_cost
        FROM cost GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
    FROM part
    JOIN cost ON cost.l_partkey = p_partkey
    JOIN best ON best.l_partkey = p_partkey AND supply_cost = best_cost
    JOIN supplier ON s_suppkey = cost.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery over a 5-table join —
    for each qualifying part, keep only the supplier(s) achieving the
    minimum supply cost, then rank by account balance. Without a
    partsupp table, supply cost is min(l_extendedprice) per
    (part, supplier) — a MIN of raw values, so the min-of-min equality
    join compares identical doubles on both engines (no accumulation
    drift). Plan: two partial aggs reusing the same shuffle key, then
    broadcast dims; the region filter prunes before the join."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supply_cost").alias("best_cost")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        cost.join(
            best,
            (cost.l_partkey == F.col("b_partkey"))
            & (F.col("supply_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q09_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                          * CAST(1 - l_discount AS DECIMAL(18, 2))
                          - CAST(0.1 AS DECIMAL(2, 1))
                            * (CAST(p_retailprice AS DECIMAL(12, 2))
                               * CAST(l_quantity AS DECIMAL(4, 0)))), 2)
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (nation, order-year) over a 5-table
    join with a part-name LIKE filter. Without partsupp's
    ps_supplycost, cost is proxied as 10% of p_retailprice per unit —
    the plan (big fact joined to three broadcast dims + orders, then a
    two-key agg) is the thing under test. The LIKE filter reaches the
    part scan (pushed predicate) and prunes before the join."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    o = _t(spark, sf_dir, "orders")
    # DECIMAL-accumulated profit terms (exact, fold-order-free; r8
    # strict fix): revenue at scale 4, unit cost at scale 3 — the
    # subtraction and sum stay exact, and the final round-to-cents
    # happens in DECIMAL (half-away-from-zero on both engines) before
    # the double cast, never on an engine-folded double
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)") - F.lit("0.1").cast("decimal(2,1)") * (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(4,0)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY ship_class
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) aggregation of order
    priorities over late shipments in a date window. The fixture has no
    l_shipmode/l_commitdate, so "late" is ship ≥ 30 days after order
    and the grouping class is l_returnflag — the pattern (join + two
    filtered counts in one pass, no second scan) is unchanged."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                   * CAST(1 - l_discount AS DECIMAL(18, 2))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view over a quarter, then the supplier(s)
    matching the view's MAX — a scalar subquery over a derived
    aggregate. Spark side computes the quarter revenue ONCE (the
    'view'), takes max via an agg-broadcast (scalar), and filters —
    both engines compare each supplier's own sum against its own max,
    so float-accumulation order cannot split the argmax across
    engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix): the
    # argmax compares exact decimals, the output rounds in DECIMAL
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        ).alias("total_revenue")
    )
    best = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q20_excess_shipments",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'blue%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
    )
    AND s_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
    )
    ORDER BY s_name
    """,
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries — suppliers who moved more
    than a threshold quantity of a name-prefixed part family in a year,
    restricted to one region. Without partsupp's availqty the
    HAVING-sum threshold replaces the 0.5*availqty comparison; the plan
    (semi join against a group-filtered aggregate, semi join against a
    broadcast dim chain) is the Q20 skeleton."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .join(asia, s.s_nationkey == asia.n_nationkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT substr(c_name, 10, 2) AS cntrycode,
           count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18, 2)))
                                   AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-dormant customers — acctbal above the
    positive-balance average (scalar subquery) AND no orders at all
    (anti join), grouped by a substring 'country code'. The fixture
    has no c_phone, so the code comes from the zero-padded digits of
    c_name — same substring-extraction pattern; 'dormant' means no
    orders since 1999 (the fixture's order stream is dense enough that
    literally order-less customers don't exist)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    # threshold = exact decimal total divided as a double (r8 strict fix)
    avg_pos = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_pos), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "q_market_basket_pairs",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(count(*) AS BIGINT) AS support
        FROM basket a JOIN basket b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY support DESC,
                                     brand_a, brand_b) AS rk
        FROM pairs
    )
    SELECT brand_a, brand_b, support, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the A-priori level-2 candidate
    pass, Agrawal & Srikant VLDB'94): which brand pairs ship together
    in the same order. The per-basket pair expansion is bounded by
    basket size (TPC-H orders hold ≤ 7 lines; real carts are similarly
    small — the itemset-mining standard assumption), so the self-join
    on the order key is linear in orders times a small constant, never
    corpus². Dimension lookup (part → brand) broadcasts; the support
    census is one partial-aggregable groupBy over brand²-bounded keys;
    the top-20 ranks that bounded relation. All-integer output."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # r10 (guide §2.4): the r5 shape shuffled the fact stream twice —
    # a (okey, brand) distinct, then a self-join reshuffle on okey. One
    # collect_set groupBy (partial-aggregable) replaces both, and the
    # ≤-basket-sized pair expansion happens array-side on the sorted
    # set (a < b by construction), feeding straight into the
    # brand²-bounded support census. Same pairs, same counts.
    basket_sets = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("bs"))
    )
    pairs = (
        basket_sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (x, i) -> "
                    "transform(slice(bs, i + 2, size(bs)), "
                    "y -> struct(x AS brand_a, y AS brand_b))))"
                )
            ).alias("pr")
        )
        .select("pr.brand_a", "pr.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("support").desc(), "brand_a", "brand_b")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("brand_a", "brand_b", "support", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "q_market_basket_rules",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_baskets AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS nb FROM basket),
    supp1 AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS s FROM basket GROUP BY brand
    ),
    pairs AS (
        SELECT a.brand AS antecedent, b.brand AS consequent,
               CAST(count(*) AS BIGINT) AS supp_ab
        FROM basket a JOIN basket b
          ON a.okey = b.okey AND a.brand <> b.brand
        GROUP BY a.brand, b.brand
    ),
    rules AS (
        SELECT r.antecedent, r.consequent, r.supp_ab,
               sa.s AS supp_a, sb.s AS supp_b,
               round(CAST(r.supp_ab AS DOUBLE) / sa.s, 6) AS confidence,
               round(CAST(r.supp_ab AS DOUBLE) * (SELECT nb FROM n_baskets)
                     / (CAST(sa.s AS DOUBLE) * sb.s), 6) AS lift
        FROM pairs r
        JOIN supp1 sa ON sa.brand = r.antecedent
        JOIN supp1 sb ON sb.brand = r.consequent
        WHERE r.supp_ab >= 5
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY lift DESC, antecedent,
                                     consequent) AS rk
        FROM rules
    )
    SELECT antecedent, consequent, supp_ab, supp_a, supp_b,
           confidence, lift, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def q_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from basket co-occurrence (the A-priori rule
    step, Agrawal & Srikant VLDB'94): for every DIRECTED brand pair
    with joint support >= 5, confidence(A->B) = supp(AB)/supp(A) and
    lift = supp(AB)*N / (supp(A)*supp(B)) — the two numbers a
    recommender/assortment team actually reads (confidence without
    lift mistakes popularity for affinity). Top-20 by lift.

    Scale: the same bounded per-basket pair expansion as
    q_market_basket_pairs (baskets are small — the itemset-mining
    standing assumption) joined to the brand-bounded unary supports
    (broadcast) and one scalar basket count; the rank runs after a
    TakeOrdered over brand^2-bounded rules. Confidence/lift are exact
    integer ratios rounded to 6 dp — identical doubles cross-engine.
    """
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    nb = basket.agg(F.countDistinct("okey").cast("bigint").alias("nb"))
    supp1 = basket.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    b2 = basket.select(F.col("okey"), F.col("brand").alias("consequent"))
    pairs = (
        basket.withColumnRenamed("brand", "antecedent")
        .join(b2, "okey")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp_ab"))
        .filter(F.col("supp_ab") >= 5)
    )
    sa = supp1.select(F.col("brand").alias("antecedent"), F.col("s").alias("supp_a"))
    sb = supp1.select(F.col("brand").alias("consequent"), F.col("s").alias("supp_b"))
    rules = (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "supp_ab",
            "supp_a",
            "supp_b",
            F.round(F.col("supp_ab").cast("double") / F.col("supp_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("supp_ab").cast("double")
                * F.col("nb")
                / (F.col("supp_a").cast("double") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
    from pyspark.sql import Window

    topn = rules.orderBy(
        F.col("lift").desc(), "antecedent", "consequent"
    ).limit(20)
    w = Window.orderBy(F.col("lift").desc(), "antecedent", "consequent")
    return topn.withColumn("rk", F.row_number().over(w)).select(
        "antecedent", "consequent", "supp_ab", "supp_a", "supp_b",
        "confidence", "lift", F.col("rk").cast("int").alias("rk"),
    )
