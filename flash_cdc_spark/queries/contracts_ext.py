"""Data-contract extensions (r6, batch 11): column-level schema/
profile drift between two snapshots, and Wilson-interval source
ranking.

Schema drift is the data-contract check a lakehouse runs between
yesterday's and today's loads (the row-level twin is
`q_maintenance_snapshot_diff`; this one watches DISTRIBUTIONS, not
rows). The Wilson lower bound is the correct way to rank groups by a
pass rate when group sizes differ (Agresti-Coull / Wilson 1927 — the
classic 'how not to sort by average rating' correction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


@query(
    "q_quality_profile_drift",
    oracle="""
    WITH halves AS (
        SELECT CASE WHEN o_orderdate < DATE '1996-01-01'
                    THEN 'before' ELSE 'after' END AS half,
               o_totalprice, o_orderpriority, o_custkey, o_orderstatus
        FROM orders
    ),
    prof AS (
        SELECT half,
               count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
                          AS DOUBLE) / count(*), 9) AS price_mean,
               round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))
                                   * CAST(o_totalprice AS DECIMAL(18, 2)))
                               AS DOUBLE)
                           - CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
                                  AS DOUBLE)
                             * CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
                                    AS DOUBLE) / count(*))
                          / (count(*) - 1)), 9) AS price_std,
               count(DISTINCT o_orderpriority) AS prio_distinct,
               count(DISTINCT o_custkey) AS cust_distinct,
               round(avg(CAST(o_orderstatus = 'F' AS INT)), 9)
                   AS fulfilled_share
        FROM halves GROUP BY half
    )
    SELECT b.n AS n_before, a.n AS n_after,
           round((a.price_mean - b.price_mean)
                 / b.price_std, 6) AS price_mean_shift_z,
           round(a.price_mean / b.price_mean, 6) AS price_mean_ratio,
           CAST(b.prio_distinct AS BIGINT) AS prio_distinct_before,
           CAST(a.prio_distinct AS BIGINT) AS prio_distinct_after,
           round(CAST(a.cust_distinct AS DOUBLE) / b.cust_distinct, 6)
               AS cust_distinct_ratio,
           round(a.fulfilled_share - b.fulfilled_share, 6)
               AS fulfilled_share_shift
    FROM (SELECT * FROM prof WHERE half = 'before') b
    CROSS JOIN (SELECT * FROM prof WHERE half = 'after') a
    """,
)
def q_quality_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between two table snapshots (before/after
    a date cut standing in for yesterday/today loads) — the data-
    contract check that catches upstream regressions schemas can't:
    a numeric mean shifting in std-units, categorical cardinality
    appearing/disappearing, id-space growth, and a categorical share
    shifting (order fulfillment, which REALLY drifts across the date
    cut — recent orders are unfulfilled). One row of named drift
    signals; alert thresholds live downstream.

    Scale: one pass builds BOTH profiles (conditional aggregation per
    half — shown as a single grouped pass here), the comparison is a
    2-row cross join. Distinct counts swap to approx_count_distinct
    at 100 TB; the drift ratios need two digits, not nine.
    """
    o = load_table(spark, sf_dir, "orders")
    half = F.when(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date"), "before"
    ).otherwise("after")
    prof = (
        o.select(
            half.alias("half"),
            "o_totalprice",
            "o_orderpriority",
            "o_custkey",
            (F.col("o_orderstatus") == "F").cast("int").alias("isf"),
        )
        .groupBy("half")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__sx"),
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.col("o_totalprice").cast("decimal(18,2)")
            ).alias("__sx2"),
            F.countDistinct("o_orderpriority").alias("prio_distinct"),
            F.countDistinct("o_custkey").alias("cust_distinct"),
            F.round(F.avg("isf"), 9).alias("fulfilled_share"),
        )
        # mean/std from EXACT decimal Σx and Σx² (2-dp money squares to
        # 4-dp — exact in DECIMAL), then identical-operand IEEE math:
        # bit-deterministic on both engines under any fold order (r8
        # strict fix; the raw avg/stddev_samp folds were dice rolls)
        .select(
            "half",
            "n",
            "prio_distinct",
            "cust_distinct",
            "fulfilled_share",
            F.round(F.col("__sx").cast("double") / F.col("n"), 9).alias(
                "price_mean"
            ),
            F.round(
                F.sqrt(
                    (
                        F.col("__sx2").cast("double")
                        - F.col("__sx").cast("double")
                        * F.col("__sx").cast("double")
                        / F.col("n")
                    )
                    / (F.col("n") - 1)
                ),
                9,
            ).alias("price_std"),
        )
    )
    b = prof.filter(F.col("half") == "before").alias("b")
    a = prof.filter(F.col("half") == "after").alias("a")
    return b.crossJoin(a).select(
        F.col("b.n").alias("n_before"),
        F.col("a.n").alias("n_after"),
        F.round(
            (F.col("a.price_mean") - F.col("b.price_mean")) / F.col("b.price_std"),
            6,
        ).alias("price_mean_shift_z"),
        F.round(F.col("a.price_mean") / F.col("b.price_mean"), 6).alias(
            "price_mean_ratio"
        ),
        F.col("b.prio_distinct").alias("prio_distinct_before"),
        F.col("a.prio_distinct").alias("prio_distinct_after"),
        F.round(
            F.col("a.cust_distinct").cast("double") / F.col("b.cust_distinct"), 6
        ).alias("cust_distinct_ratio"),
        F.round(
            F.col("a.fulfilled_share") - F.col("b.fulfilled_share"), 6
        ).alias("fulfilled_share_shift"),
    )


@query(
    "q_quality_wilson_ranking",
    oracle="""
    WITH rates AS (
        SELECT source,
               count(*) AS n,
               sum(CAST(n_chars >= 200 AS INT)) AS k
        FROM documents GROUP BY source
    ),
    wilson AS (
        SELECT source, n, k,
               round(CAST(k AS DOUBLE) / n, 6) AS raw_rate,
               round((
                   (k * 1.0 / n) + 3.8416 / (2 * n)
                   - 1.96 * sqrt(((k * 1.0 / n) * (1 - k * 1.0 / n)
                                  + 3.8416 / (4 * n)) / n)
               ) / (1 + 3.8416 / n), 6) AS wilson_lb
        FROM rates
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(k AS BIGINT) AS n_pass, raw_rate, wilson_lb
    FROM wilson
    """,
)
def q_quality_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-interval source ranking: score each source by the 95%
    LOWER confidence bound of its quality-pass rate (docs ≥200 chars
    as the stand-in predicate), not the raw rate — the standard fix
    for 'a source with 3/3 passing outranks one with 970/1000' when
    deciding which sources to trust or upweight (Wilson 1927; the
    how-not-to-sort-by-average-rating correction).

    Scale: one conditional-aggregation pass to (source, n, k); the
    Wilson arithmetic is closed-form per row. z²=3.8416 (z=1.96) is
    inlined so both engines evaluate the identical expression; sqrt
    is IEEE correctly-rounded, so 6-dp rounding is stable.
    """
    d = load_table(spark, sf_dir, "documents")
    rates = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_chars") >= 200).cast("int")).alias("k"),
    )
    p = F.col("k") * 1.0 / F.col("n")
    z2 = 3.8416
    wilson_lb = F.round(
        (p + z2 / (2 * F.col("n"))
         - 1.96 * F.sqrt((p * (1 - p) + z2 / (4 * F.col("n"))) / F.col("n")))
        / (1 + z2 / F.col("n")),
        6,
    )
    return rates.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("k").alias("n_pass"),
        F.round(p, 6).alias("raw_rate"),
        wilson_lb.alias("wilson_lb"),
    )


@query(
    "q_sales_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey, CAST(year(min(o_orderdate)) AS INT) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    spend AS (
        SELECT f.cohort,
               CAST(year(o.o_orderdate) AS INT) - f.cohort AS age_years,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18, 2))), 2)
                    AS DOUBLE) AS revenue,
               count(DISTINCT o.o_custkey) AS active_customers
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY f.cohort, age_years
    ),
    sizes AS (
        SELECT cohort, count(*) AS cohort_size FROM firsts GROUP BY cohort
    )
    SELECT s.cohort, CAST(s.age_years AS INT) AS age_years,
           CAST(z.cohort_size AS BIGINT) AS cohort_size,
           CAST(s.active_customers AS BIGINT) AS active_customers,
           s.revenue,
           CAST(sum(CAST(s.revenue AS DECIMAL(18, 2))) OVER
                    (PARTITION BY s.cohort ORDER BY s.age_years)
                AS DOUBLE) / z.cohort_size AS cum_ltv_per_customer
    FROM spend s JOIN sizes z ON s.cohort = z.cohort
    """,
)
def q_sales_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-cohort lifetime-value matrix: customers grouped by
    first-order year, revenue tracked by cohort age, cumulative LTV
    per customer as the running sum — the (cohort × age) triangle
    every subscription/commerce dashboard draws, and the batch twin of
    the event-level `q_events_cohort_retention` (that one counts
    activity; this one follows the money).

    Scale: first-order dates are one partial-agg pass; the fact scan
    joins that broadcast-sized relation and reduces to the tiny
    (cohort × age) grid, where the running sum is window work over
    dozens of rows. Revenue rounded to 2 dp before the cumulative
    fold; the fold order is the unique age axis.
    """
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("int").alias("cohort")
    )
    spend = (
        o.join(F.broadcast(firsts), "o_custkey")
        .groupBy(
            "cohort",
            (F.year("o_orderdate").cast("int") - F.col("cohort")).alias(
                "age_years"
            ),
        )
        .agg(
            # DECIMAL-accumulated (exact, fold-order-free; r8 strict fix)
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
            F.countDistinct("o_custkey").alias("active_customers"),
        )
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    from pyspark.sql import Window as W

    cum = (
        W.partitionBy("cohort")
        .orderBy("age_years")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spend.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            F.col("age_years").cast("int").alias("age_years"),
            "cohort_size",
            "active_customers",
            "revenue",
            # DECIMAL windowed running sum, quotient left UNROUNDED
            # (round(quotient, 2) splits engines on exact half-cent
            # boundaries the small cohort grid does hit; r8 strict fix)
            (
                F.sum(F.col("revenue").cast("decimal(18,2)")).over(cum)
                .cast("double")
                / F.col("cohort_size")
            ).alias("cum_ltv_per_customer"),
        )
    )


@query(
    "q_text_lexical_diversity",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    toksf AS (SELECT * FROM toks WHERE w <> ''),
    per_doc AS (
        SELECT doc_id, source,
               count(*) AS n_tokens,
               count(DISTINCT w) AS n_types,
               round(count(DISTINCT w) / sqrt(CAST(count(*) AS DOUBLE)), 9)
                   AS root_ttr
        FROM toksf GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(root_ttr), 6) AS avg_root_ttr,
           round(min(root_ttr), 6) AS min_root_ttr,
           CAST(sum(CAST(n_types * 2 < n_tokens AS INT)) AS BIGINT)
               AS n_low_diversity_docs
    FROM per_doc GROUP BY source
    """,
)
def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source via root type-token ratio
    (Guiraud's index — types/√tokens, the TTR variant that does not
    collapse with document length): low diversity flags generated or
    template text before any model-based scorer runs; the
    low-diversity count (types < tokens/2) is the dashboard's
    machine-text alarm. Complements `q_text_repetition_ratio` (which
    watches the TOP bigram; this watches the whole vocabulary).

    Scale: one groupBy per (doc, word) underneath a per-doc aggregate
    — token-stream shuffles keyed by doc, uniform by construction;
    per-doc ratios are exact-int arithmetic rounded to 9 dp before
    the source average.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    per_doc = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_types"),
        F.round(
            F.countDistinct("w") / F.sqrt(F.count(F.lit(1)).cast("double")), 9
        ).alias("root_ttr"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("root_ttr"), 6).alias("avg_root_ttr"),
        F.round(F.min("root_ttr"), 6).alias("min_root_ttr"),
        F.sum((F.col("n_types") * 2 < F.col("n_tokens")).cast("int")).alias(
            "n_low_diversity_docs"
        ),
    )
