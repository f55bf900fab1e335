"""Warehouse analytics, r7 wave: survival analysis, statistical
testing, exact global order statistics, CDC feed-health auditing, and
curation duplication reporting.

Five standing workloads a 100 TB warehouse/training-data platform runs
that the inventory did not yet cover:

- Kaplan-Meier survival over user lifetimes (Kaplan & Meier 1958) —
  THE churn/retention estimator under right-censoring;
- Pearson chi-square independence test with Cramér's V (the A/B and
  data-drift significance workhorse);
- exact global latency percentiles by rank selection — order
  statistics WITHOUT a global sort, the SLA-report form of the
  two-phase rank in ``operators/global_order.py``;
- changefeed offset-gap audit (lost-event monitoring for a filtered
  subfeed consuming from a global offset sequence);
- exact-duplicate token-inflation report per source (what fraction of
  a source's training tokens are redundant copies — the headline
  number of a dedup pass).

Cross-engine determinism follows the repo conventions: log terms are
rounded to 9 dp and accumulated in DECIMAL (exact, fold-order-free)
wherever a parallel decomposition changes float addition order;
everything else is integer arithmetic or a final bounded-cardinality
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import (
    bounded_running_sum,
    with_global_order,
)
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

_CHURN_HOURS = 24  # last activity more than this before feed end = churned


# ---------------------------------------------------------------------
# Kaplan-Meier survival estimator
# ---------------------------------------------------------------------


@query(
    "q_survival_kaplan_meier",
    oracle=f"""
    WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
    users AS (
        SELECT user_id,
               date_diff('second', min(ts), max(ts)) // 3600 AS dur,
               CASE WHEN max(ts) < (SELECT ref_ts FROM ref)
                                   - INTERVAL {_CHURN_HOURS} HOUR
                    THEN 1 ELSE 0 END AS churned
        FROM events GROUP BY user_id
    ),
    per_dur AS (
        SELECT dur,
               CAST(sum(churned) AS BIGINT) AS d,
               CAST(count(*) - sum(churned) AS BIGINT) AS c
        FROM users GROUP BY dur
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
    cum AS (
        SELECT dur, d, c,
               (SELECT n FROM tot)
                 - CAST(coalesce(sum(d + c) OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS n_risk
        FROM per_dur
    ),
    terms AS (
        SELECT dur, d, c, n_risk,
               CAST(CASE WHEN d = 0 THEN 0
                         WHEN d >= n_risk THEN -50.0
                         ELSE round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
                    END AS DECIMAL(38, 9)) AS lnterm
        FROM cum
    ),
    curve AS (
        SELECT dur, d, n_risk,
               round(exp(CAST(sum(lnterm) OVER (ORDER BY dur) AS DOUBLE)), 6)
                   AS survival
        FROM terms
    )
    SELECT CAST(dur AS BIGINT) AS duration_hours,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           survival
    FROM curve WHERE d > 0
    """,
)
def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes (Kaplan & Meier
    1958): lifetime = whole HOURS between a user's first and last
    event (hour granularity keeps the duration grid informative on the
    30-day fixture while staying bounded); a user is an EVENT
    (churned) when their last activity predates the feed end by more
    than {_CHURN_HOURS} hours, otherwise right-censored (still active
    — the estimator's whole point is using these rows without biasing
    the curve). S(t) = prod over event times u <= t of (1 - d_u/n_u),
    with censored users leaving the risk set after their duration.
    Hour arithmetic is truncate-each-to-seconds then integer-divide on
    BOTH engines (DuckDB date_diff('second') counts second boundaries,
    which equals Spark's unix_timestamp subtraction).

    Determinism: per-duration log factors are rounded to 9 dp and
    accumulated in DECIMAL(38,9) — exact, associative — so the product
    is bit-identical across engines and across any parallel fold
    order; a saturated risk set (d = n) contributes -50 (survival
    rounds to 0 at 6 dp) instead of ln(0).

    Scale: the corpus reduces to one row per user (one shuffle), then
    to one row per distinct DURATION — bounded by the feed's TIMESPAN
    in hours (a domain), never by corpus rows. Both running sums
    (prior removals -> risk set; cumulative log survival) therefore go
    through :func:`bounded_running_sum` — a broadcast triangular join
    over the grid, value-identical to the window form because the
    accumulated terms are integer / DECIMAL (exact under any fold
    order) — so the plan has NO window at all and pays none of the
    two-phase operator's fixed construction cost. 100 TB cost = the
    per-user aggregate scan.
    """
    e = load_table(spark, sf_dir, "events")
    # The feed-end reference rides the per-user aggregate (global max =
    # max of per-user maxes): one corpus scan, shared by both branches,
    # instead of a second scan just for the reference timestamp.
    peruser = e.groupBy("user_id").agg(
        F.min("ts").alias("__first_ts"), F.max("ts").alias("__last_ts")
    )
    ref = peruser.agg(F.max("__last_ts").alias("ref_ts"))
    users = peruser.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.expr(
            "(unix_timestamp(__last_ts) - unix_timestamp(__first_ts))"
            " div 3600"
        ).alias("dur"),
        (
            F.col("__last_ts")
            < F.col("ref_ts") - F.expr(f"INTERVAL {_CHURN_HOURS} HOURS")
        )
        .cast("int")
        .alias("churned"),
    )
    per_dur = users.groupBy("dur").agg(
        F.sum("churned").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("churned")).cast("bigint").alias("c"),
    )
    tot = users.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cum = bounded_running_sum(
        per_dur,
        [F.col("dur").asc()],
        sums={"removed_incl": F.col("d") + F.col("c")},
    )
    cum = cum.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        (F.col("n") - (F.col("removed_incl") - F.col("d") - F.col("c"))).cast(
            "bigint"
        ),
    )
    lnterm = (
        F.when(F.col("d") == 0, F.lit(0.0))
        .when(F.col("d") >= F.col("n_risk"), F.lit(-50.0))
        .otherwise(
            F.round(
                F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
                9,
            )
        )
        .cast("decimal(38,9)")
    )
    terms = cum.withColumn("lnterm", lnterm)
    curve = bounded_running_sum(
        terms, [F.col("dur").asc()], sums={"cumln": F.col("lnterm")}
    )
    return (
        curve.filter(F.col("d") > 0)
        .select(
            F.col("dur").cast("bigint").alias("duration_hours"),
            "n_risk",
            F.col("d").alias("n_events"),
            F.round(F.exp(F.col("cumln").cast("double")), 6).alias("survival"),
        )
    )


# ---------------------------------------------------------------------
# Pearson chi-square test of independence
# ---------------------------------------------------------------------

_BAND_SQL = """CASE WHEN value < 50 THEN 'low'
                    WHEN value < 200 THEN 'mid'
                    ELSE 'high' END"""


@query(
    "q_stats_chi_square",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, {_BAND_SQL} AS band,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, band
    ),
    rows_ AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS r FROM obs
              GROUP BY event_type),
    cols_ AS (SELECT band, CAST(sum(n) AS BIGINT) AS c FROM obs
              GROUP BY band),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM obs),
    grid AS (
        SELECT rw.event_type, cl.band, rw.r, cl.c,
               coalesce(o.n, 0) AS n
        FROM rows_ rw CROSS JOIN cols_ cl
        LEFT JOIN obs o ON o.event_type = rw.event_type AND o.band = cl.band
    ),
    cells AS (
        SELECT round(
                 pow(n - (CAST(r AS DOUBLE) * c / (SELECT n_total FROM tot)), 2)
                 / (CAST(r AS DOUBLE) * c / (SELECT n_total FROM tot)), 9)
               AS contrib
        FROM grid
    ),
    dims AS (
        SELECT (SELECT count(*) FROM rows_) AS nr,
               (SELECT count(*) FROM cols_) AS nc
    )
    SELECT round(sum(contrib), 4) AS chi2,
           CAST((SELECT (nr - 1) * (nc - 1) FROM dims) AS BIGINT) AS dof,
           round(sqrt(sum(contrib) / ((SELECT n_total FROM tot)
                 * (SELECT least(nr - 1, nc - 1) FROM dims))), 6)
               AS cramers_v,
           (SELECT n_total FROM tot) AS n_total
    FROM cells
    """,
)
def q_stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    value band (low/mid/high), with degrees of freedom and Cramér's V
    effect size — the standard significance check behind A/B readouts
    and categorical drift monitors.

    The expected-count grid is the FULL cross product of observed row
    and column categories (zero-observed cells still contribute), so
    the contingency build is: one groupBy over the facts, two
    marginal aggregates, a bounded grid cross join, and one final
    4-value aggregate. Per-cell contributions are rounded to 9 dp
    before the (bounded, ~grid-size) sum. 100 TB cost = the one fact
    scan; everything after is |types| x 3 rows.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    band = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
    )
    obs = e.groupBy("event_type", band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rows_ = obs.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("r"))
    cols_ = obs.groupBy("band").agg(F.sum("n").cast("bigint").alias("c"))
    tot = obs.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("band").alias("nc"),
    )
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .join(obs, ["event_type", "band"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    expected = F.col("r").cast("double") * F.col("c") / F.col("n_total")
    cells = grid.select(
        F.round(F.pow(F.col("n") - expected, 2) / expected, 9).alias("contrib"),
        "n_total",
        "nr",
        "nc",
    )
    return cells.groupBy("n_total", "nr", "nc").agg(
        F.round(F.sum("contrib"), 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.sum("contrib")
                / (F.col("n_total") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    ).select(
        "chi2",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        "cramers_v",
        "n_total",
    )


# ---------------------------------------------------------------------
# Exact global SLA percentiles by rank selection
# ---------------------------------------------------------------------

_SLA_QUANTILES = ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"), (0.999, "p999"))


@query(
    "q_events_sla_percentiles",
    oracle=f"""
    WITH ranked AS (
        SELECT value, event_id,
               row_number() OVER (ORDER BY value, event_id) AS rn,
               count(*) OVER () AS n
        FROM events WHERE value IS NOT NULL
    ),
    qs(q, label) AS (VALUES {",".join(f"(CAST({q} AS DOUBLE), '{lb}')" for q, lb in _SLA_QUANTILES)})
    SELECT label,
           q,
           CAST(rn AS BIGINT) AS at_rank,
           CAST(n AS BIGINT) AS n_values,
           round(value, 6) AS value
    FROM ranked JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)
    """,
)
def q_events_sla_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global SLA percentiles (p50/p90/p99/p99.9) of the event
    value distribution by RANK SELECTION: the value at 1-based rank
    ceil(q*n) under the total order (value, event_id) — discrete
    quantile semantics, pinned by explicit rank arithmetic on BOTH
    engines rather than builtin quantile functions (whose
    interpolation conventions differ).

    This is the SLA-report face of ``operators/global_order.py``: the
    exact rank comes from the two-phase range-partitioned pass (no
    single-partition sort, no full collect), then four broadcast-joined
    target ranks select four rows. At 100 TB this is how you get EXACT
    tail latencies when approx_percentile's t-digest error bars are
    not acceptable (p99.9 contract disputes); the cost is two linear
    passes instead of one approximate one.
    """
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value", "event_id")
    )
    n_df = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = with_global_order(
        e, [F.col("value").asc(), F.col("event_id").asc()], rank_col="rn"
    )
    qs = F.array(
        *[
            F.struct(F.lit(q).alias("q"), F.lit(lb).alias("label"))
            for q, lb in _SLA_QUANTILES
        ]
    )
    targets = (
        n_df.select("n", F.explode(qs).alias("qq"))
        .select(
            F.col("qq.label").alias("label"),
            F.col("qq.q").alias("q"),
            F.ceil(F.col("qq.q") * F.col("n")).cast("bigint").alias("at_rank"),
            F.col("n").alias("n_values"),
        )
    )
    return (
        ranked.join(
            F.broadcast(targets), ranked["rn"] == targets["at_rank"]
        )
        .select(
            "label",
            "q",
            "at_rank",
            "n_values",
            F.round("value", 6).alias("value"),
        )
    )


# ---------------------------------------------------------------------
# Changefeed offset-gap audit
# ---------------------------------------------------------------------


@query(
    "q_changefeed_offset_gaps",
    oracle="""
    WITH sub AS (
        SELECT event_type, event_id,
               lag(event_id) OVER (PARTITION BY event_type
                                   ORDER BY event_id) AS prev_id
        FROM events
    ),
    gaps AS (
        SELECT event_type,
               event_id - prev_id - 1 AS gap
        FROM sub WHERE prev_id IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_deliveries,
           CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gaps,
           CAST(max(gap) AS BIGINT) AS max_gap,
           CAST(sum(gap) AS BIGINT) AS skipped_offsets,
           round(avg(CAST(gap AS DOUBLE)), 6) AS avg_gap
    FROM gaps GROUP BY event_type
    """,
)
def q_changefeed_offset_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-gap audit of a filtered changefeed subscription: a
    consumer of one topic (event_type) sees a subsequence of the
    global offset sequence (event_id), and the gaps between
    consecutive delivered offsets tell it how many offsets the filter
    skipped — the lost-event monitor every at-least-once consumer runs
    (a gap DISTRIBUTION shift, not the gaps themselves, signals loss;
    reference semantics: the replay-id continuity the reference client
    trusts, audited as data). Reports per topic: deliveries, positive
    gaps, max/avg gap, total skipped offsets.

    Scale: ONE key-partitioned window (lag over event_type — the
    consumer's natural partitioning, no global sort) + one groupBy.
    All-integer except the final bounded-cardinality avg.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    w = Window.partitionBy("event_type").orderBy("event_id")
    gaps = (
        e.withColumn("prev_id", F.lag("event_id").over(w))
        .filter(F.col("prev_id").isNotNull())
        .withColumn("gap", F.col("event_id") - F.col("prev_id") - 1)
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_deliveries"),
        F.sum((F.col("gap") > 0).cast("int")).cast("bigint").alias("n_gaps"),
        F.max("gap").cast("bigint").alias("max_gap"),
        F.sum("gap").cast("bigint").alias("skipped_offsets"),
        F.round(F.avg(F.col("gap").cast("double")), 6).alias("avg_gap"),
    )


# ---------------------------------------------------------------------
# Exact-duplicate token-inflation report
# ---------------------------------------------------------------------


@query(
    "q_quality_dup_inflation",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, md5(text) AS h,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    flagged AS (
        SELECT source, n_tokens,
               CASE WHEN row_number() OVER (PARTITION BY h ORDER BY doc_id)
                    > 1 THEN 1 ELSE 0 END AS is_copy
        FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_copy) AS BIGINT) AS n_dup_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(is_copy * n_tokens) AS BIGINT) AS dup_tokens,
           round(100.0 * sum(is_copy * n_tokens) / sum(n_tokens), 4)
               AS inflation_pct
    FROM flagged GROUP BY source
    """,
)
def q_quality_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate token inflation per source — the headline number
    of a dedup pass over a training corpus: how many of each source's
    tokens are byte-identical copies beyond the first occurrence
    (md5(text) groups, first copy by doc_id is the keeper, the rest is
    inflation a dedup pass would reclaim). The per-source view is what
    drives curation decisions (which crawls/feeds are recycling
    content) — the global census lives in q_dedup_exact_summary.

    Scale: one hash-partitioned window (row_number per md5 group —
    the dedup key is the natural partitioning) + one groupBy(source);
    all integers except the final per-source percentage.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    flagged = toks.withColumn(
        "is_copy", (F.row_number().over(w) > 1).cast("int")
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_copy").cast("bigint").alias("n_dup_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.col("is_copy") * F.col("n_tokens"))
        .cast("bigint")
        .alias("dup_tokens"),
        F.round(
            100.0
            * F.sum(F.col("is_copy") * F.col("n_tokens"))
            / F.sum("n_tokens"),
            4,
        ).alias("inflation_pct"),
    )
