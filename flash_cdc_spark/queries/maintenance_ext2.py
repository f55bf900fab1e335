"""Engine-maintenance extensions (r6, batch 10): incremental
aggregate-view maintenance and event-time disorder profiling (the
watermark advisor).

Incremental view maintenance is the CDC engine's reason to exist
downstream: a delta batch must update a materialized aggregate
without rescanning history. The query both PERFORMS the incremental
merge and PROVES it equals the full recompute, group by group — the
partial-aggregate merge property as data, not prose. The watermark
advisor answers the question every Structured Streaming deployment
asks ("how late is my data, so what watermark do I set?") from the
changelog itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# ---------------------------------------------------------------------
# Incremental aggregate-view maintenance
# ---------------------------------------------------------------------


@query(
    "q_maintenance_incremental_agg",
    oracle="""
    WITH base AS (
        SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'
    ),
    delta AS (
        SELECT * FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    ),
    base_agg AS (
        SELECT o_orderpriority, count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(38, 2))) AS rev
        FROM base GROUP BY o_orderpriority
    ),
    delta_agg AS (
        SELECT o_orderpriority, count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(38, 2))) AS rev
        FROM delta GROUP BY o_orderpriority
    ),
    incr AS (
        SELECT coalesce(b.o_orderpriority, d.o_orderpriority)
                   AS o_orderpriority,
               coalesce(b.n, 0) + coalesce(d.n, 0) AS n,
               coalesce(b.rev, 0) + coalesce(d.rev, 0) AS rev
        FROM base_agg b FULL OUTER JOIN delta_agg d
          ON b.o_orderpriority = d.o_orderpriority
    ),
    full_agg AS (
        SELECT o_orderpriority, count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(38, 2))) AS rev
        FROM orders GROUP BY o_orderpriority
    )
    SELECT i.o_orderpriority,
           CAST(i.n AS BIGINT) AS n_orders,
           CAST(i.rev AS VARCHAR) AS revenue,
           CAST(i.n <> f.n OR i.rev <> f.rev AS INT) AS mismatch
    FROM incr i JOIN full_agg f
      ON i.o_orderpriority = f.o_orderpriority
    """,
)
def q_maintenance_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance, self-verified:
    the view (orders count + exact revenue per priority) is updated by
    MERGING the pre-computed base aggregate with the delta batch's
    aggregate — a full-outer join on the group key with coalesced
    partial states — and the query compares that against the full
    recompute per group. ``mismatch`` must be all-zero BECAUSE count
    and DECIMAL sum are commutative-monoid states (the same property
    Spark's own partial aggregation relies upon); a non-mergeable
    statistic (a raw median) in the view would light this column up.

    Scale: this is THE 100 TB materialized-view pattern — the base
    never rescans (here it does once only to prove equality; in
    production the base_agg is the stored view), the delta is the
    day's partition, and the merge is group-key-sized. Exact DECIMAL
    state makes the merge bit-reproducible under any partitioning.
    """
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")
    dec = F.col("o_totalprice").cast("decimal(38,2)")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.sum(dec).alias("rev")
        )

    base_agg = agg(o.filter(F.col("o_orderdate") < cutoff))
    delta_agg = agg(o.filter(F.col("o_orderdate") >= cutoff))
    incr = (
        base_agg.alias("b")
        .join(
            delta_agg.alias("d"),
            F.col("b.o_orderpriority") == F.col("d.o_orderpriority"),
            "full_outer",
        )
        .select(
            F.coalesce(
                F.col("b.o_orderpriority"), F.col("d.o_orderpriority")
            ).alias("o_orderpriority"),
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("b.rev"), F.lit(0).cast("decimal(38,2)"))
                + F.coalesce(F.col("d.rev"), F.lit(0).cast("decimal(38,2)"))
            ).cast("decimal(38,2)").alias("rev"),
        )
    )
    full_agg = agg(o)
    return (
        incr.alias("i")
        .join(
            full_agg.alias("f"),
            F.col("i.o_orderpriority") == F.col("f.o_orderpriority"),
        )
        .select(
            F.col("i.o_orderpriority").alias("o_orderpriority"),
            F.col("i.n").alias("n_orders"),
            F.col("i.rev").cast("string").alias("revenue"),
            (
                (F.col("i.n") != F.col("f.n"))
                | (F.col("i.rev") != F.col("f.rev"))
            ).cast("int").alias("mismatch"),
        )
    )


# ---------------------------------------------------------------------
# Watermark advisor (event-time disorder profile)
# ---------------------------------------------------------------------


@query(
    "q_events_watermark_advisor",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts, event_id,
               epoch_ms(ts)
               + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                      AS BIGINT) % 120000 AS arr_ms
        FROM events
    ),
    arrivals AS (
        SELECT event_type, ts,
               max(ts) OVER (PARTITION BY event_type
                             ORDER BY arr_ms, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS hwm
        FROM seq
    ),
    lateness AS (
        SELECT event_type,
               CASE WHEN hwm IS NULL OR ts >= hwm THEN 0
                    ELSE epoch_ms(hwm) - epoch_ms(ts) END AS late_ms
        FROM arrivals
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(100.0 * sum(CAST(late_ms > 0 AS INT)) / count(*), 4)
               AS pct_out_of_order,
           round(quantile_cont(late_ms, 0.50) / 1000.0, 4) AS p50_late_s,
           round(quantile_cont(late_ms, 0.99) / 1000.0, 4) AS p99_late_s,
           CAST(ceil(quantile_cont(late_ms, 0.99) / 1000.0) AS BIGINT)
               AS suggested_watermark_s
    FROM lateness GROUP BY event_type
    """,
)
def q_events_watermark_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark advisor: profile event-time DISORDER in arrival order
    and recommend a watermark. An event is late by how far its
    timestamp trails the running event-time high-water mark at its
    arrival; the p99 lateness, rounded up to whole seconds, is the
    ``withWatermark`` setting that bounds state while dropping ≤1% of
    late data — the number every Structured Streaming deployment
    (`streaming/windows.py` included) otherwise guesses. The synthetic
    changelog is written in commit order (zero native disorder — the
    all-zeros vacuity trap), so arrival order is simulated with
    deterministic per-event network jitter (md5-hash, ≤120 s) — the
    profiling machinery is unchanged and runs as-is on a real
    changelog's arrival sequence.

    Scale: one key-partitioned running-max window in arrival order,
    one aggregate; lateness values are exact integer milliseconds.
    The exact quantile swaps for ``approx_percentile`` at 100 TB (the
    advisor needs two digits, not nine). The streaming twin maintains
    the same high-water mark as ``mapGroupsWithState``.
    """
    e = load_table(spark, sf_dir, "events")
    jitter = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 120000
    )
    seq = e.select(
        "event_type", "ts", "event_id",
        (F.unix_millis("ts") + jitter).alias("arr_ms"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("arr_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arrivals = seq.select(
        "event_type", "ts", F.max("ts").over(w).alias("hwm")
    )
    late_ms = F.when(
        F.col("hwm").isNull() | (F.col("ts") >= F.col("hwm")), F.lit(0)
    ).otherwise(F.unix_millis("hwm") - F.unix_millis("ts"))
    lateness = arrivals.select("event_type", late_ms.alias("late_ms"))
    return lateness.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            100.0 * F.sum((F.col("late_ms") > 0).cast("int")) / F.count(F.lit(1)),
            4,
        ).alias("pct_out_of_order"),
        F.round(F.expr("percentile(late_ms, 0.50)") / 1000.0, 4).alias(
            "p50_late_s"
        ),
        F.round(F.expr("percentile(late_ms, 0.99)") / 1000.0, 4).alias(
            "p99_late_s"
        ),
        F.ceil(F.expr("percentile(late_ms, 0.99)") / 1000.0)
        .cast("bigint")
        .alias("suggested_watermark_s"),
    )
