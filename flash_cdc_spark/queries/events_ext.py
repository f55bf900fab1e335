"""Extended event-analytics queries (r3, registered PAST the driver
window — r4 rotation candidates; continuously checked by the local
oracle mimic).

The funnel and cohort-retention shapes are the standard product-
analytics workloads a warehouse engine is expected to run over an
events table; both reduce to one or two key-uniform shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


@query(
    "q_events_funnel_conversion",
    oracle="""
    WITH peru AS (
        SELECT user_id,
               list_sort(list({'ts': ts, 'et': event_type})) AS evs
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id
    ),
    stages AS (
        SELECT user_id,
               list_min(list_transform(
                   list_filter(evs, e -> e.et = 'view'), e -> e.ts)) AS v_ts
        FROM peru
    ),
    s2 AS (
        SELECT p.user_id, s.v_ts,
               list_min(list_transform(
                   list_filter(p.evs,
                       e -> e.et = 'click' AND s.v_ts IS NOT NULL
                            AND e.ts >= s.v_ts),
                   e -> e.ts)) AS c_ts
        FROM peru p JOIN stages s USING (user_id)
    ),
    s3 AS (
        SELECT p.user_id, s2.v_ts, s2.c_ts,
               list_min(list_transform(
                   list_filter(p.evs,
                       e -> e.et = 'purchase' AND s2.c_ts IS NOT NULL
                            AND e.ts >= s2.c_ts),
                   e -> e.ts)) AS p_ts
        FROM peru p JOIN s2 USING (user_id)
    )
    SELECT CAST(count(v_ts) AS BIGINT)               AS n_viewed,
           CAST(count(c_ts) AS BIGINT)               AS n_clicked_after_view,
           CAST(count(p_ts) AS BIGINT)               AS n_purchased_after_click,
           round(count(c_ts) / CAST(count(v_ts) AS DOUBLE), 6) AS view_to_click,
           round(count(p_ts) / CAST(count(c_ts) AS DOUBLE), 6) AS click_to_purchase
    FROM s3
    """,
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts a stage only with an event AT OR AFTER their previous
    stage's first event. Shape: ONE shuffle (groupBy user) collecting
    the user's (ts, type) pairs into a sorted array, then pure
    higher-order functions find the stage times — per-user event counts
    are human-bounded, so the collected groups stay small at any corpus
    scale, and the final funnel is a partial-aggregatable count."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    evs = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("et")))
    )
    peru = e.groupBy("user_id").agg(evs.alias("evs"))

    def first_ts(arr, et, not_before):
        cand = F.filter(
            arr,
            lambda x: (x["et"] == et)
            & (F.lit(True) if not_before is None else not_before.isNotNull() & (x["ts"] >= not_before)),
        )
        return F.array_min(F.transform(cand, lambda x: x["ts"]))

    staged = (
        peru.withColumn("v_ts", first_ts(F.col("evs"), "view", None))
        .withColumn("c_ts", first_ts(F.col("evs"), "click", F.col("v_ts")))
        .withColumn("p_ts", first_ts(F.col("evs"), "purchase", F.col("c_ts")))
    )
    return staged.agg(
        F.count("v_ts").alias("n_viewed"),
        F.count("c_ts").alias("n_clicked_after_view"),
        F.count("p_ts").alias("n_purchased_after_click"),
        F.round(F.count("c_ts") / F.count("v_ts").cast("double"), 6).alias(
            "view_to_click"
        ),
        F.round(F.count("p_ts") / F.count("c_ts").cast("double"), 6).alias(
            "click_to_purchase"
        ),
    )


@query(
    "q_events_cohort_retention",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    cohorts AS (
        SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS INT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT)          AS n_active
    FROM activity a JOIN cohorts c USING (user_id)
    WHERE date_diff('day', c.cohort_day, a.day) <= 7
    GROUP BY 1, 2
    """,
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, the
    matrix counts distinct users still active N days later (N ≤ 7).
    Shape: dedup to (user, day) → per-user min (both shuffle on
    user_id) → re-join on user_id (co-partitioned — AQE reuses the
    exchange) → count-distinct keyed by (cohort, offset). Every shuffle
    keys on user_id or the small (cohort, offset) grid; no skew, no
    broadcast of anything user-sized."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    offset = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .filter(offset <= 7)
        .groupBy("cohort_day", offset.cast("int").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "q_streaming_stream_stream_join",
    oracle="""
    SELECT p.user_id,
           p.event_id        AS purchase_id,
           epoch_ms(p.ts)    AS purchase_ms,
           round(p.value, 2) AS purchase_value,
           c.event_id        AS click_id,
           epoch_ms(c.ts)    AS click_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
)
def q_streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed stream-stream interval join, oracle-checked
    (the fourth streaming-executed driver row): a real Structured
    Streaming job joins the purchase stream to the click stream of the
    same user within a 30-minute look-back, and the appended sink must
    equal the batch inner join with the identical interval predicate.

    Scale shape: both sides watermarked (1 h), so Spark's join state
    buffers only watermark + interval of each stream per key and evicts
    the rest — the attribution join of a 100 TB event pipeline, where
    an unwatermarked stream-stream join would buffer both streams
    forever. Inner-join matches emit in the micro-batch they are found;
    the watermark exists purely to bound state."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming.windows import stream_stream_purchase_after_click

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    workdir = tempfile.mkdtemp(prefix="flash_ssj_")
    try:
        src = f"{workdir}/src"
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = stream_stream_purchase_after_click(
            stream, within="30 minutes", watermark="1 hour"
        ).select(
            "user_id",
            "purchase_id",
            F.unix_millis("purchase_ts").alias("purchase_ms"),
            F.round("purchase_value", 2).alias("purchase_value"),
            "click_id",
            F.unix_millis("click_ts").alias("click_ms"),
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{workdir}/out")
            .option("checkpointLocation", f"{workdir}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        from flash_cdc_spark.streaming import await_or_fail

        await_or_fail(q)
        rows = spark.read.parquet(f"{workdir}/out").collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id bigint, purchase_id bigint, purchase_ms bigint, "
        "purchase_value double, click_id bigint, click_ms bigint",
    )


@query(
    "q_streaming_running_totals",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed custom stateful operator
    (``applyInPandasWithState``), oracle-checked — the fifth
    streaming-executed driver row, and the one that externally
    validates the arbitrary-state API the reference's replay cursor
    maps onto: a real streaming job maintains per-user (count, sum)
    state in Arrow-batched pandas groups, emitting the running total
    each micro-batch; the LAST emission per user (largest n_events —
    the count is monotone per key) must equal the batch
    ``groupBy(user).count/sum``.

    Scale shape: state is one (bigint, double) pair per user — bytes
    per key, shuffled once on user_id; emissions flow through
    ``foreachBatch`` because the file sink cannot take update-mode
    output. The state store, not the stream length, bounds memory."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming.windows import running_user_totals

    batch = load_table(spark, sf_dir, "events").select("user_id", "value")
    workdir = tempfile.mkdtemp(prefix="flash_rt_")
    try:
        src = f"{workdir}/src"
        out = f"{workdir}/out"
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        totals = running_user_totals(stream)

        def sink(bdf: DataFrame, _bid: int) -> None:
            bdf.write.mode("append").parquet(out)

        q = (
            totals.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{workdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        from flash_cdc_spark.streaming import await_or_fail

        await_or_fail(q)
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        rows = (
            spark.read.parquet(out)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "n_events",
                F.round("total_value", 2).alias("total_value"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows, "user_id bigint, n_events bigint, total_value double"
    )


@query(
    "q_changefeed_latest_snapshot",
    oracle="""
    SELECT user_id, event_type, event_id,
           epoch_ms(ts)      AS commit_ms,
           round(value, 2)   AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_changefeed_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current-state table: the canonical CDC downstream
    materialization (what every consumer of the reference's change
    feed ultimately builds) — per record key (user_id, event_type),
    keep only the most recent change. One shuffle on the key, then a
    linear window pass; at 100 TB this is the compaction step that
    turns an append-only changelog into a queryable snapshot, and the
    key partitioning makes it embarrassingly parallel. Tie-break on
    event_id so the winner is total-ordered on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_millis("ts").alias("commit_ms"),
            F.round("value", 2).alias("value"),
        )
    )


@query(
    "q_changefeed_scd2_history",
    oracle="""
    SELECT user_id, event_type, event_id,
           CAST(row_number() OVER w AS INT)     AS version,
           epoch_ms(ts)                         AS valid_from_ms,
           epoch_ms(lead(ts) OVER w)            AS valid_to_ms,
           CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def q_changefeed_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD-type-2 history table: each change event becomes
    a versioned row with a validity interval [valid_from, valid_to) —
    valid_to is the NEXT change's timestamp (NULL ⇒ current row) — the
    other standard CDC materialization next to the latest-state
    snapshot. Single window pass per record key: one shuffle on
    (user_id, event_type), then lead()/row_number() in the same sorted
    pass — linear at 100 TB, no self-join (the naive interval build
    joins the changelog to itself). Unique (ts, event_id) ordering
    makes the intervals engine-deterministic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        "event_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        F.isnull(nxt).cast("int").alias("is_current"),
    )


@query(
    "q_events_cogroup_enrich",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id,
           CAST(p.user_id AS BIGINT)   AS user_id,
           CAST(count(c.ts) AS BIGINT) AS n_clicks_prior_1h
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q_events_cogroup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the two-sided Arrow escape hatch
    (``groupBy().cogroup().applyInPandas``), the API for per-key merges
    whose logic doesn't fit a join condition: each purchase is enriched
    with the user's click count in the hour before it. The pandas fn
    gets BOTH sides' rows for one user as aligned DataFrames and
    binary-searches the sorted click times — O((p+c)·log c) per user
    instead of the oracle's O(p·c) inequality join. Shape: one shuffle
    per side on user_id (co-partitioned by the cogroup), Arrow-batched
    per-group execution, no driver involvement — the same plan at
    100 TB, with user_id uniform so no hot keys. Keys present on only
    one side still reach the fn (empty frame), matching the LEFT join.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # Catalyst prunes UNUSED input columns into the cogroup UDF
        # (e.g. under a bare .count() no output column is consumed and
        # the non-key side arrives key-only), so guard every access:
        # row COUNT must stay exact even when values are never read.
        n = len(left.index)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "n_clicks_prior_1h": pd.Series([], dtype="int64"),
                }
            )

        def col(df: pd.DataFrame, name: str, length: int):
            if name in df.columns:
                return df[name].to_numpy()
            return np.zeros(length, dtype="int64")

        if "ts" in left.columns and "ts" in right.columns and len(right.index):
            p_ts = left["ts"].to_numpy()
            c_ts = np.sort(right["ts"].to_numpy())
            lo = np.searchsorted(c_ts, p_ts - np.timedelta64(1, "h"), side="left")
            hi = np.searchsorted(c_ts, p_ts, side="left")
            n_clicks = (hi - lo).astype("int64")
        else:
            n_clicks = np.zeros(n, dtype="int64")
        return pd.DataFrame(
            {
                "event_id": col(left, "event_id", n),
                "user_id": col(left, "user_id", n),
                "n_clicks_prior_1h": n_clicks,
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge, schema="event_id bigint, user_id bigint, n_clicks_prior_1h bigint"
        )
    )


@query(
    "q_streaming_session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT user_id,
           epoch_ms(min(ts))           AS session_start_ms,
           epoch_ms(max(ts)) + 1800000 AS session_end_ms,
           CAST(count(*) AS BIGINT)    AS n_events,
           round(sum(value), 2)        AS session_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed native ``session_window`` aggregation,
    oracle-checked (the sixth streaming-executed driver row): a real
    Structured Streaming job runs the gap-based session merge
    (reference gap semantics: ``q_events_sessionize``'s lag/cumsum
    twin, but computed by the streaming state store), and the appended
    sink must equal the batch gaps-and-islands SQL.

    End-of-stream flush: append mode only emits sessions already closed
    by the watermark, so after the data pass a single far-future
    SENTINEL event (user_id -1) is appended and the query restarted
    from its checkpoint — the sentinel advances the global watermark
    past every real session's end, flushing all state. The restart also
    re-proves checkpoint recovery on a stateful query.

    Session-boundary parity: Spark merges an event arriving at or
    before last_ts + gap (closed boundary — pinned by
    ``test_session_window_gap_boundary_semantics``), so a new session
    starts only when the gap is STRICTLY greater: the oracle's is_new
    test is ``> 1800000``, same as ``q_events_sessionize``;
    ``session_window.end`` is last event + gap, mirrored as
    ``epoch_ms(max(ts)) + 1800000``.

    Scale shape: state is one merged-window span per (user, open
    session), shuffled once on user_id, evicted at the watermark — the
    standard sessionization front of a 100 TB clickstream pipeline."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming.windows import session_windows

    batch = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    workdir = tempfile.mkdtemp(prefix="flash_sess_")
    try:
        src = f"{workdir}/src"
        out = f"{workdir}/out"
        batch.write.parquet(src)

        def run_pass() -> None:
            stream = spark.readStream.schema(batch.schema).parquet(src)
            sessions = session_windows(stream, gap="30 minutes", watermark="30 minutes")
            q = (
                sessions.select(
                    "user_id",
                    F.unix_millis("session_start").alias("session_start_ms"),
                    F.unix_millis("session_end").alias("session_end_ms"),
                    "n_events",
                    F.round("session_value", 2).alias("session_value"),
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", f"{workdir}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            from flash_cdc_spark.streaming import await_or_fail

            await_or_fail(q)

        run_pass()  # pass 1: all real events
        # pass 2: sentinel advances the watermark past every session end
        max_ts = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
        sentinel = spark.createDataFrame(
            [(-1, max_ts, 0.0)], "user_id bigint, ts timestamp, value double"
        ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 3 HOURS"))
        sentinel.write.mode("append").parquet(src)
        run_pass()

        rows = (
            spark.read.parquet(out).filter(F.col("user_id") >= 0).collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id bigint, session_start_ms bigint, session_end_ms bigint, "
        "n_events bigint, session_value double",
    )


@query(
    "q_streaming_latest_state",
    oracle="""
    SELECT user_id, event_type, event_id,
           epoch_ms(ts)      AS commit_ms,
           round(value, 2)   AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_streaming_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed CDC upsert (the seventh streaming-executed
    driver row): a real Structured Streaming job merges the change
    stream micro-batch by micro-batch into a bucketed latest-state
    parquet table (``streaming/upsert.py`` — delta-latest reduction,
    touched-bucket pruning, dynamic partition overwrite), across
    MULTIPLE micro-batches (the source is split into thirds and fed
    with ``maxFilesPerTrigger=1``, so later batches must genuinely
    merge against persisted state, not just write once). The final
    table must equal the batch ``row_number() = 1`` snapshot — the same
    oracle as the batch twin ``q_changefeed_latest_snapshot``."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming.upsert import streaming_latest_state

    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    workdir = tempfile.mkdtemp(prefix="flash_upsert_")
    try:
        src = f"{workdir}/src"
        # three source files → three micro-batches at maxFilesPerTrigger=1
        for third in range(3):
            batch.filter(F.pmod(F.col("event_id"), F.lit(3)) == third).coalesce(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = streaming_latest_state(
            stream, f"{workdir}/state", f"{workdir}/ckpt"
        )
        from flash_cdc_spark.streaming import await_or_fail

        await_or_fail(q)
        rows = (
            spark.read.parquet(f"{workdir}/state")
            .select(
                "user_id",
                "event_type",
                "event_id",
                F.unix_millis("ts").alias("commit_ms"),
                F.round("value", 2).alias("value"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id bigint, event_type string, event_id bigint, "
        "commit_ms bigint, value double",
    )


@query(
    "q_streaming_dim_enrich",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           e.event_type,
           round(e.value, 2)  AS value,
           c.c_name           AS user_name,
           c.c_mktsegment     AS segment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_streaming_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed stream-static dimension enrichment (the
    eighth streaming-executed driver row): a real Structured Streaming
    job left-joins the event stream against the customer dimension
    (broadcast per micro-batch — the static side is re-resolved each
    batch, so a refreshed dim is picked up mid-stream), and the
    appended sink must equal the batch left join.

    Scale shape: the canonical stream enrichment of a 100 TB event
    pipeline — the dim broadcasts (no stream-side shuffle, no state
    store at all; contrast the stream-stream interval join, which must
    buffer both sides). Multiple micro-batches (maxFilesPerTrigger)
    prove the per-batch dim re-resolution path."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming import await_or_fail
    from flash_cdc_spark.streaming.windows import stream_static_enrich

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    workdir = tempfile.mkdtemp(prefix="flash_enrich_")
    try:
        src = f"{workdir}/src"
        for half in range(2):
            batch.filter(F.pmod(F.col("event_id"), F.lit(2)) == half).coalesce(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = stream_static_enrich(stream, dim, on="user_id").select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            "user_name",
            "segment",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{workdir}/out")
            .option("checkpointLocation", f"{workdir}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_fail(q)
        rows = spark.read.parquet(f"{workdir}/out").collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, value double, "
        "user_name string, segment string",
    )


@query(
    "q_streaming_scd2_history",
    oracle="""
    SELECT user_id, event_type, event_id,
           CAST(row_number() OVER w AS INT)     AS version,
           epoch_ms(ts)                         AS valid_from_ms,
           epoch_ms(lead(ts) OVER w)            AS valid_to_ms,
           CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def q_streaming_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed SCD2 history materialization (the ninth
    streaming-executed driver row): ``streaming_scd2_history`` merges
    three real micro-batches into the bucketed version-history table.
    The thirds split by ``event_id % 3`` delivers each key's events
    OUT of time order across batches, so later batches must
    retroactively insert versions between existing ones and re-stamp
    their neighbors' validity windows — the late-data revision property
    the recompute-per-touched-bucket design exists for. Final table
    must equal the batch SCD2 window oracle (same as the batch twin
    ``q_changefeed_scd2_history``)."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming import await_or_fail
    from flash_cdc_spark.streaming.upsert import streaming_scd2_history

    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    workdir = tempfile.mkdtemp(prefix="flash_scd2_")
    try:
        src = f"{workdir}/src"
        for third in range(3):
            batch.filter(F.pmod(F.col("event_id"), F.lit(3)) == third).coalesce(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = streaming_scd2_history(stream, f"{workdir}/state", f"{workdir}/ckpt")
        await_or_fail(q)
        rows = (
            spark.read.parquet(f"{workdir}/state")
            .select(
                "user_id",
                "event_type",
                "event_id",
                "version",
                "valid_from_ms",
                "valid_to_ms",
                "is_current",
            )
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id bigint, event_type string, event_id bigint, version int, "
        "valid_from_ms bigint, valid_to_ms bigint, is_current int",
    )


@query(
    "q_events_anomaly_zscore",
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
               s / n AS mu,
               sqrt(greatest(0, (q - s * (s / n)) / (n - 1))) AS sigma
        FROM moments
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 2)                        AS value,
           round((e.value - s.mu) / s.sigma, 4)     AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 3
    """,
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flagging: events whose value sits more than 3
    sample standard deviations from their type's mean — the monitoring
    primitive every event pipeline runs before alerting.

    Scale shape: the per-type stats are a partial-aggregable groupBy on
    a tiny key (5 types), broadcast back onto the stream — one full
    shuffle-free scan plus a broadcast join; output is the anomaly tail
    only.

    Degenerate types (sigma = 0: every event shares one value) are
    excluded EXPLICITLY on both engines — Spark's non-ANSI divide would
    NULL the z-score while DuckDB's IEEE divide yields ±inf, the kind
    of engine divergence a constant-valued type would surface."""
    e = load_table(spark, sf_dir, "events")
    # mu/sigma from EXACT decimal moments (value is a 2-dp money-like
    # double, so sum and sum-of-squares are exact in DECIMAL and the
    # remaining double arithmetic is the identical expression tree on
    # both engines) — a raw avg/stddev_samp over doubles is fold-order-
    # sensitive at bit level, the r8 strict-rule residual class.
    vdec = F.col("value").cast("decimal(18,2)")
    moments = e.groupBy("event_type").agg(
        F.sum(vdec).cast("double").alias("s"),
        F.sum(vdec * vdec).cast("double").alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    stats = moments.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mu"),
        # radicand clamped at 0 on BOTH engines (ADVICE r9): floating
        # cancellation on a near-constant group can make it a tiny
        # negative, where DuckDB's sqrt hard-errors while Spark returns
        # NaN (and NaN > 0 is TRUE under Spark's ordering) — the clamp
        # gives sigma = 0, excluded identically by the sigma > 0 gate.
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                (F.col("q") - F.col("s") * (F.col("s") / F.col("n")))
                / (F.col("n") - 1),
            )
        ).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) > 3))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@query(
    "q_streaming_feed_outbox",
    oracle="""
    SELECT CAST(event_id AS BIGINT)            AS replay_seq,
           'evt-' || CAST(event_id AS VARCHAR) AS out_event_id,
           '/data/EventChange'                 AS topic_name,
           'schema-v1'                         AS schema_id,
           CAST(length(CAST(user_id AS VARCHAR) || ':' || event_type) AS INT)
               AS payload_len
    FROM events WHERE event_id % 5 = 0
    """,
)
def q_streaming_feed_outbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed 2PC feed outbox (K6; the tenth
    streaming-executed driver row): a real Structured Streaming job
    publishes the event stream through the custom ``flashfeed``
    DataSourceStreamWriter — executor-staged JSONL fragments, driver
    append on commit, committed-epoch sidecar — across THREE
    micro-batches, then the feed log is read back through the matching
    batch reader and value-compared against the relational projection
    of the same events. Explicit producer replay_seq keeps the output
    deterministic (bus assignment order varies with task scheduling);
    every envelope field and the payload length must round-trip the
    wire format exactly."""
    import shutil
    import tempfile

    from flash_cdc_spark.sources.flashfeed import FlashFeedDataSource
    from flash_cdc_spark.streaming import await_or_fail

    try:
        spark.dataSource.register(FlashFeedDataSource)
    except Exception:
        pass  # already registered on this session
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    env = ev.select(
        F.concat(F.lit("evt-"), F.col("event_id").cast("string")).alias("event_id"),
        F.col("event_id").cast("bigint").alias("replay_seq"),
        F.lit("/data/EventChange").alias("topic_name"),
        F.lit("schema-v1").alias("schema_id"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")
        ).alias("payload"),
    )
    workdir = tempfile.mkdtemp(prefix="flash_outbox_")
    try:
        src = f"{workdir}/src"
        for third in range(3):  # three files -> three micro-batches
            env.filter(F.pmod(F.col("replay_seq"), F.lit(3)) == third).coalesce(
                1
            ).write.mode("append").parquet(src)
        feed = f"{workdir}/feed.jsonl"
        stream = (
            spark.readStream.schema(env.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        await_or_fail(
            stream.writeStream.format("flashfeed")
            .option("path", feed)
            .option("checkpointLocation", f"{workdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        rows = (
            spark.read.format("flashfeed")
            .option("path", feed)
            .load()
            .select(
                "replay_seq",
                F.col("event_id").alias("out_event_id"),
                "topic_name",
                "schema_id",
                F.length("payload").cast("int").alias("payload_len"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "replay_seq bigint, out_event_id string, topic_name string, "
        "schema_id string, payload_len int",
    )


@query(
    "q_events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS nxt1,
               lead(event_type, 2) OVER w AS nxt2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT event_type || ' > ' || nxt1 || ' > ' || nxt2 AS path
        FROM seq WHERE nxt2 IS NOT NULL
    ),
    counted AS (
        SELECT path, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, path) AS rk
        FROM paths GROUP BY path
    )
    SELECT path, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk
    FROM counted WHERE rk <= 20
    """,
)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 20 most common 3-step event-type
    sequences across users (the clickstream question funnels and
    Markov transitions approximate from fixed templates — this one
    DISCOVERS the templates). One user-keyed shuffle builds ordered
    per-user sequences via two `lead()`s in a single window pass (no
    self-joins, no per-user collect), then a path-keyed count and a
    20-row TakeOrdered — path cardinality is |event_types|³-bounded,
    so the second shuffle is tiny at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).filter(F.col("nxt2").isNotNull())
    counted = (
        seq.select(
            F.concat_ws(" > ", "event_type", "nxt1", "nxt2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), "path")
    return (
        counted.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select("path", "n", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "q_streaming_db_upsert",
    oracle="""
    SELECT user_id, event_type, event_id,
           epoch_ms(ts)      AS commit_ms,
           round(value, 2)   AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_streaming_db_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed transactional DB sink (the eleventh
    streaming-executed driver row; reference parity with its
    Postgres-consumer delivery, ``app/services/processor.py``): a real
    streaming job upserts the change stream micro-batch by micro-batch
    into a sqlite table, with the batch-id ledger and the per-key
    conditional upsert sharing ONE transaction — exactly-once in the
    database under at-least-once replay. The final table must equal
    the batch latest-snapshot relation, same oracle as the parquet
    merge sink."""
    import shutil
    import tempfile

    from flash_cdc_spark.streaming import await_or_fail
    from flash_cdc_spark.streaming.dbsink import read_db_state, streaming_db_upsert

    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    workdir = tempfile.mkdtemp(prefix="flash_dbsink_")
    try:
        src = f"{workdir}/src"
        for third in range(3):
            batch.filter(F.pmod(F.col("event_id"), F.lit(3)) == third).coalesce(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        await_or_fail(
            streaming_db_upsert(stream, f"{workdir}/state.db", f"{workdir}/ckpt")
        )
        rows = (
            read_db_state(spark, f"{workdir}/state.db")
            .select(
                "user_id",
                "event_type",
                "event_id",
                "commit_ms",
                F.round("value", 2).alias("value"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id bigint, event_type string, event_id bigint, "
        "commit_ms bigint, value double",
    )


@query(
    "q_events_resample_locf",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('hour', min(ts)) AS t0,
               date_trunc('hour', max(ts)) AS t1
        FROM events WHERE user_id < 40 GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
        FROM bounds
    ),
    hourly AS (
        SELECT user_id, slot, obs FROM (
            SELECT user_id, date_trunc('hour', ts) AS slot, value AS obs,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id < 40
        ) WHERE rn = 1
    )
    SELECT g.user_id,
           epoch_ms(g.slot) AS slot_ms,
           CAST(h.obs IS NOT NULL AS INT) AS observed,
           round(last_value(h.obs IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value
    FROM grid g LEFT JOIN hourly h
      ON h.user_id = g.user_id AND h.slot = g.slot
    """,
)
def q_events_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a regular 1-hour grid with
    last-observation-carried-forward — the gap-fill operator every
    hypertable/metrics store exposes (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``), and the feature-engineering
    step that turns irregular event streams into fixed-step model
    inputs. Per user: hourly slots spanning the user's own active
    range (``sequence`` + explode — grid generation is JVM-side),
    hourly observations reduce by latest (ts, event_id), and gaps fill
    via ``last(obs, ignorenulls)`` over an unbounded-preceding row
    window.

    Scale shape: one user-keyed shuffle shared by the bounds and
    hourly aggregates, the grid explode is linear in slots, and the
    LOCF window is the same partition key — no extra exchange. Grid
    density is bounded per key (a user's active hours), never a global
    calendar cross-join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("slot"),
    )
    hourly = (
        ev.withColumn("slot", F.date_trunc("hour", "ts"))
        .groupBy("user_id", "slot")
        .agg(
            F.max_by("value", F.struct("ts", "event_id")).alias("obs")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "slot"], "left")
        .select(
            "user_id",
            F.unix_millis("slot").alias("slot_ms"),
            F.col("obs").isNotNull().cast("int").alias("observed"),
            F.round(F.last("obs", ignorenulls=True).over(w), 2).alias("value"),
        )
    )


@query(
    "q_events_peak_concurrency",
    oracle="""
    WITH bounds AS (
        SELECT event_type, epoch_ms(ts) AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, epoch_ms(ts) + 1800000, -1 FROM events
    ),
    swept AS (
        SELECT event_type,
               sum(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS active
        FROM bounds
    )
    SELECT event_type,
           CAST(max(active) AS BIGINT) AS peak_concurrency,
           CAST(count(*) / 2 AS BIGINT) AS n_intervals
    FROM swept GROUP BY event_type
    """,
)
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency by the classic sweep line: each event
    opens a 30-minute half-open activity interval; +1/-1 boundary
    deltas sort by (time, delta) — ends before starts at the same
    instant — and a running sum over that order is the live
    concurrency gauge, whose max is the capacity-planning number
    (simultaneous sessions, connections, streams). Determinism under
    ties: equal-key runs are all +1s or all -1s, so the prefix-maximum
    is order-independent within a run.

    Scale shape: one union (map-side), one event_type-keyed shuffle for
    the running-sum window, one aggregate. The interval list is never
    joined against itself — the O(n²) overlap-join formulation this
    replaces."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.unix_millis("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.unix_millis("ts") + F.lit(1_800_000)).alias("t"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bounds.withColumn("active", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(
            F.max("active").cast("bigint").alias("peak_concurrency"),
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
        )
    )


@query(
    "q_events_rolling_active_users",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM activity)
    SELECT d.day,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM days d JOIN activity a
      ON a.day <= d.day AND a.day > d.day - INTERVAL 7 DAY
    GROUP BY d.day
    """,
)
def q_events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the sliding
    DISTINCT-count, which no window function computes directly
    (count-distinct isn't decomposable over sliding frames). The
    relational shape: dedup to (day, user) once, then a bounded range
    join of the day grid against that activity set and a distinct
    count per day.

    Scale shape: the activity dedup is one (day, user) shuffle; the
    range join fans each activity row out to ≤ 7 grid days (bounded by
    the window width, not data), so the join output is 7× the deduped
    activity — linear. The day grid is calendar-sized. This beats the
    naive events×days join (which would fan out raw events) by
    deduplicating FIRST."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = activity.select("day").distinct().select(F.col("day").alias("grid_day"))
    return (
        activity.join(
            days,
            (F.col("day") <= F.col("grid_day"))
            & (F.col("day") > F.col("grid_day") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy(F.col("grid_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "q_events_value_histogram",
    oracle="""
    WITH bounds AS (
        SELECT min(value) AS lo, max(value) AS hi FROM events
    ),
    binned AS (
        SELECT event_type,
               least(CAST(floor((value - lo) / ((hi - lo) / 16.0)) AS INT), 15) AS bin
        FROM events CROSS JOIN bounds
    )
    SELECT event_type, bin,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY event_type, bin
    """,
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 16-bin histogram of event values per type — the
    distribution-profiling primitive behind data drift checks and UI
    sparklines. Global (lo, hi) bounds broadcast as a one-row scalar
    (one pass), then binning is pure arithmetic and the count keys on
    (type, bin) — a 16·|types|-cell aggregate, map-side combined. The
    top bin is closed (least(..., 15)) so hi lands in bin 15 on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(16.0)
    bin_col = F.least(
        F.floor((F.col("value") - F.col("lo")) / width).cast("int"), F.lit(15)
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select("event_type", bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_events_ts_profile_similarity",
    oracle="""
    WITH cells AS (
        SELECT user_id, hour(ts) AS hod,
               round(CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE)
                     / count(*), 9) AS v
        FROM events GROUP BY user_id, hour(ts)
    ),
    users AS (SELECT DISTINCT user_id FROM cells),
    grid AS (
        SELECT u.user_id, CAST(h AS INT) AS hod,
               coalesce(c.v, 0.0) AS v
        FROM users u
        CROSS JOIN (SELECT unnest(range(24)) AS h)
        LEFT JOIN cells c
          ON c.user_id = u.user_id AND c.hod = CAST(h AS INT)
    ),
    stats AS (
        SELECT user_id, round(avg(v), 9) AS mu,
               round(stddev_samp(v), 9) AS sigma
        FROM grid GROUP BY user_id
    ),
    z AS (
        SELECT g.user_id, g.hod,
               round((g.v - s.mu) / s.sigma, 9) AS z
        FROM grid g JOIN stats s ON s.user_id = g.user_id
        WHERE s.sigma > 0
    ),
    probes AS (
        SELECT DISTINCT user_id FROM z ORDER BY user_id LIMIT 3
    ),
    dist AS (
        SELECT p.user_id AS probe_user, c.user_id AS candidate_user,
               round(sum((pz.z - c.z) * (pz.z - c.z)), 6) AS sq_dist
        FROM probes p
        JOIN z pz ON pz.user_id = p.user_id
        JOIN z c ON c.hod = pz.hod AND c.user_id <> p.user_id
        GROUP BY p.user_id, c.user_id
    )
    SELECT probe_user, candidate_user, sq_dist,
           CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_user
            ORDER BY sq_dist, candidate_user) AS rk
        FROM dist
    ) WHERE rk <= 5
    """,
)
def q_events_ts_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over user activity profiles (the
    distributed top-k ts-similarity shape of the EDBT'19/'20 and
    REPOSE/ICDE'21 line of work, re-expressed relationally): each user
    is a z-normalized 24-hour mean-value profile, and for 3 probe
    users the 5 nearest neighbors by squared Euclidean distance come
    back. Shape at 100 TB: the profile build is ONE
    groupBy(user_id, hour) over the facts (linear, partial-agg); the
    dense 24-cell grid and z-normalization are per-user arithmetic;
    the probe side is 3×24 rows — BROADCAST — so the distance join
    touches each candidate cell a constant number of times (no n²
    user-pair blowup; k·n by construction, the same probe-broadcast
    device as the ANN queries), and the per-probe rank window
    partitions on probe_user (3 partitions, n rows each — no global
    sort). Flat cells (σ=0) are excluded rather than divided by zero.
    9-dp profile / 6-dp distance rounding + candidate tie-break make
    the ranking cross-engine exact."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select("user_id", F.hour("ts").alias("hod"), "value")
        .groupBy("user_id", "hod")
        # exact decimal total / count, rounded at the 9-dp cell contract:
        # deterministic regardless of fold order (r8 strict rule)
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("v")
        )
    )
    users = cells.select("user_id").distinct()
    hods = spark.range(24).select(F.col("id").cast("int").alias("hod"))
    grid = (
        users.crossJoin(F.broadcast(hods))
        .join(cells, ["user_id", "hod"], "left")
        .select("user_id", "hod", F.coalesce("v", F.lit(0.0)).alias("v"))
    )
    stats = grid.groupBy("user_id").agg(
        F.round(F.avg("v"), 9).alias("mu"),
        F.round(F.stddev_samp("v"), 9).alias("sigma"),
    )
    z = (
        grid.join(stats, "user_id")
        .filter(F.col("sigma") > 0)
        .select(
            "user_id",
            "hod",
            F.round((F.col("v") - F.col("mu")) / F.col("sigma"), 9).alias("z"),
        )
        .localCheckpoint(eager=False)  # feeds probe AND candidate sides
    )
    probe_ids = z.select("user_id").distinct().orderBy("user_id").limit(3)
    probe_cells = z.join(probe_ids, "user_id").select(
        F.col("user_id").alias("probe_user"),
        "hod",
        F.col("z").alias("pz"),
    )
    dist = (
        z.join(F.broadcast(probe_cells), "hod")
        .filter(F.col("user_id") != F.col("probe_user"))
        .groupBy("probe_user", F.col("user_id").alias("candidate_user"))
        .agg(
            F.round(
                F.sum((F.col("pz") - F.col("z")) * (F.col("pz") - F.col("z"))),
                6,
            ).alias("sq_dist")
        )
    )
    w = Window.partitionBy("probe_user").orderBy("sq_dist", "candidate_user")
    return (
        dist.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
    )
