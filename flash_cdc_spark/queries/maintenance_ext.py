"""Driver-checked table-maintenance evidence (r4): compaction has been
pytest-only since r3 (`tests/test_maintenance.py`); this query runs the
REAL compaction operator inside the driver gate and value-compares the
content invariants a rewrite must preserve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


@query(
    "q_maintenance_compaction",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)               AS n_rows,
           CAST(sum(event_id) AS BIGINT)          AS sum_event_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(event_id) AS BIGINT)          AS min_event_id,
           CAST(max(event_id) AS BIGINT)          AS max_event_id,
           round(CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE), 2)
                                                  AS sum_value,
           CAST(1 AS INT)                         AS files_reduced
    FROM events
    """,
)
def q_maintenance_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction, driver-value-compared end to end: the
    events table is written as a deliberately fragmented 48-file copy
    (a CDC ingest tail), compacted through the real
    ``compact_parquet_table`` operator (one ``repartitionByRange``
    shuffle + census-verified atomic swap), and the COMPACTED layout is
    then read back and aggregated. The oracle computes the same content
    invariants from the original table — a rewrite that drops,
    duplicates, or corrupts any row mismatches on count / id-sum /
    distinct-users / min-max / value-sum. ``files_reduced`` pins the
    point of the exercise: the rewrite actually collapsed the file
    count (the relational constant 1 on the oracle side)."""
    import shutil
    import tempfile

    from flash_cdc_spark.operators.maintenance import compact_parquet_table

    events = load_table(spark, sf_dir, "events")
    workdir = tempfile.mkdtemp(prefix="flash_compact_")
    try:
        frag = f"{workdir}/events_frag"
        events.repartition(48).write.parquet(frag)  # the small-file tail
        stats = compact_parquet_table(spark, frag, target_file_mb=512)
        agg = (
            spark.read.parquet(frag)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("event_id").alias("sum_event_id"),
                F.countDistinct("user_id").alias("n_users"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
                F.round(
                    F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
                    2,
                ).alias("sum_value"),
            )
            .withColumn(
                "files_reduced",
                F.lit(1 if stats.files_after < stats.files_before else 0).cast("int"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        agg,
        "n_rows bigint, sum_event_id bigint, n_users bigint, "
        "min_event_id bigint, max_event_id bigint, sum_value double, "
        "files_reduced int",
    )


@query(
    "q_quality_constraint_report",
    oracle="""
    SELECT * FROM (
        SELECT 'orders_orderkey_unique' AS check_name,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
               CAST(count(*) AS BIGINT) AS population
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_complete',
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_totalprice_positive',
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_referential',
               CAST(count(*) AS BIGINT),
               (SELECT CAST(count(*) AS BIGINT) FROM orders)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE c_custkey IS NULL
        UNION ALL
        SELECT 'lineitem_orderkey_referential',
               CAST(count(*) AS BIGINT),
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderkey IS NULL
        UNION ALL
        SELECT 'lineitem_discount_in_range',
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.3
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'events_ts_not_future',
               CAST(sum(CASE WHEN ts > TIMESTAMP '2030-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM events
    )
    """,
)
def q_quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality report — the constraint
    families a production table contract asserts (uniqueness,
    completeness, value range, referential integrity, temporal sanity)
    evaluated in ONE pass per table plus two anti-joins, emitting one
    row per check with its violation count and population.

    Scale shape: every per-table check family shares a single scan and
    aggregate (sums of CASE indicators + count-distinct are all
    partial-aggregable), so adding a tenth check to a table adds zero
    I/O; the referential checks are anti joins on the key — broadcast
    when the parent side is dimension-sized, shuffle otherwise. This is
    how a constraint engine (AWS Deequ's analyzer pattern) maps onto
    Catalyst."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def report(name: str, violations: F.Column, population: F.Column, df: DataFrame):
        return df.agg(
            F.lit(name).alias("check_name"),
            violations.cast("bigint").alias("violations"),
            population.cast("bigint").alias("population"),
        )

    cnt = F.count(F.lit(1))
    orders_checks = [
        report(
            "orders_orderkey_unique",
            cnt - F.countDistinct("o_orderkey"),
            cnt,
            o,
        ),
        report(
            "orders_custkey_complete",
            F.sum(F.col("o_custkey").isNull().cast("int")),
            cnt,
            o,
        ),
        report(
            "orders_totalprice_positive",
            F.sum((F.col("o_totalprice") <= 0).cast("int")),
            cnt,
            o,
        ),
    ]
    n_orders = o.count()
    n_lineitem = li.count()
    orphan_orders = report(
        "orders_custkey_referential",
        cnt,
        F.lit(n_orders),
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti"),
    )
    orphan_lineitem = report(
        "lineitem_orderkey_referential",
        cnt,
        F.lit(n_lineitem),
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
    )
    li_range = report(
        "lineitem_discount_in_range",
        F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 0.3)).cast("int")),
        cnt,
        li,
    )
    ev_ts = report(
        "events_ts_not_future",
        F.sum((F.col("ts") > F.lit("2030-01-01").cast("timestamp")).cast("int")),
        cnt,
        ev,
    )
    out = orders_checks[0]
    for part in orders_checks[1:] + [orphan_orders, orphan_lineitem, li_range, ev_ts]:
        out = out.unionByName(part)
    return out


# ---------------------------------------------------------------------
# Column profiler (r6): the ANALYZE-style per-column statistics pass
# ---------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@query(
    "q_quality_column_profile",
    oracle="\n    UNION ALL\n    ".join(
        f"""SELECT '{c}' AS column_name,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT)   AS n_distinct,
           CAST(min({c}) AS VARCHAR)             AS min_value,
           CAST(max({c}) AS VARCHAR)             AS max_value
    FROM documents"""
        for c in _PROFILE_COLS
    ),
)
def q_quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiler (r6): per-column null count,
    EXACT distinct count, and min/max (string-rendered so heterogeneous
    column types share one result schema) — the data-quality census
    every ingest pipeline runs before trusting a new table drop.
    Spark shape: ONE scan — all 5×4 statistics fold into a single
    ``agg`` (multiple count-distincts plan as one Expand + one shuffle,
    the standard multi-distinct strategy), then the wide row unpivots
    to the per-column layout with ``stack`` (driver-free, constant
    rows). The oracle computes each column's branch independently —
    5 scans on the oracle side, irrelevant at oracle scale. At 100 TB:
    exact distinct is the one deliberately expensive statistic (the
    Expand multiplies the shuffle by #distinct-columns); the sketch
    variant (`approx_count_distinct`, HLL++) is the drop-in when ±2%
    suffices — `q_events_sketches` demonstrates it; this query is the
    exact-audit form."""
    d = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nn_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)"
    )


@query(
    "q_maintenance_snapshot_diff",
    oracle="""
    WITH oldv AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
    ),
    newv AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 AND o_orderstatus = 'O'
                    THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0
                    THEN o_totalprice + 10.0 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 89 = 0
    ),
    j AS (
        SELECT o.o_orderkey IS NOT NULL AS in_old,
               n.o_orderkey IS NOT NULL AS in_new,
               CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                         AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 1 ELSE 0 END AS chg_status,
               CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                         AND o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 1 ELSE 0 END AS chg_price,
               CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                         AND o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                    THEN 1 ELSE 0 END AS chg_priority
        FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
    ),
    typed AS (
        SELECT CASE WHEN NOT in_old THEN 'added'
                    WHEN NOT in_new THEN 'deleted'
                    WHEN chg_status + chg_price + chg_priority > 0
                         THEN 'changed'
                    ELSE 'unchanged' END AS change_type,
               chg_status, chg_price, chg_priority
        FROM j
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT)          AS n_rows,
           CAST(sum(chg_status) AS BIGINT)   AS n_status_changed,
           CAST(sum(chg_price) AS BIGINT)    AS n_price_changed,
           CAST(sum(chg_priority) AS BIGINT) AS n_priority_changed
    FROM typed GROUP BY change_type
    """,
)
def q_maintenance_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation census — the CDC audit job
    (`operators/snapshot.py:snapshot_diff`): diff two versions of a
    keyed table into added/deleted/changed/unchanged with per-column
    change attribution. Here the "new" snapshot is derived
    deterministically from orders (every 97th key deleted, every 89th
    re-keyed in as an insert, status flips on open %7 keys, price
    bumps on %13 keys) so both engines reconstruct the identical pair;
    in production the two sides are yesterday's mirror and today's
    extract — exactly the audit that verifies the engine's own
    latest-state MERGE sink (`streaming/upsert.py`) against its
    source. One full-outer shuffle join on the key (zero-shuffle when
    both snapshots are bucketed by it, which a CDC mirror is),
    null-safe column compares in codegen, one bounded census
    aggregate. All counters are integers — no cross-engine float
    hazard; the double price compare is exact (same parquet doubles,
    exact +10.0 on both engines)."""
    from flash_cdc_spark.operators.snapshot import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    k = F.col("o_orderkey")
    updated = o.filter(k % 97 != 0).select(
        "o_orderkey",
        F.when(
            (k % 7 == 0) & (F.col("o_orderstatus") == "O"), F.lit("F")
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(k % 13 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderpriority",
    )
    inserted = o.filter(k % 89 == 0).select(
        (k + 10_000_000).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    new = updated.unionByName(inserted)
    diff = snapshot_diff(
        o,
        new,
        key_cols=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("chg_o_orderstatus").cast("bigint").alias("n_status_changed"),
        F.sum("chg_o_totalprice").cast("bigint").alias("n_price_changed"),
        F.sum("chg_o_orderpriority").cast("bigint").alias("n_priority_changed"),
    )
