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
           round(sum(value), 2)                   AS sum_value,
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
                F.round(F.sum("value"), 2).alias("sum_value"),
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
