"""Ingestion-boundary queries (r6): parsing raw semi-structured feeds
with malformed-record quarantine — the step every production pipeline
runs BEFORE the analytics in this registry, and the relational twin of
the streaming source's schema pre-flight (`sources/registry.py`; cf.
reference app/services/feed.py which trusts its gRPC envelope and has
no malformed-record path — the gap a raw JSONL feed exposes).

Semantics follow Spark's PERMISSIVE JSON mode: a malformed line yields
a NULL parse (never an aborted job — FAILFAST is the anti-pattern at
100 TB where some corruption is a statistical certainty), and the
quarantine census makes the corruption rate an observable, per
partition key, instead of silent data loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

__all__ = ["q_ingest_json_quarantine"]


@query(
    "q_ingest_json_quarantine",
    oracle="""
    WITH raw AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 37 = 0
                    THEN 'CORRUPT' || props ELSE props END AS line
        FROM events
    ),
    parsed AS (
        SELECT event_type,
               try_cast(line AS JSON) IS NOT NULL AS ok,
               CAST(json_extract(try_cast(line AS JSON), '$.k') AS BIGINT)
                   AS k
        FROM raw
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)                              AS n_lines,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)   AS n_parsed,
           CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)   AS n_quarantined,
           CAST(sum(CASE WHEN ok THEN k ELSE 0 END) AS BIGINT)   AS sum_k
    FROM parsed GROUP BY event_type
    """,
)
def q_ingest_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingestion with malformed-record quarantine: the events
    feed's ``props`` JSON is re-read as a raw line stream with a
    deterministic corruption (every 37th line prefixed with garbage —
    the same lines on both engines), parsed with ``from_json`` in its
    default PERMISSIVE mode (malformed → NULL struct, job never
    aborts), and censused per event_type: line/parse/quarantine counts
    plus an aggregate over the RECOVERED field proving the good lines
    actually parse. Scale shape: parse + classify are one codegen'd
    narrow projection (JsonToStructs is JVM-side — no Python), the
    census a partial-aggregable groupBy over #event_types rows. In
    production the quarantined lines themselves go to a dead-letter
    path exactly like the webhook DLQ sink
    (`streaming/webhook.py:webhook_batch_writer_with_dlq`) — this
    query is the monitoring face of that pattern."""
    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 37 == 0, F.concat(F.lit("CORRUPT"), F.col("props"))
    ).otherwise(F.col("props"))
    # PERMISSIVE mode never nulls the whole struct in Spark 4 — the
    # malformed-line signal is the declared corrupt-record column
    # (raw line for malformed input, NULL for clean parses)
    parsed = ev.select(
        "event_type",
        F.from_json(
            line,
            "k BIGINT, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    ).select(
        "event_type",
        F.col("j._corrupt_record").isNull().alias("ok"),
        F.col("j.k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_parsed"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_quarantined"),
        F.sum(F.when(F.col("ok"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("sum_k"),
    )
