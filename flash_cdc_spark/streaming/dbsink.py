"""Transactional SQL-database sink: exactly-once micro-batch upsert
into a relational store — the reference's actual delivery target
(its consumers apply per-event row UPDATEs into Postgres,
``app/services/processor.py``; here the same contract is a set-based
merge in ONE database transaction per micro-batch).

Exactly-once mechanics (the canonical Structured-Streaming idempotent
sink pattern): each ``foreachBatch`` merge runs inside a single DB
transaction that (a) checks a ``_committed_batches`` ledger for this
``batch_id`` and skips if present, (b) applies per-key conditional
upserts (newer-(ts, event_id) wins — the same recency order as
``streaming/upsert.py``), and (c) records the batch id — so a replayed
micro-batch (restart between sink commit and checkpoint commit) is
skipped ATOMICALLY, never half-applied. The at-least-once stream
becomes exactly-once in the table because the dedup decision and the
data mutation share one transaction.

Scale/topology note: this module targets the CONTROL-PLANE-sized
tables the reference actually maintains in its DB (client state,
delivery bookkeeping — O(clients·entities) rows), so the reduced
per-batch delta routes through the driver connection; sqlite's
single-writer model also requires it. Against a server database
(Postgres/MySQL) the production shape is the same transaction ledger
but executor-side: ``foreachPartition`` connections writing to a
staging table, then one driver-side
``INSERT ... SELECT ... ON CONFLICT`` + ledger insert in a single
transaction. The per-key conditional-upsert SQL is identical.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["streaming_db_upsert", "read_db_state"]

_DDL = """
CREATE TABLE IF NOT EXISTS latest_state (
    user_id    INTEGER NOT NULL,
    event_type TEXT    NOT NULL,
    event_id   INTEGER NOT NULL,
    ts_ms      INTEGER NOT NULL,
    value      REAL,
    PRIMARY KEY (user_id, event_type)
);
CREATE TABLE IF NOT EXISTS _committed_batches (
    batch_id INTEGER PRIMARY KEY
);
"""

# Conditional upsert: a row loses to the incumbent unless strictly
# newer by (ts, event_id) — identical recency order to the parquet
# merge sink and the q_changefeed_latest_snapshot oracle. The same
# statement works verbatim on Postgres (ON CONFLICT is standard).
_UPSERT = """
INSERT INTO latest_state (user_id, event_type, event_id, ts_ms, value)
VALUES (?, ?, ?, ?, ?)
ON CONFLICT (user_id, event_type) DO UPDATE SET
    event_id = excluded.event_id,
    ts_ms    = excluded.ts_ms,
    value    = excluded.value
WHERE (excluded.ts_ms, excluded.event_id) > (latest_state.ts_ms, latest_state.event_id)
"""


def streaming_db_upsert(
    events: DataFrame,
    db_path: str,
    checkpoint: str,
    keys: list[str] | None = None,
) -> StreamingQuery:
    """Run the change stream into a SQL database with exactly-once
    batch semantics. ``events`` needs columns
    (user_id, event_type, event_id, ts, value)."""
    keys = keys or ["user_id", "event_type"]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy(*keys).orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        delta = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "user_id",
                "event_type",
                "event_id",
                F.unix_millis("ts").alias("ts_ms"),
                "value",
            )
            .collect()  # control-plane-sized by contract (see module doc)
        )
        con = sqlite3.connect(db_path)
        try:
            con.executescript(_DDL)
            con.execute("BEGIN IMMEDIATE")
            seen = con.execute(
                "SELECT 1 FROM _committed_batches WHERE batch_id = ?", (batch_id,)
            ).fetchone()
            if seen:
                con.rollback()
                return  # replayed batch: already applied atomically
            con.executemany(
                _UPSERT,
                [
                    (r["user_id"], r["event_type"], r["event_id"], r["ts_ms"], r["value"])
                    for r in delta
                ],
            )
            con.execute(
                "INSERT INTO _committed_batches (batch_id) VALUES (?)", (batch_id,)
            )
            con.commit()
        except Exception:
            con.rollback()
            raise  # fail the batch -> offsets don't commit -> replay
        finally:
            con.close()

    return (
        events.writeStream.foreachBatch(merge)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_db_state(spark, db_path: str) -> DataFrame:
    """Load the materialized latest-state table back into a DataFrame
    (driver-side fetch — the table is control-plane-sized)."""
    con = sqlite3.connect(db_path)
    try:
        rows = con.execute(
            "SELECT user_id, event_type, event_id, ts_ms, value "
            "FROM latest_state ORDER BY user_id, event_type"
        ).fetchall()
    finally:
        con.close()
    return spark.createDataFrame(
        rows,
        "user_id bigint, event_type string, event_id bigint, "
        "commit_ms bigint, value double",
    )
