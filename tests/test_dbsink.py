"""Transactional DB sink (``streaming/dbsink.py``): exactly-once
micro-batch upsert into sqlite — the reference's Postgres-consumer
contract. Content equals the batch latest-snapshot, full replay leaves
the table unchanged, and a pre-committed batch id is skipped wholesale
(the ledger decision is atomic with the data mutation)."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from flash_cdc_spark.streaming import await_or_fail
from flash_cdc_spark.streaming.dbsink import read_db_state, streaming_db_upsert
from flash_cdc_spark.tables import load_table


def _run(spark, src, db, ckpt):
    stream = (
        spark.readStream.schema(
            "user_id bigint, event_type string, event_id bigint, "
            "ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    await_or_fail(streaming_db_upsert(stream, db, ckpt))


def _stage_source(spark, sf_dir, src):
    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    for third in range(3):
        batch.filter(F.pmod(F.col("event_id"), F.lit(3)) == third).coalesce(
            1
        ).write.mode("append").parquet(src)
    return batch


def test_db_state_equals_batch_snapshot_and_replay_idempotent(
    spark, sf_dir, tmp_path
):
    src = str(tmp_path / "src")
    batch = _stage_source(spark, sf_dir, src)
    db = str(tmp_path / "state.db")
    _run(spark, src, db, str(tmp_path / "ckpt1"))

    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expect = sorted(
        tuple(r)
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id", "event_type", "event_id",
            F.unix_millis("ts").alias("commit_ms"), "value",
        )
        .collect()
    )
    got = sorted(tuple(r) for r in read_db_state(spark, db).collect())
    assert got == expect and len(got) > 0

    # full replay from a fresh checkpoint: ledger skips every batch,
    # table unchanged
    _run(spark, src, db, str(tmp_path / "ckpt2"))
    assert sorted(tuple(r) for r in read_db_state(spark, db).collect()) == expect


def test_precommitted_batch_is_skipped_wholesale(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    _stage_source(spark, sf_dir, src)
    db = str(tmp_path / "skip.db")
    con = sqlite3.connect(db)
    con.executescript(
        "CREATE TABLE _committed_batches (batch_id INTEGER PRIMARY KEY);"
        "INSERT INTO _committed_batches VALUES (0);"
    )
    con.commit()
    con.close()
    _run(spark, src, db, str(tmp_path / "ckpt"))
    state = read_db_state(spark, db)
    # batch 0 (event_id % 3 == 0) was marked committed -> its rows are
    # absent unless a later batch carried a newer row for the same key
    ids = {r["event_id"] for r in state.collect()}
    assert ids and all(i % 3 != 0 for i in ids)
