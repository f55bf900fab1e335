"""STREAMING-executed end-to-end changefeed query.

``q_streaming_rollup`` proves the windowed-aggregation streaming path;
this module proves the *delivery* path: the same synthesized change-event
envelope the flagship batch query uses is written to a changelog
directory, a real :class:`PipelineManager` pipeline streams it through
decode → normalize → explode → truthy-filter → webhook HTTP POST
(executor-side, with retry), and the query returns the payloads an
actual local HTTP capture server received. The DuckDB oracle computes
the expected delivered set relationally — so the driver's correctness
gate checks the entire streaming engine + sink stack, not a batch twin.

Reference parity: this is the reference's whole reason to exist — a
subscribe→decode→filter→webhook loop (``app/services/sf_pubsub.py``,
``603-789``) — here executed by Structured Streaming with at-least-once
conditional commit instead of a per-event asyncio loop.
"""

from __future__ import annotations

import http.server
import json
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.queries.changefeed import INSTANCE_URL, TOPIC, synth_decoded_events

_ORACLE = f"""
    WITH env AS (
        SELECT event_id, event_type, event_id % 3 + 1 AS n_ids
        FROM events
    ), exploded AS (
        SELECT event_id, event_type,
               unnest(range(n_ids)) AS record_pos
        FROM env
    ), flagged AS (
        SELECT event_id, record_pos,
               'r' || CAST(event_id AS VARCHAR) || '_' || CAST(record_pos AS VARCHAR)
                   AS record_id,
               CASE WHEN event_id % 5 = 0
                    THEN CASE WHEN (event_id + record_pos) % 2 = 0
                              THEN 'true' ELSE 'false' END
                    ELSE CASE event_type
                              WHEN 'purchase' THEN 'true'
                              WHEN 'click'    THEN '1'
                              WHEN 'view'     THEN 'no'
                              WHEN 'signup'   THEN 'yes'
                              ELSE NULL END
               END AS flag
        FROM exploded
    )
    SELECT record_id,
           '{TOPIC}'        AS topic,
           '{INSTANCE_URL}' AS instance_url
    FROM flagged
    WHERE flag IN ('true', '1', 'yes')
"""


class _CaptureHandler(http.server.BaseHTTPRequestHandler):
    """Minimal webhook endpoint: record every POSTed payload, 200 OK.
    HTTP/1.1 + Content-Length so the pooled keep-alive transport can
    reuse connections (HTTP/1.0 would force one TCP connect per post)."""

    protocol_version = "HTTP/1.1"
    disable_nagle_algorithm = True

    def _reply(self, code: int, body: bytes = b"{}") -> None:
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode("utf-8")
        with self.server.lock:
            self.server.requests.append(json.loads(body))
        self._reply(200)

    def log_message(self, *args):  # silence
        pass


@query("q_streaming_changefeed_e2e", oracle=_ORACLE)
def q_streaming_changefeed_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the supervised changefeed pipeline end-to-end and return
    what the webhook endpoint actually received.

    The HTTP round-trip is local-loopback here, but the dataflow is the
    production one: posts happen executor-side inside ``foreachBatch``
    (never a driver collect), the batch commits only after every post
    succeeded, and the capture set is exactly the at-least-once delivery
    contract's output on a clean run (no failures → no duplicates)."""
    from flash_cdc_spark.streaming.pipelines import (
        PipelineConfig,
        PipelineManager,
        STREAM_SCHEMA,
    )
    from flash_cdc_spark.streaming.webhook import RetryPolicy

    # replay cursor: the event id recovered from "r{event_id}_0" — any
    # monotone unique long works as the changelog seq
    seq = (
        F.split(F.col("ChangeEventHeader.recordIds")[0], "_")[0]
        .substr(F.lit(2), F.lit(18))
        .cast("long")
    )
    decoded = synth_decoded_events(spark, sf_dir).withColumn("replay_seq", seq)

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CaptureHandler)
    server.requests, server.lock = [], threading.Lock()
    server_thread = threading.Thread(target=server.serve_forever, daemon=True)
    server_thread.start()
    workdir = tempfile.mkdtemp(prefix="flash_e2e_")
    try:
        source = f"{workdir}/source"
        decoded.select(*[f.name for f in STREAM_SCHEMA.fields]).write.parquet(source)
        config = PipelineConfig(
            id=9001,
            name="e2e-oracle",
            topic=TOPIC,
            webhook_url=f"http://127.0.0.1:{server.server_address[1]}/hook",
            instance_url=INSTANCE_URL,
            source_path=source,
            checkpoint_root=f"{workdir}/ckpt",
        )
        mgr = PipelineManager(
            spark,
            retry_policy=RetryPolicy(timeout_s=30.0, max_attempts=3,
                                     backoff_initial_s=0.1, backoff_cap_s=1.0,
                                     jitter_max_s=0.0),
        )
        mgr.start(config)
        mgr.wait(9001, timeout_s=600)
        with server.lock:
            # every record of every POST (a payload may batch several),
            # deduped on record id: the pipeline is at-least-once, so a
            # transient delivery failure or micro-batch replay would
            # legitimately repeat a POST — the delivered SET, not the
            # POST log, is the contract the oracle states (ADVICE r2)
            rows = {
                (
                    rec["Id"],
                    rec["subscriptionTopic"],
                    rec["instanceUrl"],
                )
                for req in server.requests
                for rec in req["data"]
            }
    finally:
        server.shutdown()
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "record_id string, topic string, instance_url string"
    )


class _RejectingHandler(_CaptureHandler):
    """Webhook endpoint with a poison rule: payloads carrying
    ``"poison": true`` get a permanent 400; everything else records
    and 200s — the endpoint shape the DLQ sink exists for."""

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode("utf-8")
        doc = json.loads(body)
        if doc.get("poison"):
            self._reply(400, b'{"error":"permanent"}')
            return
        with self.server.lock:
            self.server.requests.append(doc)
        self._reply(200)


@query(
    "q_streaming_dlq_delivery",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 13 THEN 'dlq' ELSE 'delivered' END
               AS disposition
    FROM documents
    """,
)
def q_streaming_dlq_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-executed dead-letter delivery: a real Structured
    Streaming job posts one payload per document to a live HTTP
    endpoint that PERMANENTLY rejects the poison slice (doc_id%97==13
    → 400), through the DLQ webhook sink
    (`streaming/webhook.py:webhook_batch_writer_with_dlq`). Poison
    records land in the dead-letter parquet and the batch COMMITS —
    the reference's all-or-nothing commit would replay the same batch
    forever on one bad record. Output: each document's disposition,
    reconstructed from what the endpoint accepted plus what the DLQ
    table recorded; the oracle states the poison rule relationally.
    Transient failures (5xx/429) still fail the batch — at-least-once
    is unchanged for everything recoverable (pytest covers that arm)."""
    import os

    from flash_cdc_spark.streaming import await_or_fail
    from flash_cdc_spark.streaming.webhook import (
        RetryPolicy,
        webhook_batch_writer_with_dlq,
    )
    from flash_cdc_spark.tables import load_table

    payloads = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.to_json(
            F.struct(
                F.col("doc_id"), (F.col("doc_id") % 97 == 13).alias("poison")
            )
        ).alias("payload_json"),
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RejectingHandler)
    server.requests, server.lock = [], threading.Lock()
    threading.Thread(target=server.serve_forever, daemon=True).start()
    workdir = tempfile.mkdtemp(prefix="flash_dlq_")
    try:
        src = f"{workdir}/src"
        payloads.write.parquet(src)
        stream = spark.readStream.schema(payloads.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                webhook_batch_writer_with_dlq(
                    f"http://127.0.0.1:{server.server_address[1]}/hook",
                    dlq_path=f"{workdir}/dlq",
                    policy=RetryPolicy(
                        timeout_s=30.0, max_attempts=2,
                        backoff_initial_s=0.05, backoff_cap_s=0.2,
                        jitter_max_s=0.0,
                    ),
                )
            )
            .option("checkpointLocation", f"{workdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        await_or_fail(q)
        with server.lock:
            delivered = {int(r["doc_id"]) for r in server.requests}
        dlq_ids = set()
        if os.path.isdir(f"{workdir}/dlq"):
            dlq_ids = {
                int(json.loads(r["payload_json"])["doc_id"])
                for r in spark.read.parquet(f"{workdir}/dlq").collect()
            }
    finally:
        server.shutdown()
        shutil.rmtree(workdir, ignore_errors=True)
    rows = [(d, "delivered") for d in sorted(delivered)] + [
        (d, "dlq") for d in sorted(dlq_ids)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, disposition string")
