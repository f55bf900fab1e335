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
    """Minimal webhook endpoint: record every POSTed payload, 200 OK."""

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode("utf-8")
        with self.server.lock:
            self.server.requests.append(json.loads(body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

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
