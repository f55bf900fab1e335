"""Canonical schemas for the change-feed engine.

These re-express, as declared Spark ``StructType``s, the shapes the
reference handles dynamically:

- the transport envelope (reference: Pub/Sub ``ConsumerEvent`` proto,
  ``app/sfproto/pubsub_api_pb2.py:27``, consumed at
  ``app/services/sf_pubsub.py:603-613``),
- the decoded change event with its ``ChangeEventHeader``
  (``app/services/sf_pubsub.py:615-633``),
- the pipeline-config (``clients``) table (``app/models.py:39-135``),
- the offset store (``app/models.py:262-275``,
  ``app/services/sf_pubsub.py:104-113``),
- the listener status snapshot (``app/services/sf_pubsub.py:382-400``).

The scalar-vs-array duality of payload fields (a field can be one value
for all recordIds or a list aligned positionally —
``app/services/sf_pubsub.py:676-682``) is encoded as two columns with
exactly one non-null, per FIXTURES.md §2; the compat expression in
:mod:`flash_cdc_spark.operators.changefeed` reunifies them.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "CHANGE_EVENT_HEADER",
    "DECODED_CHANGE_EVENT",
    "ENVELOPE",
    "CLIENT_CONFIG",
    "LISTENER_OFFSET",
    "LISTENER_STATUS",
    "WEBHOOK_PAYLOAD",
]

# ChangeEventHeader — reference accesses entityName/changeType/recordIds/
# commitTimestamp (sf_pubsub.py:616-633); commitTimestamp unit is ambiguous
# (s|ms|ns — sf_pubsub.py:215-227) and normalized downstream.
CHANGE_EVENT_HEADER = T.StructType(
    [
        T.StructField("entityName", T.StringType()),
        T.StructField("changeType", T.StringType()),  # CREATE|UPDATE|DELETE|UNDELETE
        T.StructField("recordIds", T.ArrayType(T.StringType())),
        T.StructField("commitTimestamp", T.LongType()),
    ]
)

# Decoded Avro record (FIXTURES.md §2). FlashField__c carries the
# scalar variant, FlashField__c_arr the positional-list variant.
DECODED_CHANGE_EVENT = T.StructType(
    [
        T.StructField("ChangeEventHeader", CHANGE_EVENT_HEADER),
        T.StructField("FlashField__c", T.StringType()),
        T.StructField("FlashField__c_arr", T.ArrayType(T.StringType())),
        T.StructField("OtherField__c", T.StringType()),
        T.StructField("Amount__c", T.DoubleType()),
    ]
)

# Transport envelope (FIXTURES.md §1).
ENVELOPE = T.StructType(
    [
        T.StructField("event_id", T.StringType(), nullable=False),
        T.StructField("replay_id", T.BinaryType(), nullable=False),
        T.StructField("topic_name", T.StringType(), nullable=False),
        T.StructField("schema_id", T.StringType(), nullable=False),
        T.StructField("payload", T.BinaryType(), nullable=False),
    ]
)

# Pipeline-config table (reference `clients`, app/models.py:39-135).
CLIENT_CONFIG = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("client_name", T.StringType(), nullable=False),
        T.StructField("login_url", T.StringType()),
        T.StructField("oauth_grant_type", T.StringType()),
        T.StructField("oauth_client_id", T.StringType()),
        T.StructField("oauth_client_secret", T.StringType()),
        T.StructField("oauth_username", T.StringType()),
        T.StructField("oauth_password", T.StringType()),
        T.StructField("topic_name", T.StringType()),
        T.StructField("webhook_url", T.StringType()),
        T.StructField("pubsub_host", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("flow_batch_size", T.IntegerType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# Offset store (reference `listener_offsets`).
LISTENER_OFFSET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("client_id", T.IntegerType(), nullable=False),
        T.StructField("topic_name", T.StringType(), nullable=False),
        T.StructField("last_replay_b64", T.StringType()),
        T.StructField("last_commit_ts", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# Listener status snapshot — the probe side of the status join
# (app/routers/clients.py:152-188).
LISTENER_STATUS = T.StructType(
    [
        T.StructField("client_id", T.IntegerType(), nullable=False),
        T.StructField("status", T.StringType()),
        T.StructField("running", T.BooleanType()),
        T.StructField("events_received", T.LongType()),
        T.StructField("last_event_at", T.LongType()),
        T.StructField("last_error", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("last_beat", T.TimestampType()),
        T.StructField("fail_count", T.IntegerType()),
    ]
)

# Webhook delivery payload shape (sf_pubsub.py:736-744):
# {"data":[{"Id": rid, "subscriptionTopic": topic, "instanceUrl": url}]}
WEBHOOK_PAYLOAD = T.StructType(
    [
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Id", T.StringType()),
                        T.StructField("subscriptionTopic", T.StringType()),
                        T.StructField("instanceUrl", T.StringType()),
                    ]
                )
            ),
        )
    ]
)
