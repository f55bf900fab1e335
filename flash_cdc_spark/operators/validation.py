"""Schema-on-write validation operators (reference V1–V4,
``app/models.py:39-177``) as column expressions over a config DataFrame.

The reference validates row-at-a-time with pydantic; here validation is
a vectorized projection producing a ``violations`` array per row — run
it over a million-config table and it's still one narrow pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "topic_valid",
    "normalize_url",
    "url_valid",
    "email_valid",
    "host_port_valid",
    "grant_fields_consistent",
    "flow_batch_size_valid",
    "validate_configs",
]

# V1: startswith /data/ and contains ChangeEvent (models.py:92-97)
def topic_valid(c: Column | str = "topic_name") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.rlike("^/data/.*ChangeEvent")


# V2: URL normalization — prepend https:// when scheme missing
# (models.py:79-83), then validate shape.
def normalize_url(c: Column | str = "webhook_url") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        col.isNotNull() & ~col.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
        F.concat(F.lit("https://"), col),
    ).otherwise(col)


def url_valid(c: Column | str = "webhook_url") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.rlike(r"^https?://[^\s/$.?#].[^\s]*$")


def email_valid(c: Column | str = "oauth_username") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.rlike(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$")


def host_port_valid(c: Column | str = "pubsub_host") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.rlike(r"^[A-Za-z0-9.-]+:[0-9]{1,5}$")


# V3: grant_type ⇒ credential fields present (models.py:106-115 — the
# reference requires username+password for both grant types).
def grant_fields_consistent(
    grant: Column | str = "oauth_grant_type",
    username: Column | str = "oauth_username",
    password: Column | str = "oauth_password",
) -> Column:
    g = F.col(grant) if isinstance(grant, str) else grant
    u = F.col(username) if isinstance(username, str) else username
    p = F.col(password) if isinstance(password, str) else password
    needs_creds = g.isin("password", "client_credentials")
    return ~needs_creds | (u.isNotNull() & (F.length(u) > 0) & p.isNotNull() & (F.length(p) > 0))


# V4: flow_batch_size ∈ [1, 5000] (models.py:66)
def flow_batch_size_valid(c: Column | str = "flow_batch_size") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.between(1, 5000)


def validate_configs(df: DataFrame) -> DataFrame:
    """Attach ``violations: array<string>`` (empty = valid row) and a
    ``is_valid`` flag; callers filter or route to a quarantine sink."""
    checks: list[tuple[str, Column]] = [
        ("topic_pattern", topic_valid()),
        ("webhook_url", url_valid(normalize_url())),
        ("grant_credentials", grant_fields_consistent()),
        ("flow_batch_size", flow_batch_size_valid()),
    ]
    if "oauth_username" in df.columns:
        checks.append(("email", F.col("oauth_username").isNull() | email_valid()))
    if "pubsub_host" in df.columns:
        checks.append(("host_port", F.col("pubsub_host").isNull() | host_port_valid()))
    violations = F.filter(
        F.array(
            *[F.when(~ok.eqNullSafe(F.lit(True)), F.lit(name)) for name, ok in checks]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("webhook_url", normalize_url()).withColumn(
        "violations", violations
    ).withColumn("is_valid", F.size("violations") == 0)
