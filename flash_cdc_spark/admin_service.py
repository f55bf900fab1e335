"""Admin service — the reference's entry points B and C as thin
orchestration over the engine pieces (SURVEY.md §3.2/§3.3).

Entry point B (``POST /clients/`` → validate → duplicate-check →
upsert → autostart, ``app/routers/clients.py:81-134``):
:meth:`AdminService.create_pipeline`. The full CRUD surface
(``clients.py:197-343``) rides the same config table:
:meth:`list_clients` (ilike filter + ordered pagination),
:meth:`get_client` (point lookup), :meth:`update_client` (partial
patch → merged-entity re-validation → upsert → restart/stop side
effect), :meth:`delete_client` (stop-first), and
:meth:`test_connection` (dry-run validation, ``clients.py:60-78``).

Entry point C (``GET /clients/status`` → config scan ⋈ in-memory status
with defaults, ``clients.py:137-189``): :meth:`AdminService.status_page`.

The config "table" is a parquet path (a deployment would use Delta +
MERGE); the status probe side comes from the live
:class:`~flash_cdc_spark.streaming.pipelines.PipelineManager`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.operators.admin import (
    ilike_filter,
    paginate,
    point_lookup,
    status_join,
    upsert,
)
from flash_cdc_spark.operators.validation import validate_configs
from flash_cdc_spark.streaming.pipelines import PipelineConfig, PipelineManager

__all__ = ["AdminService"]

# Columns a PATCH may change (reference ``ClientUpdate``; pubsub_host
# is explicitly stripped — env-controlled, ``clients.py:262-264``).
_PATCHABLE = {
    "client_name",
    "topic_name",
    "webhook_url",
    "instance_url",
    "flow_batch_size",
    "is_active",
    "source_path",
    "checkpoint_root",
    "offsets_path",
}


class AdminService:
    def __init__(self, spark: SparkSession, manager: PipelineManager, config_path: str):
        self.spark = spark
        self.manager = manager
        self.config_path = config_path

    # -- config table ------------------------------------------------------
    def _config_df(self) -> DataFrame | None:
        if not os.path.isdir(self.config_path) or not os.listdir(self.config_path):
            return None
        df = self.spark.read.parquet(self.config_path)
        # schema backfill: tables persisted before r3 lack instance_url;
        # surface it as NULL so every reader (status page, restart,
        # upsert) sees one schema
        if "instance_url" not in df.columns:
            df = df.withColumn("instance_url", F.lit(None).cast("string"))
        return df

    def _write_configs(self, df: DataFrame) -> None:
        # localCheckpoint first: every caller derives ``df`` from a lazy
        # read of config_path itself, and mode("overwrite") deletes the
        # source files BEFORE the read plan executes — without cutting
        # lineage a delete/patch silently truncates the table
        # (FAILED_READ_FILE mid-write). Config tables are metadata-sized,
        # so materializing is free.
        df.localCheckpoint(eager=True).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.config_path)

    # -- entry point B -----------------------------------------------------
    def create_pipeline(self, config: PipelineConfig, start: bool | None = None) -> dict:
        """Validate → uniqueness-check → upsert → (auto)start.

        Mirrors the reference flow: validation failure → 4xx-style error
        dict; duplicate name → conflict; start failures are logged but
        do not fail the create (``clients.py:125-132``)."""
        new_df = self.spark.createDataFrame(
            [
                (
                    config.id,
                    config.name,
                    config.topic,
                    config.webhook_url,
                    config.instance_url,
                    "password",
                    "user@example.com",
                    "secret",
                    None,
                    config.flow_batch_size,
                    config.is_active,
                    config.source_path,
                    config.checkpoint_root,
                    config.offsets_path,
                )
            ],
            "id long, client_name string, topic_name string, webhook_url string,"
            "instance_url string,"
            "oauth_grant_type string, oauth_username string, oauth_password string,"
            "pubsub_host string, flow_batch_size int, is_active boolean,"
            "source_path string, checkpoint_root string, offsets_path string",
        )
        validated = validate_configs(new_df).first()
        if not validated["is_valid"]:
            return {"ok": False, "error": "validation", "violations": list(validated["violations"])}
        existing = self._config_df()
        if existing is not None:
            clash = existing.filter(
                (F.col("client_name") == config.name) & (F.col("id") != config.id)
            ).count()
            if clash:
                return {"ok": False, "error": "duplicate client_name"}
            merged = upsert(existing, new_df, "id")
        else:
            merged = new_df
        self._write_configs(merged)
        result = {"ok": True, "id": config.id, "started": False}
        if config.is_active if start is None else start:
            try:
                self.manager.start(config)
                result["started"] = True
            except Exception as exc:  # start failure doesn't fail the create
                result["start_error"] = str(exc)
        return result

    # -- entry point C -----------------------------------------------------
    def status_page(self) -> DataFrame:
        """Config rows left-joined to live pipeline status with the
        reference's defaults for never-started pipelines."""
        configs = self._config_df()
        if configs is None:
            raise RuntimeError("no configs")
        statuses = self.manager.status_all()
        if statuses:
            status_df = self.spark.createDataFrame(
                [
                    (pid, s.get("status"), bool(s.get("running")),
                     int(s.get("batches_seen") or 0))
                    for pid, s in statuses.items()
                ],
                "id long, status string, running boolean, batches_seen long",
            )
        else:
            status_df = self.spark.createDataFrame(
                [], "id long, status string, running boolean, batches_seen long"
            )
        return status_join(
            configs.select("id", "client_name", "topic_name", "is_active"),
            status_df,
            key="id",
            defaults={"status": "stopped", "running": False, "batches_seen": 0},
        )

    # -- CRUD surface (reference clients.py:197-343) ----------------------
    @staticmethod
    def row_to_config(r: Row) -> PipelineConfig:
        """Stored config row → runtime :class:`PipelineConfig` (shared
        by start/restart/PATCH; older tables predate instance_url and
        source_format)."""
        fields = set(r.__fields__)
        return PipelineConfig(
            id=r["id"],
            name=r["client_name"],
            topic=r["topic_name"],
            webhook_url=r["webhook_url"],
            instance_url=(r["instance_url"] if "instance_url" in fields else "")
            or "",
            source_path=r["source_path"],
            checkpoint_root=r["checkpoint_root"],
            flow_batch_size=r["flow_batch_size"],
            is_active=r["is_active"],
            offsets_path=r["offsets_path"],
            source_format=(
                r["source_format"] if "source_format" in fields else "parquet"
            )
            or "parquet",
        )

    def list_clients(
        self,
        q: str | None = None,
        is_active: bool | None = None,
        limit: int = 50,
        offset: int = 0,
    ) -> dict:
        """``GET /clients/`` — ilike name filter + is_active filter +
        id-ordered pagination, returning the reference's page envelope
        ``{items, total, limit, offset}`` (``clients.py:197-227``).
        ``total`` counts the FILTERED relation, not the page."""
        df = self._config_df()
        if df is None:
            return {"items": [], "total": 0, "limit": limit, "offset": offset}
        df = ilike_filter(df, "client_name", q)
        if is_active is not None:
            df = df.filter(F.col("is_active") == bool(is_active))
        total = df.count()
        page = paginate(df, "id", limit=limit, offset=offset)
        return {
            "items": [r.asDict() for r in page.collect()],
            "total": total,
            "limit": max(1, min(int(limit), 200)),
            "offset": int(offset),
        }

    def get_client(self, client_id: int) -> dict | None:
        """``GET /clients/{id}`` — point lookup; None → caller's 404
        (``clients.py:31-35,231-242``)."""
        df = self._config_df()
        if df is None:
            return None
        row = point_lookup(df, "id", client_id)
        return row.asDict() if row is not None else None

    def update_client(self, client_id: int, patch: dict) -> dict:
        """``PATCH /clients/{id}`` (``clients.py:244-324``): apply the
        partial update to the stored row, re-validate the MERGED
        entity (not just the patch), reject duplicate names, persist
        via upsert, then recycle the pipeline — restart when the
        merged row is active, stop otherwise; recycle failures are
        reported but do not fail the request (reference returns 200
        and logs)."""
        if not isinstance(patch, dict):
            return {"ok": False, "error": "validation",
                    "violations": ["body must be a JSON object"]}
        df = self._config_df()
        row = point_lookup(df, "id", client_id) if df is not None else None
        if row is None:
            return {"ok": False, "error": "not found"}
        data = {k: v for k, v in patch.items() if k in _PATCHABLE}
        merged = {**row.asDict(), **data}
        if "client_name" in data:
            clash = df.filter(
                (F.col("client_name") == data["client_name"])
                & (F.col("id") != client_id)
            ).count()
            if clash:
                return {"ok": False, "error": "duplicate client_name"}
        try:
            # type-mismatched patch values (e.g. flow_batch_size:
            # "seven") fail createDataFrame's schema coercion — a
            # client error, not a handler crash (reference: 422)
            merged_df = self.spark.createDataFrame(
                [tuple(merged.values())], df.schema
            )
            merged_df.first()  # force coercion errors here
        except Exception as exc:
            return {"ok": False, "error": "validation",
                    "violations": [f"patch value type: {exc}"]}
        validated = validate_configs(merged_df).first()
        if not validated["is_valid"]:
            return {
                "ok": False,
                "error": "validation",
                "violations": list(validated["violations"]),
            }
        self._write_configs(upsert(df, merged_df, "id"))
        result = {"ok": True, "id": client_id, "client": merged}
        config = self.row_to_config(merged_df.first())
        try:
            if config.is_active:
                # stop + start with the MERGED config (the reference's
                # restart re-reads the row from the DB so the update
                # takes effect immediately; PipelineManager.restart
                # would replay the stale in-memory config)
                try:
                    self.manager.stop(client_id)
                except Exception:
                    pass
                self.manager.start(config)
                result["restarted"] = True
            else:
                self.manager.stop(client_id)
                result["stopped"] = True
        except Exception as exc:  # recycle failure ≠ request failure
            result["recycle_error"] = str(exc)
        return result

    def delete_client(self, client_id: int) -> dict:
        """``DELETE /clients/{id}`` — stop-first, then remove the row
        (``clients.py:327-343``); stop failures only warn."""
        df = self._config_df()
        row = point_lookup(df, "id", client_id) if df is not None else None
        if row is None:
            return {"ok": False, "error": "not found"}
        try:
            self.manager.stop(client_id)
        except Exception:  # stop-on-delete is best-effort
            pass
        self._write_configs(df.filter(F.col("id") != client_id))
        return {"ok": True, "id": client_id, "deleted": True}

    def test_connection(self, client_id: int) -> dict:
        """``POST /clients/{id}/test`` — dry-run validation of the
        STORED config through :meth:`PipelineManager.validate` (the
        reference's connection test, ``clients.py:60-78``, checks
        auth + topic reachability; here: topic shape + source
        existence)."""
        df = self._config_df()
        row = point_lookup(df, "id", client_id) if df is not None else None
        if row is None:
            return {"ok": False, "error": "not found"}
        return self.manager.validate(self.row_to_config(row))
