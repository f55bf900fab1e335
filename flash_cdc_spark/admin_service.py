"""Admin service — the reference's entry points B and C as thin
orchestration over the engine pieces (SURVEY.md §3.2/§3.3).

Entry point B (``POST /clients/`` → validate → duplicate-check →
upsert → autostart, ``app/routers/clients.py:81-134``):
:meth:`AdminService.create_pipeline`.

Entry point C (``GET /clients/status`` → config scan ⋈ in-memory status
with defaults, ``clients.py:137-189``): :meth:`AdminService.status_page`.

The config "table" is a parquet path (a deployment would use Delta +
MERGE); the status probe side comes from the live
:class:`~flash_cdc_spark.streaming.pipelines.PipelineManager`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.operators.admin import find_duplicates, status_join, upsert
from flash_cdc_spark.operators.validation import validate_configs
from flash_cdc_spark.streaming.pipelines import PipelineConfig, PipelineManager

__all__ = ["AdminService"]


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
        df.coalesce(1).write.mode("overwrite").parquet(self.config_path)

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
