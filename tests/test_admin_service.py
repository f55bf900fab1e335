"""Entry points B (create→validate→upsert→autostart) and C (status
page) end-to-end (SURVEY.md §3.2/§3.3)."""

from __future__ import annotations

import pytest

from flash_cdc_spark.admin_service import AdminService
from flash_cdc_spark.streaming.pipelines import PipelineConfig, PipelineManager
from flash_cdc_spark.streaming.webhook import RetryPolicy

from tests.test_streaming import _CaptureHandler, _event_row, _mk_config, _write_events  # noqa: F401
import http.server
import threading

FAST = RetryPolicy(max_attempts=1, backoff_initial_s=0.01, jitter_max_s=0.0)


@pytest.fixture()
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CaptureHandler)
    srv.requests, srv.fail_remaining = [], 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


def _cfg(tmp_path, server, pid, name=None, topic=None, active=True):
    return PipelineConfig(
        id=pid,
        name=name or f"client-{pid}",
        topic=topic or "/data/OppChangeEvent",
        webhook_url=f"http://127.0.0.1:{server.server_address[1]}/h",
        instance_url="https://i",
        source_path=str(tmp_path / "source"),
        checkpoint_root=str(tmp_path / "ckpt"),
        is_active=active,
    )


def test_create_validate_upsert_autostart_and_status(spark, tmp_path, server):
    _write_events(spark, str(tmp_path / "source"), [_event_row(1, ["w1"], flag="true")])
    mgr = PipelineManager(spark, retry_policy=FAST)
    svc = AdminService(spark, mgr, str(tmp_path / "configs"))

    # invalid topic → rejected, nothing written
    bad = svc.create_pipeline(_cfg(tmp_path, server, 1, topic="/not/valid"))
    assert not bad["ok"] and "topic_pattern" in bad["violations"]

    # valid active config → created + started + delivered
    res = svc.create_pipeline(_cfg(tmp_path, server, 1))
    assert res["ok"] and res["started"]
    mgr.wait(1, timeout_s=120)
    assert [r["data"][0]["Id"] for r in server.requests] == ["w1"]

    # duplicate name under a different id → conflict
    dup = svc.create_pipeline(_cfg(tmp_path, server, 2, name="client-1", active=False))
    assert not dup["ok"] and dup["error"] == "duplicate client_name"

    # second pipeline, inactive → stored but not started
    res2 = svc.create_pipeline(_cfg(tmp_path, server, 2, active=False))
    assert res2["ok"] and not res2["started"]

    # upsert: re-create id=1 with a new name → replaces the row
    res3 = svc.create_pipeline(_cfg(tmp_path, server, 1, name="client-1-renamed",
                                    active=False), start=False)
    assert res3["ok"]

    # entry point C: status page joins configs to live statuses with defaults
    page = {r["id"]: r for r in svc.status_page().collect()}
    assert set(page) == {1, 2}
    assert page[1]["client_name"] == "client-1-renamed"
    assert page[1]["status"] == "stopped" and page[1]["batches_seen"] >= 1
    assert page[2]["status"] == "stopped" and page[2]["batches_seen"] == 0


def test_create_pipeline_upserts_into_pre_instance_url_table(spark, tmp_path):
    """A config table persisted BEFORE the instance_url column existed
    (13 columns) must still accept upserts — the read backfills the
    missing column as NULL and unionByName null-fills old rows."""
    import pyspark.sql.functions as F

    from flash_cdc_spark.admin_service import AdminService
    from flash_cdc_spark.streaming.pipelines import PipelineConfig, PipelineManager

    config_path = str(tmp_path / "configs")
    svc = AdminService(spark, PipelineManager(spark), config_path)

    def cfg(pid, name):
        return PipelineConfig(
            id=pid, name=name, topic="/data/OppChangeEvent",
            webhook_url="http://127.0.0.1:1/h", instance_url="https://new",
            source_path=str(tmp_path / "src"), checkpoint_root=str(tmp_path / "ck"),
            flow_batch_size=100, is_active=False, offsets_path=None,
        )

    assert svc.create_pipeline(cfg(1, "old-client"), start=False)["ok"]
    # simulate the pre-r3 table: drop the instance_url column on disk
    legacy = (
        spark.read.parquet(config_path)
        .drop("instance_url")
        .localCheckpoint(eager=True)  # break lineage before self-overwrite
    )
    legacy.coalesce(1).write.mode("overwrite").parquet(config_path)

    out = svc.create_pipeline(cfg(2, "new-client"), start=False)
    assert out["ok"], out
    merged = {r["id"]: r for r in spark.read.parquet(config_path).collect()}
    assert set(merged) == {1, 2}
    assert merged[1]["instance_url"] is None  # backfilled
    assert merged[2]["instance_url"] == "https://new"
