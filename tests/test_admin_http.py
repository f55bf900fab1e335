"""HTTP admin shim: the reference's REST routes (create / status /
start / stop) driven end-to-end in-process over AdminService."""

from __future__ import annotations

import http.server
import json
import threading
import urllib.request

import pytest

from flash_cdc_spark.admin_http import AdminHttpServer
from flash_cdc_spark.admin_service import AdminService
from flash_cdc_spark.streaming.pipelines import PipelineManager
from flash_cdc_spark.streaming.webhook import RetryPolicy
from tests.test_streaming import _CaptureHandler, _event_row, _write_events  # noqa: F401

FAST = RetryPolicy(max_attempts=1, backoff_initial_s=0.01, jitter_max_s=0.0)


@pytest.fixture()
def capture():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CaptureHandler)
    srv.requests, srv.fail_remaining = [], 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


def _call(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_admin_http_routes_end_to_end(spark, tmp_path, capture):
    _write_events(spark, str(tmp_path / "source"), [_event_row(1, ["w1"], flag="true")])
    mgr = PipelineManager(spark, retry_policy=FAST)
    svc = AdminService(spark, mgr, str(tmp_path / "configs"))

    def cfg_body(pid, name=None, topic="/data/OppChangeEvent", active=False):
        return {
            "id": pid,
            "name": name or f"client-{pid}",
            "topic": topic,
            "webhook_url": f"http://127.0.0.1:{capture.server_address[1]}/h",
            "instance_url": "https://i",
            "source_path": str(tmp_path / "source"),
            "checkpoint_root": str(tmp_path / "ckpt"),
            "is_active": active,
        }

    with AdminHttpServer(svc) as url:
        # 400: validation failure (bad topic pattern)
        code, body = _call(f"{url}/clients/", "POST", cfg_body(1, topic="/nope"))
        assert code == 400 and "topic_pattern" in body["violations"]

        # 200: create (inactive — no autostart)
        code, body = _call(f"{url}/clients/", "POST", cfg_body(1))
        assert code == 200 and body["ok"] and not body["started"]

        # 409: duplicate client_name under a different id
        code, body = _call(f"{url}/clients/", "POST", cfg_body(2, name="client-1"))
        assert code == 409

        # start by id from the stored config → pipeline delivers
        code, body = _call(f"{url}/clients/1/start", "POST")
        assert code == 200 and body["started"]
        mgr.wait(1, timeout_s=120)
        with capture.lock:
            assert [r["data"][0]["Id"] for r in capture.requests] == ["w1"]
            # the restarted pipeline must deliver the CONFIGURED
            # instance url, not a blank (the persisted config table
            # carries instance_url since r3)
            assert capture.requests[0]["data"][0]["instanceUrl"] == "https://i"

        # status page reflects the finished pipeline + defaults
        code, body = _call(f"{url}/clients/status")
        assert code == 200
        page = {r["id"]: r for r in body["clients"]}
        assert page[1]["batches_seen"] >= 1

        # stop is idempotent-safe on a finished pipeline
        code, body = _call(f"{url}/clients/1/stop", "POST")
        assert code == 200 and body["stopped"]

        # 404s
        assert _call(f"{url}/clients/99/start", "POST")[0] == 404
        assert _call(f"{url}/nope")[0] == 404
