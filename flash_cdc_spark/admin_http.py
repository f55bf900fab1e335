"""HTTP admin surface: the reference's REST entry points as a stdlib
``http.server`` shim over :class:`AdminService` (no web framework in
this container — the routes, payload shapes, and status codes mirror
``app/routers/clients.py``; the dataflow underneath is unchanged).

Routes (reference parity):

- ``POST /clients/``            → create (validate → dup-check → upsert
  → autostart; ``clients.py:81-134``). 200 on success, 400 on
  validation error, 409 on duplicate name.
- ``GET  /clients/status``      → config ⋈ live status with defaults
  (``clients.py:137-189``).
- ``POST /clients/{id}/start``  → start from stored config.
- ``POST /clients/{id}/stop``   → graceful stop.

The server is driver-side control plane only — request handling calls
the same Spark actions the Python API does; no data ever flows through
HTTP (webhook delivery stays executor-side in the streaming sink).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from flash_cdc_spark.admin_service import AdminService
from flash_cdc_spark.streaming.pipelines import PipelineConfig

__all__ = ["AdminHttpServer"]

_ID_ROUTE = re.compile(r"^/clients/(\d+)/(start|stop)$")


def _config_from_json(body: dict) -> PipelineConfig:
    known = {f for f in PipelineConfig.__dataclass_fields__}
    return PipelineConfig(**{k: v for k, v in body.items() if k in known})


class _Handler(BaseHTTPRequestHandler):
    service: AdminService  # injected via server class attr

    def _send(self, code: int, payload) -> None:
        raw = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"{}")

    def do_GET(self) -> None:  # noqa: N802
        if self.path == "/clients/status":
            try:
                rows = [r.asDict() for r in self.server.service.status_page().collect()]
            except RuntimeError:
                rows = []
            self._send(200, {"clients": rows})
            return
        self._send(404, {"error": "not found"})

    def do_POST(self) -> None:  # noqa: N802
        svc = self.server.service
        if self.path in ("/clients", "/clients/"):
            try:
                config = _config_from_json(self._body())
            except (TypeError, json.JSONDecodeError) as exc:
                self._send(400, {"error": f"bad request: {exc}"})
                return
            result = svc.create_pipeline(config)
            if result.get("ok"):
                self._send(200, result)
            elif result.get("error") == "duplicate client_name":
                self._send(409, result)
            else:
                self._send(400, result)
            return
        m = _ID_ROUTE.match(self.path)
        if m:
            pid, action = int(m.group(1)), m.group(2)
            if action == "stop":
                svc.manager.stop(pid)
                self._send(200, {"ok": True, "id": pid, "stopped": True})
                return
            cfg_df = svc._config_df()
            row = (
                cfg_df.filter(cfg_df.id == pid).limit(1).collect() if cfg_df is not None else []
            )
            if not row:
                self._send(404, {"error": f"no config for id {pid}"})
                return
            r = row[0]
            config = PipelineConfig(
                id=r["id"], name=r["client_name"], topic=r["topic_name"],
                webhook_url=r["webhook_url"],
                # older config tables predate the instance_url column
                instance_url=(r["instance_url"] if "instance_url" in r.__fields__ else "") or "",
                source_path=r["source_path"], checkpoint_root=r["checkpoint_root"],
                flow_batch_size=r["flow_batch_size"], is_active=r["is_active"],
                offsets_path=r["offsets_path"],
            )
            try:
                svc.manager.start(config)
                self._send(200, {"ok": True, "id": pid, "started": True})
            except Exception as exc:
                self._send(400, {"ok": False, "error": str(exc)})
            return
        self._send(404, {"error": "not found"})

    def log_message(self, *args) -> None:  # quiet
        pass


class AdminHttpServer:
    """In-process admin HTTP server. ``with AdminHttpServer(svc) as url:``
    yields ``http://127.0.0.1:<port>``."""

    def __init__(self, service: AdminService, host: str = "127.0.0.1", port: int = 0):
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.service = service
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
