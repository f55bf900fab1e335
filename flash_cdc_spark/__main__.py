"""Command-line entry point — ``python -m flash_cdc_spark <cmd>``.

The runnable surface a reference user starts with (the reference's
``uvicorn main:app`` + listener autostart, `app/main.py`), minus the
web UI (out of scope per SURVEY §2.6):

- ``serve``  — bring up the admin HTTP API over a config store and
  autostart every active pipeline (entry points B/C + C4).
- ``query``  — run one registered analytics query and print rows.
- ``list``   — list the registered query inventory.

All subcommands build the session through ``get_spark`` (AQE + Arrow +
UTC), so a CLI run exercises exactly the code paths the tests pin.
"""

from __future__ import annotations

import argparse
import json
import sys


def _configs_from_items(items: list[dict]):
    """Stored-config page items (``AdminService.list_clients``) →
    runtime ``PipelineConfig``s, through the SAME mapping the admin
    start/restart/PATCH routes use (``AdminService.row_to_config``) so
    the CLI can never start a pipeline with different config than the
    API would."""
    from pyspark.sql import Row

    from flash_cdc_spark.admin_service import AdminService

    return [AdminService.row_to_config(Row(**it)) for it in items]


def _all_client_items(service) -> list[dict]:
    """Every stored config row — pages through ``list_clients`` (its
    page size is clamped server-side, so one huge-limit call silently
    truncates at the clamp; autostart must see ALL rows)."""
    items: list[dict] = []
    while True:
        page = service.list_clients(limit=200, offset=len(items))
        items.extend(page["items"])
        if len(items) >= page["total"] or not page["items"]:
            return items


def _cmd_serve(args: argparse.Namespace) -> int:
    from flash_cdc_spark.admin_http import AdminHttpServer
    from flash_cdc_spark.admin_service import AdminService
    from flash_cdc_spark.session import get_spark
    from flash_cdc_spark.streaming.pipelines import PipelineManager

    spark = get_spark(app_name="flash-cdc-serve")
    manager = PipelineManager(spark)
    service = AdminService(spark, manager, args.config_path)
    if args.autostart:
        started = manager.autostart(
            _configs_from_items(_all_client_items(service))
        )
        print(f"autostarted pipelines: {started}", flush=True)
    server = AdminHttpServer(service, host=args.host, port=args.port)
    with server as url:
        print(f"admin API listening on {url}", flush=True)
        import signal
        import threading

        stop = threading.Event()
        # SIGTERM (systemd/k8s stop) must drain like Ctrl-C: set the
        # event so the finally block stops every pipeline supervisor
        # and checkpoints commit cleanly before the JVM dies
        signal.signal(signal.SIGTERM, lambda *_: stop.set())
        try:
            stop.wait()  # serve until SIGTERM or KeyboardInterrupt
        except KeyboardInterrupt:
            pass
        finally:
            manager.stop_all()
    return 0


def _cmd_query(args: argparse.Namespace) -> int:
    from flash_cdc_spark.queries import QUERIES
    from flash_cdc_spark.session import get_spark
    from flash_cdc_spark.tables import default_sf_dir

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r} — try `list`", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"flash-cdc-query-{args.name}")
    df = QUERIES[args.name](spark, args.sf_dir or default_sf_dir())
    if args.json:
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    else:
        df.show(args.limit, truncate=False)
    # no spark.stop(): process exit tears the session down, and the
    # in-process test harness reuses the singleton session
    return 0


def _cmd_list(args: argparse.Namespace) -> int:
    from flash_cdc_spark.queries import ORACLE, QUERIES

    for name in QUERIES:
        if args.filter and args.filter not in name:
            continue
        marker = "oracle" if name in ORACLE else "rows-only"
        print(f"{name}\t{marker}")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="flash_cdc_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_serve = sub.add_parser("serve", help="admin HTTP API + pipeline autostart")
    p_serve.add_argument("--config-path", required=True)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--autostart", action="store_true")
    p_serve.set_defaults(fn=_cmd_serve)

    p_query = sub.add_parser("query", help="run one registered query")
    p_query.add_argument("name")
    p_query.add_argument("--sf-dir", default=None)
    p_query.add_argument("--limit", type=int, default=20)
    p_query.add_argument("--json", action="store_true")
    p_query.set_defaults(fn=_cmd_query)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--filter", default=None)
    p_list.set_defaults(fn=_cmd_list)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
