"""Dump ``.explain("formatted")`` for headline queries to plans/<tag>/.

Usage:
    python tools/plan_dump.py <tag> [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` (suffix ``before``/``after``
via --suffix, default ``before``) for every named query, or for every
batch HEADLINE query when none are named. Streaming-executed entries
(which run a real stream inside the query fn and return a collected
local relation — their "plan" is a LocalTableScan) are skipped unless
named explicitly.

The dump is driver-side only (no job runs for the explain itself), but
query *construction* may execute bounded memo jobs (signature index,
trained-model collects) exactly as the bench's warmup does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flash_cdc_spark.queries import QUERIES  # noqa: E402
from flash_cdc_spark.session import get_spark  # noqa: E402
from flash_cdc_spark.tables import default_sf_dir  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    if not args:
        print("usage: plan_dump.py <tag> [query ...]", file=sys.stderr)
        sys.exit(2)
    tag, names = args[0], args[1:]
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n not in bench.STREAMING_QUERIES]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = default_sf_dir()
    spark = get_spark(app_name=f"plan-dump-{tag}")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
