"""Freeze the DuckDB-oracle fingerprints for every oracle-backed query.

Why this exists (VERDICT r3, next-round item #2): the local driver-gate
mimic (``tests/test_oracle.py``) recomputes BOTH sides of every compare
each run, so a bug introduced simultaneously into a query and its
oracle — or into the shared canonicalization harness — could drift
silently. This snapshot pins ONE side: the DuckDB oracle's canonical
result (row count, sorted column names, md5 of canonicalized values)
at a fixed scale factor, computed on a single-threaded connection so
aggregation order is deterministic. The paired test
(``tests/test_oracle_snapshot.py``) re-derives the fingerprints and
fails loudly on any divergence; regenerating the snapshot is a
deliberate, reviewed act:

    python -m tests.freeze_oracle_snapshot            # sf0.001
    python -m tests.freeze_oracle_snapshot --sf 0.01

Combined with the mimic's Spark-vs-oracle tolerance compare, this gives
the rotated-out driver window (queries currently outside the round
driver's 50-slot value-compare) a fixed external reference.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

SNAPSHOT_DIR = os.path.join(os.path.dirname(__file__), "snapshots")


def snapshot_path(sf: str) -> str:
    return os.path.join(SNAPSHOT_DIR, f"oracle_sf{sf}.json")


def deterministic_duck(sf_dir: str):
    """Single-threaded DuckDB connection: one worker means one
    aggregation/scan order, so float accumulations are bit-stable
    run-to-run (the multi-threaded default is tolerance-stable but not
    hash-stable)."""
    from tests.oracle_harness import duck_connection

    con = duck_connection(sf_dir)
    con.execute("SET threads=1")
    return con


def oracle_fingerprint(con, sql: str) -> dict:
    """Canonical fingerprint of one oracle query's result: reuses the
    harness's value canonicalization (floats to 9 significant digits,
    tz-stripped timestamps, column-name-sorted, row-sorted) and hashes
    the canonical rows."""
    from tests.oracle_harness import _canon_rows

    res = con.execute(sql)
    cols = [d[0].lower() for d in res.description]
    rows = res.fetchall()
    cols_sorted, canon = _canon_rows(cols, rows)
    digest = hashlib.md5(
        repr((cols_sorted, canon)).encode("utf-8")
    ).hexdigest()
    return {"rows": len(rows), "cols": cols_sorted, "value_hash": digest}


def build_snapshot(sf: str, only: list[str] | None = None) -> dict:
    """Full rebuild, or — with ``only`` — recompute just those names
    and merge into the existing snapshot (the add-a-query fast path;
    untouched entries stay bit-identical, which is the point of the
    snapshot). Unknown names in ``only`` raise."""
    from flash_cdc_spark.queries import ORACLE

    sf_dir = f"/root/testdata/sf{sf}"
    con = deterministic_duck(sf_dir)
    if only:
        missing = [n for n in only if n not in ORACLE]
        if missing:
            raise SystemExit(f"--only names not registered: {missing}")
        with open(snapshot_path(sf), encoding="utf-8") as fh:
            out = json.load(fh)
        # drop entries for queries that no longer register an oracle
        out = {n: v for n, v in out.items() if n in ORACLE}
        names = only
    else:
        out = {}
        names = sorted(ORACLE)
    for name in names:
        out[name] = oracle_fingerprint(con, ORACLE[name])
    con.close()
    return out


def main() -> int:
    args = sys.argv[1:]
    sf = "0.001"
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    only = None
    if "--only" in args:
        only = args[args.index("--only") + 1].split(",")
    snap = build_snapshot(sf, only=only)
    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    path = snapshot_path(sf)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"froze {len(snap)} oracle fingerprints -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
