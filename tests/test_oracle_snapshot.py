"""Pin every oracle's canonical result against the committed snapshot.

The driver-gate mimic (``test_oracle.py``) recomputes both sides of
each Spark-vs-DuckDB compare, so a shared-harness bug or a
simultaneous query+oracle edit could drift silently. This test
re-derives each oracle's deterministic fingerprint (single-threaded
DuckDB, canonicalized rows, md5) and asserts it against
``tests/snapshots/oracle_sf0.001.json``. Any change to an oracle's
RESULT — not just its text — fails here until the snapshot is
deliberately regenerated via ``python -m tests.freeze_oracle_snapshot``.

DuckDB-only: no SparkSession needed, so the whole sweep runs in
seconds and can sit early in the suite.
"""

from __future__ import annotations

import json
import os

import pytest

from flash_cdc_spark.queries import ORACLE
from tests.freeze_oracle_snapshot import (
    deterministic_duck,
    oracle_fingerprint,
    snapshot_path,
)

# Both committed snapshot scales are pinned: sf0.001 catches logic
# drift fast; sf0.01 additionally pins scale-sensitive constants
# (bucket caps, thresholds, window sizes) against the data the round
# driver actually grades at.
SFS = ["0.001", "0.01"]


@pytest.fixture(scope="module", params=SFS)
def sf(request) -> str:
    return request.param


@pytest.fixture(scope="module")
def snapshot(sf) -> dict:
    path = snapshot_path(sf)
    assert os.path.exists(path), (
        f"missing committed snapshot {path}; run "
        f"`python -m tests.freeze_oracle_snapshot --sf {sf}`"
    )
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def duck(sf):
    con = deterministic_duck(f"/root/testdata/sf{sf}")
    yield con
    con.close()


def test_snapshot_covers_every_oracle(snapshot):
    """New oracle-backed queries must be frozen when added — a query
    missing from the snapshot has no pinned reference."""
    assert set(snapshot) == set(ORACLE), {
        "unfrozen": sorted(set(ORACLE) - set(snapshot)),
        "stale": sorted(set(snapshot) - set(ORACLE)),
    }


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_matches_frozen_fingerprint(snapshot, duck, name):
    assert name in snapshot, f"run freeze_oracle_snapshot to pin {name}"
    got = oracle_fingerprint(duck, ORACLE[name])
    assert got == snapshot[name], (
        f"{name}: oracle result diverged from committed snapshot "
        f"(got {got['rows']} rows hash {got['value_hash']}, frozen "
        f"{snapshot[name]['rows']} rows hash {snapshot[name]['value_hash']}); "
        "if the change is intentional, regenerate via "
        "`python -m tests.freeze_oracle_snapshot`"
    )
