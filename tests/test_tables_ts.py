"""load_table must normalize every events.ts physical variant the
driver has shipped to session-local TIMESTAMP (UTC session):

- r1/r2: TIMESTAMP(NANOS) — unreadable by Spark's parquet reader, read
  as raw int64 via the nanosAsLong legacy conf and floored to micros;
- r3: TIMESTAMP(MICROS, isAdjustedToUTC=false) — reads as
  TIMESTAMP_NTZ, which breaks unix_millis() downstream unless cast.

Both variants must yield identical TIMESTAMP values for the same
instant (ns values are exact multiples of 1µs here, so floor is a
no-op on the shared instants).
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flash_cdc_spark.tables import load_table

_INSTANTS = [
    datetime.datetime(2024, 1, 10, 3, 4, 5, 123456),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
    datetime.datetime(2023, 11, 2, 0, 0, 0, 0),
]


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "events.parquet"), version="2.6")
    return tmpdir


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_normalizes_events_ts_variants(spark, tmp_path, unit):
    sf_dir = _write_events(
        str(tmp_path), pa.array(_INSTANTS, pa.timestamp(unit))
    )
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    got = [
        r["ms"]
        for r in df.selectExpr("unix_millis(ts) AS ms").orderBy("ms").collect()
    ]
    want = sorted(
        int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for t in _INSTANTS
    )
    assert got == want
