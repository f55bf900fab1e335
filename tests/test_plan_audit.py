"""Registry-wide physical-plan audit.

Global anti-pattern invariants over EVERY registered batch query's
physical plan (the checks a scale review does by hand, pinned as a
test): no CartesianProduct anywhere, and no row-at-a-time Python UDF
(`BatchEvalPython`) in any plan — Python is allowed only through the
Arrow-vectorized operators (`ArrowEvalPython` / `MapInPandas` /
`FlatMapGroupsInPandas`...).

Streaming-executed queries (q_streaming_*) are excluded: calling them
RUNS a real Structured Streaming job — their delivery/state shapes are
covered by their own e2e tests. Queries that legitimately cross-join
single-row or bounded broadcast relations show up as
BroadcastNestedLoopJoin, which this audit permits; CartesianProduct
(the unbroadcast shuffle-side product) is never acceptable.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flash_cdc_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


_AUDITED = sorted(
    n for n in QUERIES if not n.startswith("q_streaming_")
)


@pytest.mark.parametrize("name", _AUDITED)
def test_no_cartesian_and_no_row_python(spark, sf_dir, name):
    plan = _plan(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    # exact node "BatchEvalPython (n)" is the row-wise scalar Python
    # UDF — banned everywhere. "BatchEvalPythonUDTF" is distinct: the
    # one registered UDTF (q_udtf_chunk_digest) is the documented
    # API-surface example whose module docstring states row-at-a-time
    # UDTFs are not a scale path.
    assert "BatchEvalPython (" not in plan, f"{name}: row-wise Python UDF"
