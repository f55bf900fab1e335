"""Query registry — the driver-facing inventory.

Every implemented operator/query registers here with a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. ``__spark_entry__.py`` re-exports this registry to the driver.

Registration is side-effect-on-import: importing
:mod:`flash_cdc_spark.queries` pulls in every query module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Registrations stashed until every module has imported: the round
# driver's correctness gate only evaluates the first 50 registered
# queries, and it reports ``err: no_oracle`` (not a rows-only check)
# for oracle-less entries — so oracle-less queries must never occupy a
# window slot. ``defer=True`` pushes them to the very end.
_DEFERRED: list[tuple[str, Callable[[SparkSession, str], DataFrame], str | None]] = []


def query(name: str, oracle: str | None = None, defer: bool = False):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (the driver skips the value compare for it — see ``defer``)."""

    def deco(fn):
        if defer:
            _DEFERRED.append((name, fn, oracle))
        else:
            QUERIES[name] = fn
            if oracle is not None:
                ORACLE[name] = oracle
        return fn

    return deco


def _flush_deferred() -> None:
    for name, fn, oracle in _DEFERRED:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
    _DEFERRED.clear()


# Import for registration side effects. Intra-module order still
# determines the relative order of everything OUTSIDE the explicit
# driver window below; the window itself is applied as a final reorder
# (see ``WINDOW``), so module order no longer decides driver slots.
from flash_cdc_spark.queries import changefeed  # noqa: E402,F401
from flash_cdc_spark.queries import llm  # noqa: E402,F401
from flash_cdc_spark.queries import neardup  # noqa: E402,F401
from flash_cdc_spark.queries import events  # noqa: E402,F401
from flash_cdc_spark.queries import streaming_e2e  # noqa: E402,F401
from flash_cdc_spark.queries import scale  # noqa: E402,F401
from flash_cdc_spark.queries import functions_ext  # noqa: E402,F401
from flash_cdc_spark.queries import pandas_udfs  # noqa: E402,F401
from flash_cdc_spark.queries import batch  # noqa: E402,F401
from flash_cdc_spark.queries import batch_ext  # noqa: E402,F401

# r3 additions (their queries now lead the r4 window; see WINDOW).
from flash_cdc_spark.queries import llm_ext  # noqa: E402,F401
from flash_cdc_spark.queries import events_ext  # noqa: E402,F401
from flash_cdc_spark.queries import multimodal_ext  # noqa: E402,F401
from flash_cdc_spark.queries import llm_ext2  # noqa: E402,F401
from flash_cdc_spark.queries import neardup_ext  # noqa: E402,F401

# r4 additions (window slots 1-32 this round).
from flash_cdc_spark.queries import llm_ext3  # noqa: E402,F401
from flash_cdc_spark.queries import maintenance_ext  # noqa: E402,F401
from flash_cdc_spark.queries import curation_ext  # noqa: E402,F401
from flash_cdc_spark.queries import retrieval_ext  # noqa: E402,F401
from flash_cdc_spark.queries import udtf_ext  # noqa: E402,F401

# r5 additions (window slots 1-21 this round).
from flash_cdc_spark.queries import llm_ext4  # noqa: E402,F401
from flash_cdc_spark.queries import quality_ext  # noqa: E402,F401

# r6 additions (past-window; r7 rotation candidates).
from flash_cdc_spark.queries import tokenize_ext  # noqa: E402,F401
from flash_cdc_spark.queries import ingest_ext  # noqa: E402,F401
from flash_cdc_spark.queries import analytics_ext  # noqa: E402,F401
from flash_cdc_spark.queries import analytics_ext2  # noqa: E402,F401
from flash_cdc_spark.queries import quality_ext2  # noqa: E402,F401
from flash_cdc_spark.queries import analytics_ext3  # noqa: E402,F401
from flash_cdc_spark.queries import corpus_ext  # noqa: E402,F401
from flash_cdc_spark.queries import training_ext  # noqa: E402,F401
from flash_cdc_spark.queries import analytics_ext4  # noqa: E402,F401
from flash_cdc_spark.queries import maintenance_ext2  # noqa: E402,F401
from flash_cdc_spark.queries import contracts_ext  # noqa: E402,F401

# r7 additions (past-window; r8 rotation candidates — slots reserved in
# the COVERAGE.md r8 proposal).
from flash_cdc_spark.queries import analytics_ext5  # noqa: E402,F401

# r8 additions (past-window; r9 rotation candidates — slots reserved in
# the COVERAGE.md r9 proposal).
from flash_cdc_spark.queries import analytics_ext6  # noqa: E402,F401

# r9 additions (past-window; r10 rotation candidates).
from flash_cdc_spark.queries import analytics_ext7  # noqa: E402,F401

# r10 additions (past-window; r11 rotation candidates).
from flash_cdc_spark.queries import analytics_ext8  # noqa: E402,F401

# ---------------------------------------------------------------------
# r8 driver window (VERDICT r7, next-round item #3 — the rotation plan
# written in COVERAGE.md last round, executed verbatim).
#
# The round driver value-compares only the FIRST 50 registered queries,
# so which 50 lead the registry is an explicit per-round decision, not
# a side effect of module import order. This round's composition:
#
# * slots 1-11 — the remaining r6-new queries (COVERAGE.md ledger rows
#   222-232): burst detection, interleave order, doc keywords, replay
#   idempotency, contrast stretch, incremental agg, watermark advisor,
#   profile drift, Wilson ranking, cohort LTV, lexical diversity.
#   First driver rows; restores the every-oracle-backed-query-
#   driver-green-at-least-once invariant.
# * slots 12-20 — the 9 r7-new queries (ledger rows 233-241):
#   Kaplan-Meier survival, chi-square, SLA percentiles, offset gaps,
#   dup inflation, QL-Dirichlet retrieval, FORCAST readability,
#   basket rules, video dup groups. First driver rows.
# * slots 21-48 — r7/r8-diff keepers: q_null_semantics (r7 semantics
#   change: partitioned ranks), the lazy-signature-memo consumers,
#   the two-phase rewrites RFM / Pareto / equi-depth (RFM and Pareto
#   additionally carry this round's DECIMAL money-sum fixes — the r7
#   red row's re-proof — and all ride the r8 boundary-literal
#   global-order refactor), pagerank (r8 DECIMAL contribution fix),
#   admin filter/paginate (post-restart-route), the changefeed
#   flagship + Avro decode + streaming e2e, the five streaming sinks,
#   and the high-traffic dedup/retrieval regressions.
#   ONE AMENDMENT to the written proposal (documented in COVERAGE.md):
#   the r8 strict sweep changed five MORE queries than the proposal
#   anticipated (q_events_tumbling_hour, q_window_running_spend,
#   q07/q17/q19 — DECIMAL money-sum fixes, STRICT_SWEEP.md), so those
#   five take the keeper slots of five unchanged long-green
#   regressions (minhash_lsh, exact_summary, semdedup,
#   contamination_check, bm25_topk — all still snapshot-pinned every
#   pytest run): changed code needs driver re-proof more than
#   unchanged code needs an extra green row.
# * slots 49-50 — batch canaries from the rotation pool (q01/q14 due
#   back — served r5; q05/q13 served r7, q03/q10 r6).
#
# Pre-rotation gate (r8, VERDICT r7 #2): every window name passes the
# STRICT (bit-exact) oracle mimic at sf0.01 — the float-tolerant gate
# structurally cannot see the sub-tolerance money-sum drift that made
# r7's one red row.
#
# Everything rotated out stays continuously checked by the local mimic
# (tests/test_oracle.py) AND pinned against the committed
# oracle-fingerprint snapshot (tests/test_oracle_snapshot.py), so a
# regression in the rotated-out surface still fails pytest loudly.
WINDOW: list[str] = [
    # -- r8-new, first driver rows (10; ledger rows 242-251; the exact
    #    slots the COVERAGE.md r9 proposal reserved) --
    "q_sales_new_vs_returning",
    "q_stats_mann_whitney",
    "q_quality_lognormal_fit",
    "q_train_shard_manifest",
    "q_events_interarrival_burstiness",
    "q_text_code_detection",
    "q_changefeed_tombstone_audit",
    "q_multimodal_audio_silence_trim",
    "q_embedding_matryoshka_error",
    "q_graph_jaccard_link_prediction",
    # -- keepers: the five long-greens the r8 amendment displaced --
    "q_dedup_minhash_lsh",
    "q_dedup_exact_summary",
    "q_dedup_semdedup",
    "q_train_contamination_check",
    "q_retrieval_bm25_topk",
    # -- keepers: plan changed in r8 after the r8 window froze --
    "q_text_ngram_novelty",
    # -- keepers: changed-code-first — the 10 queries whose query AND
    #    oracle moved to DECIMAL-exact events.value aggregates in r9
    #    (STRICT_SWEEP.md residual list + the two same-class sites the
    #    sweep grep surfaced: ts_profile cells, streaming rollup) --
    "q_events_sliding_6h",
    "q_events_sessionize",
    "q_events_range_join",
    "q_streaming_rollup",
    "q_events_anomaly_zscore",
    "q_events_ts_profile_similarity",
    "q_maintenance_compaction",
    "q_events_cusum_changepoint",
    "q_events_theilsen_trend",
    "q_events_seasonal_anomalies",
    # -- keepers: two-phase global-order riders (operator gained the
    #    shared persist registry + contract guard this round) --
    "q_customer_rfm_segments",
    "q_sales_pareto_abc",
    "q_stats_equidepth_histogram",
    "q_events_sla_percentiles",
    "q_survival_kaplan_meier",
    "q_null_semantics",
    # -- keepers: streaming sinks --
    "q_streaming_latest_state",
    "q_streaming_db_upsert",
    "q_streaming_dlq_delivery",
    "q_streaming_feed_outbox",
    "q_streaming_neardup_dedup",
    "q_streaming_changefeed_e2e",
    # -- keepers: changefeed surface --
    "q_changefeed_flagship",
    "q_envelope_decode_avro",
    "q_admin_filter_paginate",
    # -- keepers: signature-memo consumers (containment_pairs and
    #    pagerank_centrality yield their slots this round to the
    #    changed-code set; both stay snapshot-pinned + mimic-checked) --
    "q_dedup_simhash64_pairs",
    "q_dedup_clusters",
    "q_dedup_clusters64",
    "q_multimodal_dhash_neardup",
    "q_multimodal_audiohash_neardup",
    "q_multimodal_video_neardup",
    "q_dedup_prefix_jaccard_join",
    # -- batch canaries (2; rotation pool in COVERAGE.md: q18/q03 due
    #    — q01/q14 served r8, q05/q13 r7, q03/q10 r6, q18 last in r5) --
    "q18_large_orders",
    "q03_shipping_priority",
]

# This round's batch canaries (tail of WINDOW); exported for the
# registry-contract test and COVERAGE.md's rotation history.
CANARIES: list[str] = [
    "q18_large_orders",
    "q03_shipping_priority",
]


def _apply_window(window: list[str]) -> None:
    """Reorder the registry so ``window`` occupies the first 50 slots;
    everything else follows in its original registration order."""
    missing = [n for n in window if n not in QUERIES]
    if missing:
        raise RuntimeError(f"WINDOW names not registered: {missing}")
    in_window = set(window)
    new_order = window + [n for n in QUERIES if n not in in_window]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in new_order:
        QUERIES[n] = snapshot[n]


_apply_window(WINDOW)

# Oracle-less (rows-only) queries land after every oracle-backed one.
_flush_deferred()

__all__ = ["QUERIES", "ORACLE", "query", "CANARIES", "WINDOW"]
