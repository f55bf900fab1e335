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
        # A duplicate name would SILENTLY shadow the earlier query (dict
        # overwrite) — the later-imported module would win and the
        # earlier query would vanish from the registry while its ledger
        # row lived on (this actually happened in r10: two new
        # registrations reused r4-era names and replaced those queries
        # unnoticed until a registry-vs-ledger reconciliation). Fail at
        # import time instead.
        if name in QUERIES or any(name == n for n, _, _ in _DEFERRED):
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(existing: {QUERIES.get(name)})"
            )
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
# r10 driver window (VERDICT r9 #3 — the rotation plan written in
# COVERAGE.md last round, executed with two documented amendments).
#
# The round driver value-compares only the FIRST 50 registered queries,
# so which 50 lead the registry is an explicit per-round decision, not
# a side effect of module import order. Composition: slots 1-5 the
# r9-new queries (first driver rows — the entire rotation debt), slots
# 6-10 the r10-new queries (amendment #1: debt was small enough that
# this window absorbs BOTH waves, closing the round at debt zero),
# then changed-code-first keepers (every global-order consumer — the
# operator was restructured this round — plus the radicand-clamp
# trio), the standing high-traffic sets, the two signature-memo
# long-greens whose return the proposal promised, and (amendment #2)
# an oldest-served-cohort block: six rows last driver-green in r7 take
# the slots of keepers that were just green in r9. Canaries q10/q05
# per the pool order.
#
# Pre-rotation gate (since r8, tightened in r9): every window name
# passes the STRICT (bit-exact) oracle mimic at sf0.01 on BOTH
# adversarial partitioning tiers (7 and 13 cores) at window freeze.
#
# Everything rotated out stays continuously checked by the local mimic
# (tests/test_oracle.py) AND pinned against the committed
# oracle-fingerprint snapshots (tests/test_oracle_snapshot.py), so a
# regression in the rotated-out surface still fails pytest loudly.
WINDOW: list[str] = [
    # ------------------------------------------------------------------
    # r10 driver window (VERDICT r9 #3, executed per the COVERAGE.md
    # r10 proposal, with one widening: the five r10-NEW queries also
    # take first-row slots — rotation debt was only the 5 r9-new, so
    # the window absorbs BOTH waves and the round closes at debt ZERO).
    # Pre-rotation gate: every name below passed the STRICT bit-exact
    # oracle mimic at sf0.01 on the 7- and 13-core adversarial
    # partitioning tiers at window freeze.
    # ------------------------------------------------------------------
    # -- r9-new, first driver rows (5; ledger rows 252-256; the exact
    #    slots the COVERAGE.md r10 proposal reserved) --
    "q_stats_ks_test",
    "q_stats_spearman_corr",
    "q_train_curriculum_order",
    "q_dedup_editdist_verify",
    "q_multimodal_scene_cuts",
    # -- r10-new, first driver rows (5; ledger rows 257-261) --
    "q_sales_gini_coefficient",
    "q_stats_kendall_tau",
    "q_events_hourly_autocorr",
    "q_events_markov_transitions",
    "q_text_zipf_slope",
    # -- keepers, changed-code-first: every global-order consumer (the
    #    operator was restructured in r10 — exact-ntile cut selection,
    #    single-F.expr boundary predicates, analyzed-plan leaf identity
    #    in the persist/memo digests, shared multi-axis sampling; rfm
    #    is the VERDICT r9 #1 rewrite itself). ks/spearman/curriculum/
    #    gini/zipf above are consumers too. --
    "q_customer_rfm_segments",
    "q_sales_pareto_abc",
    "q_stats_equidepth_histogram",
    "q_survival_kaplan_meier",
    "q_events_sla_percentiles",
    "q_stats_mann_whitney",
    "q_train_length_matched_sample",
    "q_train_negative_sampling",
    "q_train_sequence_packing",
    # -- keepers, changed-code-first: the radicand-clamp trio (ADVICE
    #    r9 — sigma = sqrt(greatest(0, ...)) in query AND oracle) --
    "q_events_anomaly_zscore",
    "q_events_cusum_changepoint",
    "q_events_seasonal_anomalies",
    # -- keepers: high-traffic regression surface --
    "q_null_semantics",
    "q_streaming_rollup",
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
    # -- keepers: signature-memo consumers --
    "q_dedup_simhash64_pairs",
    "q_dedup_clusters",
    "q_dedup_clusters64",
    "q_multimodal_dhash_neardup",
    "q_multimodal_audiohash_neardup",
    "q_multimodal_video_neardup",
    "q_dedup_prefix_jaccard_join",
    # -- keepers: the two signature-memo long-greens the r9
    #    changed-code set displaced (their return was promised in the
    #    written r10 proposal) --
    "q_dedup_containment_pairs",
    "q_dedup_pagerank_centrality",
    # -- keepers: oldest-served cohort (last driver rows r7) — the
    #    five r9-green long-greens (minhash_lsh, exact_summary,
    #    semdedup, contamination_check, bm25_topk) and the r9-green
    #    events keepers yield to rows three rounds stale; all stay
    #    snapshot-pinned + mimic-checked --
    "q_quality_nb_classifier",
    "q_quality_psi_drift",
    "q_graph_bipartite_projection",
    "q_events_dwell_time",
    "q_quality_referential_audit",
    "q_text_source_jsd",
    # -- batch canaries (2; rotation pool in COVERAGE.md: q10/q05 due —
    #    q18/q03 served r9, q01/q14 r8, q05/q13 r7, q10 last in r6) --
    "q10_returned_items",
    "q05_local_supplier_volume",
]

# This round's batch canaries (tail of WINDOW); exported for the
# registry-contract test and COVERAGE.md's rotation history.
CANARIES: list[str] = [
    "q10_returned_items",
    "q05_local_supplier_volume",
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
